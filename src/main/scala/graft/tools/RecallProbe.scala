package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures IVF recall vs brute-force top-k across the full
  * (Lloyd iterations, nprobe) grid at both sf0.001 and sf0.01 — the
  * recall-curve table quoted in Similarity.annIvf's Scaladoc and
  * committed to COVERAGE.md; OperatorsSpec pins the (it=1, nprobe=2)
  * and (it=1, nprobe=4) points. Prints markdown table rows. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nprobes = Seq(1, 2, 4, 8)
    println(s"| sf | iterations | " + nprobes.map(np => s"nprobe=$np").mkString(" | ") + " |")
    println("|---|---|" + nprobes.map(_ => "---").mkString("|") + "|")
    for (sf <- Seq("sf0.001", "sf0.01"); it <- Seq(0, 1, 2)) {
      val dir = s"/root/testdata/$sf"
      val brute = graft.operators.Similarity.annTopK(spark, dir, k = 5)
        .collect().map(_.getLong(0)).toSet
      val cells = nprobes.map { np =>
        val ivf = graft.operators.Similarity
          .annIvf(spark, dir, k = 5, nprobe = np, iterations = it)
          .collect().map(_.getLong(0)).toSet
        s"${(brute & ivf).size}/5"
      }
      println(s"| $sf | $it | " + cells.mkString(" | ") + " |")
    }
    spark.stop()
  }
}
