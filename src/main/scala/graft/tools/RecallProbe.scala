package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures IVF recall vs brute-force top-k (the number quoted in
  * Similarity.annIvf's Scaladoc and pinned by OperatorsSpec). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01"); np <- Seq(1, 2)) {
      val dir = s"/root/testdata/$sf"
      val brute = graft.operators.Similarity.annTopK(spark, dir, k = 5)
        .collect().map(_.getLong(0)).toSet
      val ivf = graft.operators.Similarity.annIvf(spark, dir, k = 5, nprobe = np)
        .collect().map(_.getLong(0)).toSet
      println(s"RECALL $sf nprobe=$np: ${(brute & ivf).size}/5")
    }
    spark.stop()
  }
}
