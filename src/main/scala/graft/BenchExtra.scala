package graft

import org.apache.spark.sql.SparkSession

/**
 * Per-query isolation bench + plan capture (optimization-guide §1.4):
 * times named SparkEntry queries through the noop sink in a session
 * configured exactly like [[Bench]] (local[$SPARK_GRAFT_CPUS], AQE on,
 * shuffle.partitions = cpus), brackets every pass with /proc/stat
 * samples so hypervisor steal is visible per pass, and dumps each
 * query's `.explain("formatted")` to plans/<roundTag>/<query>_<tag>.txt
 * for the before/after plan evidence. Separate main so the frozen
 * [[Bench]] harness stays untouched.
 *
 * Usage: runMain graft.BenchExtra <tag> <q1,q2,...> [passes] [plansDir]
 * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val passes = if (args.length > 2) args(2).toInt else 3
    val plansDir = if (args.length > 3) args(3) else "plans/r07"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cpuSample(): Option[Array[Long]] = try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
      Some(line.trim.split("\\s+").drop(1).map(_.toLong))
    } catch { case _: Throwable => None }
    def stealPct(c0: Option[Array[Long]], c1: Option[Array[Long]]): Double =
      (c0, c1) match {
        case (Some(a), Some(b)) if a.length > 7 && b.length > 7 && b.sum > a.sum =>
          100.0 * (b(7) - a(7)) / (b.sum - a.sum).toDouble
        case _ => -1.0
      }

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(plansDir))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"benchextra:$name:plan")
      val planDf = fn(spark, sfDir)
      val plan = planDf.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$plansDir/${name}_$tag.txt"), plan)
      val results = (0 until (1 + passes)).map { i =>
        spark.sparkContext.setJobDescription(s"benchextra:$name:pass$i")
        val c0 = cpuSample()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        (t, stealPct(c0, cpuSample()))
      }
      val timed = results.drop(1)
      val best = timed.minBy(_._1)
      println(f"BENCHEXTRA $tag $name best=${best._1}%.3f steal_best=${best._2}%.1f " +
        s"all=[${results.map(r => f"${r._1}%.3f@${r._2}%.1f").mkString(",")}]")
    }
    spark.stop()
  }
}
