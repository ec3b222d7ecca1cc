package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the fused single-scan Gopher shape against the per-leg proof
  * shape (9 independent scans) — the measurement behind choosing fused
  * as the default. Usage: runMain graft.tools.GopherProbe [sfDir] [passes] */
object GopherProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String, f: => Unit): Unit = for (i <- 0 until passes) {
      val t0 = System.nanoTime(); f
      println(f"GOPHERPROBE $tag pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("fused", graft.operators.GopherQuality.quality(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("perleg", graft.operators.GopherQuality.qualityPerLeg(spark, dir)
      .write.format("noop").mode("overwrite").save())
    // blocked variant at PRODUCTION thresholds (1M tokens / 32 blocks):
    // light docs degenerate to blk = 0 — the candidate default dispatch
    time("blockedProd", graft.operators.GopherQuality
      .qualityBlocked(spark, dir, numBlocks = 32, heavyThreshold = 1000000L)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
