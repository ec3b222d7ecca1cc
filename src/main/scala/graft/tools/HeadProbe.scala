package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.Verdict
object HeadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val turns = {
      val n = sys.env.getOrElse("SPARK_GRAFT_TURNS", "2000000").toLong
      val c = s"${sys.props("java.io.tmpdir")}/graft_bench_${n}.parquet"
      if (!new java.io.File(c).exists())
        graft.sources.Transcripts.generate(spark, n, math.max(1L, n / 50), 5, 256)
          .write.mode("overwrite").parquet(c)
      spark.read.parquet(c)
    }
    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(n: String)(f: => Unit): Unit = { val t0=System.nanoTime(); f; println(f"[h] $n ${(System.nanoTime()-t0)/1e9}%.2f s") }
    force(Verdict(turns.limit(50000), fused = true))
    force(Verdict(turns.limit(50000), fused = false))
    for (i <- 1 to 6) t(s"fused $i")(force(Verdict(turns, fused = true)))
    for (i <- 1 to 4) t(s"chain $i")(force(Verdict(turns, fused = false)))
    
    spark.stop()
  }
}
