package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Clean, Verdict}
import graft.rules.Pii
import graft.sources.Transcripts

/** Stage-cost probe for the verdict pipeline: times each incremental
  * slice (scan, clean, +skip, +pii(chain/fused), +vader, full) over the
  * bench corpus so optimization effort goes where the time is. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_TURNS", "500000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_bench_${nTurns}.parquet"
    if (!new java.io.File(corpus).exists())
      Transcripts.generate(spark, nTurns, nConvs = math.max(1L, nTurns / 50),
        skewPct = 5, numPartitions = 128).write.mode("overwrite").parquet(corpus)
    val turns = spark.read.parquet(corpus)

    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(name: String)(df: => DataFrame): Unit = {
      force(df) // warm
      val t0 = System.nanoTime(); force(df)
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (${nTurns / ((System.nanoTime() - t0) / 1e9)}%,.0f rows/s)")
    }

    t("scan only")(turns)
    t("clean")(turns.withColumn("clean_text", Clean.cleanText(col("text"))))
    t("clean+skip")(turns.withColumn("clean_text", Clean.cleanText(col("text")))
      .withColumn("skipped", Clean.isSkipped(col("clean_text"))))
    t("clean+pii chain")(turns.withColumn("clean_text", Clean.cleanText(col("text")))
      .withColumn("m", Pii.piiMatches(col("clean_text")))
      .withColumn("r", Pii.piiRiskScore(col("m"))))
    t("clean+pii fused")(turns.withColumn("clean_text", Clean.cleanText(col("text")))
      .withColumn("m", graft.functions.PiiScan(col("clean_text")))
      .withColumn("r", Pii.piiRiskScore(col("m"))))
    t("clean+vader")(turns.withColumn("clean_text", Clean.cleanText(col("text")))
      .withColumn("s", graft.functions.VaderUdf.compound(col("clean_text"))))
    t("full fused")(Verdict(turns, fused = true))
    t("full chain")(Verdict(turns, fused = false))
    spark.stop()
  }
}
