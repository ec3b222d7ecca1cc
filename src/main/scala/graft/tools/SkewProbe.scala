package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Conversation, Verdict}
import graft.sources.Transcripts

/**
 * Skew-salting evidence probe: times the direct window / blocked-scan
 * window / direct rollup / salted rollup on a generated corpus with one
 * mega-conversation, at chosen (turns, skewPct, cpus). Used to pick the
 * bench defaults and to document WHERE salting pays: the ordered window
 * (no map-side combine exists) vs the combinable rollup (partial
 * aggregation already neutralizes skew).
 *
 * Usage: runMain graft.tools.SkewProbe [turns] [skewPct] [cpus] [passes]
 */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val pct = if (args.length > 1) args(1).toInt else 40
    val cpus = if (args.length > 2) args(2) else "32"
    val passes = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val slimPath = s"${sys.props("java.io.tmpdir")}/graft_bench_skew_${Transcripts.generatorVersion}_${n}_p$pct.parquet"
    if (!new java.io.File(slimPath).exists()) {
      val t = Transcripts.generate(spark, n, nConvs = math.max(1L, n / 50),
        skewPct = pct, numPartitions = 128)
      Verdict(t, fused = true)
        .select("conv_id", "turn_idx", "keep", "pii_risk_score")
        .write.mode("overwrite").parquet(slimPath)
    }
    val slim = spark.read.parquet(slimPath)
    val mega = slim.groupBy("conv_id").count().orderBy(desc("count")).first()
    println(s"[skewprobe] n=$n pct=$pct cpus=$cpus mega=${mega.getString(0)}:${mega.getLong(1)}")

    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def rollupDirect(v: DataFrame): DataFrame =
      v.groupBy("conv_id").agg(
        count(lit(1)).as("turns"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("dropped"),
        sum(when(col("pii_risk_score") > 0.0, 1L).otherwise(0L)).as("pii_turns"),
        round(max("pii_risk_score"), 6).as("max_risk"))
    def run(name: String, f: => Unit): Unit = {
      timed(f) // warmup
      val ts = (0 until passes).map(_ => timed(f))
      println(f"[skewprobe] $name%-16s best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    run("window_direct", force(Conversation.runningState(slim)))
    run("window_salted", force(Conversation.runningStateSalted(slim)))
    run("rollup_direct", force(rollupDirect(slim)))
    run("rollup_salted", force(Conversation.rollupSalted(slim)))
    spark.stop()
  }
}
