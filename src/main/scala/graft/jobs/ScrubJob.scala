package graft.jobs

import org.apache.spark.sql.SparkSession
import graft.pipeline.Checkpoint

/**
 * The production entry point (see DEPLOY.md): spark-submit driver for
 * the resumable keep-drop+scrub job. Reads a transcript table, commits
 * the verdict bucket-by-bucket with the sidecar, and is safe to re-run
 * after a kill (committed buckets are skipped).
 *
 *   spark-submit --class graft.jobs.ScrubJob engine.jar \
 *     --input /path/transcripts.parquet --output /path/verdicts --buckets 4096
 */
object ScrubJob {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val input = opts.getOrElse("input",
      sys.error("--input <transcript parquet/table path> is required"))
    val output = opts.getOrElse("output", sys.error("--output <dir> is required"))
    val buckets = opts.getOrElse("buckets", "64").toInt

    // master/conf come from spark-submit; local[*] fallback for dev runs
    val builder = SparkSession.builder()
      .appName("graft-scrub")
      .config("spark.sql.adaptive.enabled", "true")
    val spark = (if (sys.props.contains("spark.master") ||
                     sys.env.contains("SPARK_MASTER")) builder
                 else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stats = Checkpoint.run(spark, spark.read.parquet(input), output, buckets)
    println(s"[scrub] buckets committed=${stats.bucketsCommitted} " +
      s"skipped=${stats.bucketsSkipped} rows=${stats.rowsWritten}")
    spark.stop()
  }
}
