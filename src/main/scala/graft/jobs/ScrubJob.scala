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
 *
 * Job parameters may also come from a java-properties config file
 * (SURVEY.md §2.8 K4 — the reference reads a config file for the same
 * knobs): `--config job.properties` with keys input/output/buckets/
 * parallelism; explicit CLI flags override file values.
 */
object ScrubJob {

  /** CLI flags merged over config-file values (flags win). */
  private[graft] def resolve(args: Array[String]): Map[String, String] = {
    val flags = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val fromFile = flags.get("config").map { path =>
      val p = new java.util.Properties()
      val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
      try p.load(in) finally in.close()
      import scala.jdk.CollectionConverters._
      p.stringPropertyNames().asScala.map(k => k -> p.getProperty(k)).toMap
    }.getOrElse(Map.empty)
    fromFile ++ flags
  }

  def main(args: Array[String]): Unit = {
    val opts = resolve(args)
    val input = opts.getOrElse("input",
      sys.error("--input <transcript parquet/table path> is required"))
    val output = opts.getOrElse("output", sys.error("--output <dir> is required"))
    val buckets = opts.getOrElse("buckets", "64").toInt
    val parallelism = opts.getOrElse("parallelism", "4").toInt

    // master/conf come from spark-submit; local[*] fallback for dev runs
    val builder = SparkSession.builder()
      .appName("graft-scrub")
      .config("spark.sql.adaptive.enabled", "true")
    val spark = (if (sys.props.contains("spark.master") ||
                     sys.env.contains("SPARK_MASTER")) builder
                 else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stats = Checkpoint.run(spark, spark.read.parquet(input), output,
      buckets, parallelism = parallelism)
    println(s"[scrub] buckets committed=${stats.bucketsCommitted} " +
      s"skipped=${stats.bucketsSkipped} rows=${stats.rowsWritten}")
    spark.stop()
  }
}
