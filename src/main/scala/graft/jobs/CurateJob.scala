package graft.jobs

import org.apache.spark.sql.SparkSession
import graft.operators.{Curation, TrainFilter}

/**
 * spark-submit driver for the corpus-curation pipeline (see DEPLOY.md):
 * stages the eight filter legs once (the resumable production shape —
 * a re-run reuses nothing-lost staging parquet), then writes the
 * packed-sequence layout of the filtered + mixture-sampled corpus,
 * partitioned by pack shard so each output file is one writer's
 * contiguous token stream.
 *
 *   spark-submit --class graft.jobs.CurateJob engine.jar \
 *     --input /path/sfdir --output /path/curated [--stage /path/stage]
 *
 * Accepts the same `--config job.properties` mechanism as [[ScrubJob]]
 * (CLI flags override file values).
 */
object CurateJob {

  def main(args: Array[String]): Unit = {
    val opts = ScrubJob.resolve(args)
    val input = opts.getOrElse("input",
      sys.error("--input <sf dir with documents.parquet> is required"))
    val output = opts.getOrElse("output", sys.error("--output <dir> is required"))
    val stage = opts.getOrElse("stage", s"$output/_stage")

    val builder = SparkSession.builder()
      .appName("graft-curate")
      .config("spark.sql.adaptive.enabled", "true")
    val spark = (if (sys.props.contains("spark.master") ||
                     sys.env.contains("SPARK_MASTER")) builder
                 else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = run(spark, input, output, stage)
    println(s"[curate] packed rows=$n output=$output stage=$stage")
    spark.stop()
  }

  /** The job body (main minus session lifecycle — testable). */
  def run(spark: SparkSession, input: String, output: String,
          stage: String): Long = {
    import org.apache.spark.sql.functions.col
    val kept = TrainFilter.trainFilterStaged(spark, input, stage)
      .filter(col("train_keep")).select("doc_id")
    val docs = graft.operators.Inputs.documents(spark, input).join(kept, "doc_id")
    val sampled = Curation.mixSampleDocs(docs)
      .filter(col("keep")).select("doc_id")
    Curation.seqPackDocs(docs.join(sampled, "doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(output)
    spark.read.parquet(output).count()
  }
}
