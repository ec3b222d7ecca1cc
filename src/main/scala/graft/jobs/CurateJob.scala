package graft.jobs

import org.apache.spark.sql.SparkSession
import graft.operators.Curation

/**
 * spark-submit driver for the corpus-curation pipeline (see DEPLOY.md):
 * stages the eight filter legs once (the resumable production shape —
 * a re-run reuses nothing-lost staging parquet), then writes the
 * packed-sequence layout of the filtered + mixture-sampled corpus,
 * partitioned by pack shard so each output file is one writer's
 * contiguous token stream.
 *
 *   spark-submit --class graft.jobs.CurateJob engine.jar \
 *     --input /path/sfdir --output /path/curated \
 *     [--stage /path/stage] [--shards N] [--eval /path/benchmarks.parquet] \
 *     [--resume true]
 *
 * `--stage` defaults to a SIBLING of the output (`<output>_stage`),
 * never a child: the final overwrite deletes the whole output path
 * before the pack query runs, so a stage dir underneath it would be
 * deleted mid-job ([[run]] rejects that shape outright). `--shards`
 * sets the pack-shard count (≫ executor cores in deployment);
 * `--eval` points decontamination at a real benchmark parquet (any
 * `text` column) instead of the held-out split. `--resume true` skips
 * every staged piece whose `_SUCCESS` marker exists — re-running a
 * killed job re-pays only uncommitted stages (same input/options
 * assumed; point `--stage` elsewhere when they change).
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
    val stage = opts.getOrElse("stage", s"${output.stripSuffix("/")}_stage")
    val shards = opts.get("shards").map(_.toInt).getOrElse(Curation.PackShards)
    val resume = opts.get("resume").exists(_.toBoolean)

    val builder = SparkSession.builder()
      .appName("graft-curate")
      .config("spark.sql.adaptive.enabled", "true")
    val spark = (if (sys.props.contains("spark.master") ||
                     sys.env.contains("SPARK_MASTER")) builder
                 else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = run(spark, input, output, stage, shards, opts.get("eval"), resume)
    println(s"[curate] packed rows=$n output=$output stage=$stage shards=$shards" +
      (if (resume) " resume=true" else ""))
    spark.stop()
  }

  /** The job body (main minus session lifecycle — testable). */
  def run(spark: SparkSession, input: String, output: String, stage: String,
          shards: Int = Curation.PackShards,
          evalPath: Option[String] = None,
          resume: Boolean = false): Long = {
    val outNorm = output.stripSuffix("/")
    require(stage != outNorm && !stage.startsWith(outNorm + "/"),
      s"--stage must not be the output or under it (stage=$stage output=$output): " +
        "the final overwrite would delete the staged legs before the pack query reads them")
    val evalGrams = evalPath.map(p => Curation.evalGramsOf(spark.read.parquet(p)))
    Curation.curatePipelineStaged(spark, input, stage, shards, evalGrams, resume)
      .write.mode("overwrite").partitionBy("shard").parquet(output)
    spark.read.parquet(output).count()
  }
}
