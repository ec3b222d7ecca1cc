package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.pipeline.{Checkpoint, Verdict}
import graft.sources.Transcripts

/** Kill/resume integration test (north rule): a run killed mid-job must
  * resume without recomputing committed buckets and converge to output
  * identical to an uninterrupted run. */
class CheckpointSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("killed run resumes; committed buckets are not recomputed; output identical") {
    val out = Files.createTempDirectory("ckpt").toString
    val transcripts = Transcripts.fromDocuments(spark, "/root/testdata/sf0.001")

    // run 1: inject a crash after 5 bucket commits, with 2 buckets in
    // flight — a bucket already past the gate may still land, so the
    // surviving commit count is 5 or 6
    val boom = intercept[RuntimeException] {
      Checkpoint.run(spark, transcripts, out, nBuckets = 16,
        failAfterBucket = 5, parallelism = 2)
    }
    boom.getMessage should include("injected failure")
    val survived = Checkpoint.committedBuckets(spark, s"$out/_sidecar").size
    survived should (be >= 5 and be <= 6)

    // capture commit timestamps of the surviving buckets
    val firstSidecar = spark.read.parquet(s"$out/_sidecar")
      .select("bucket", "committed_at").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

    // run 2: resume — must skip every committed bucket
    val stats2 = Checkpoint.run(spark, transcripts, out, nBuckets = 16)
    stats2.bucketsSkipped shouldBe survived
    stats2.bucketsCommitted shouldBe (16 - survived)

    // committed buckets keep their original sidecar rows (not rewritten)
    val finalSidecar = spark.read.parquet(s"$out/_sidecar")
    finalSidecar.count() shouldBe 16
    firstSidecar.foreach { case (b, ts) =>
      finalSidecar.filter(col("bucket") === b).head().getAs[String]("committed_at") shouldBe ts
    }

    // final output == uninterrupted direct pipeline, row for row
    val resumed = Checkpoint.readOutput(spark, out)
      .select("conv_id", "turn_idx", "keep", "scrubbed_text")
    val direct = Verdict(transcripts)
      .select("conv_id", "turn_idx", "keep", "scrubbed_text")
    resumed.count() shouldBe direct.count()
    resumed.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(resumed).count() shouldBe 0L
  }

  test("bucketed output is partition-discoverable and bucket reads are pruned") {
    // bucket=N dir layout == Iceberg bucket(conv_id) partitioning: the
    // whole output reads as one table with a `bucket` partition column,
    // and a bucket-scoped read must prune to that directory at plan time
    val out = Files.createTempDirectory("ckpt3").toString
    val transcripts = Transcripts.fromDocuments(spark, "/root/testdata/sf0.001")
    Checkpoint.run(spark, transcripts, out, nBuckets = 4)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val one = spark.read.parquet(out).filter(col("bucket") === 2)
      val plan = one.queryExecution.executedPlan.toString
      plan should include("PartitionFilters")
      plan should include regex "PartitionFilters: \\[[^\\]]*bucket"
      one.count() shouldBe
        transcripts.filter(Checkpoint.bucketOf(4) === 2).count()
      spark.read.parquet(out).count() shouldBe transcripts.count()
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("a fully committed run is a no-op on re-run") {
    val out = Files.createTempDirectory("ckpt2").toString
    val transcripts = Transcripts.fromDocuments(spark, "/root/testdata/sf0.001")
    Checkpoint.run(spark, transcripts, out, nBuckets = 4).bucketsCommitted shouldBe 4
    val again = Checkpoint.run(spark, transcripts, out, nBuckets = 4)
    again.bucketsCommitted shouldBe 0
    again.bucketsSkipped shouldBe 4
    again.rowsWritten shouldBe 0L
  }
}
