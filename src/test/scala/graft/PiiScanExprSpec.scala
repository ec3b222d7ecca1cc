package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.PiiScan
import graft.rules.Pii
import graft.sources.Transcripts

/** The fused single-pass scanner must be literally equivalent to the
  * built-in column chain — same matches, same order, same confidences —
  * over the golden corpus AND the full derived transcript table. */
class PiiScanExprSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("fused expression == column chain on the documents-derived transcripts") {
    val t = Transcripts.fromDocuments(spark, "/root/testdata/sf0.001")
      .withColumn("clean_text", pipeline.Clean.cleanText(col("text")))
    val both = t.select(
      col("conv_id"), col("turn_idx"),
      Pii.piiMatches(col("clean_text")).as("chain"),
      PiiScan(col("clean_text")).as("fused"))
    both.filter(expr("chain <> fused")).count() shouldBe 0L
    // and non-trivially: some rows DO have matches
    both.filter(org.apache.spark.sql.functions.size(col("fused")) > 0).count() should be > 0L
  }

  test("fused expression == column chain on adversarial literals") {
    import spark.implicits._
    val texts = Seq(
      "reach me at a@b.io and c@d.org, Dr. Jane Mary Doe",
      "my ssn is 123-45-6789 but email x@y.zz",
      "Mr. Bob Jones Dr. Ann Lee contact phone email",
      "", " ", "@@", "a@b.c", "16gb", "3 gpu", "4th",
      "+1 (212) 555-1234 call me",
      "45 Oak Avenue then 99 Elm Street Dr. Who")
    val df = texts.toDF("t")
      .select(Pii.piiMatches(col("t")).as("chain"), PiiScan(col("t")).as("fused"))
    df.filter(expr("chain <> fused")).count() shouldBe 0L
  }

  test("risk score over fused matches equals chain risk") {
    val t = Transcripts.fromDocuments(spark, "/root/testdata/sf0.001")
      .withColumn("clean_text", pipeline.Clean.cleanText(col("text")))
      .select(
        Pii.piiRiskScore(Pii.piiMatches(col("clean_text"))).as("a"),
        Pii.piiRiskScore(PiiScan(col("clean_text"))).as("b"))
    t.filter(col("a") =!= col("b")).count() shouldBe 0L
  }
}
