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

  test("fused + collapse expressions really codegen (no silent interpreted fallback)") {
    // Spark swallows janino compile errors and falls back to interpreted
    // eval unless fallback is disabled — force-compile to prove doGenCode
    // emits valid Java for both custom expressions.
    import spark.implicits._
    withSQLConf("spark.sql.codegen.fallback" -> "false",
                "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      val df = Seq("Dr. Ada Lovelace a@b.io", " x \u00a0 y ", "")
        .toDF("t")
        .select(PiiScan(col("t")).as("m"),
          graft.functions.PyText.collapseTrimCol(col("t")).as("c"),
          graft.functions.MinHashSig(split(col("t"), " ")).as("mh"))
      df.selectExpr("size(m)", "c", "size(mh)").collect().map(_.getInt(0)).sum should be > 0
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.sessionState.conf
    val saved = pairs.map { case (k, _) => k -> conf.getConfString(k, null) }
    pairs.foreach { case (k, v) => conf.setConfString(k, v) }
    try f finally saved.foreach {
      case (k, null) => conf.unsetConf(k)
      case (k, v) => conf.setConfString(k, v)
    }
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
