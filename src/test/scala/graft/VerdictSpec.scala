package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.model.Turn
import graft.pipeline.Verdict
import graft.rules.PiiRules

/** Pipeline-level invariants for the keep/drop/scrub verdict
  * (SURVEY.md §2.3 F5, §2.4 X8, BASELINE.json per-row invariants). */
class VerdictSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def turns(texts: Seq[String]): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      Turn(s"c${i % 3}", i, "user", t, "", new Timestamp(1704067200000L + i * 1000L))
    }.toDF()
  }

  private val mixed = Seq(
    "reach me at john.doe+spam@example.co.uk",          // drop (risk 1.0)
    "Dr. John Smith will see you",                      // drop (0.7)
    "my ssn is 123-45-6789",                            // keep (FP gate)
    "Just a regular comment about cats",                // keep
    "x " + PiiRules.RedactionMessage,                   // skipped
    "  <b> spaced </b> &amp;#x200B; text  "             // keep, cleaned
  )

  test("keep iff risk <= 0.5; scrub replaces whole text with the standard message") {
    val v = Verdict(turns(mixed)).select("text", "keep", "scrubbed_text", "clean_text").collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getString(2), r.getString(3))).toMap
    val (k1, s1, _) = v(mixed.head)
    k1 shouldBe false
    s1 shouldBe PiiRules.RedactionMessage
    v(mixed(1))._1 shouldBe false
    v(mixed(2))._1 shouldBe true
    v(mixed(3))._1 shouldBe true
  }

  test("keep=true rows emit text byte-identical to the cleaned input") {
    Verdict(turns(mixed)).filter(col("keep")).collect().foreach { r =>
      r.getAs[String]("scrubbed_text") shouldBe r.getAs[String]("clean_text")
    }
  }

  test("rows containing the redaction marker are skipped, never re-analyzed") {
    val row = Verdict(turns(mixed)).filter(col("skipped")).collect()
    row.length shouldBe 1
    row.head.getAs[Double]("pii_risk_score") shouldBe 0.0
    row.head.getAs[Boolean]("keep") shouldBe true
    row.head.getAs[String]("scrubbed_text") should include(PiiRules.RedactionMessage)
  }

  test("idempotence: from the second pass on, re-running the pipeline is a no-op") {
    // The reference's own clean chain is NOT a fixpoint on first contact
    // (an HTML strip can leave a leading/double space that a re-run would
    // re-collapse), so exact idempotence starts at pass 2: scrubbed rows
    // are skip-guarded (F3) and kept rows are fully normalized by then.
    def rerun(df: DataFrame): DataFrame = Verdict(
      df.select(col("conv_id"), col("turn_idx"), col("role"),
        col("scrubbed_text").as("text"), col("tool"), col("ts")))
    val pass2 = rerun(Verdict(turns(mixed)))
    val pass3 = rerun(pass2)
    val diff = pass2.as("a")
      .join(pass3.as("b"), Seq("conv_id", "turn_idx"))
      .filter(col("a.scrubbed_text") =!= col("b.scrubbed_text") ||
        col("a.keep") =!= col("b.keep"))
    diff.count() shouldBe 0L
    // pass 2 skip-guards the 2 freshly scrubbed rows plus the original marker row
    pass2.filter(col("skipped")).count() shouldBe 3L
  }

  test("deterministic UUID scrub mode is stable and UUIDv4-shaped") {
    val v1 = Verdict(turns(mixed), useRandomString = true)
      .filter(!col("keep")).select("scrubbed_text").collect().map(_.getString(0))
    val v2 = Verdict(turns(mixed), useRandomString = true)
      .filter(!col("keep")).select("scrubbed_text").collect().map(_.getString(0))
    v1 shouldBe v2
    all(v1) should fullyMatch regex "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-a[0-9a-f]{3}-[0-9a-f]{12}"
  }

  test("verdict is a pure per-row function: stable under input row-order permutation") {
    def byText(texts: Seq[String]) =
      Verdict(turns(texts)).select("clean_text", "keep", "scrubbed_text")
        .distinct().collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSet
    byText(mixed) shouldBe byText(mixed.reverse)
  }
}
