package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.pipeline.{Report, Verdict}
import graft.sources.Transcripts

/** K1 markdown report: sample-bounded render with the reference's
  * summary stats and per-turn blocks. */
class ReportSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("report carries summary stats, riskiest preview, and per-turn blocks") {
    val v = Verdict(Transcripts.fromDocuments(spark, "/root/testdata/sf0.001"))
    val md = Report.render(v, "sf0.001", piiOnly = true, maxRows = 5)
    md should include("# Analysis Report for 'sf0.001'")
    md should include("Total turns: 500")
    md should include("Turns with PII:")
    md should include("Max risk score: 1.0")
    md should include("## Turn 1:")
    // pii_only: every rendered block has a positive risk
    "- PII risk: ([0-9.]+)".r.findAllMatchIn(md).foreach(m =>
      m.group(1).toDouble should be > 0.0)
    // bounded collect: at most 5 blocks
    "## Turn ".r.findAllIn(md).length should be <= 5
  }
}
