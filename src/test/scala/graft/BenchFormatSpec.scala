package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The bench JSON line is the driver's machine-parsed artifact; round 3
  * lost `parsed` because 59 queries at 17-digit precision outgrew the
  * driver's stdout capture window. Pin the format contract: headline
  * fields before the per-query map, 4-dp query seconds, pass arrays
  * last, and the whole line under 4 KB at 70 queries. */
class BenchFormatSpec extends AnyFunSuite with Matchers {

  private def fakeLine(nQueries: Int): String = {
    val head = Seq(
      "metric" -> "\"total\"", "value" -> "123.4567", "unit" -> "\"sec\"",
      "sf" -> "\"/root/testdata/sf0.1\"", "cpus" -> "32", "turns" -> "4000000",
      "keepdrop_sec_fused" -> "3.8512", "keepdrop_sec_chain" -> "8.1934",
      "turns_per_sec" -> "1039162.4", "turns_per_sec_chain" -> "488669.1",
      "warmup_passes" -> "2", "timed_passes" -> "5",
      "skew_turns" -> "8000000",
      "skew_direct_sec" -> "12.3456", "skew_salted_sec" -> "4.5678",
      "skew_rollup_direct_sec" -> "1.2345", "skew_rollup_salted_sec" -> "1.3456")
    // worst-case-ish names: 22 chars, full double values pre-rounding
    val queries = (0 until nQueries).map(i => (f"q_some_long_name_$i%04d", 123.45678901234567))
    val errors = Seq("q_failed_example" -> "java.lang.RuntimeException: boom")
    val tail = Seq(
      "passes_fused" -> "[40.629,69.920,3.981,3.851,4.102,4.140,3.972]",
      "passes_chain" -> "[41.001,70.123,8.301,8.193,8.400,8.299,8.350]")
    Bench.renderLine(head, errors, queries, tail)
  }

  test("line stays under the 4 KB driver capture budget at 70 queries") {
    fakeLine(70).length should be < 4096
  }

  test("line is valid JSON with 4-dp query values and -1 for errors") {
    val line = Bench.renderLine(
      Seq("metric" -> "\"total\"", "value" -> "1.2345", "unit" -> "\"sec\""),
      Seq("q_bad" -> "boom \"quoted\" \\ slash"),
      Seq("q_ok" -> 1.23456789, "q_bad" -> -1.0),
      Seq("passes_fused" -> "[1.000]"))
    val json = JsonMethods.parse(line)
    (json \ "queries" \ "q_ok") shouldBe JDouble(1.2346)
    (json \ "queries" \ "q_bad") shouldBe JInt(-1)
    (json \ "errors" \ "q_bad") shouldBe JString("boom \"quoted\" \\ slash")
  }

  test("headline fields (incl. errors) appear BEFORE the queries map, pass arrays after") {
    val line = fakeLine(70)
    val iQueries = line.indexOf("\"queries\":")
    line.indexOf("\"turns_per_sec\":") should (be >= 0 and be < iQueries)
    line.indexOf("\"keepdrop_sec_fused\":") should (be >= 0 and be < iQueries)
    line.indexOf("\"skew_salted_sec\":") should (be >= 0 and be < iQueries)
    line.indexOf("\"errors\":") should (be >= 0 and be < iQueries)
    line.indexOf("\"passes_fused\":") should be > iQueries
  }
}
