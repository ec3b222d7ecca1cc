package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The bench stdout line is the driver's machine-parsed artifact. The
  * driver's capture window is MEASURED at 2,000 chars and keeps the
  * TAIL of the stream: round 3 lost `parsed` to 17-digit doubles,
  * round 4 to a 2,225-byte line budgeted against a wrong 4 KB
  * constant — the front brace and the headline-first fields were
  * exactly what truncation removed. Pin the round-5 contract: the
  * stdout line is COMPACT (errors, 2-dp query map, headline fields
  * LAST) and stays under 1,800 bytes at 80 queries; the full-fidelity
  * fields (master, pass arrays, per-query steal, 4-dp seconds) belong
  * to the file artifact rendered from the same run. */
class BenchFormatSpec extends AnyFunSuite with Matchers {

  // realistic-worst names: 15 chars (real sweep avg 13.5, max 21), a
  // long tail of >100-second values pre-rounding
  private def fakeQueries(n: Int): Seq[(String, Double)] =
    (0 until n).map(i =>
      (f"q_realish_$i%04d", if (i % 10 == 0) 123.45678901234567 else 3.45678901))

  private val fakeHeadline = Seq(
    "metric" -> "\"total\"", "value" -> "123.4567", "unit" -> "\"sec\"",
    "sf" -> Bench.jstr("/root/testdata/sf0.1"), "cpus" -> "32",
    "turns" -> "4000000",
    "turns_per_sec" -> "1039162.4", "turns_per_sec_chain" -> "488669.1",
    "steal_pct" -> "0.3")

  private def compactLine(nQueries: Int): String =
    Bench.compactLine(
      Seq("q_failed_example" -> "java.lang.RuntimeException: boom"),
      fakeQueries(nQueries), fakeHeadline)

  test("compact stdout line stays under 1,800 bytes at 80 queries (2,000-char driver window)") {
    compactLine(80).length should be < 1800
    // the adaptive floor (degrade dp, then drop announced entries) keeps
    // even a 150-query sweep under budget AND valid JSON
    val big = compactLine(150)
    big.length should be < 1800
    val json = JsonMethods.parse(big)
    (json \ "turns_per_sec") shouldBe JDouble(1039162.4)
  }

  test("compact line is valid JSON with 2-dp query values and -1 for errors") {
    val line = Bench.renderLine(
      Seq.empty,
      Seq("q_bad" -> "boom \"quoted\" \\ slash"),
      Seq("q_ok" -> 1.23456789, "q_bad" -> -1.0),
      fakeHeadline, dp = 2)
    val json = JsonMethods.parse(line)
    (json \ "queries" \ "q_ok") shouldBe JDouble(1.23)
    (json \ "queries" \ "q_bad") shouldBe JInt(-1)
    (json \ "errors" \ "q_bad") shouldBe JString("boom \"quoted\" \\ slash")
    (json \ "turns_per_sec") shouldBe JDouble(1039162.4)
  }

  test("compact line: headline fields (metric/value/tps/skew) come AFTER the queries map") {
    val line = compactLine(80)
    val iQueries = line.indexOf("\"queries\":")
    iQueries should be >= 0
    line.indexOf("\"errors\":") should (be >= 0 and be < iQueries)
    line.indexOf("\"metric\":") should be > iQueries
    line.indexOf("\"turns_per_sec\":") should be > iQueries
    line.indexOf("\"steal_pct\":") should be > iQueries
  }

  test("free-text head values (sf path with quote/backslash) still render valid JSON") {
    val line = Bench.renderLine(Seq.empty, Seq.empty, Seq("q_ok" -> 1.0),
      Seq("sf" -> Bench.jstr("""/weird "dir"\path"""), "metric" -> "\"total\""), dp = 2)
    val json = JsonMethods.parse(line)
    (json \ "sf") shouldBe JString("""/weird "dir"\path""")
  }

  test("full file line (4 dp, pass arrays in tail) parses and keeps full precision") {
    val line = Bench.renderLine(
      Seq("metric" -> "\"total\"", "master" -> Bench.jstr("local-cluster[4,8,16384]")),
      Seq.empty, Seq("q_ok" -> 1.23456789),
      Seq("queries_steal" -> "{\"q_ok\":0.2}",
        "passes_fused" -> "[40.629,3.981,3.851]",
        "steal_passes" -> "[0.1,0.2,0.0]",
        "passes_chain" -> "[41.001,8.301]"), dp = 4)
    val json = JsonMethods.parse(line)
    (json \ "queries" \ "q_ok") shouldBe JDouble(1.2346)
    (json \ "master") shouldBe JString("local-cluster[4,8,16384]")
    (json \ "queries_steal" \ "q_ok") shouldBe JDouble(0.2)
  }
}
