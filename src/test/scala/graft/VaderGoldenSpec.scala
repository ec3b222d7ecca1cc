package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Reference-anchored goldens for the three VADER-valued queries the
  * DuckDB oracle cannot check (q_sentiment / q_sentiment_agg /
  * q_displayed_avg): the committed Python replicas (tools/vader_ref.py +
  * tools/pii_ref.py, regenerate with tools/gen_vader_golden.py) produce
  * src/test/resources/vader_golden_sf0.01.json, and the engine must
  * reproduce it EXACTLY at sf0.01 — as strong a check as the oracle
  * rows, anchored outside the Scala implementation. */
class VaderGoldenSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  private lazy val golden: JValue = {
    val in = getClass.getResourceAsStream("/vader_golden_sf0.01.json")
    try JsonMethods.parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  test("q_sentiment matches the replica golden row-for-row at sf0.01") {
    val got = SparkEntry.queries("q_sentiment")(spark, dir)
      .collect()
      .map(r => List(r.getString(0), r.getInt(1).toLong,
        r.getDouble(2), r.getString(3)))
      .sortBy(l => (l(0).asInstanceOf[String], l(1).asInstanceOf[Long]))
    val want = (golden \ "q_sentiment").asInstanceOf[JArray].arr.map {
      case JArray(List(JString(c), JInt(i), s, JString(l))) =>
        val score = s match { case JDouble(d) => d; case JInt(n) => n.toDouble; case x => fail(s"bad $x") }
        List(c, i.toLong, score, l)
      case x => fail(s"bad golden row $x")
    }
    got.length shouldBe want.length
    got.zip(want).foreach { case (g, w) =>
      withClue(s"row ${g.take(2)}: ") { g shouldBe w }
    }
  }

  test("q_sentiment_agg matches the replica golden (value + label)") {
    val r = SparkEntry.queries("q_sentiment_agg")(spark, dir).head()
    JDouble(r.getDouble(0)) shouldBe (golden \ "q_sentiment_agg" \ "overall_sentiment")
    JString(r.getString(1)) shouldBe (golden \ "q_sentiment_agg" \ "overall_label")
  }

  test("q_displayed_avg matches the replica golden (avg + denominator)") {
    val r = SparkEntry.queries("q_displayed_avg")(spark, dir).head()
    JDouble(r.getDouble(0)) shouldBe (golden \ "q_displayed_avg" \ "displayed_avg_sentiment")
    JInt(r.getLong(1)) shouldBe (golden \ "q_displayed_avg" \ "displayed_turns")
  }
}
