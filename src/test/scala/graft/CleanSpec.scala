package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.pipeline.Clean

/**
 * Golden suite for the clean chain (SURVEY.md §2.2: P2-P4), pinned to the
 * reference's exact order of operations (api/scraper.py:56-58 then
 * sentiment.py:205): whitespace collapse happens BEFORE zwsp removal, so
 * removals can legally leave double/leading spaces — we must too.
 */
class CleanSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val golden = Seq(
    ("&amp;#x200B; <b>hello</b>   world", " hello world"), // leading space is faithful
    ("  leading\t\tand trailing \n", "leading and trailing"),
    ("a &amp;#x200B; b", "a  b"),                          // double space is faithful
    ("<div class='x'>wrapped</div> tail", "wrapped tail"),
    ("no<br/>break", "nobreak"),
    ("plain", "plain"),
    ("< not a tag really >ok", "ok"),                      // non-greedy still eats the first <...>
    ("a  <i>b</i>  c", "a b c"),
    ("nbsp here and　wide", "nbsp here and wide") // Python str.split() = unicode whitespace
  )

  test("clean chain matches reference order of operations") {
    import spark.implicits._
    val out = golden.map(_._1).toDF("text")
      .select(col("text"), Clean.cleanText(col("text")).as("clean"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    golden.foreach { case (in, exp) => out(in) shouldBe exp }
  }

  test("F1 drops rows whose scrape-cleaned text is empty") {
    import spark.implicits._
    val df = Seq("   ", "", "&amp;#x200B;", "x").toDF("text")
      .filter(Clean.nonEmpty(Clean.scrapeClean(col("text"))))
    df.as[String].collect() shouldBe Seq("x")
  }

  test("F2 text_match is case-insensitive, F3 skip is case-sensitive") {
    import spark.implicits._
    val df = Seq("Hello WORLD", "hello world").toDF("text")
    df.filter(Clean.textMatch(col("text"), "WoRlD")).count() shouldBe 2
    df.filter(Clean.isSkipped(col("text"), "WORLD")).count() shouldBe 1
  }
}
