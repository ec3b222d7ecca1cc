package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Toxicity

/** Known-answer tests for the two-tier toxicity gate: severe any-hit
  * drop, mild density threshold, word boundaries, case folding, and
  * the AC scrub output — all hand-computed. doc_ids are chosen to hit
  * each seeding branch (mild: id % 7 ∈ {1,2}; severe: id % 11 == 3). */
class ToxicitySpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def run(rows: (Long, String)*) = {
    import spark.implicits._
    Toxicity.toxicityDocs(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("word boundaries: 'hateful' does not match 'hate'") {
    val m = run((0L, "a perfectly hateful civil message"))
    m(0L).getAs[Int]("mild_hits") shouldBe 0
    m(0L).getAs[Boolean]("severe_hit") shouldBe false
    m(0L).getAs[Boolean]("tox_keep") shouldBe true
    m(0L).getAs[String]("tox_scrubbed") shouldBe "a perfectly hateful civil message"
  }

  test("mild density: same 3 seeded hits keep a long doc, drop a short one") {
    // id 22 (%7==1): 60 tokens + 9 seeded = 69 -> 3/69 = 0.043478 <= 0.1
    // id 15 (%7==1): 5 tokens + 9 seeded = 14 -> 3/14 = 0.214286 > 0.1
    val m = run((22L, words(60)), (15L, words(5)))
    m(22L).getAs[Int]("mild_hits") shouldBe 3
    m(22L).getAs[Double]("tox_ratio") shouldBe 0.043478
    m(22L).getAs[Boolean]("tox_keep") shouldBe true
    m(15L).getAs[Double]("tox_ratio") shouldBe 0.214286
    m(15L).getAs[Boolean]("tox_keep") shouldBe false
  }

  test("case folding + scrub: mixed-case seeded hits are counted and masked") {
    // id 9 (%7==2): ' oh CRAP what a dumb MORON thing' -> CRAP, dumb, MORON
    val m = run((9L, words(40)))
    m(9L).getAs[Int]("mild_hits") shouldBe 3
    m(9L).getAs[String]("tox_scrubbed") shouldBe
      words(40) + " oh [TOX] what a [TOX] [TOX] thing"
  }

  test("severe phrase: any hit drops regardless of density, and is scrubbed") {
    // id 3 (%11==3, %7==3 so no mild seed): severe suffix on a long doc
    val m = run((3L, words(200)))
    m(3L).getAs[Boolean]("severe_hit") shouldBe true
    m(3L).getAs[Int]("mild_hits") shouldBe 0
    m(3L).getAs[Boolean]("tox_keep") shouldBe false
    m(3L).getAs[String]("tox_scrubbed") shouldBe
      words(200) + " just [TOX] already"
  }

  test("fused kernel hash-equals the three-pass chain on the sf corpus") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fused = Toxicity.toxicityDocs(docs)
    val chain = Toxicity.toxicityDocsChain(docs)
    fused.exceptAll(chain).count() shouldBe 0L
    chain.exceptAll(fused).count() shouldBe 0L
  }

  test("ac_tox and ac_count emit valid codegen (CODEGEN_ONLY, no fallback)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val conf = spark.sessionState.conf
    val saved = Seq("spark.sql.codegen.fallback", "spark.sql.codegen.factoryMode")
      .map(k => k -> conf.getConfString(k, null))
    try {
      conf.setConfString("spark.sql.codegen.fallback", "false")
      conf.setConfString("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val df = Seq("oh CRAP what a dumb MORON thing", "benign", "")
        .toDF("t")
        .select(
          graft.functions.AhoCorasick.tox(col("t"),
            Toxicity.SevereTerms, Toxicity.MildTerms, "[TOX]").as("x"),
          graft.functions.AhoCorasick.count(col("t"), Toxicity.MildTerms).as("c"))
      df.selectExpr("x.mild_hits + c").collect().map(_.getInt(0)).sum shouldBe 6
    } finally saved.foreach { case (k, v) =>
      if (v == null) conf.unsetConf(k) else conf.setConfString(k, v)
    }
  }

  test("sf0.001 smoke: both tiers fire somewhere and survivors exist") {
    val df = Toxicity.toxicity(spark, "/root/testdata/sf0.001")
    df.filter("severe_hit").count() should be >= 1L
    df.filter("NOT severe_hit AND NOT tox_keep").count() should be >= 1L
    df.filter("tox_keep").count() should be >= 1L
  }
}
