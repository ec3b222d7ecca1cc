package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.GopherQuality

/** Known-answer tests for the Gopher repetition metrics (hand-computed
  * fractions, including the overlap-union subtlety of dup5). */
class GopherQualitySpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("gopher").toString
    Seq(
      // doc 0: "x y z w v" twice, disjoint spans -> dup5 = 18/19
      (0L, "x y z w v x y z w v"),
      // doc 1: alternating -> every 5-gram duplicated, spans overlap;
      // union must cover the whole text exactly once -> dup5 = 1.0
      (1L, "a b a b a b a b"),
      // doc 2: no repetition at all
      (2L, "one two three four five six"),
      // doc 3: shorter than a 5-gram -> no dup5 row, coalesced to 0;
      // top2 = "q q" count 2 * len 3 / 5 (overlap-counting, like the
      // public datatrove/NeMo implementations)
      (3L, "q q q")
    ).toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    d
  }

  test("dup5: union-of-spans counts overlapping duplicate chars once") {
    val rows = GopherQuality.quality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    rows(0L).getAs[Double]("dup5_frac") shouldBe 18.0 / 19.0 +- 1e-6
    rows(1L).getAs[Double]("dup5_frac") shouldBe 1.0
    rows(2L).getAs[Double]("dup5_frac") shouldBe 0.0
    rows(3L).getAs[Double]("dup5_frac") shouldBe 0.0
  }

  test("materialized-tokens variant is result-identical to the streaming default") {
    val a = GopherQuality.quality(spark, dir).collect().sortBy(_.getLong(0)).map(_.toString)
    val b = GopherQuality.quality(spark, dir, materializeTokens = true)
      .collect().sortBy(_.getLong(0)).map(_.toString)
    a shouldBe b
  }

  test("top-n fractions and the published-threshold keep decision") {
    val rows = GopherQuality.quality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    rows(3L).getAs[Double]("top2_frac") shouldBe 2 * 3.0 / 5.0 +- 1e-6
    // all doc-2 bigrams tie at count 1; the deterministic tiebreak picks
    // the lexicographically smallest, "five six" (8 chars of 27)
    rows(2L).getAs[Double]("top2_frac") shouldBe 8.0 / 27.0 +- 1e-6
    rows(2L).getAs[Boolean]("gopher_keep") shouldBe false // 8/27 > 0.20
    rows(0L).getAs[Boolean]("gopher_keep") shouldBe false // dup5 0.947 > 0.15
  }
}
