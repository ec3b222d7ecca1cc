package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Perplexity

/** Known-answer tests for the trigram stupid-backoff scorer: one
  * held-out doc per backoff branch, hand-computed. The sf0.001 corpus
  * exercises branches 3 (trigram hit) and 2 (bigram backoff) but its
  * tiny vocabulary makes the unigram base unreachable there — this
  * fixture pins all three. */
class PerplexitySpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("ppl_sb").toString
    // train = doc_id % 10 != 0 (ids 1..9), each "a b c":
    //   uni a=b=c=9, N=27, V=3; bi (a,b)=(b,c)=9; tri (a,b,c)=9
    val train = (1L to 9L).map(i => (i, "a b c"))
    val held = Seq(
      (0L, "z q r"),  // all-OOV trigram: S = 0.4^2 * (0+1)/(27+3) -> ppl 187.5
      (10L, "a b c"), // trigram hit:     S = 9/9 = 1               -> ppl 1.0
      (20L, "c a b")) // bigram backoff:  S = 0.4 * 9/9 = 0.4       -> ppl 2.5
    (train ++ held).toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    d
  }

  test("stupid backoff: each branch hit by its held-out doc, hand-computed ppl") {
    val rows = Perplexity.scoreTrigramSB(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl_sb")).toMap
    rows(0L) shouldBe 187.5 +- 1e-4   // unigram Laplace base (0.16/30)
    rows(10L) shouldBe 1.0            // trigram hit
    rows(20L) shouldBe 2.5 +- 1e-4    // one-level backoff (alpha=0.4)
    rows(1L) shouldBe 1.0             // training docs score through branch 3
  }

  test("n_trigrams counts positions (len-2) for every doc with >= 3 tokens") {
    val n = Perplexity.scoreTrigramSB(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_trigrams")).toMap
    n.values.toSet shouldBe Set(1L)
    n.size shouldBe 12
  }
}
