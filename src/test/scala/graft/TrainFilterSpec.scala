package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.TrainFilter

/** Composed-vs-staged equivalence: the production shape (legs
  * materialized to parquet once, then joined) must be row-identical to
  * the single declarative query the oracle verifies. */
class TrainFilterSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("trainFilterStaged hash-equals the composed trainFilter") {
    val stageDir = java.nio.file.Files.createTempDirectory("graft_stage_spec").toString
    val composed = TrainFilter.trainFilter(spark, dir)
    val staged = TrainFilter.trainFilterStaged(spark, dir, stageDir)
    staged.schema.map(f => (f.name, f.dataType)) shouldBe
      composed.schema.map(f => (f.name, f.dataType))
    staged.exceptAll(composed).count() shouldBe 0L
    composed.exceptAll(staged).count() shouldBe 0L
    // ALL staged paths really were materialized (resume/reuse point
    // exists for every leg, incl. the shared page view)
    Seq("quality", "langid", "keeplist", "gopher", "pages", "gopherdoc",
        "c4", "toxicity", "decontam").foreach { leg =>
      spark.read.parquet(s"$stageDir/$leg").count() shouldBe 500L
    }
  }

  test("two concurrent staged runs (nonce'd dirs, as SparkEntry builds them) both hash-match") {
    // r4 verdict nit: a shared stage dir raced concurrent Verify + Bench
    // runs on the overwrite. SparkEntry now keys the dir by a
    // per-invocation nonce; prove two SIMULTANEOUS staged filters over
    // the same input both produce the composed result
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fn = SparkEntry.queries("q_train_filter_staged")
    val runs = Seq.fill(2)(Future(fn(spark, dir).collect()
      .map(_.toString).sorted.mkString("\n")))
    val Seq(a, b) = Await.result(Future.sequence(runs), 10.minutes)
    val composed = TrainFilter.trainFilter(spark, dir).collect()
      .map(_.toString).sorted.mkString("\n")
    a shouldBe composed
    b shouldBe composed
  }
}
