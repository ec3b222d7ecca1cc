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

  test("resume=true re-pays only uncommitted legs and still matches the composed result") {
    // north rule: "a killed run resumes without recomputing committed
    // partitions". Simulate a crash that (a) never staged one leg and
    // (b) tore another mid-write (data files present, no _SUCCESS):
    // the resumed run must rewrite exactly those two and leave every
    // committed leg's files byte-for-byte alone.
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    val stageDir = Files.createTempDirectory("graft_resume_spec").toString
    TrainFilter.trainFilterStaged(spark, dir, stageDir)
    def listing(leg: String): Map[String, Long] =
      Files.list(Paths.get(s"$stageDir/$leg")).iterator().asScala
        .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
    val legs = Seq("quality", "langid", "keeplist", "gopher", "pages",
      "gopherdoc", "c4", "toxicity", "decontam")
    val before = legs.map(l => l -> listing(l)).toMap
    // (a) crash before this leg ever staged
    def rmTree(p: Path): Unit =
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    rmTree(Paths.get(s"$stageDir/toxicity"))
    // (b) torn write: committer marker missing, stale data files present
    Files.delete(Paths.get(s"$stageDir/langid/_SUCCESS"))
    val resumed = TrainFilter.trainFilterStaged(spark, dir, stageDir, resume = true)
    val composed = TrainFilter.trainFilter(spark, dir)
    resumed.exceptAll(composed).count() shouldBe 0L
    composed.exceptAll(resumed).count() shouldBe 0L
    val after = legs.map(l => l -> listing(l)).toMap
    legs.filterNot(Set("toxicity", "langid")).foreach { l =>
      withClue(s"committed leg $l must not be rewritten on resume: ") {
        after(l) shouldBe before(l)
      }
    }
    Seq("toxicity", "langid").foreach { l =>
      withClue(s"uncommitted leg $l must be recomputed: ") {
        after(l) should not be before(l)
        after(l).keySet should contain("_SUCCESS")
      }
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
