package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.pipeline.{Conversation, Verdict}
import graft.sources.Transcripts

/** Skew-salting equivalence: the salted/blocked variants must be
  * row-identical to their direct forms on any input — the salt only
  * reshapes the shuffle. Exercised on a generated corpus with a real
  * mega-conversation so the heavy-conv path actually runs. */
class ConversationSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val slim = {
    val t = Transcripts.generate(spark, 20000, nConvs = 50, skewPct = 20)
    Verdict(t).select("conv_id", "turn_idx", "keep", "pii_risk_score")
      .localCheckpoint()
  }

  test("runningStateSalted ≡ runningState on a skewed corpus (heavy path active)") {
    // skewPct=20 on 20k turns → conv0 holds ~4k + its hash share; with
    // heavyThreshold=100 it (and only the genuinely heavy convs) blocks
    val direct = Conversation.runningState(slim)
    val salted = Conversation.runningStateSalted(slim, numBlocks = 8, heavyThreshold = 100)
    salted.schema.map(f => (f.name, f.dataType)) shouldBe
      direct.schema.map(f => (f.name, f.dataType))
    salted.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(salted).count() shouldBe 0L
  }

  test("runningStateSalted ≡ runningState when NO conversation is heavy (all blk=0)") {
    val direct = Conversation.runningState(slim)
    val salted = Conversation.runningStateSalted(slim, numBlocks = 8,
      heavyThreshold = 10000000L)
    salted.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(salted).count() shouldBe 0L
  }

  test("the mega-conversation really splits across blocks (the skew win exists)") {
    val t = Transcripts.generate(spark, 20000, nConvs = 50, skewPct = 20)
    val counts = t.groupBy("conv_id").count()
    val mega = counts.orderBy(desc("count")).first()
    mega.getString(0) shouldBe "conv0"
    mega.getLong(1).toDouble should be > 0.15 * 20000
  }
}
