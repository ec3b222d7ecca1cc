package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.model.Turn
import graft.pipeline.Verdict
import graft.rules.PiiRules
import graft.streaming.StreamingVerdict

/** Streaming layer: the stateless verdict must agree with batch row for
  * row; stateful conversation state must survive across micro-batches. */
class StreamingSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def turn(c: String, i: Int, text: String) =
    Turn(c, i, "user", text, "", new Timestamp(1704067200000L + i * 60000L))

  private val batch1 = Seq(
    turn("a", 0, "reach me at john.doe+spam@example.co.uk"), // drop
    turn("a", 1, "Just a regular comment about cats"),       // keep
    turn("b", 0, "contact me please"))                       // keep, boost keyword
  private val batch2 = Seq(
    turn("a", 2, "Dr. John Smith will see you"),             // drop
    turn("b", 1, "Mrs. Anna Lee Smith"))                     // drop (0.7); boosted flag from prev turn's keyword

  test("stateless streaming verdict equals the batch verdict row for row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Turn]
    val q = StreamingVerdict.runToMemory(spark,
      StreamingVerdict(in.toDF()).select("conv_id", "turn_idx", "keep", "scrubbed_text"),
      "sv_stateless")
    in.addData(batch1: _*); q.processAllAvailable()
    in.addData(batch2: _*); q.processAllAvailable()
    val streamed = spark.sql("SELECT * FROM sv_stateless")
    val batch = Verdict((batch1 ++ batch2).toDF())
      .select("conv_id", "turn_idx", "keep", "scrubbed_text")
    streamed.exceptAll(batch).count() shouldBe 0L
    batch.exceptAll(streamed).count() shouldBe 0L
    q.stop()
  }

  test("map-side curation gates run unchanged on a stream (toxicity + gopher doc)") {
    // the curation gates are scan→project with no shuffle, so the SAME
    // frame-level operators compose with readStream with no code change
    // — the property a 100 TB ingest-time filter needs
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val toxed = graft.operators.Toxicity.toxicityDocs(
      in.toDF().toDF("doc_id", "text"))
    val q = StreamingVerdict.runToMemory(spark, toxed, "sv_tox")
    val rows1 = Seq((22L, (1 to 60).map(i => s"w$i").mkString(" ")))
    val rows2 = Seq((3L, "a long enough clean doc right here"))
    in.addData(rows1: _*); q.processAllAvailable()
    in.addData(rows2: _*); q.processAllAvailable()
    val streamed = spark.sql("SELECT * FROM sv_tox")
    val batch = graft.operators.Toxicity.toxicityDocs(
      (rows1 ++ rows2).toDF("doc_id", "text"))
    streamed.exceptAll(batch).count() shouldBe 0L
    batch.exceptAll(streamed).count() shouldBe 0L
    q.stop()

    val in2 = MemoryStream[(Long, String)]
    val q2 = StreamingVerdict.runToMemory(spark,
      graft.operators.C4Quality.gopherDocPages(in2.toDF().toDF("doc_id", "page")),
      "sv_gdoc")
    val pages = Seq((0L, (1 to 60).map(i => s"tok$i").mkString(" ") + " the cat saw that dog"))
    in2.addData(pages: _*); q2.processAllAvailable()
    val s2 = spark.sql("SELECT * FROM sv_gdoc")
    s2.count() shouldBe 1L
    s2.collect()(0).getAs[Boolean]("gopher_doc_keep") shouldBe true
    q2.stop()
  }

  test("streaming dedup keeps the first-seen turn per content hash across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Turn]
    val q = StreamingVerdict.runToMemory(spark,
      StreamingVerdict.streamingDedup(in.toDF())
        .select("conv_id", "turn_idx", "content_hash"),
      "sv_dedup")
    in.addData(
      turn("a", 0, "identical   text"),
      turn("a", 1, "identical text"), // same normalized hash, same batch
      turn("b", 0, "other text"))
    q.processAllAvailable()
    in.addData(turn("c", 0, "identical text")) // dup across micro-batches
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM sv_dedup").collect()
    rows.map(_.getString(2)).distinct.length shouldBe rows.length // unique hashes
    rows.length shouldBe 2 // one keeper per hash; cross-batch dup dropped
    q.stop()
  }

  test("flatMapGroupsWithState carries conversation state across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Turn]
    val q = StreamingVerdict.runToMemory(spark,
      StreamingVerdict.conversationState(spark, in.toDF()), "sv_state")
    in.addData(batch1: _*); q.processAllAvailable()
    in.addData(batch2: _*); q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM sv_state").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getBoolean(2), r.getBoolean(3), r.getLong(4))).toMap
    rows(("a", 0))._1 shouldBe false // dropped
    rows(("a", 0))._3 shouldBe 1L    // cum_dropped after first turn
    rows(("a", 2))._3 shouldBe 2L    // state carried into batch 2
    // conv b: turn 0 had the "contact" keyword; turn 1 (next batch) sees it
    rows(("b", 1))._2 shouldBe true
    q.stop()
  }

  test("streaming session windows merge by gap and close at the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val t0 = 1704067200000L
    def ev(id: Long, user: String, offsetMin: Long, value: Double) =
      (id, new Timestamp(t0 + offsetMin * 60000L), user, value)
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val q = StreamingVerdict.runToMemory(spark,
      StreamingVerdict.streamingSessionWindow(
        in.toDF().toDF("event_id", "ts", "user_id", "value")),
      "sv_sess", outputMode = "append")
    in.addData(ev(1, "u1", 0, 1.0), ev(2, "u1", 10, 2.0), ev(4, "u2", 5, 4.0))
    q.processAllAvailable()
    in.addData(ev(3, "u1", 50, 3.0)) // 40 min after u1's last: new session
    q.processAllAvailable()
    // push the watermark far past every session end so they all close
    in.addData(ev(99, "wm", 600, 0.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM sv_sess").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getDouble(4))).toMap
    rows((("u1"), (t0 * 1000L))) shouldBe (2L, 3.0)            // events 1+2 merged
    rows((("u1"), (t0 + 50 * 60000L) * 1000L)) shouldBe (1L, 3.0) // gap > 30min split
    rows((("u2"), (t0 + 5 * 60000L) * 1000L)) shouldBe (1L, 4.0)
    q.stop()
  }

  test("windowed drop counts with watermark aggregate per event-time minute") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Turn]
    val q = StreamingVerdict.runToMemory(spark,
      StreamingVerdict.windowedDropCounts(in.toDF()), "sv_win", outputMode = "append")
    in.addData(batch1 ++ batch2: _*)
    q.processAllAvailable()
    // append mode emits only watermark-closed windows; push the watermark
    in.addData(turn("z", 9999, "late marker " + PiiRules.RedactionMessage))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM sv_win").collect()
    rows.map(_.getAs[Long]("turns")).sum shouldBe 5L
    rows.map(_.getAs[Long]("dropped")).sum shouldBe 3L
    q.stop()
  }
}
