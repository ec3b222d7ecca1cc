package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Turn
import graft.pipeline.Verdict

/**
 * Structured Streaming rendering of the quality-filter pipeline: the
 * per-turn verdict chain is stateless column work, so the SAME
 * [[Verdict]] transform applies to a streaming DataFrame unchanged —
 * `readStream → Verdict(_) → writeStream` is the deployment shape for
 * continuous transcript ingestion.
 *
 * Stateful pieces:
 *  - [[windowedDropCounts]]: event-time tumbling window + watermark
 *    (late turns beyond 10 min are dropped from the aggregate);
 *  - [[conversationState]]: `flatMapGroupsWithState` carrying each
 *    conversation's running (last-boost, cumulative-dropped) across
 *    micro-batches — the streaming twin of the batch conversation layer.
 */
object StreamingVerdict {

  /** Stateless per-turn verdict over a streaming transcript source. */
  def apply(stream: DataFrame): DataFrame = Verdict(stream)

  /** Event-time windowed drop/keep counts with a 10-minute watermark. */
  def windowedDropCounts(stream: DataFrame): DataFrame =
    Verdict(stream)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("role"))
      .agg(count(lit(1)).as("turns"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("dropped"))
      .select(col("window.start").as("window_start"), col("role"),
        col("turns"), col("dropped"))

  case class ConvState(lastBoost: Boolean, cumDropped: Long, turns: Long)
  case class ConvUpdate(conv_id: String, turn_idx: Int, keep: Boolean,
                        boosted_by_prev: Boolean, cum_dropped: Long)

  /**
   * Per-conversation running state across micro-batches: within each
   * group, turns are processed in turn_idx order (sorted per batch —
   * turn order within a conversation is the north rule's stable order),
   * carrying the previous turn's context-keyword flag and the cumulative
   * drop count in state.
   *
   * Memory bound: the in-place sort buffers one conversation's rows of
   * ONE micro-batch (4 slim fields per row) — bounded by trigger
   * interval x per-conversation arrival rate, NOT conversation lifetime
   * (the cross-batch part lives in the 3-field ConvState). A turn-order
   * total sort without buffering is not expressible in
   * flatMapGroupsWithState; if a single conversation can flood a single
   * micro-batch, bound the trigger (maxOffsetsPerTrigger /
   * maxFilesPerTrigger) — the per-group buffer scales down linearly.
   */
  def conversationState(spark: SparkSession, stream: DataFrame): DataFrame = {
    import spark.implicits._
    val scored = Verdict(stream)
      .withColumn("own_boost", graft.rules.Pii.hasContextBoost(col("clean_text")))
      .select("conv_id", "turn_idx", "keep", "own_boost")
      .as[(String, Int, Boolean, Boolean)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (convId: String, rows: Iterator[(String, Int, Boolean, Boolean)],
         state: GroupState[ConvState]) => {
          var s = state.getOption.getOrElse(ConvState(lastBoost = false, 0L, 0L))
          val buf = rows.toArray
          java.util.Arrays.sort(buf, Ordering.by[(String, Int, Boolean, Boolean), Int](_._2))
          val out = buf.iterator.map { case (_, idx, keep, ownBoost) =>
            val upd = ConvUpdate(convId, idx, keep, s.lastBoost,
              s.cumDropped + (if (keep) 0 else 1))
            s = ConvState(ownBoost, upd.cum_dropped, s.turns + 1)
            upd
          }.toArray
          state.update(s)
          out.iterator
        }).toDF()
  }

  /** Streaming session windows: the native `session_window` gap merge
    * over event time with a watermark bounding session state — the
    * streaming twin of [[graft.operators.Events.sessionWindow]] (same
    * 30-minute gap; closed sessions emit once the watermark passes
    * their end). */
  def streamingSessionWindow(events: DataFrame,
                             gap: String = "30 minutes"): DataFrame =
    events
      .withColumn("tts", col("ts").cast("timestamp"))
      .withWatermark("tts", "1 hour")
      .groupBy(col("user_id"), session_window(col("tts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup: first-seen turn per normalized content hash,
    * with state bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark` — duplicates beyond the watermark
    * horizon re-emit, the price of bounded state; the batch
    * [[graft.operators.Dedup.exact]] is the exact global form). */
  def streamingDedup(stream: DataFrame): DataFrame =
    stream
      .withColumn("content_hash",
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")

  /** Convenience: a memory-sink query over any of the above, for tests
    * and local smoke runs. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
                  outputMode: String = "append"): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode).start()
}
