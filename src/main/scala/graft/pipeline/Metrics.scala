package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Global aggregates over the verdict table (SURVEY.md §2.6 A1-A7).
 * All are single-pass partial aggregates (map-side combine), so the only
 * shuffle is the final 1-row reduce — scale-invariant.
 *
 * Reference denominators, kept faithfully distinct:
 *  - A1 overall sentiment averages over PROCESSED rows (skipped rows are
 *    never analyzed and never counted — sentiment.py:311-318);
 *  - A6 report-average covers only DISPLAYED rows (post-F4 filter —
 *    report.py:166-171).
 */
object Metrics {

  /** One metrics row: the sidecar summary the north rule requires. */
  def summary(verdict: DataFrame): DataFrame = {
    val processed = !col("skipped")
    verdict.agg(
      count(lit(1)).as("total_turns"),
      sum(when(col("skipped"), 1L).otherwise(0L)).as("skipped_turns"),
      sum(when(processed, 1L).otherwise(0L)).as("processed_turns"),
      // A1: round-half-even like Python round() (sentiment.py:318)
      bround(avg(when(processed, col("sentiment_score"))), 4).as("overall_sentiment"),
      // A3: count where pii risk > 0 (report.py:172-173)
      sum(when(processed && col("pii_risk_score") > 0.0, 1L).otherwise(0L)).as("total_pii_turns"),
      sum(when(!col("keep"), 1L).otherwise(0L)).as("dropped_turns"),
      max(col("pii_risk_score")).as("max_risk_score")
    )
  }

  /** A6: average sentiment over displayed (pii_only-filtered) rows. */
  def displayedAvgSentiment(verdict: DataFrame): DataFrame =
    verdict.filter(!col("skipped") && col("pii_risk_score") > 0.0)
      .agg(bround(avg(col("sentiment_score")), 4).as("displayed_avg_sentiment"),
        count(lit(1)).as("displayed_turns"))

  /** O3: the riskiest turn. The reference tracks first-seen strict max in
    * source order (report.py:156-183); deterministic equivalent here is
    * order by (risk desc, conv_id, turn_idx) limit 1, with the reference's
    * 100-char preview truncation. */
  def riskiest(verdict: DataFrame): DataFrame =
    verdict.filter(!col("skipped"))
      .orderBy(desc("pii_risk_score"), asc("conv_id"), asc("turn_idx"))
      .limit(1)
      .select(
        col("conv_id"), col("turn_idx"), col("pii_risk_score"),
        when(length(col("clean_text")) > 100,
          concat(substring(col("clean_text"), 1, 100), lit("...")))
          .otherwise(col("clean_text")).as("riskiest_preview"))

  /** A7-style per-conversation rollup — our conversation-level extension:
    * partial aggregation per conv_id (combiner runs map-side; the shuffle
    * moves only one row per conversation). */
  def perConversation(verdict: DataFrame): DataFrame =
    verdict.groupBy("conv_id").agg(
      count(lit(1)).as("turns"),
      sum(when(!col("keep"), 1L).otherwise(0L)).as("dropped"),
      sum(when(col("pii_risk_score") > 0.0, 1L).otherwise(0L)).as("pii_turns"),
      bround(avg(when(!col("skipped"), col("sentiment_score"))), 4).as("avg_sentiment"),
      max("pii_risk_score").as("max_risk"))
}
