package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.rules.{Pii, PiiRules}

/**
 * Conversation-level layer: all cross-turn logic runs under the stable
 * (conv_id, turn_idx) window ordering the north rule requires, so
 * results are reproducible under any input partitioning.
 *
 * Scale design:
 *  - the window shuffle is the pipeline's ONE required shuffle; we hash-
 *    partition by conv_id so the per-turn map work before/after stays
 *    pipelined in the same stage;
 *  - mega-conversations (single conv_id with ~10^8 turns) would serialize
 *    one window partition; [[rollupSalted]] shows the two-phase
 *    salt-partial/merge pattern for the aggregate path (windows that
 *    need full ordering use range re-partitioning by (conv_id, turn_idx)
 *    instead — `repartitionByRange` keeps ordered runs contiguous).
 */
object Conversation {

  private def turnWindow = Window.partitionBy("conv_id").orderBy("turn_idx")

  /**
   * Cross-turn context boost — the conversation-aware extension of the
   * reference's per-text keyword boost (X5): a context keyword seen in
   * the PREVIOUS turn of the same conversation also boosts this turn's
   * match confidences (+0.15, cap 1.0). First turn has no predecessor.
   */
  def verdictWithCrossTurnBoost(transcripts: DataFrame): DataFrame = {
    val withBoost = Verdict.cleaned(transcripts, PiiRules.RedactionMessage)
      .withColumn("own_boost", Pii.hasContextBoost(col("clean_text")))
      .withColumn("prev_boost",
        coalesce(lag(col("own_boost"), 1).over(turnWindow), lit(false)))
      .withColumn("boost_any", col("own_boost") || col("prev_boost"))
    Verdict.assemble(withBoost,
      Pii.piiMatchesBoosted(col("clean_text"), col("boost_any")),
      useRandomString = false)
  }

  /** Per-conversation running state under stable turn order: dense row
    * number and cumulative dropped count (the reproducible-order probe). */
  def runningState(verdict: DataFrame): DataFrame =
    verdict.select(
      col("conv_id"), col("turn_idx"),
      row_number().over(turnWindow).as("rn"),
      sum(when(!col("keep"), 1L).otherwise(0L))
        .over(turnWindow.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum_dropped"))

  /**
   * Salted two-phase per-conversation rollup: phase 1 aggregates on
   * (conv_id, salt) — spreading a mega-conversation over `salts`
   * reducers — phase 2 merges the partials. Result is IDENTICAL to the
   * direct groupBy (same oracle), which is exactly the point: the salt
   * only reshapes the shuffle.
   */
  def rollupSalted(verdict: DataFrame, salts: Int = 8): DataFrame = {
    val partial = verdict
      .withColumn("salt", pmod(hash(col("turn_idx")), lit(salts)))
      .groupBy("conv_id", "salt").agg(
        count(lit(1)).as("p_turns"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("p_dropped"),
        sum(when(col("pii_risk_score") > 0.0, 1L).otherwise(0L)).as("p_pii"),
        max("pii_risk_score").as("p_max"))
    partial.groupBy("conv_id").agg(
      sum("p_turns").as("turns"),
      sum("p_dropped").as("dropped"),
      sum("p_pii").as("pii_turns"),
      round(max("p_max"), 6).as("max_risk"))
  }
}
