package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Reddit's classic listing-rank score functions, as published in the
 * open-sourced reddit codebase (`r2/lib/db/_sorts.pyx`, public since
 * 2008). The reference delegates hot/controversial user-comment sorts
 * to the API server (`/root/reference/reddacted/api/reddit.py:371-378`,
 * praw `comments.hot/controversial`); these are the formulas that
 * server applies, re-expressed as Catalyst column expressions so the
 * sort dispatch can rank CLIENT-side over any scored row set — closing
 * the O1 "hot/controversial out-of-scope" gap for data that carries
 * (ups, downs, created) rather than a server-provided order.
 *
 * Both are pure per-row arithmetic (map-side, codegen'd via built-in
 * functions, no shuffle); ranking with them is one TakeOrderedAndProject
 * at any scale.
 */
object Ranking {

  /** Reddit's epoch for the hot ranking (2005-12-08 07:46:43 UTC). */
  val HotEpoch = 1134028003L

  /** hot(ups, downs, date): sign(s)·log10(max(|s|,1)) + seconds/45000,
    * rounded to 7 decimals — `_sorts.pyx hot()`. `createdEpoch` is the
    * creation time in epoch seconds. */
  def hotScore(ups: Column, downs: Column, createdEpoch: Column): Column = {
    val s = (ups - downs).cast("double")
    val order = log10(greatest(abs(s), lit(1.0)))
    val seconds = createdEpoch.cast("double") - lit(HotEpoch.toDouble)
    round(signum(s) * order + seconds / lit(45000.0), 7)
  }

  /** controversy(ups, downs): 0 unless both sides voted, else
    * (ups+downs)^(min/max vote balance) — `_sorts.pyx controversy()`.
    * Rounded to 6 decimals so the cross-engine libm pow comparison is
    * stable (same convention as every similarity query). */
  def controversyScore(ups: Column, downs: Column): Column = {
    val u = ups.cast("double")
    val d = downs.cast("double")
    val magnitude = u + d
    val balance = when(u > d, d / u).otherwise(u / d)
    round(when(ups <= 0 || downs <= 0, lit(0.0))
      .otherwise(pow(magnitude, balance)), 6)
  }

  /** DuckDB twin of [[hotScore]] (sign/log10/greatest/abs/round are all
    * ANSI-ish and agree bit-for-bit at 7dp rounding). */
  def hotScoreSql(ups: String, downs: String, createdEpoch: String): String =
    s"round(sign(CAST($ups - $downs AS DOUBLE)) * log10(greatest(abs(CAST($ups - $downs AS DOUBLE)), 1.0)) + " +
      s"(CAST($createdEpoch AS DOUBLE) - $HotEpoch) / 45000.0, 7)"

  /** DuckDB twin of [[controversyScore]]. */
  def controversyScoreSql(ups: String, downs: String): String =
    s"round(CASE WHEN $ups <= 0 OR $downs <= 0 THEN 0.0 ELSE " +
      s"pow(CAST($ups AS DOUBLE) + CAST($downs AS DOUBLE), " +
      s"CASE WHEN CAST($ups AS DOUBLE) > CAST($downs AS DOUBLE) " +
      s"THEN CAST($downs AS DOUBLE) / CAST($ups AS DOUBLE) " +
      s"ELSE CAST($ups AS DOUBLE) / CAST($downs AS DOUBLE) END) END, 6)"
}
