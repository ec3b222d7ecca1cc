package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * K1 (utils/report.py:30-202): the markdown analysis report. The
 * reference renders every shown comment into a text file; at scale this
 * is a debug artifact over a SAMPLE — the renderer collects at most
 * `maxRows` verdict rows (deterministic order) plus the single
 * aggregated stats row. Never a full-table collect.
 */
object Report {

  def render(verdict: DataFrame, identifier: String,
             piiOnly: Boolean = false, maxRows: Int = 100): String = {
    val shown0 = verdict.filter(!col("skipped"))
    val shown = (if (piiOnly) shown0.filter(col("pii_risk_score") > 0.0) else shown0)
      .orderBy("conv_id", "turn_idx")
    val stats = Metrics.summary(verdict).head()
    val riskiest = Metrics.riskiest(verdict).collect().headOption
    val rows = shown.select("conv_id", "turn_idx", "sentiment_score",
      "sentiment_label", "pii_risk_score", "keep", "clean_text").take(maxRows)

    val sb = new StringBuilder
    sb.append(s"# Analysis Report for '$identifier'\n\n")
    sb.append(s"- Total turns: ${stats.getAs[Long]("total_turns")}\n")
    sb.append(s"- Processed: ${stats.getAs[Long]("processed_turns")}" +
      s" (skipped ${stats.getAs[Long]("skipped_turns")})\n")
    sb.append(s"- Overall sentiment: ${stats.getAs[Double]("overall_sentiment")}\n")
    sb.append(s"- Turns with PII: ${stats.getAs[Long]("total_pii_turns")}\n")
    sb.append(s"- Dropped (scrubbed): ${stats.getAs[Long]("dropped_turns")}\n")
    riskiest.foreach { r =>
      sb.append(s"- Max risk score: ${r.getAs[Double]("pii_risk_score")}\n")
      sb.append(s"- Riskiest turn: ${r.getAs[String]("riskiest_preview")}\n")
    }
    sb.append("\n---\n\n")
    rows.zipWithIndex.foreach { case (r, i) =>
      val text = r.getAs[String]("clean_text")
      val preview = if (text.length > 70) text.substring(0, 67) + "..." else text
      sb.append(s"## Turn ${i + 1}: ${r.getAs[String]("conv_id")}/${r.getAs[Int]("turn_idx")}\n")
      sb.append(s"- Sentiment: ${r.getAs[Double]("sentiment_score")} (${r.getAs[String]("sentiment_label")})\n")
      sb.append(s"- PII risk: ${r.getAs[Double]("pii_risk_score")}\n")
      sb.append(s"- Verdict: ${if (r.getAs[Boolean]("keep")) "keep" else "drop"}\n")
      sb.append(s"- Text: $preview\n\n")
    }
    sb.toString
  }
}
