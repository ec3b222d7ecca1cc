package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Verdict
import graft.rules.{Pii, PiiRules}
import graft.sources.Transcripts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One `queries` entry per implemented operator (SURVEY.md §2 ids in the
  * comments); `oracleSql` gives the DuckDB twin where SQL-expressible. */
object SparkEntry {

  /** Flagship: the full clean→PII→keep/drop→scrub verdict pipeline over
    * the documents-derived transcript table at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Verdict(Transcripts.fromDocuments(spark, "/root/testdata/sf0.001"))

  private def transcripts(s: SparkSession, dir: String): DataFrame =
    Transcripts.fromDocuments(s, dir)

  /** Verdict pipeline plus the diagnostic fp/boost flags and per-type
    * match counts the oracle checks. */
  private def scored(s: SparkSession, dir: String): DataFrame = {
    val v = Verdict(transcripts(s, dir))
    val counted = PiiRules.Patterns.foldLeft(v) { case (df, (t, _, _)) =>
      df.withColumn(s"n_$t",
        size(filter(col("pii_matches"), m => m.getField("type") === lit(t))))
    }
    counted
      .withColumn("fp", Pii.fpGate(col("clean_text")))
      .withColumn("boost", Pii.hasContextBoost(col("clean_text")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P2-P4 + F1: clean chain
    "q_clean" -> ((s, dir) =>
      transcripts(s, dir)
        .withColumn("clean_text", pipeline.Clean.cleanText(col("text")))
        .filter(pipeline.Clean.nonEmpty(pipeline.Clean.scrapeClean(col("text"))))
        .select("conv_id", "turn_idx", "role", "tool", "clean_text")),
    // X3-X6 + F7 + F3: per-turn PII scan & weighted risk
    "q_pii_risk" -> ((s, dir) =>
      scored(s, dir).select(
        Seq(col("conv_id"), col("turn_idx"), col("skipped"), col("fp"), col("boost")) ++
          PiiRules.Patterns.map { case (t, _, _) => col(s"n_$t") } :+
          round(col("pii_risk_score"), 6).as("pii_risk_score"): _*)),
    // F5 + X8: keep/drop decision + whole-text scrub
    "q_keep_drop" -> ((s, dir) =>
      Verdict(transcripts(s, dir))
        .select("conv_id", "turn_idx", "skipped", "keep", "scrubbed_text"))
  )

  def oracleSql: Map[String, String] = Map(
    "q_clean" -> Oracle.cleanQuery,
    "q_pii_risk" -> Oracle.piiRiskQuery,
    "q_keep_drop" -> Oracle.keepDropQuery
  )
}
