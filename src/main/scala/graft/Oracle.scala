package graft

import graft.rules.PiiRules
import graft.sources.Transcripts

/**
 * DuckDB-SQL twins of the engine's expressions, assembled from the same
 * [[PiiRules]] constants the Spark pipeline uses — one source of truth
 * for patterns/weights, two rendering targets (Catalyst columns, ANSI
 * SQL). Every regex here is RE2-and-Java-compatible ((?i) prefixes, no
 * backrefs/lookaround), so the same pattern strings drive both engines.
 */
object Oracle {

  /** Reference clean chain over a SQL expression (see pipeline.Clean):
    * whitespace collapse+trim → literal zwsp removal → HTML strip. */
  def cleanSql(col: String): String =
    s"regexp_replace(replace(trim(regexp_replace($col, '\\s+', ' ', 'g')), '&amp;#x200B;', ''), '<.*?>', '', 'g')"

  /** Scrape-time clean only (the F1 non-empty check runs on this). */
  def scrapeCleanSql(col: String): String =
    s"replace(trim(regexp_replace($col, '\\s+', ' ', 'g')), '&amp;#x200B;', '')"

  def fpSql(col: String): String =
    s"regexp_matches($col, '${PiiRules.FalsePositiveRegex}')"

  def boostSql(col: String): String =
    s"regexp_matches($col, '${PiiRules.ContextKeywordRegex}')"

  def skippedSql(col: String): String =
    s"contains($col, '${PiiRules.RedactionMessage}')"

  /** Per-type match count (0 when skipped or FP-gated). */
  def countSql(col: String, pattern: String): String =
    s"CASE WHEN skipped OR fp THEN 0 ELSE CAST(len(regexp_extract_all($col, '${PiiRules.ciPattern(pattern)}')) AS INT) END"

  /** SELECT-list fragments: skipped, fp, boost, n_<type>…, pii_risk_score
    * (rounded to 6dp to absorb summation-order ULP noise vs Spark). */
  def piiSelectSql(cleanCol: String): String = {
    val counts = PiiRules.Patterns.map { case (t, p, _) =>
      s"${countSql(cleanCol, p)} AS n_$t"
    }.mkString(",\n    ")
    val tw = PiiRules.Patterns.map { case (t, _, _) =>
      s"n_$t * ${PiiRules.TypeWeights(t)}"
    }.mkString(" + ")
    val ws = PiiRules.Patterns.map { case (t, _, c) =>
      s"n_$t * least(1.0, $c + CASE WHEN boost THEN ${PiiRules.ContextBoost} ELSE 0.0 END) * ${PiiRules.TypeWeights(t)}"
    }.mkString(" + ")
    s"""${skippedSql(cleanCol)} AS skipped,
       |    ${fpSql(cleanCol)} AS fp,
       |    ${boostSql(cleanCol)} AS boost,
       |    $counts,
       |    CASE WHEN ($tw) = 0 THEN 0.0 ELSE least(1.0, ($ws) / ($tw)) END AS risk_raw""".stripMargin
  }

  /** Full per-turn PII oracle over the documents-derived transcripts. */
  val piiRiskQuery: String =
    s"""${Transcripts.oracleCte},
       |clean AS (
       |  SELECT conv_id, turn_idx, ${cleanSql("text")} AS clean_text
       |  FROM transcripts
       |  WHERE ${scrapeCleanSql("text")} <> ''
       |),
       |scored AS (
       |  SELECT conv_id, turn_idx,
       |    ${piiSelectSql("clean_text")}
       |  FROM clean
       |)
       |SELECT conv_id, turn_idx, skipped, fp, boost,
       |  ${PiiRules.Patterns.map { case (t, _, _) => s"n_$t" }.mkString(", ")},
       |  round(risk_raw, 6) AS pii_risk_score
       |FROM scored""".stripMargin

  val cleanQuery: String =
    s"""${Transcripts.oracleCte}
       |SELECT conv_id, turn_idx, role, tool, ${cleanSql("text")} AS clean_text
       |FROM transcripts
       |WHERE ${scrapeCleanSql("text")} <> ''""".stripMargin

  val keepDropQuery: String =
    s"""${Transcripts.oracleCte},
       |clean AS (
       |  SELECT conv_id, turn_idx, ${cleanSql("text")} AS clean_text
       |  FROM transcripts
       |  WHERE ${scrapeCleanSql("text")} <> ''
       |),
       |scored AS (
       |  SELECT conv_id, turn_idx, clean_text,
       |    ${piiSelectSql("clean_text")}
       |  FROM clean
       |)
       |SELECT conv_id, turn_idx, skipped,
       |  (skipped OR NOT (risk_raw > ${PiiRules.DropThreshold})) AS keep,
       |  CASE WHEN (skipped OR NOT (risk_raw > ${PiiRules.DropThreshold}))
       |       THEN clean_text
       |       ELSE '${PiiRules.RedactionMessage}' END AS scrubbed_text
       |FROM scored""".stripMargin
}
