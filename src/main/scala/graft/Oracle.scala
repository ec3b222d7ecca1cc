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
    * unicode-whitespace collapse+trim → literal zwsp removal → HTML strip. */
  def cleanSql(col: String): String =
    s"regexp_replace(replace(trim(regexp_replace($col, '${graft.pipeline.Clean.PyWhitespaceClass}+', ' ', 'g')), '&amp;#x200B;', ''), '<.*?>', '', 'g')"

  /** Scrape-time clean only (the F1 non-empty check runs on this). */
  def scrapeCleanSql(col: String): String =
    s"replace(trim(regexp_replace($col, '${graft.pipeline.Clean.PyWhitespaceClass}+', ' ', 'g')), '&amp;#x200B;', '')"

  def fpSql(col: String): String =
    s"regexp_matches($col, '${PiiRules.FalsePositiveRegex}')"

  def boostSql(col: String): String =
    s"regexp_matches($col, '${PiiRules.ContextKeywordRegex}')"

  def skippedSql(col: String): String =
    s"contains($col, '${PiiRules.RedactionMessage}')"

  /** Per-type match count (0 when skipped or FP-gated). */
  def countSql(col: String, pattern: String): String =
    s"CASE WHEN skipped OR fp THEN 0 ELSE CAST(len(regexp_extract_all($col, '${PiiRules.ciPattern(pattern)}')) AS INT) END"

  /** Count + weighted-risk fragments; assumes `skipped`, `fp`, `boost`
    * columns are already in scope (lateral aliases or an outer CTE). */
  def countsRiskSql(cleanCol: String): String = {
    val counts = PiiRules.Patterns.map { case (t, p, _) =>
      s"${countSql(cleanCol, p)} AS n_$t"
    }.mkString(",\n    ")
    val tw = PiiRules.Patterns.map { case (t, _, _) =>
      s"n_$t * ${PiiRules.TypeWeights(t)}"
    }.mkString(" + ")
    val ws = PiiRules.Patterns.map { case (t, _, c) =>
      s"n_$t * least(1.0, $c + CASE WHEN boost THEN ${PiiRules.ContextBoost} ELSE 0.0 END) * ${PiiRules.TypeWeights(t)}"
    }.mkString(" + ")
    s"""$counts,
       |    CASE WHEN ($tw) = 0 THEN 0.0 ELSE least(1.0, ($ws) / ($tw)) END AS risk_raw""".stripMargin
  }

  /** SELECT-list fragments: skipped, fp, boost, n_<type>…, risk_raw
    * (rounded only at query boundaries, to absorb summation-order ULP
    * noise vs Spark). Uses DuckDB lateral column aliases. */
  def piiSelectSql(cleanCol: String): String =
    s"""${skippedSql(cleanCol)} AS skipped,
       |    ${fpSql(cleanCol)} AS fp,
       |    ${boostSql(cleanCol)} AS boost,
       |    ${countsRiskSql(cleanCol)}""".stripMargin

  /** Shared CTE chain: documents → transcripts → clean → scored → verdict.
    * Every oracle query is a short SELECT over `verdict`. */
  val verdictCte: String =
    s"""${Transcripts.oracleCte},
       |clean AS (
       |  SELECT conv_id, turn_idx, role, tool, ${cleanSql("text")} AS clean_text
       |  FROM transcripts
       |  WHERE ${scrapeCleanSql("text")} <> ''
       |),
       |scored AS (
       |  SELECT conv_id, turn_idx, role, tool, clean_text,
       |    ${piiSelectSql("clean_text")}
       |  FROM clean
       |),
       |verdict AS (
       |  SELECT *,
       |    (skipped OR NOT (risk_raw > ${PiiRules.DropThreshold})) AS keep,
       |    CASE WHEN (skipped OR NOT (risk_raw > ${PiiRules.DropThreshold}))
       |         THEN clean_text ELSE '${PiiRules.RedactionMessage}' END AS scrubbed_text
       |  FROM scored
       |)""".stripMargin

  val cleanQuery: String =
    s"""$verdictCte
       |SELECT conv_id, turn_idx, role, tool, clean_text FROM clean""".stripMargin

  val piiRiskQuery: String =
    s"""$verdictCte
       |SELECT conv_id, turn_idx, skipped, fp, boost,
       |  ${PiiRules.Patterns.map { case (t, _, _) => s"n_$t" }.mkString(", ")},
       |  round(risk_raw, 6) AS pii_risk_score
       |FROM verdict""".stripMargin

  val keepDropQuery: String =
    s"""$verdictCte
       |SELECT conv_id, turn_idx, skipped, keep, scrubbed_text FROM verdict""".stripMargin

  /** F4 pii_only display filter (utils/report.py:50-63; LLM term absent
    * when the LLM stage is off, as in the reference default). */
  val piiOnlyQuery: String =
    s"""$verdictCte
       |SELECT conv_id, turn_idx, round(risk_raw, 6) AS pii_risk_score
       |FROM verdict WHERE NOT skipped AND risk_raw > 0.0""".stripMargin

  /** F6 risk bands (ui/details_screen.py:121-128; utils/base.py:14-21). */
  val riskBandQuery: String =
    s"""$verdictCte
       |SELECT conv_id, turn_idx,
       |  CASE WHEN risk_raw > 0.7 THEN 'high' WHEN risk_raw > 0.4 THEN 'medium' ELSE 'low' END AS band_ui,
       |  CASE WHEN risk_raw > 0.5 THEN 'red' WHEN risk_raw > 0.2 THEN 'yellow' ELSE 'green' END AS band_table
       |FROM verdict""".stripMargin

  /** O3 riskiest turn: deterministic equivalent of the reference's
    * first-seen strict max, with the 100-char preview (report.py:156-183). */
  val topRiskyQuery: String =
    s"""$verdictCte
       |SELECT conv_id, turn_idx, round(risk_raw, 6) AS pii_risk_score,
       |  CASE WHEN length(clean_text) > 100 THEN substr(clean_text, 1, 100) || '...'
       |       ELSE clean_text END AS riskiest_preview
       |FROM verdict WHERE NOT skipped
       |ORDER BY risk_raw DESC, conv_id ASC, turn_idx ASC LIMIT 1""".stripMargin

  /** F2 case-insensitive substring keep-filter (api/reddit.py:394-402). */
  def textMatchQuery(q: String): String =
    s"""$verdictCte
       |SELECT conv_id, turn_idx FROM verdict
       |WHERE contains(lower(clean_text), '${q.toLowerCase}')""".stripMargin

  /** X10 table preview truncation (utils/tables.py:27). */
  val previewQuery: String =
    s"""$verdictCte
       |SELECT conv_id, turn_idx,
       |  CASE WHEN length(clean_text) > 70 THEN substr(clean_text, 1, 67) || '...'
       |       ELSE clean_text END AS preview
       |FROM verdict""".stripMargin

  /** A3/A5 global metrics (sentiment column omitted — not SQL-expressible;
    * covered by the rows-only q_sentiment_agg). */
  val metricsQuery: String =
    s"""$verdictCte
       |SELECT
       |  count(*) AS total_turns,
       |  CAST(sum(CASE WHEN skipped THEN 1 ELSE 0 END) AS BIGINT) AS skipped_turns,
       |  CAST(sum(CASE WHEN NOT skipped THEN 1 ELSE 0 END) AS BIGINT) AS processed_turns,
       |  CAST(sum(CASE WHEN NOT skipped AND risk_raw > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS total_pii_turns,
       |  CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS dropped_turns,
       |  round(max(risk_raw), 6) AS max_risk_score
       |FROM verdict""".stripMargin

  /** A7-style per-conversation rollup (counts only — SQL-expressible part). */
  val convRollupQuery: String =
    s"""$verdictCte
       |SELECT conv_id,
       |  count(*) AS turns,
       |  CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
       |  CAST(sum(CASE WHEN risk_raw > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS pii_turns,
       |  round(max(risk_raw), 6) AS max_risk
       |FROM verdict GROUP BY conv_id""".stripMargin

  /** Cross-turn context boost (conversation layer): a keyword in turn
    * t-1 of the same conversation boosts turn t too. */
  val convBoostQuery: String =
    s"""${Transcripts.oracleCte},
       |clean AS (
       |  SELECT conv_id, turn_idx, ${cleanSql("text")} AS clean_text
       |  FROM transcripts
       |  WHERE ${scrapeCleanSql("text")} <> ''
       |),
       |flags AS (
       |  SELECT conv_id, turn_idx, clean_text,
       |    ${skippedSql("clean_text")} AS skipped,
       |    ${fpSql("clean_text")} AS fp,
       |    ${boostSql("clean_text")} AS own_boost
       |  FROM clean
       |),
       |boosted AS (
       |  SELECT *, (own_boost OR coalesce(
       |      lag(own_boost) OVER (PARTITION BY conv_id ORDER BY turn_idx), false)) AS boost
       |  FROM flags
       |),
       |scored AS (
       |  SELECT conv_id, turn_idx, skipped, boost,
       |    ${countsRiskSql("clean_text")}
       |  FROM boosted
       |)
       |SELECT conv_id, turn_idx, boost AS boost_any,
       |  round(risk_raw, 6) AS pii_risk_score,
       |  (skipped OR NOT (risk_raw > ${PiiRules.DropThreshold})) AS keep
       |FROM scored""".stripMargin

  /** Per-conversation running state under stable turn order. */
  val convRunningQuery: String =
    s"""$verdictCte
       |SELECT conv_id, turn_idx,
       |  CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS INT) AS rn,
       |  CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY conv_id ORDER BY turn_idx
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_dropped
       |FROM verdict""".stripMargin

  /** Stub-LLM merged verdict (J1/X7/F5 full form). The stub's decisions
    * (has_pii ⇔ contains '@'; md5-derived confidence) are SQL-expressible,
    * so the WHOLE merged keep/drop path has an exact oracle. */
  val llmVerdictQuery: String =
    s"""$verdictCte,
       |llm AS (
       |  SELECT *,
       |    (NOT skipped AND contains(clean_text, '@')) AS llm_has_pii,
       |    CASE WHEN (NOT skipped AND contains(clean_text, '@'))
       |         THEN ((('0x' || substr(md5(clean_text), 1, 4))::INT) % 100) / 100.0
       |         ELSE 0.0 END AS llm_confidence
       |  FROM verdict
       |), merged AS (
       |  SELECT *,
       |    CASE WHEN llm_has_pii THEN greatest(risk_raw, llm_confidence)
       |         ELSE risk_raw END AS pii_risk_merged
       |  FROM llm
       |)
       |SELECT conv_id, turn_idx, llm_has_pii,
       |  round(llm_confidence, 6) AS llm_confidence,
       |  round(pii_risk_merged, 6) AS pii_risk_merged,
       |  (skipped OR NOT (pii_risk_merged > ${PiiRules.DropThreshold} OR llm_has_pii)) AS keep
       |FROM merged""".stripMargin

  /** F4 with the LLM term live (utils/report.py:50-63 full predicate). */
  val llmPiiOnlyQuery: String =
    s"""$verdictCte,
       |llm AS (
       |  SELECT *,
       |    (NOT skipped AND contains(clean_text, '@')) AS llm_has_pii,
       |    CASE WHEN (NOT skipped AND contains(clean_text, '@'))
       |         THEN ((('0x' || substr(md5(clean_text), 1, 4))::INT) % 100) / 100.0
       |         ELSE 0.0 END AS llm_confidence
       |  FROM verdict
       |)
       |SELECT conv_id, turn_idx
       |FROM llm
       |WHERE NOT skipped AND (risk_raw > 0.0 OR (llm_has_pii AND llm_confidence > 0.0))""".stripMargin

  /** X-rewrite: the stub's suggestion is md5-derived, so the whole
    * rewrite surface (flag → suggest → substitute) is SQL-expressible. */
  val llmRewriteQuery: String =
    s"""$verdictCte
       |SELECT conv_id, turn_idx,
       |  (NOT skipped AND contains(clean_text, '@')) AS llm_has_pii,
       |  CASE WHEN (NOT skipped AND contains(clean_text, '@'))
       |       THEN '[rewritten:' || substr(md5(clean_text), 1, 8) || ']'
       |       ELSE clean_text END AS rewritten_text
       |FROM verdict""".stripMargin

  /** A6 denominator (the SQL-expressible half of displayed-avg). */
  val displayedCountQuery: String =
    s"""$verdictCte
       |SELECT count(*) AS displayed_turns
       |FROM verdict WHERE NOT skipped AND risk_raw > 0.0""".stripMargin

  /** Lexicon-coverage metric twin: the bundled VADER subset's word set
    * (alphabetic slice) is embedded as a VALUES list so DuckDB applies
    * the EXACT same membership function the engine does — measuring,
    * per corpus, how many scored tokens the subset covers vs how many
    * alphabetic tokens score zero purely for being out-of-subset. */
  def sentimentCoverageQuery: String = {
    val values = graft.rules.Vader.LexiconAlphaWords.map(w => s"('$w')").mkString(",")
    s"""$verdictCte,
       |lex(tok) AS (VALUES $values),
       |toks AS (
       |  SELECT u.tok FROM verdict, LATERAL unnest(
       |    regexp_extract_all(lower(clean_text), '[a-z]+')) AS u(tok)
       |  WHERE NOT skipped AND length(u.tok) > 1
       |)
       |SELECT CAST(count(*) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN l.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS covered_tokens,
       |  CAST(sum(CASE WHEN l.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS zero_scored_tokens,
       |  round(CAST(sum(CASE WHEN l.tok IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS coverage,
       |  CAST(count(DISTINCT t.tok) AS BIGINT) AS distinct_tokens,
       |  CAST(count(DISTINCT CASE WHEN l.tok IS NOT NULL THEN t.tok END) AS BIGINT) AS distinct_covered
       |FROM toks t LEFT JOIN lex l ON l.tok = t.tok""".stripMargin
  }

  /** X8 deterministic-UUID scrub mode (uuid4-shaped, sha256-derived). */
  val scrubUuidQuery: String =
    s"""$verdictCte
       |SELECT conv_id, turn_idx,
       |  CASE WHEN keep THEN clean_text ELSE
       |    substr(h,1,8) || '-' || substr(h,9,4) || '-4' || substr(h,14,3) || '-a' || substr(h,18,3) || '-' || substr(h,21,12)
       |  END AS scrubbed_text
       |FROM (SELECT *, sha256(conv_id || '#' || CAST(turn_idx AS VARCHAR)) AS h FROM verdict)""".stripMargin
}
