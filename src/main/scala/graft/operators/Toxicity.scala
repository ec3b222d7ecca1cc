package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Toxicity gate + scrub — the north rule's "PII/toxicity-scrub" half
 * that the PII pipeline doesn't cover. Two-tier blocklist design, the
 * shape C4 (Raffel'20 §2.2, "List of Dirty, Naughty, Obscene..." drop
 * rule) and production curation stacks use:
 *
 *  - SEVERE phrases: any word-bounded occurrence drops the doc
 *    outright (C4's any-hit rule), via the codegen'd one-pass
 *    Aho-Corasick `ac_any`;
 *  - MILD terms: counted (`ac_count`, replaceAll-consistent) and
 *    thresholded as a per-token density, so long documents aren't
 *    dropped for one heated sentence but short rants are;
 *  - both tiers are scrubbed in ONE further AC pass for the docs the
 *    gate keeps in redacted form.
 *
 * The embedded lists are deliberately small and mild (the operator
 * shape is what matters; a deployment swaps in the full published
 * blocklist, which stays a broadcast-sized automaton). Both lists are
 * jointly prefix-free, so AC matching is order-free and agrees exactly
 * with the oracle's regex alternation on this ASCII corpus (the same
 * contract TextStats.scrubKeywords documents).
 *
 * The synthetic corpus contains no toxic vocabulary, so a
 * deterministic doc_id-keyed suffix seeds hits — mixed case included —
 * exactly like the scrubKeywords seeding; the density rule then
 * genuinely splits by document length (3 seeded hits clear 0.1 only on
 * short docs).
 *
 * Scale shape: pure map-side expression work (three automaton passes
 * per row, all inside whole-stage codegen); no shuffle, no join.
 */
object Toxicity {

  val SevereTerms: Seq[String] = Seq("kill yourself", "die in a fire")
  val MildTerms: Seq[String] =
    Seq("damn", "stupid", "idiot", "crap", "hate", "jerk", "dumb", "moron")
  val MaxMildRatio = 0.1
  val ToxMask = "[TOX]"

  def toxicity(spark: SparkSession, dir: String): DataFrame =
    toxicityDocs(Inputs.documents(spark, dir))

  private def seeded(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id",
        """CASE doc_id % 7
          |  WHEN 1 THEN concat(text, ' that idea is damn stupid and I hate it')
          |  WHEN 2 THEN concat(text, ' oh CRAP what a dumb MORON thing')
          |  ELSE text END AS t0""".stripMargin)
      .selectExpr("doc_id",
        """CASE WHEN doc_id % 11 = 3
          |  THEN concat(t0, ' just die in a fire already')
          |  ELSE t0 END AS seeded""".stripMargin)
      .selectExpr("doc_id", "seeded", "size(split(seeded, '\\\\s+')) AS n_tok")

  private def finish(df: DataFrame): DataFrame =
    df.selectExpr("doc_id", "n_tok", "severe_hit", "mild_hits",
      "round(mild_hits / CAST(n_tok AS DOUBLE), 6) AS tox_ratio",
      s"NOT severe_hit AND round(mild_hits / CAST(n_tok AS DOUBLE), 6) <= $MaxMildRatio AS tox_keep",
      "tox_scrubbed")

  /** The computation over any (doc_id, text) frame (spec entry).
    * DEFAULT = the fused [[graft.functions.AcToxExpr]] kernel: ONE
    * automaton pass yields all three signals — a third of the text
    * scans of the chain below, which is kept as the proof shape
    * (ToxicitySpec asserts hash-equality). */
  def toxicityDocs(docs: DataFrame): DataFrame =
    finish(seeded(docs)
      .select(col("doc_id"), col("n_tok"),
        graft.functions.AhoCorasick.tox(col("seeded"),
          SevereTerms, MildTerms, ToxMask).as("tox"))
      .selectExpr("doc_id", "n_tok", "tox.severe_hit AS severe_hit",
        "tox.mild_hits AS mild_hits", "tox.scrubbed AS tox_scrubbed"))

  /** The three-expression chain (severe any + mild count + combined
    * scrub) — the semantic baseline the fused kernel must match. */
  def toxicityDocsChain(docs: DataFrame): DataFrame =
    finish(seeded(docs)
      .select(col("doc_id"), col("n_tok"),
        graft.functions.AhoCorasick.any(col("seeded"), SevereTerms).as("severe_hit"),
        graft.functions.AhoCorasick.count(col("seeded"), MildTerms).as("mild_hits"),
        graft.functions.AhoCorasick.scrub(col("seeded"),
          SevereTerms ++ MildTerms, ToxMask).as("tox_scrubbed")))

  def toxicityOracle: String = {
    val severeAlt = SevereTerms.mkString("|")
    val mildAlt = MildTerms.mkString("|")
    val allAlt = (SevereTerms ++ MildTerms).mkString("|")
    s"""WITH seeded AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 11 = 3 THEN t0 || ' just die in a fire already'
       |         ELSE t0 END AS seeded
       |  FROM (
       |    SELECT doc_id, CASE doc_id % 7
       |      WHEN 1 THEN text || ' that idea is damn stupid and I hate it'
       |      WHEN 2 THEN text || ' oh CRAP what a dumb MORON thing'
       |      ELSE text END AS t0
       |    FROM documents)
       |), m AS (
       |  SELECT doc_id, seeded,
       |    CAST(len(regexp_split_to_array(seeded, '\\s+')) AS INT) AS n_tok,
       |    regexp_matches(seeded, '(?i)\\b($severeAlt)\\b') AS severe_hit,
       |    CAST(len(regexp_extract_all(seeded, '(?i)\\b($mildAlt)\\b')) AS INT) AS mild_hits
       |  FROM seeded
       |)
       |SELECT doc_id, n_tok, severe_hit, mild_hits,
       |  round(mild_hits / CAST(n_tok AS DOUBLE), 6) AS tox_ratio,
       |  (NOT severe_hit AND round(mild_hits / CAST(n_tok AS DOUBLE), 6) <= $MaxMildRatio) AS tox_keep,
       |  regexp_replace(seeded, '\\b($allAlt)\\b', '$ToxMask', 'gi') AS tox_scrubbed
       |FROM m""".stripMargin
  }
}
