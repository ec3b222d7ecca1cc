package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Text-analysis operators for the training-data pipeline: language-ID
 * (stopword n-gram heuristic), quality scoring, token counting, and
 * document fingerprinting (min char-shingle hash, winnowing-style).
 * Each has an exact DuckDB oracle; all are pure map-side column work.
 */
object TextStats {

  /** Embedded marker-word lists (distinct-hit scoring). Tiny on purpose:
    * language-ID at scale swaps in a larger table broadcast to executors;
    * the operator shape (tokenize → intersect → argmax) is what matters. */
  val StopWords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "zu", "von", "mit", "auf",
      "nicht", "ein", "eine", "ich", "sie"),
    "en" -> Seq("the", "and", "is", "to", "of", "in", "that", "it", "was",
      "for", "on", "with", "as", "at"),
    "es" -> Seq("el", "los", "las", "es", "que", "un", "una", "por", "con",
      "para", "como", "del", "se", "su"),
    "fr" -> Seq("le", "les", "et", "est", "dans", "une", "pour", "avec",
      "ne", "pas", "je", "vous", "ce", "qui"))

  private val langs = StopWords.keys.toSeq.sorted // de, en, es, fr

  private def litArr(ws: Seq[String], spark: Boolean): String =
    if (spark) "array(" + ws.map(w => s"'$w'").mkString(", ") + ")"
    else "[" + ws.map(w => s"'$w'").mkString(", ") + "]"

  /** Distinct stopword hits per language; argmax with alphabetical
    * preference on ties (score 0 everywhere ⇒ 'de' — deterministic). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scores = langs.map(l =>
      s"size(array_intersect(toks, ${litArr(StopWords(l), spark = true)})) AS s_$l")
    val pred =
      s"""CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |  WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
         |  WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END""".stripMargin
    Inputs.documents(spark, dir)
      .selectExpr("doc_id", "array_distinct(split(lower(text), '\\\\s+')) AS toks")
      .selectExpr(Seq("doc_id") ++ scores: _*)
      .selectExpr("doc_id", s"$pred AS lang_pred",
        "greatest(s_de, s_en, s_es, s_fr) AS n_hits")
  }

  val langIdOracle: String = {
    val scores = langs.map(l =>
      s"len(list_intersect(toks, ${litArr(StopWords(l), spark = false)})) AS s_$l").mkString(",\n    ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS toks
       |  FROM documents
       |), scored AS (
       |  SELECT doc_id,
       |    $scores
       |  FROM toks
       |)
       |SELECT doc_id,
       |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       |    WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       |    WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS lang_pred,
       |  CAST(greatest(s_de, s_en, s_es, s_fr) AS INT) AS n_hits
       |FROM scored""".stripMargin
  }

  /** Quality scoring: token count, mean token length, digit ratio,
    * stopword ratio → composite in [0,1] + keep flag. The formula is the
    * engine's own (the reference has no text-quality scorer); it follows
    * the usual length/stopword/digit heuristics. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val en = litArr(StopWords("en"), spark = true)
    Inputs.documents(spark, dir)
      .selectExpr("doc_id", "text", "split(text, '\\\\s+') AS t")
      .selectExpr("doc_id",
        "size(t) AS n_tokens",
        "round(length(replace(text, ' ', '')) / CAST(size(t) AS DOUBLE), 6) AS mean_tok_len",
        // digit count via translate (codegen'd char scan) — same value as
        // the oracle's regexp_replace strip, no regex on the hot path
        "round((length(text) - length(translate(text, '0123456789', ''))) / CAST(length(text) AS DOUBLE), 6) AS digit_ratio",
        s"size(array_intersect(array_distinct(transform(t, x -> lower(x))), $en)) AS stop_hits")
      .selectExpr("doc_id", "n_tokens", "mean_tok_len", "digit_ratio", "stop_hits",
        "round(0.4 * least(1.0, n_tokens / 50.0) + 0.3 * (1.0 - digit_ratio) + 0.3 * least(1.0, stop_hits / 8.0), 6) AS quality_score")
      .selectExpr("doc_id", "n_tokens", "mean_tok_len", "digit_ratio", "stop_hits",
        "quality_score", "quality_score > 0.5 AND n_tokens >= 5 AS pass")
  }

  val qualityOracle: String = {
    val en = litArr(StopWords("en"), spark = false)
    s"""WITH base AS (
       |  SELECT doc_id, text, regexp_split_to_array(text, '\\s+') AS t FROM documents
       |), stats AS (
       |  SELECT doc_id,
       |    CAST(len(t) AS INT) AS n_tokens,
       |    round(length(replace(text, ' ', '')) / CAST(len(t) AS DOUBLE), 6) AS mean_tok_len,
       |    round(length(regexp_replace(text, '[^0-9]', '', 'g')) / CAST(length(text) AS DOUBLE), 6) AS digit_ratio,
       |    CAST(len(list_intersect(list_distinct(list_transform(t, x -> lower(x))), $en)) AS INT) AS stop_hits
       |  FROM base
       |), q AS (
       |  SELECT *,
       |    round(0.4 * least(1.0, n_tokens / 50.0) + 0.3 * (1.0 - digit_ratio) + 0.3 * least(1.0, stop_hits / 8.0), 6) AS quality_score
       |  FROM stats
       |)
       |SELECT doc_id, n_tokens, mean_tok_len, digit_ratio, stop_hits, quality_score,
       |  (quality_score > 0.5 AND n_tokens >= 5) AS pass
       |FROM q""".stripMargin
  }

  /** Deterministic stratified sampling — the training-mixture primitive
    * (per-language/per-source rates): an md5-derived uniform per doc_id
    * compared against the stratum's rate. Reproducible across engines,
    * runs, and partitionings (no RNG state, no sampleBy seed coupling);
    * map-side only, so it composes with any downstream pipeline. */
  val SampleRates: Map[String, Double] =
    Map("en" -> 0.5, "zh" -> 0.25).withDefaultValue(0.1)

  private def rateCase(quote: String => String): String =
    "CASE lang " + SampleRates.map { case (l, r) => s"WHEN ${quote(l)} THEN $r" }
      .mkString(" ") + " ELSE 0.1 END"

  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    Inputs.documents(spark, dir)
      .filter(s"(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10000) / 10000.0 < ${rateCase(l => s"'$l'")}")
      .select("doc_id", "lang")

  val sampleStratifiedOracle: String =
    s"""SELECT doc_id, lang FROM documents
       |WHERE ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000) / 10000.0)
       |      < ${rateCase(l => s"'$l'")}""".stripMargin

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation marks). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Inputs.documents(spark, dir)
      .selectExpr("doc_id",
        "size(split(text, '\\\\s+')) AS ws_tokens",
        "size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)) AS regex_tokens")

  val tokenCountOracle: String =
    """SELECT doc_id,
      |  CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS regex_tokens
      |FROM documents""".stripMargin

  /** Multi-pattern keyword scrub via the codegen'd Aho-Corasick
    * expression ([[graft.functions.AhoCorasick]]): every word-bounded
    * occurrence of any context keyword is replaced in ONE text pass
    * (the north star's "multi-pattern Aho-Corasick scrubbing"). The
    * synthetic corpus contains no PII keywords, so a deterministic
    * doc_id-keyed suffix seeds hits (mixed case included) — the oracle
    * runs the equivalent regexp_replace alternation; the keyword set is
    * prefix-free, so alternation order cannot matter.
    *
    * ORACLE CONTRACT — ASCII-only: the engine scrubs with Java `\b`
    * semantics (Unicode-aware word chars via Character.isLetterOrDigit,
    * ASCII case fold), while DuckDB/RE2 'gi' uses an ASCII-only `\b`
    * and Unicode simple case folding. The two agree exactly on ASCII
    * text and can diverge on non-ASCII adjacent to keywords ('éphone')
    * or fold-equivalent non-ASCII chars — so the oracle is valid only
    * because the documents corpus and the seeded suffixes are pure
    * ASCII (OperatorsSpec asserts this per sf dir; the Java-vs-regex
    * UNICODE equivalence itself is property-tested in PropertySpec). */
  val ScrubMask = "[REDACTED-KW]"

  def scrubKeywords(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    Inputs.documents(spark, dir)
      .selectExpr("doc_id",
        """CASE doc_id % 5
          |  WHEN 0 THEN concat(text, ' call me on my phone')
          |  WHEN 1 THEN concat(text, ' my SSN is secret')
          |  WHEN 2 THEN concat(text, ' Email: test, reach me soon')
          |  ELSE text END AS seeded""".stripMargin)
      .select(col("doc_id"),
        graft.functions.AhoCorasick.scrub(col("seeded"),
          graft.rules.PiiRules.ContextKeywords, ScrubMask).as("scrubbed"))
  }

  val scrubKeywordsOracle: String = {
    val alt = graft.rules.PiiRules.ContextKeywords.mkString("|")
    s"""WITH seeded AS (
       |  SELECT doc_id, CASE doc_id % 5
       |    WHEN 0 THEN text || ' call me on my phone'
       |    WHEN 1 THEN text || ' my SSN is secret'
       |    WHEN 2 THEN text || ' Email: test, reach me soon'
       |    ELSE text END AS seeded
       |  FROM documents)
       |SELECT doc_id,
       |  regexp_replace(seeded, '\\b($alt)\\b', '$ScrubMask', 'gi') AS scrubbed
       |FROM seeded""".stripMargin
  }

  /** Fingerprinting: full-content md5 plus a winnowing-style min hash
    * over character 8-grams (robust to local edits). Spark runs the
    * fused [[graft.functions.FingerprintMin]] (one pass, one u64 min);
    * the oracle keeps the composed transform/array_min form. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, md5}
    Inputs.documents(spark, dir)
      .select(col("doc_id"),
        md5(col("text")).as("content_md5"),
        graft.functions.FingerprintMin(col("text")).as("min_shingle_hash"))
  }

  val fingerprintOracle: String =
    """SELECT doc_id,
      |  md5(text) AS content_md5,
      |  CASE WHEN length(text) >= 8
      |    THEN list_min(list_transform(generate_series(1, length(text) - 7), i -> substr(md5(substr(text, i, 8)), 1, 16)))
      |    ELSE substr(md5(text), 1, 16) END AS min_shingle_hash
      |FROM documents""".stripMargin
}
