package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
 * Transfer Learning with a Unified Text-to-Text Transformer" — the
 * published §2.2 heuristics behind the C4 corpus):
 *
 *  line level — keep only lines that (a) end in a terminal punctuation
 *  mark ('.', '!', '?', '"'), (b) contain at least 3 words, (c) do not
 *  contain the word "javascript";
 *
 *  page level — drop any page with (a) fewer than 5 sentences after
 *  line filtering, (b) the phrase "lorem ipsum", (c) a curly brace
 *  '{', (d) any word from the blocklist (the paper uses the public
 *  "List of Dirty, Naughty …" list; a small embedded subset stands in
 *  for it here — the MECHANISM is what's implemented, the full list is
 *  a drop-in resource swap);
 *
 *  corpus level — remove all but the FIRST occurrence of any
 *  three-sentence span (first = lowest (doc_id, sentence index); a
 *  sentence is removed when every copy of it sits inside some
 *  duplicated span occurrence).
 *
 * The synthetic documents table has no line or sentence structure (a
 * flat token stream, no punctuation), so the rules operate on a
 * DETERMINISTIC re-punctuated page view built by a shared enrichment
 * CTE (same construction in the Spark plan and the DuckDB oracle —
 * the established Transcripts.fromDocuments pattern): '.' closes every
 * 7th token, a newline every 21st, the stop word "of" is woven in
 * after token i when i % 7 = 3 and i >= 35 (doc-id-INDEPENDENT, so
 * identical raw texts still yield identical pages — required by the
 * span-dedup borrow property — while docs shorter than ~36 tokens
 * genuinely fail the Gopher stop-word rule along with the word-count
 * rule), a deterministic subset of docs gets marker lines exercising
 * each rule (javascript / lorem ipsum / brace / blocklist), and docs
 * with doc_id % 11 ∈ {1,2} borrow their token stream from the template
 * doc at doc_id - (doc_id % 11) so three-sentence spans genuinely
 * repeat across documents.
 *
 * Scale shape: line and page rules are pure map-side string work; the
 * sentence rebuild is one groupBy(doc_id); span dedup is ONE shuffle
 * keyed by the span text (the global first-occurrence window), then an
 * equi-join back — no pairwise work, no windows over the corpus.
 * C4QualitySpec pins the rules on real English fixtures; the sf oracle
 * hash-checks the whole distributed chain.
 */
object C4Quality {

  /** Embedded stand-in subset of the public blocklist. */
  val BlockWords: Seq[String] = Seq("bastard", "bitch", "shit")

  private val TerminalPunct = Seq(".", "!", "?", "\"")

  /** The deterministic re-punctuated page view: (doc_id, page). */
  def pageView(spark: SparkSession, dir: String): DataFrame = {
    val docs = Inputs.documents(spark, dir).select("doc_id", "text")
    // borrowers take the template doc's token stream (content dup)
    val tmpl = docs.select(col("doc_id").as("t_id"), col("text").as("t_text"))
    val based = docs
      .withColumn("tmpl_id",
        when(col("doc_id") % 11 === 1 || col("doc_id") % 11 === 2,
          col("doc_id") - (col("doc_id") % 11)).otherwise(col("doc_id")))
      .join(tmpl, col("tmpl_id") === col("t_id"), "left")
      .select(col("doc_id"), coalesce(col("t_text"), col("text")).as("text"))
    based.selectExpr("doc_id", "split(text, ' ') AS t")
      .selectExpr("doc_id",
        """concat(
          |  concat_ws('', transform(sequence(0, size(t) - 1), i -> concat(
          |    t[i],
          |    CASE WHEN i % 7 = 3 AND i >= 35 THEN ' of' ELSE '' END,
          |    CASE WHEN i % 7 = 6 THEN '.' ELSE '' END,
          |    CASE WHEN i = size(t) - 1 THEN ''
          |         WHEN i % 21 = 20 THEN '\n' ELSE ' ' END))),
          |  CASE WHEN doc_id % 13 = 0 THEN '\nenable javascript to continue.' ELSE '' END,
          |  CASE WHEN doc_id % 17 = 0 THEN '\nlorem ipsum dolor sit amet.' ELSE '' END,
          |  CASE WHEN doc_id % 19 = 0 THEN '\nconfig { display none }.' ELSE '' END,
          |  CASE WHEN doc_id % 23 = 0 THEN '\nthat bastard broke the build.' ELSE '' END
          |) AS page""".stripMargin)
  }

  private def pageViewCte: String =
    """based AS (
      |  SELECT d.doc_id, coalesce(t.text, d.text) AS text
      |  FROM documents d
      |  LEFT JOIN documents t
      |    ON t.doc_id = d.doc_id - (d.doc_id % 11)
      |   AND (d.doc_id % 11 = 1 OR d.doc_id % 11 = 2)
      |), pages AS (
      |  SELECT doc_id,
      |    concat(
      |      (SELECT string_agg(
      |         concat(parts[i],
      |           CASE WHEN (i - 1) % 7 = 3 AND (i - 1) >= 35 THEN ' of' ELSE '' END,
      |           CASE WHEN (i - 1) % 7 = 6 THEN '.' ELSE '' END,
      |           CASE WHEN i = len(parts) THEN ''
      |                WHEN (i - 1) % 21 = 20 THEN chr(10) ELSE ' ' END), '' ORDER BY i)
      |       FROM unnest(generate_series(1, len(parts))) AS g(i)),
      |      CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'enable javascript to continue.' ELSE '' END,
      |      CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END,
      |      CASE WHEN doc_id % 19 = 0 THEN chr(10) || 'config { display none }.' ELSE '' END,
      |      CASE WHEN doc_id % 23 = 0 THEN chr(10) || 'that bastard broke the build.' ELSE '' END
      |    ) AS page
      |  FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM based)
      |)""".stripMargin

  /** Line + page rules over a (doc_id, page) frame. Columns:
    * total_lines, kept_lines, n_sentences, page_keep, clean_text. */
  def cleanPages(pages: DataFrame): DataFrame = {
    val lines = pages
      .select(col("doc_id"), col("page"), posexplode(split(col("page"), "\n")).as(Seq("lidx", "line")))
    val kept = lines.withColumn("line_keep",
      TerminalPunct.map(p => col("line").endsWith(p)).reduce(_ || _) &&
        size(split(trim(col("line")), " +")) >= 3 &&
        !lower(col("line")).contains("javascript"))
    val block = BlockWords.mkString("\\b(", "|", ")\\b")
    kept.groupBy("doc_id", "page")
      .agg(count(lit(1)).as("total_lines"),
        sum(when(col("line_keep"), 1L).otherwise(0L)).as("kept_lines"),
        // rebuild from kept lines in original order
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN line_keep THEN struct(lidx, line) END)), x -> x.line)"),
          "\n").as("clean_text"))
      .withColumn("n_sentences",
        size(expr("regexp_extract_all(replace(clean_text, '\n', ' '), '[^.!?]+[.!?]+', 0)")))
      .withColumn("page_keep",
        col("n_sentences") >= 5 &&
          !lower(col("page")).contains("lorem ipsum") &&
          !col("page").contains("{") &&
          !lower(col("page")).rlike(block))
      .select("doc_id", "total_lines", "kept_lines", "n_sentences", "page_keep", "clean_text")
  }

  /** q_c4_clean: the line/page rule output per doc. */
  def clean(spark: SparkSession, dir: String): DataFrame =
    cleanPages(pageView(spark, dir))

  def cleanOracle: String =
    s"""WITH $pageViewCte, lines AS (
       |  SELECT doc_id, page, CAST(g.i - 1 AS INT) AS lidx, ls[g.i] AS line
       |  FROM (SELECT doc_id, page, string_split(page, chr(10)) AS ls FROM pages),
       |       LATERAL unnest(generate_series(1, len(ls))) AS g(i)
       |), marked AS (
       |  SELECT doc_id, page, lidx, line,
       |    (right(line, 1) IN ('.', '!', '?', '"')
       |     AND len(regexp_split_to_array(trim(line), ' +')) >= 3
       |     AND NOT contains(lower(line), 'javascript')) AS line_keep
       |  FROM lines
       |), rebuilt AS (
       |  SELECT doc_id, any_value(page) AS page,
       |    CAST(count(*) AS BIGINT) AS total_lines,
       |    CAST(sum(CASE WHEN line_keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
       |    coalesce(string_agg(CASE WHEN line_keep THEN line END, chr(10) ORDER BY lidx), '') AS clean_text
       |  FROM marked GROUP BY doc_id
       |)
       |SELECT doc_id, total_lines, kept_lines,
       |  CAST(len(regexp_extract_all(replace(clean_text, chr(10), ' '), '[^.!?]+[.!?]+')) AS INT) AS n_sentences,
       |  (len(regexp_extract_all(replace(clean_text, chr(10), ' '), '[^.!?]+[.!?]+')) >= 5
       |   AND NOT contains(lower(page), 'lorem ipsum')
       |   AND NOT contains(page, '{')
       |   AND NOT regexp_matches(lower(page), '\\b(${BlockWords.mkString("|")})\\b')) AS page_keep,
       |  clean_text
       |FROM rebuilt""".stripMargin

  /** q_c4_span_dedup: corpus-wide three-sentence-span dedup over pages
    * that survive the line/page rules. First occurrence of a span =
    * lowest (doc_id, sidx); every sentence of a later occurrence is
    * removed. Output per kept page: sentence counts + rebuilt text. */
  def spanDedup(spark: SparkSession, dir: String): DataFrame = {
    // the surviving-page frame feeds BOTH the sentence explode chain and
    // the final left join (and the explode chain reads it twice more:
    // spans + keptSents) — materialize the slim per-doc frame once per
    // invocation instead of re-running the pageView self-join + line
    // aggregation per consumer (3 re-derivations in the r6 plan)
    val pages = cleanPages(pageView(spark, dir)).filter(col("page_keep"))
      .select("doc_id", "n_sentences", "clean_text")
      .localCheckpoint()
    val sents = pages.select(col("doc_id"),
        posexplode(expr(
          "transform(regexp_extract_all(replace(clean_text, '\n', ' '), '[^.!?]+[.!?]+', 0), x -> trim(x))"))
          .as(Seq("sidx", "sent")))
    val byDoc = Window.partitionBy("doc_id").orderBy("sidx")
    val spans = sents
      .withColumn("s2", lead("sent", 1).over(byDoc))
      .withColumn("s3", lead("sent", 2).over(byDoc))
      .filter(col("s3").isNotNull)
      .withColumn("span", concat_ws(" ", col("sent"), col("s2"), col("s3")))
    // global first-occurrence: ONE shuffle keyed by span text
    val firstWin = Window.partitionBy("span").orderBy("doc_id", "sidx")
    val dropIdx = spans.withColumn("rn", row_number().over(firstWin))
      .filter(col("rn") > 1)
      .select(col("doc_id"), explode(sequence(col("sidx"), col("sidx") + 2)).as("sidx"))
      .distinct()
    val keptSents = sents.join(dropIdx, Seq("doc_id", "sidx"), "left_anti")
    val rebuilt = keptSents.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(sidx, sent))), x -> x.sent)"),
          " ").as("dedup_text"))
    pages.select("doc_id", "n_sentences")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sentences").cast("long").as("n_sentences"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"))
  }

  // ---- Gopher DOCUMENT-quality rules (Rae'21 A1.1, the non-repetition
  // half; GopherQuality covers the repetition half). All published
  // thresholds; every rule is a map-side expression over the page view
  // (no shuffle at all — the whole operator is scan → project).

  /** Published Gopher doc-filter thresholds (Rae'21 A1.1). */
  val MinWords = 50
  val MaxWords = 100000
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MaxSymbolRatio = 0.1
  val MaxBulletFrac = 0.9
  val MaxEllipsisFrac = 0.3
  val MinAlphaFrac = 0.8
  /** The paper's stop-word list; a doc must contain >= 2 of them. */
  val GopherStops: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** q_gopher_doc: all 7 published document-level rules + keep flag.
    * On this corpus the bullet/ellipsis/symbol rules pass trivially
    * (the vocabulary has no such characters) — they are pinned on real
    * text by C4QualitySpec; word-count and stop-word rules genuinely
    * split the corpus (docs shorter than 50 tokens fail; only pages
    * whose marker lines carry a second distinct stop word pass the
    * stop-word rule). */
  def gopherDoc(spark: SparkSession, dir: String): DataFrame =
    gopherDocPages(pageView(spark, dir))

  /** The rule computation over any (doc_id, page) frame (spec entry). */
  def gopherDocPages(pages: DataFrame): DataFrame = {
    val stops = GopherStops.map(s => s"'$s'").mkString("array(", ",", ")")
    pages.selectExpr("doc_id",
        "filter(split(replace(page, '\n', ' '), ' +'), w -> w != '') AS ws",
        "split(page, '\n') AS ls",
        "page")
      .selectExpr("doc_id",
        "size(ws) AS n_words",
        "round(aggregate(ws, 0, (a, w) -> a + length(w)) / CAST(size(ws) AS DOUBLE), 6) AS mean_word_len",
        "round((length(page) - length(replace(page, '#', '')) + (length(page) - length(replace(page, '...', ''))) div 3) / CAST(size(ws) AS DOUBLE), 6) AS symbol_ratio",
        "round(size(filter(ls, l -> ltrim(l) LIKE '•%' OR ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%')) / CAST(size(ls) AS DOUBLE), 6) AS bullet_frac",
        "round(size(filter(ls, l -> l LIKE '%...' OR l LIKE '%…')) / CAST(size(ls) AS DOUBLE), 6) AS ellipsis_frac",
        "round(size(filter(ws, w -> w RLIKE '[A-Za-z]')) / CAST(size(ws) AS DOUBLE), 6) AS alpha_frac",
        s"size(array_intersect(array_distinct(transform(ws, w -> lower(w))), $stops)) AS stop_hits")
      .withColumn("gopher_doc_keep",
        col("n_words").between(MinWords, MaxWords) &&
          col("mean_word_len").between(MinMeanWordLen, MaxMeanWordLen) &&
          col("symbol_ratio") <= MaxSymbolRatio &&
          col("bullet_frac") <= MaxBulletFrac &&
          col("ellipsis_frac") <= MaxEllipsisFrac &&
          col("alpha_frac") >= MinAlphaFrac &&
          col("stop_hits") >= 2)
  }

  def gopherDocOracle: String = {
    val stops = GopherStops.map(s => s"'$s'").mkString("[", ",", "]")
    s"""WITH $pageViewCte, feats AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(replace(page, chr(10), ' '), ' +'), w -> w != '') AS ws,
       |    string_split(page, chr(10)) AS ls,
       |    page
       |  FROM pages
       |), m AS (
       |  SELECT doc_id,
       |    CAST(len(ws) AS INT) AS n_words,
       |    round(list_sum(list_transform(ws, w -> len(w))) / CAST(len(ws) AS DOUBLE), 6) AS mean_word_len,
       |    round((len(page) - len(replace(page, '#', ''))
       |           + (len(page) - len(replace(page, '...', ''))) // 3) / CAST(len(ws) AS DOUBLE), 6) AS symbol_ratio,
       |    round(len(list_filter(ls, l -> ltrim(l) LIKE '•%' OR ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%')) / CAST(len(ls) AS DOUBLE), 6) AS bullet_frac,
       |    round(len(list_filter(ls, l -> l LIKE '%...' OR l LIKE '%…')) / CAST(len(ls) AS DOUBLE), 6) AS ellipsis_frac,
       |    round(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) / CAST(len(ws) AS DOUBLE), 6) AS alpha_frac,
       |    CAST(len(list_intersect(list_distinct(list_transform(ws, w -> lower(w))), $stops)) AS INT) AS stop_hits
       |  FROM feats
       |)
       |SELECT *,
       |  (n_words BETWEEN $MinWords AND $MaxWords
       |   AND mean_word_len BETWEEN $MinMeanWordLen AND $MaxMeanWordLen
       |   AND symbol_ratio <= $MaxSymbolRatio
       |   AND bullet_frac <= $MaxBulletFrac
       |   AND ellipsis_frac <= $MaxEllipsisFrac
       |   AND alpha_frac >= $MinAlphaFrac
       |   AND stop_hits >= 2) AS gopher_doc_keep
       |FROM m""".stripMargin
  }

  def spanDedupOracle: String =
    s"""WITH c4 AS (
       |$cleanOracle
       |), keptpages AS (
       |  SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences, clean_text
       |  FROM c4 WHERE page_keep
       |), sents AS (
       |  SELECT doc_id, CAST(g.i - 1 AS INT) AS sidx, trim(ss[g.i]) AS sent
       |  FROM (SELECT doc_id,
       |          regexp_extract_all(replace(clean_text, chr(10), ' '), '[^.!?]+[.!?]+') AS ss
       |        FROM keptpages),
       |       LATERAL unnest(generate_series(1, len(ss))) AS g(i)
       |), spans AS (
       |  SELECT doc_id, sidx,
       |    concat_ws(' ', sent,
       |      lead(sent, 1) OVER (PARTITION BY doc_id ORDER BY sidx),
       |      lead(sent, 2) OVER (PARTITION BY doc_id ORDER BY sidx)) AS span,
       |    lead(sent, 2) OVER (PARTITION BY doc_id ORDER BY sidx) AS s3
       |  FROM sents
       |), dups AS (
       |  SELECT doc_id, sidx FROM (
       |    SELECT doc_id, sidx,
       |      row_number() OVER (PARTITION BY span ORDER BY doc_id, sidx) AS rn
       |    FROM spans WHERE s3 IS NOT NULL)
       |  WHERE rn > 1
       |), dropidx AS (
       |  SELECT DISTINCT d.doc_id, CAST(d.sidx + g.o AS INT) AS sidx
       |  FROM dups d, LATERAL unnest(generate_series(0, 2)) AS g(o)
       |), kept AS (
       |  SELECT s.doc_id, s.sidx, s.sent
       |  FROM sents s LEFT JOIN dropidx x
       |    ON x.doc_id = s.doc_id AND x.sidx = s.sidx
       |  WHERE x.doc_id IS NULL
       |), rebuilt AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |    string_agg(sent, ' ' ORDER BY sidx) AS dedup_text
       |  FROM kept GROUP BY doc_id
       |)
       |SELECT p.doc_id, p.n_sentences,
       |  coalesce(r.n_kept, 0) AS n_kept,
       |  coalesce(r.dedup_text, '') AS dedup_text
       |FROM keptpages p LEFT JOIN rebuilt r ON r.doc_id = p.doc_id""".stripMargin
}
