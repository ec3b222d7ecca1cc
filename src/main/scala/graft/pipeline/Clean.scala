package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.rules.PiiRules

/**
 * Text normalization, reproducing the reference's exact cleaning order:
 *
 *  1. whitespace collapse + trim  — `body.rstrip()` then
 *     `" ".join(text.split())` (api/scraper.py:56-57)
 *  2. literal `&amp;#x200B;` removal (api/scraper.py:58) — AFTER the
 *     collapse, so a surviving double-space is faithful to the reference
 *  3. HTML tag strip `<.*?>` at analysis time (sentiment.py:189,205) —
 *     applied last, again without re-collapsing whitespace
 *
 * All three are single codegen'd `RegExpReplace`/`StringTrim` expressions;
 * patterns are foldable literals so the compiled `Pattern` is cached in
 * generated code.
 */
object Clean {

  /** Python str.split()'s whitespace set — the reference's collapse
    * (api/scraper.py:57) splits on UNICODE whitespace, not just ASCII
    * \s: adds VT, FS..US, NEL, NBSP, ogham, en/em/etc spaces, LS, PS,
    * NNBSP, MMSP, ideographic space. The `\x{hhhh}` class syntax parses
    * identically in Java regex (Spark) and RE2 (DuckDB oracle). */
  val PyWhitespaceClass: String =
    """[\s\x0b\x1c-\x1f\x{0085}\x{00a0}\x{1680}\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]"""

  /** Steps 1-2: the scrape-time normalization. The collapse+trim runs as
    * a single-pass character scan ([[graft.functions.PyText]]): Java
    * regex pays a 7-10x penalty for a unicode-whitespace class, and this
    * is the hottest expression in the engine. The DuckDB oracle keeps
    * the equivalent RE2 class ([[PyWhitespaceClass]]). */
  def scrapeClean(raw: Column): Column =
    regexp_replace(
      graft.functions.PyText.collapseTrimCol(raw),
      "&amp;#x200B;", "")

  /** Step 3: analysis-time HTML strip (non-greedy, single pass). */
  def stripHtml(text: Column): Column =
    regexp_replace(text, "<.*?>", "")

  /** Same result, guarded by a cheap contains('<'): regexp_replace is a
    * full regex scan per row; most chat text has no tags. */
  def stripHtmlFast(text: Column): Column =
    when(text.contains("<"), regexp_replace(text, "<.*?>", "")).otherwise(text)

  /** Full chain raw → analysis-ready text. */
  def cleanText(raw: Column): Column = stripHtml(scrapeClean(raw))

  /** F1: drop rows whose scrape-cleaned text is empty (api/scraper.py:59). */
  def nonEmpty(clean: Column): Column = clean =!= ""

  /** F3 skip guard (sentiment.py:208-211): case-SENSITIVE substring —
    * rows already containing the redaction marker are skipped before any
    * analysis (idempotence). */
  def isSkipped(clean: Column, skipText: String = PiiRules.RedactionMessage): Column =
    clean.contains(lit(skipText))

  /** F2 text_match filter (api/reddit.py:394-402): case-INSENSITIVE
    * substring keep-filter. */
  def textMatch(text: Column, query: String): Column =
    lower(text).contains(lit(query.toLowerCase))
}
