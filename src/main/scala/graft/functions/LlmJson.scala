package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * X9: LLM JSON response parsing (llm_detector.py:102-139) as a column
 * chain:
 *  1. strip everything up to the first `</think>` (thinking models);
 *  2. try a direct JSON parse;
 *  3. fall back to the ```json fenced block;
 *  4. normalize: confidence default 0, has_pii default false; a
 *     no-PII verdict is rewritten to the canonical zeroed record
 *     (llm_detector.py:129-139); unparseable → error record.
 */
object LlmJson {

  /** Prompt contract fields (llm_detector.py:20-27): details are
    * {type, example} objects (X11 renders them "type: example"). */
  val findingsSchema: StructType = StructType(Seq(
    StructField("has_pii", BooleanType),
    StructField("confidence", DoubleType),
    StructField("details", ArrayType(StructType(Seq(
      StructField("type", StringType), StructField("example", StringType))))),
    StructField("reasoning", StringType),
    StructField("risk_factors", ArrayType(StringType))
  ))

  /** Step 1: Python `raw.split("</think>")[1]` — the segment BETWEEN the
    * first and second marker (rest of string when there is only one);
    * whole text if the marker is absent. */
  def stripThink(raw: Column): Column = {
    val afterFirst = raw.substr(locate("</think>", raw) + 8, length(raw))
    when(raw.contains("</think>"),
      substring_index(afterFirst, "</think>", 1))
      .otherwise(raw)
  }

  /** Steps 1-3: parsed struct or null. The fenced fallback mirrors
    * `split("```json")[1].split("```")[0].strip()` — an UNTERMINATED
    * fence (common LLM truncation) still parses (substring_index returns
    * the remainder when the closing fence is absent). */
  def parse(raw: Column): Column = {
    val stripped = stripThink(raw)
    val direct = from_json(stripped, findingsSchema)
    val afterFence = stripped.substr(locate("```json", stripped) + 7, length(stripped))
    val fencedBody = when(stripped.contains("```json"),
      trim(substring_index(afterFence, "```", 1))).otherwise(lit(null))
    val fenced = from_json(fencedBody, findingsSchema)
    // from_json(PERMISSIVE) yields an all-null struct on garbage — treat
    // a null has_pii AND null confidence as a failed parse
    val ok: Column => Column = s =>
      s.isNotNull && (s.getField("has_pii").isNotNull || s.getField("confidence").isNotNull)
    when(ok(direct), direct).when(ok(fenced), fenced).otherwise(lit(null).cast(findingsSchema))
  }

  /** Full normalization → (llm_risk_score, findings, error) columns. */
  def verdictColumns(raw: Column): (Column, Column, Column) = {
    val p = parse(raw)
    val conf = coalesce(p.getField("confidence"), lit(0.0))
    val hasPii = coalesce(p.getField("has_pii"), lit(false))
    val risk = when(p.isNull, lit(0.0)).when(hasPii, conf).otherwise(lit(0.0))
    // llm_detector.py:133-139 rewrites details/risk_factors to EMPTY
    // lists (not null) for a no-PII verdict
    val canonicalNoPii = struct(
      lit(false).as("has_pii"), lit(0.0).as("confidence"),
      array().cast(findingsSchema("details").dataType).as("details"),
      lit("No PII detected").as("reasoning"),
      array().cast(ArrayType(StringType)).as("risk_factors"))
    val findings = when(p.isNull, lit(null).cast(findingsSchema))
      .when(hasPii, p).otherwise(canonicalNoPii)
    val error = when(p.isNull, lit("LLM response parsing failed")).otherwise(lit(null))
    (risk, findings, error)
  }

  /** X11 (utils/report.py:66-74): detail → "type: example", newlines →
    * spaces. */
  def formatDetail(detail: Column): Column =
    regexp_replace(
      concat_ws(": ",
        coalesce(detail.getField("type"), lit("Finding")),
        coalesce(detail.getField("example"), lit("N/A"))),
      "\n", " ")
}
