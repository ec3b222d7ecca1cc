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

  /** Step 1: text after the first `</think>` (whole text if absent). */
  def stripThink(raw: Column): Column =
    when(raw.contains("</think>"),
      raw.substr(locate("</think>", raw) + 8, length(raw)))
      .otherwise(raw)

  /** Steps 1-3: parsed struct or null. */
  def parse(raw: Column): Column = {
    val stripped = stripThink(raw)
    val direct = from_json(stripped, findingsSchema)
    val fenced = from_json(
      regexp_extract(stripped, "(?s)```json(.*?)```", 1), findingsSchema)
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
    val canonicalNoPii = struct(
      lit(false).as("has_pii"), lit(0.0).as("confidence"),
      lit(null).cast(findingsSchema("details").dataType).as("details"),
      lit("No PII detected").as("reasoning"),
      lit(null).cast(ArrayType(StringType)).as("risk_factors"))
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
