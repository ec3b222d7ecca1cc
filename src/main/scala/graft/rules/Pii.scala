package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Catalyst-column implementation of the reference's PII analysis
 * (reddacted/pii_detector.py:67-134), built entirely from codegen'd
 * built-ins (`regexp_extract_all`, `rlike`, `transform`, `aggregate`,
 * `when`) so the whole scan stays inside WholeStageCodegen and Catalyst
 * can push surrounding filters/projections freely.
 *
 * This is the semantic baseline (and the DuckDB-oracle-comparable path);
 * [[graft.functions.PiiScanExpr]] is the fused single-pass perf variant.
 */
object Pii {

  val piiMatchType: StructType = StructType(Seq(
    StructField("type", StringType, nullable = false),
    StructField("value", StringType, nullable = true),
    StructField("confidence", DoubleType, nullable = false)
  ))

  /** `\b<kw>\b` context-keyword hit anywhere in text ⇒ +0.15 boost
    * (pii_detector.py:94-105). */
  def hasContextBoost(text: Column): Column =
    text.rlike(PiiRules.ContextKeywordRegex)

  /** False-positive gate: any of the 4 patterns ⇒ the text yields zero
    * matches (pii_detector.py:75-77). */
  def fpGate(text: Column): Column =
    text.rlike(PiiRules.FalsePositiveRegex)

  /** All matches of one PII type, in positional order, as
    * array<struct<type,value,confidence>> with the boost already applied
    * (boost is per-text, so it folds into the per-type confidence). */
  private def matchesOfType(text: Column, piiType: String, pattern: String,
                            base: Double, boosted: Column): Column = {
    val conf = when(boosted, least(lit(1.0), lit(base) + lit(PiiRules.ContextBoost)))
      .otherwise(lit(base))
    transform(
      regexp_extract_all(text, lit(PiiRules.ciPattern(pattern)), lit(0)),
      v => struct(lit(piiType).as("type"), v.as("value"), conf.as("confidence"))
    )
  }

  /**
   * `analyze_text` (pii_detector.py:67-107): FP gate, then per-type
   * finditer in the reference's dict order, then context boost.
   * Returns array<struct<type,value,confidence>> in type-major,
   * position-minor order — identical to the reference's match list.
   *
   * The reference's per-type validations (phone length / address token,
   * pii_detector.py:85-90) are provably unsatisfiable-to-fail given the
   * patterns (see PiiRules scaladoc) and so are omitted from this
   * column chain; the fused expression implements them literally.
   */
  def piiMatches(text: Column): Column =
    piiMatchesBoosted(text, hasContextBoost(text))

  /** Same scan with an externally supplied boost condition — used by the
    * conversation layer's cross-turn boost (keyword in turn t-1 also
    * boosts turn t). */
  def piiMatchesBoosted(text: Column, boosted: Column): Column = {
    val all = concat(PiiRules.Patterns.map { case (t, p, c) =>
      matchesOfType(text, t, p, c, boosted)
    }: _*)
    when(fpGate(text), array().cast(ArrayType(piiMatchType))).otherwise(all)
  }

  /**
   * `get_pii_risk_score` (pii_detector.py:110-134): weighted mean of
   * match confidences with type weights, capped at 1.0; empty ⇒ 0.0.
   * The fold runs in match-array order, preserving the reference's
   * IEEE-754 addition order for bit-exact scores.
   */
  def piiRiskScore(matches: Column): Column = {
    val weightOf: Column => Column = t => {
      // unknown types weigh 1.0 (dict .get default) — unreachable for our
      // fixed type set but kept for fidelity
      PiiRules.TypeWeights.foldLeft(lit(1.0)) { case (acc, (name, w)) =>
        when(t === lit(name), lit(w)).otherwise(acc)
      }
    }
    val totalWeight = aggregate(matches, lit(0.0),
      (acc, m) => acc + weightOf(m.getField("type")))
    val weightedSum = aggregate(matches, lit(0.0),
      (acc, m) => acc + m.getField("confidence") * weightOf(m.getField("type")))
    when(size(matches) === 0, lit(0.0))
      .otherwise(least(lit(1.0), weightedSum / totalWeight))
  }
}
