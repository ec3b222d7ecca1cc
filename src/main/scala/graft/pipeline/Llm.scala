package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rules.PiiRules

/**
 * Optional LLM PII stage (SURVEY.md §2.7 J1, §2.4 X7/X9): the reference
 * buffers 10 texts and fires concurrent chat-completion calls
 * (sentiment.py:246-275, llm_detector.py:56-100), then zips results back
 * POSITIONALLY. At scale the positional zip becomes a key join: we carry
 * (conv_id, turn_idx) through an executor-side `mapPartitions`
 * micro-batcher and equi-join the verdicts back.
 *
 * The detector is a trait so a real OpenAI-compatible client can slot
 * in behind the same micro-batch loop; this sandbox has no egress, so
 * [[Llm.StubDetector]] is a deterministic md5-keyed fake whose decisions
 * are also SQL-expressible — giving the whole merged keep/drop path
 * (pattern risk OR llm has_pii) an exact DuckDB oracle.
 */
object Llm {

  case class LlmVerdict(conv_id: String, turn_idx: Int,
                        has_pii: Boolean, confidence: Double, reasoning: String)

  trait LlmDetector extends Serializable {
    /** Analyze one micro-batch (reference batch_size = 10). */
    def analyzeBatch(texts: Seq[String]): Seq[(Boolean, Double, String)]
  }

  /** Deterministic stand-in for the chat-completion endpoint:
    * has_pii iff the text contains '@'; confidence is an md5-derived
    * value in [0, 0.99]. */
  object StubDetector extends LlmDetector {
    def analyzeBatch(texts: Seq[String]): Seq[(Boolean, Double, String)] =
      texts.map { t =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(t.getBytes("UTF-8")).take(2)
          .map(b => f"${b & 0xff}%02x").mkString
        val conf = (java.lang.Integer.parseInt(hex, 16) % 100) / 100.0
        val hasPii = t.contains("@")
        (hasPii, if (hasPii) conf else 0.0,
          if (hasPii) "detected handle/email-like token" else "No PII detected")
      }
  }

  val BatchSize = 10

  /** LLM verdicts for the non-skipped rows of a verdict table, computed
    * in executor-side micro-batches of [[BatchSize]]. */
  def llmVerdicts(spark: SparkSession, verdict: DataFrame,
                  detector: LlmDetector = StubDetector): DataFrame = {
    import spark.implicits._
    verdict.filter(!col("skipped"))
      .select("conv_id", "turn_idx", "clean_text")
      .as[(String, Int, String)]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          val res = detector.analyzeBatch(batch.map(_._3))
          batch.zip(res).map { case ((c, t, _), (h, conf, why)) =>
            LlmVerdict(c, t, h, conf, why)
          }
        }
      }.toDF()
  }

  /**
   * Full merged pipeline: pattern verdict ⟕ llm verdict, then
   *  - X7 (sentiment.py:262-266): pii_risk = max(pattern risk, llm
   *    confidence) when llm.has_pii;
   *  - llm_risk (llm_detector.py:129-132): confidence if has_pii else 0;
   *  - F5 (results.py:170-175): drop iff risk > 0.5 OR llm.has_pii.
   * Skipped rows keep their pass-through verdict (left join; nulls off).
   */
  def withLlm(spark: SparkSession, transcripts: DataFrame,
              detector: LlmDetector = StubDetector): DataFrame = {
    val v = Verdict(transcripts)
    val l = llmVerdicts(spark, v, detector)
      .withColumnRenamed("has_pii", "llm_has_pii")
      .withColumnRenamed("confidence", "llm_confidence")
      .withColumnRenamed("reasoning", "llm_reasoning")
    v.join(l, Seq("conv_id", "turn_idx"), "left")
      .withColumn("llm_has_pii", coalesce(col("llm_has_pii"), lit(false)))
      .withColumn("llm_confidence", coalesce(col("llm_confidence"), lit(0.0)))
      .withColumn("llm_risk_score",
        when(col("llm_has_pii"), col("llm_confidence")).otherwise(lit(0.0)))
      .withColumn("pii_risk_merged",
        when(col("llm_has_pii"), greatest(col("pii_risk_score"), col("llm_risk_score")))
          .otherwise(col("pii_risk_score")))
      .withColumn("keep",
        col("skipped") ||
          !(col("pii_risk_merged") > PiiRules.DropThreshold || col("llm_has_pii")))
      .withColumn("scrubbed_text",
        when(col("keep"), col("clean_text")).otherwise(lit(PiiRules.RedactionMessage)))
  }
}
