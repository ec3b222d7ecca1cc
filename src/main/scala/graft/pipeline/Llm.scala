package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, StringType}
import graft.rules.PiiRules

/**
 * Optional LLM PII stage (SURVEY.md §2.7 J1, §2.4 X7/X9): the reference
 * buffers 10 texts and fires concurrent chat-completion calls
 * (sentiment.py:246-275, llm_detector.py:56-100), then zips results back
 * POSITIONALLY. Here the detector runs in ONE `mapPartitions` pass over
 * the verdict frame — all verdict columns are carried through, so there
 * is no second pipeline execution and no rejoin shuffle (round 1 derived
 * the LLM frame from the verdict and equi-joined it back, running the
 * whole clean→PII chain twice). The keyed-join variant
 * [[Llm.joinPrecomputed]] remains for genuinely precomputed verdict
 * tables (e.g. an earlier run's output).
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

    /** PII-obscuring rewrite suggestions (reference llm_detector.py:
      * 186-253 `suggest_replacement`, temperature 0.7): called only for
      * texts the analyze pass flagged has_pii. */
    def suggestBatch(texts: Seq[String]): Seq[String]
  }

  /** Deterministic stand-in for the chat-completion endpoint:
    * has_pii iff the text contains '@'; confidence is an md5-derived
    * value in [0, 0.99]; the rewrite suggestion is an md5-tagged
    * placeholder. All three are SQL-expressible for the oracle. */
  object StubDetector extends LlmDetector {
    private def md5hex(t: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(t.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    }
    def analyzeBatch(texts: Seq[String]): Seq[(Boolean, Double, String)] =
      texts.map { t =>
        val conf = (java.lang.Integer.parseInt(md5hex(t).take(4), 16) % 100) / 100.0
        val hasPii = t.contains("@")
        (hasPii, if (hasPii) conf else 0.0,
          if (hasPii) "detected handle/email-like token" else "No PII detected")
      }
    def suggestBatch(texts: Seq[String]): Seq[String] =
      texts.map(t => s"[rewritten:${md5hex(t).take(8)}]")
  }

  val BatchSize = 10

  /** LLM verdicts alone, keyed by (conv_id, turn_idx) — the shape a
    * PRECOMPUTED verdict table would arrive in. */
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

  /** Verdict frame + llm_has_pii / llm_confidence / llm_reasoning /
    * llm_suggestion, computed in one executor-side pass: per partition,
    * non-skipped texts are micro-batched ([[BatchSize]]) through the
    * detector; rows flagged has_pii additionally get a rewrite
    * suggestion. Skipped rows pass through with the null verdict. */
  private def withDetector(v: DataFrame, detector: LlmDetector): DataFrame = {
    val base = v.schema
    val schema = base
      .add("llm_has_pii", BooleanType, nullable = false)
      .add("llm_confidence", DoubleType, nullable = false)
      .add("llm_reasoning", StringType, nullable = true)
      .add("llm_suggestion", StringType, nullable = true)
    val skippedIdx = base.fieldIndex("skipped")
    val cleanIdx = base.fieldIndex("clean_text")
    v.mapPartitions { it =>
      // batch on the NON-SKIPPED count (the reference buffers 10 analyzable
      // texts — llm_detector.py:56-100): each group carries exactly
      // BatchSize texts for the detector (last group fewer), with skipped
      // rows interleaved in input order so row order is preserved
      val batches: Iterator[Seq[Row]] = new Iterator[Seq[Row]] {
        def hasNext: Boolean = it.hasNext
        def next(): Seq[Row] = {
          val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
          var n = 0
          while (it.hasNext && n < BatchSize) {
            val r = it.next(); buf += r
            if (!r.getBoolean(skippedIdx)) n += 1
          }
          buf.toSeq
        }
      }
      batches.flatMap { rows =>
        val toAnalyze = rows.filter(r => !r.getBoolean(skippedIdx))
        val analyzed = detector.analyzeBatch(toAnalyze.map(_.getString(cleanIdx)))
        val flagged = toAnalyze.zip(analyzed).collect {
          case (r, (true, _, _)) => r.getString(cleanIdx)
        }
        val suggestions = detector.suggestBatch(flagged).iterator
        val results = analyzed.iterator
        rows.map { r =>
          if (r.getBoolean(skippedIdx))
            Row.fromSeq(r.toSeq ++ Seq(false, 0.0, null, null))
          else {
            val (h, conf, why) = results.next()
            val sug = if (h) suggestions.next() else null
            Row.fromSeq(r.toSeq ++ Seq(h, conf, why, sug))
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** X7 + F5 merge columns over a frame that already carries the llm_*
    * verdict columns:
    *  - X7 (sentiment.py:262-266): pii_risk = max(pattern risk, llm
    *    confidence) when llm.has_pii;
    *  - llm_risk (llm_detector.py:129-132): confidence if has_pii else 0;
    *  - F5 (results.py:170-175): drop iff risk > 0.5 OR llm.has_pii.
    * Skipped rows keep their pass-through verdict. */
  private def merge(withLlmCols: DataFrame): DataFrame =
    withLlmCols
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

  /** Full merged pipeline, fused single-pass (no join, no second
    * pipeline execution). */
  def withLlm(spark: SparkSession, transcripts: DataFrame,
              detector: LlmDetector = StubDetector): DataFrame =
    merge(withDetector(Verdict(transcripts), detector))

  /** Join variant for a genuinely PRECOMPUTED llm-verdict table (keyed
    * by conv_id/turn_idx — the scale rendering of the reference's
    * positional zip). Semantics identical to [[withLlm]]. */
  def joinPrecomputed(verdict: DataFrame, llm: DataFrame): DataFrame =
    merge(verdict.join(
        llm.withColumnRenamed("has_pii", "llm_has_pii")
          .withColumnRenamed("confidence", "llm_confidence")
          .withColumnRenamed("reasoning", "llm_reasoning"),
        Seq("conv_id", "turn_idx"), "left")
      .withColumn("llm_has_pii", coalesce(col("llm_has_pii"), lit(false)))
      .withColumn("llm_confidence", coalesce(col("llm_confidence"), lit(0.0))))

  /** X-rewrite surface: scrub by LLM suggestion — rows the llm flagged
    * get the model's rewrite, everything else passes through clean. */
  def rewritten(spark: SparkSession, transcripts: DataFrame,
                detector: LlmDetector = StubDetector): DataFrame =
    withLlm(spark, transcripts, detector)
      .withColumn("rewritten_text",
        when(col("llm_has_pii"), col("llm_suggestion")).otherwise(col("clean_text")))
}
