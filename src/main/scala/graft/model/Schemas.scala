package graft.model

import java.sql.Timestamp

/** One transcript turn — the engine's input row
  * (BASELINE.json input_hint schema). */
case class Turn(
  conv_id: String,
  turn_idx: Int,
  role: String,
  text: String,
  tool: String,
  ts: Timestamp
)

/** One PII rule hit (reference: pii_detector.py:11-17 `PIIMatch`). */
case class PiiMatch(
  `type`: String,
  value: String,
  confidence: Double
)

/** Parsed LLM findings (reference: llm_detector.py:20-27 prompt contract;
  * loose/dynamic parts land in `error`). */
case class LlmFindings(
  has_pii: Boolean,
  confidence: Double,
  details: Seq[String],
  reasoning: String,
  risk_factors: Seq[String],
  error: Option[String]
)

/** Per-turn verdict — the engine's widest output row (reference:
  * utils/analysis.py:5-19 `AnalysisResult` + our keep/scrub columns).
  * `skipped` marks rows the reference never analyzes (F3 guard);
  * lineage = which rules fired, on what substring, at what confidence. */
case class TurnVerdict(
  conv_id: String,
  turn_idx: Int,
  role: String,
  text: String,                 // analysis-ready clean text
  skipped: Boolean,
  sentiment_score: Double,
  sentiment_label: String,
  pii_risk_score: Double,
  pii_matches: Seq[PiiMatch],
  keep: Boolean,
  scrubbed_text: String
)
