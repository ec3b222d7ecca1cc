package graft.rules

/**
 * PII rule constants, re-expressed character-for-character from the
 * reference's rule set (reddacted/pii_detector.py:24-57,120-127).
 *
 * Patterns carry an explicit `(?i)` prefix because the reference compiles
 * every pattern with `re.IGNORECASE` (pii_detector.py:59-65). The `(?i)`
 * form is portable across Java regex (Spark) and RE2 (DuckDB oracle).
 *
 * Semantics notes (verified against the reference implementation):
 *  - Under IGNORECASE, `[A-Z][a-z]+` matches words of ANY case, so the
 *    name_pattern greedily absorbs up to two following words regardless of
 *    capitalization ("Dr. John Smith will").
 *  - The 4th false-positive pattern `\b\d+[km]?b?\b` matches ANY standalone
 *    digit run, so any text containing a bare number (including the digits
 *    of a phone/ssn/credit-card/address match itself) yields ZERO matches.
 *    This is the reference's actual behavior and we reproduce it exactly.
 *  - The reference's per-type validations (pii_detector.py:85-90) are
 *    provably no-ops: the phone regex requires >= 10 digits, and the
 *    address regex guarantees the second-to-last token is alphabetic.
 *    They are still implemented in the fused scanner for fidelity.
 */
object PiiRules {

  /** (type, pattern, baseConfidence) in the reference's dict insertion
    * order — match-array order is type-major, position-minor, exactly as
    * `analyze_text` builds it (pii_detector.py:80-92). */
  val Patterns: Seq[(String, String, Double)] = Seq(
    ("email", """\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b""", 0.95),
    ("phone", """\b(\+\d{1,2}\s?)?\(?\d{3}\)?[\s.-]?\d{3}[\s.-]?\d{4}\b""", 0.85),
    ("ssn", """\b\d{3}-\d{2}-\d{4}\b""", 0.97),
    ("credit_card", """\b(?:\d{4}[- ]?){3}\d{4}\b""", 0.95),
    ("address",
      """\b\d{2,5}\s+(?:[A-Za-z]+\s)+(?:street|st|avenue|ave|road|rd|boulevard|blvd|lane|ln|drive|dr)\.?\b""",
      0.65),
    ("name_pattern",
      """\b(?:Mr\.|Mrs\.|Ms\.|Dr\.)\s+[A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,2}\b""", 0.7)
  )

  /** Risk-score weights (pii_detector.py:120-127); unknown types weigh 1.0. */
  val TypeWeights: Map[String, Double] = Map(
    "ssn" -> 1.2, "credit_card" -> 1.2, "email" -> 1.0,
    "phone" -> 0.9, "address" -> 0.7, "name_pattern" -> 0.6
  )

  /** Context keywords (pii_detector.py:37-50); each is searched as
    * `\b<kw>\b` case-insensitively; any hit adds +0.15 (cap 1.0). */
  val ContextKeywords: Seq[String] = Seq(
    "name is", "live at", "address", "reach me", "phone", "email",
    "contact", "call me", "ssn", "social security", "credit card",
    "driver license"
  )

  /** False-positive gate (pii_detector.py:52-57): ANY hit ⇒ zero matches. */
  val FalsePositivePatterns: Seq[String] = Seq(
    """\b\d+ (llm|ai|gpu|cpu|ram|mb|gb|ghz|mhz|api)\b""",
    """\b\d+ (times|years|days|hours|minutes|seconds)\b""",
    """\b\d+(?:st|nd|rd|th)\b""",
    """\b\d+[km]?b?\b"""
  )

  val ContextBoost: Double = 0.15

  /** Single alternation equivalent to "any keyword matches" — existence
    * of any `\bkw\b` hit is all the reference tests (pii_detector.py:94-102). */
  val ContextKeywordRegex: String =
    "(?i)\\b(" + ContextKeywords.mkString("|") + ")\\b" // keywords are plain `[a-z ]+`, no escaping needed

  /** Combined FP alternation — existence-only, same as any-of the four. */
  val FalsePositiveRegex: String =
    "(?i)(" + FalsePositivePatterns.mkString("|") + ")"

  def ciPattern(p: String): String = "(?i)" + p

  /** Drop threshold (utils/panels.py:306-311, results.py:170-175). */
  val DropThreshold: Double = 0.5

  /** Standard redaction message (api/reddit.py:291). */
  val RedactionMessage: String =
    "This comment has been reddacted to preserve online privacy - see r/reddacted for more info"
}
