package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.rules.{Pii, PiiRules}

/**
 * Fused single-pass PII scanner (SURVEY.md §4.3 item 3): one Catalyst
 * expression evaluating the reference's whole analyze_text
 * (pii_detector.py:67-107) — FP gate, 6 typed matchers with per-type
 * validation, context boost — against JVM-static precompiled Patterns,
 * instead of the 12+ independent regexp expressions of the column
 * chain. Literal-equivalent output (property-tested against the chain).
 *
 * Perf shape: the column chain evaluates `rlike(fp)` + `rlike(boost)` +
 * 6×`regexp_extract_all` + array HOFs per row — each re-reading the
 * text; this evaluates the gate first (one pass, short-circuit) and
 * touches the matchers only for gated-through rows. The expression
 * codegens to a direct static call ([[PiiScanExpr.doGenCode]]) so the
 * hot loop is one monomorphic JVM call inside whole-stage codegen — no
 * interpreted-eval dispatch, no per-row boxing (BENCH_r01 showed the
 * CodegenFallback form inverting the headline under a cold driver JVM).
 */
object PiiScan {

  private val compiled: Array[(UTF8String, Pattern, Double)] =
    PiiRules.Patterns.map { case (t, p, c) =>
      (UTF8String.fromString(t), Pattern.compile(p,
        Pattern.CASE_INSENSITIVE), c)
    }.toArray

  /** Single alternation ≡ "any of the 4 FP patterns fires" (existence
    * check only — pii_detector.py:75-77). */
  private val fpCompiled: Pattern = Pattern.compile(
    "(" + PiiRules.FalsePositivePatterns.mkString(")|(") + ")", Pattern.CASE_INSENSITIVE)

  /** Context-boost keyword scan: Aho-Corasick over all keywords in one
    * pass (AhoCorasick.Automaton) instead of the compiled
    * `\b(kw1|kw2|…)\b` alternation — semantics proven identical to the
    * regex in PropertySpec (ASCII case fold, `\b` boundaries). */
  private val ctxAutomaton: AhoCorasick.Automaton =
    AhoCorasick.automaton(PiiRules.ContextKeywords.mkString("\u0001"))

  /** Necessary-condition guards — each matcher's pattern makes these
    * provably required, so skipping on their absence cannot change the
    * result (property-tested against the unguarded column chain):
    *  - all 4 FP patterns and the phone/ssn/cc/address matchers need a
    *    digit;
    *  - the email matcher needs '@';
    *  - the name matcher needs an honorific "mr./mrs./ms./dr.". */
  private def hasDigit(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= '0' && s.charAt(i) <= '9') return true; i += 1 }
    false
  }

  private def hasHonorific(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n - 2) {
      val c = s.charAt(i)
      if (c == 'm' || c == 'M' || c == 'd' || c == 'D') {
        // candidates: mr. mrs. ms. dr.
        val c1 = s.charAt(i + 1)
        if ((c == 'd' || c == 'D') && (c1 == 'r' || c1 == 'R') && s.charAt(i + 2) == '.') return true
        if (c == 'm' || c == 'M') {
          if ((c1 == 'r' || c1 == 'R') && s.charAt(i + 2) == '.') return true
          if ((c1 == 's' || c1 == 'S') && s.charAt(i + 2) == '.') return true
          if ((c1 == 'r' || c1 == 'R') && i < n - 3 &&
              (s.charAt(i + 2) == 's' || s.charAt(i + 2) == 'S') && s.charAt(i + 3) == '.') return true
        }
      }
      i += 1
    }
    false
  }

  /** analyze_text fused: returns (type, value, confidence) triples in
    * type-major, position-minor order — identical to Pii.piiMatches.
    * Typical chat text (no digits, no '@', no honorific) runs ZERO
    * regexes here — one character pass decides. */
  def scan(text: String): Array[InternalRow] = {
    val digits = hasDigit(text)
    val at = text.indexOf('@') >= 0
    val honorific = hasHonorific(text)
    if (!at && !honorific && !digits) return Array.empty
    if (digits && fpCompiled.matcher(text).find()) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(UTF8String, String, Double)]
    compiled.foreach { case (t, p, conf) =>
      val typeName = t.toString
      val needed = typeName match {
        case "email" => at
        case "name_pattern" => honorific
        case _ => digits // phone, ssn, credit_card, address all start \b\d
      }
      if (needed) {
        val m = p.matcher(text)
        while (m.find()) {
          val full = m.group(0)
          val valid =
            if (typeName == "phone") full.replace("-", "").replace(" ", "").length >= 10
            else if (typeName == "address") {
              val toks = full.split("\\s+").filter(_.nonEmpty)
              toks.length >= 2 && toks(toks.length - 2).exists(_.isLetter)
            } else true
          if (valid) out += ((t, full, conf))
        }
      }
    }
    if (out.isEmpty) return Array.empty
    val boost = if (ctxAutomaton.any(text)) PiiRules.ContextBoost else 0.0
    out.map { case (t, v, c) =>
      InternalRow(t, UTF8String.fromString(v), math.min(1.0, c + boost))
    }.toArray
  }

  /** Codegen entry point (static forwarder): UTF8String in, ArrayData
    * out — one call does the whole fused scan. */
  def scanData(text: UTF8String): ArrayData =
    new GenericArrayData(scan(text.toString).asInstanceOf[Array[Any]])

  def apply(c: Column): Column = {
    // Spark 4 hides Column↔Expression bridging; see GraftBridge
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(PiiScanExpr(GraftBridge.expression(c)))
  }
}

case class PiiScanExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(Pii.piiMatchType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    PiiScan.scanData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScan.scanData($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiScanExpr =
    copy(child = newChild)

  override def prettyName: String = "pii_scan"
}
