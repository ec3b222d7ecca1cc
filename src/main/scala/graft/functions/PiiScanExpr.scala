package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
 * touches the matchers only for gated-through rows. CodegenFallback is
 * acceptable: the body is one virtual call doing all the work, and the
 * surrounding projection still codegens.
 */
object PiiScan {

  private val compiled: Array[(UTF8String, Pattern, Double)] =
    PiiRules.Patterns.map { case (t, p, c) =>
      (UTF8String.fromString(t), Pattern.compile(p,
        Pattern.CASE_INSENSITIVE), c)
    }.toArray

  private val fpCompiled: Array[Pattern] =
    PiiRules.FalsePositivePatterns.map(Pattern.compile(_, Pattern.CASE_INSENSITIVE)).toArray

  private val ctxCompiled: Array[Pattern] =
    PiiRules.ContextKeywords
      .map(kw => Pattern.compile("\\b" + Pattern.quote(kw) + "\\b", Pattern.CASE_INSENSITIVE))
      .toArray

  /** analyze_text fused: returns (type, value, confidence) triples in
    * type-major, position-minor order — identical to Pii.piiMatches. */
  def scan(text: String): Array[InternalRow] = {
    var i = 0
    while (i < fpCompiled.length) {
      if (fpCompiled(i).matcher(text).find()) return Array.empty
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(UTF8String, String, Double)]
    compiled.foreach { case (t, p, conf) =>
      val m = p.matcher(text)
      while (m.find()) {
        val full = m.group(0)
        val typeName = t.toString
        val valid =
          if (typeName == "phone") full.replace("-", "").replace(" ", "").length >= 10
          else if (typeName == "address") {
            val toks = full.split("\\s+").filter(_.nonEmpty)
            toks.length >= 2 && toks(toks.length - 2).exists(_.isLetter)
          } else true
        if (valid) out += ((t, full, conf))
      }
    }
    if (out.isEmpty) return Array.empty
    var boost = 0.0
    i = 0
    while (boost == 0.0 && i < ctxCompiled.length) {
      if (ctxCompiled(i).matcher(text).find()) boost = PiiRules.ContextBoost
      i += 1
    }
    out.map { case (t, v, c) =>
      InternalRow(t, UTF8String.fromString(v), math.min(1.0, c + boost))
    }.toArray
  }

  def apply(c: Column): Column = {
    // Spark 4 hides Column↔Expression bridging; see GraftBridge
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(PiiScanExpr(GraftBridge.expression(c)))
  }
}

case class PiiScanExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(Pii.piiMatchType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(PiiScan.scan(input.asInstanceOf[UTF8String].toString)
      .asInstanceOf[Array[Any]])

  override protected def withNewChildInternal(newChild: Expression): PiiScanExpr =
    copy(child = newChild)

  override def prettyName: String = "pii_scan"
}
