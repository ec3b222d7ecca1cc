package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused winnowing-style fingerprint: min over character-8-gram windows
 * of the first 16 hex chars of md5(window) — literally
 * `array_min(transform(sequence(1, len-7), i -> substr(md5(substr(text, i, 8)), 1, 16)))`
 * (the form the DuckDB oracle runs), computed as one pass tracking a
 * single unsigned-64 minimum (16 fixed-width lowercase hex chars ⇔ the
 * digest's first 8 big-endian bytes; lexicographic min == unsigned min).
 * Texts shorter than 8 chars fall back to md5(text)'s 16-hex prefix,
 * matching the composed CASE. Windows are CHARACTER windows
 * (UTF8String.substring is code-point aware, same as SQL substr).
 */
object FingerprintMin {

  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def first8BytesAsU64(dig: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v
  }

  /** Codegen entry point (static forwarder). */
  def min16(s: UTF8String): UTF8String = {
    val md = localMd.get()
    val n = s.numChars()
    if (n < 8) {
      md.reset()
      val hex = md.digest(s.getBytes).take(8).map(b => f"${b & 0xff}%02x").mkString
      return UTF8String.fromString(hex)
    }
    var best = -1L // unsigned max
    var i = 0
    while (i <= n - 8) {
      md.reset()
      val dig = md.digest(s.substring(i, i + 8).getBytes)
      val v = first8BytesAsU64(dig)
      if (java.lang.Long.compareUnsigned(v, best) < 0) best = v
      i += 1
    }
    UTF8String.fromString(f"$best%016x")
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(FingerprintMinExpr(GraftBridge.expression(c)))
  }
}

case class FingerprintMinExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    FingerprintMin.min16(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintMin.min16($c)")
  override protected def withNewChildInternal(newChild: Expression): FingerprintMinExpr =
    copy(child = newChild)
  override def prettyName: String = "fingerprint_min"
}
