package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Fused SimHash fingerprint over a token array — literally the composed
 * form the DuckDB oracle runs (operators/Dedup.scala): per token, the
 * value of the first `hexLen` hex chars of md5(token); per bit j, +1 if
 * set else -1 summed over tokens; fingerprint bit j set iff the sum is
 * positive. The composed Spark form evaluates `bits` separate
 * aggregate() HOF chains over a precomputed hash array (bits·n
 * interpreted lambda calls per doc); this is one codegen'd pass with the
 * bit counters in a local array.
 */
object SimHash {

  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Codegen entry point (static forwarder). hexLen must be even, <= 16;
    * at hexLen < 16 the value stays a non-negative Long (matching
    * conv(...,16,10)); at the production width 16 bit 63 is the sign bit
    * and callers must treat the fingerprint as raw bits (band masks and
    * xor/bit_count do — see Dedup.simhashPairs64). */
  def sim(tokens: ArrayData, hexLen: Int): Long = {
    val bits = hexLen * 4
    val acc = new Array[Int](bits)
    val md = localMd.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val dig = md.digest(tokens.getUTF8String(i).getBytes)
      var v = 0L
      var b = 0
      while (b < hexLen / 2) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      var j = 0
      while (j < bits) {
        if (((v >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (acc(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  def apply(c: Column, hexLen: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SimHashExpr(GraftBridge.expression(c), hexLen))
  }
}

case class SimHashExpr(child: Expression, hexLen: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    SimHash.sim(input.asInstanceOf[ArrayData], hexLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.sim($c, $hexLen)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
  override def prettyName: String = "simhash"
}
