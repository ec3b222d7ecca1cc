package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused MinHash signature (SURVEY.md §2 training-data dedup): one pass
 * over a document's shingle array computing all 32 signature components.
 *
 * Semantics are LITERALLY the composed form the DuckDB oracle runs
 * (operators/Dedup.scala):
 *   hh   = md5(s) || md5('1'||s) || … || md5('7'||s)   -- 256 hex chars
 *   mh_j = min over shingles of substr(hh, j*8+1, 8)   -- lexicographic
 * Fixed-width lowercase hex makes lexicographic min == unsigned-32 min,
 * so this tracks 32 u32 minima in registers and hex-formats once at the
 * end — instead of materializing a 256-char UTF8String per shingle and
 * re-scanning it 32 times (BENCH_r01: the composed form was 25s of the
 * 77s bench total; this is the "fuse at scale" note made real).
 */
object MinHashSig {

  val NumHashes = 32
  val DigestsPerShingle = 8 // 8 md5 x 32 hex chars = 32 windows of 8 hex

  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Codegen entry point (static forwarder): shingle array in, 32-element
    * array of 8-hex-char components out. Empty input → empty array (the
    * callers filter to >= 3 tokens, so this is never hit in the queries;
    * array_join of it matches concat_ws over all-null array_mins: ""). */
  def sig(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(NumHashes)(0x1ffffffffL) // > any u32
    val md = localMd.get()
    var i = 0
    while (i < n) {
      val base = shingles.getUTF8String(i).getBytes
      var d = 0
      while (d < DigestsPerShingle) {
        md.reset()
        if (d > 0) md.update(('0' + d).toByte) // the '1'..'7' salt prefix
        md.update(base)
        val dig = md.digest()
        // digest d covers windows 4d..4d+3; window w = 4 big-endian bytes
        var w = 0
        while (w < 4) {
          val off = w * 4
          val v = ((dig(off) & 0xffL) << 24) | ((dig(off + 1) & 0xffL) << 16) |
            ((dig(off + 2) & 0xffL) << 8) | (dig(off + 3) & 0xffL)
          val j = d * 4 + w
          if (v < mins(j)) mins(j) = v
          w += 1
        }
        d += 1
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(v => UTF8String.fromString(f"$v%08x"): Any))
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(c)))
  }
}

case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}
