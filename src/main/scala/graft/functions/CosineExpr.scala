package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Fused cosine similarity over two float[] columns — arithmetic
 * LITERALLY the composed form the DuckDB oracle runs
 * (operators/Similarity.scala): each element cast float→double,
 * products summed left-to-right from 0.0, three independent sums
 * (a·b, a·a, b·b), then dot / (sqrt·sqrt). The composed Spark form is
 * three `aggregate(zip_with(...))` higher-order-function chains per
 * pair (6·dim interpreted lambda calls); this is one codegen'd loop.
 * Bit-identical by construction, and proven by the oracle gate on every
 * similarity query.
 */
object Cosine {

  /** Codegen entry point (static forwarder). */
  def cos(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CosineExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** float[] × double[] variant (IVF scores vectors against REFINED
    * centroids, which are fixed-point-mean double arrays): identical
    * summation order, so the value matches the composed HOF/SQL form
    * bit-for-bit — this just replaces 6·dim interpreted lambda calls
    * per pair with one codegen'd loop. */
  def cosFD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** double[] × double[] variant (centroid vs centroid / query probe). */
  def cosDD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  def fd(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CosineFDExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}

case class CosineFDExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Cosine.cosFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Cosine.cosFD($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineFDExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_fd"
}

case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    Cosine.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Cosine.cos($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine"
}
