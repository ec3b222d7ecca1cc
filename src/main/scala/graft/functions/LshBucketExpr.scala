package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/**
 * Fused random-hyperplane LSH bucket id: one pass over a float[]
 * embedding computing every plane's dot product and packing the sign
 * bits — arithmetic LITERALLY identical to the composed form the DuckDB
 * oracle runs (operators/Similarity.scala): each element cast
 * float→double, products summed left-to-right from 0.0, bit p set iff
 * dot > 0. The composed Spark form evaluates P separate
 * `aggregate(zip_with(...))` HOF chains per vector (P·dim lambda
 * invocations through non-codegen higher-order functions); this is a
 * tight JVM loop inside whole-stage codegen.
 */
object LshBucket {

  /** Codegen entry point (static forwarder). */
  def compute(emb: ArrayData, planes: Array[Array[Double]]): Int = {
    var b = 0
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var acc = 0.0
      var d = 0
      while (d < pl.length) {
        acc += emb.getFloat(d).toDouble * pl(d)
        d += 1
      }
      if (acc > 0) b |= 1 << p
      p += 1
    }
    b
  }

  def apply(c: Column, planes: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(LshBucketExpr(GraftBridge.expression(c), planes))
  }
}

/** `planes` is a Seq-of-Seq (value equality keeps Catalyst expression
  * canonicalization sound; an Array field would compare by reference). */
case class LshBucketExpr(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    LshBucket.compute(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", matrix, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.LshBucket.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)

  override def prettyName: String = "lsh_bucket"
}
