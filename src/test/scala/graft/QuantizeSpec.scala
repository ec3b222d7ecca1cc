package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.{Quantize, Similarity}

/** Int8 quantization: hand-computed codes and error bound, plus the
  * recall of the quantized ANN against the exact brute-force top-k. */
class QuantizeSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("sf0.001 quantize: codes in range, error within the affine bound") {
    val rows = Quantize.quantize(spark, "/root/testdata/sf0.001").collect()
    rows.length should be >= 100
    rows.foreach { r =>
      val n = r.getAs[Int]("n")
      val codes = r.getAs[String]("codes_str").split(',').map(_.toInt)
      codes.length shouldBe n
      all(codes.toSeq) should (be >= 0 and be <= 255)
      // worst reconstruction error of affine SQ8 is half a step + fp dust
      val step = (r.getAs[Double]("hi") - r.getAs[Double]("lo")) / 255.0
      r.getAs[Double]("max_abs_err") should be <= (step / 2 + 1e-6)
    }
  }

  test("quantized ANN recalls >= 8 of the exact top-10") {
    val dir = "/root/testdata/sf0.001"
    val exact = Similarity.annTopK(spark, dir)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val quant = Quantize.annQuantized(spark, dir)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    (exact intersect quant).size should be >= 8
  }

  test("IVF+SQ8: quantization inside the probed cells loses nothing vs float IVF") {
    // the composition must return the same candidates the float IVF
    // ranks at the top, up to int8 rounding — assert against the
    // FLOAT IVF result (same cells, same nprobe), not brute force, so
    // coarse-probe recall doesn't confound the quantization question
    val dir = "/root/testdata/sf0.001"
    val ivf = Similarity.annIvf(spark, dir)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val ivfq = Similarity.annIvfQuantized(spark, dir)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    (ivf intersect ivfq).size should be >= 4 // k = 5
  }
}
