package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.QualityModel

/** Distilled quality classifier: determinism, structural invariants,
  * and the measured distillation fidelity on the sf corpora (the
  * cross-engine exactness of the whole train+infer chain is the
  * oracle's job — every value is integer arithmetic). */
class QualityModelSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("sf0.001: beats majority class on the corpus, deterministic rerun") {
    val out = QualityModel.distill(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("margin"), r.getAs[Boolean]("model_pass"),
          r.getAs[Boolean]("agree")))).toMap
    out.size shouldBe 500
    val agree = out.values.count(_._3).toDouble / out.size
    agree should be > 0.8
    // fully deterministic: same weights, same margins, bit for bit
    val again = QualityModel.distill(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("margin"), r.getAs[Boolean]("model_pass"),
          r.getAs[Boolean]("agree")))).toMap
    again shouldBe out
  }

  test("sf0.01: holdout agreement clears 95% (measured 100%)") {
    val rows = QualityModel.distill(spark, "/root/testdata/sf0.01").collect()
    rows.length shouldBe 500
    val hold = rows.filter(_.getAs[Boolean]("holdout"))
    hold.length shouldBe 50
    hold.count(_.getAs[Boolean]("agree")).toDouble / hold.length should be >= 0.95
    // the model is not a constant predictor
    rows.count(_.getAs[Boolean]("model_pass")) should
      (be > 0 and be < rows.length)
  }
}
