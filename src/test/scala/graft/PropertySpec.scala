package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.PiiScan
import graft.rules.Vader

/** ScalaCheck-generated robustness corpus: the scalar kernels must never
  * throw and must hold their invariants on arbitrary (including
  * adversarial unicode) input — run off-Spark for speed, covering the
  * same functions the expressions call. Seeds fixed ⇒ deterministic. */
class PropertySpec extends AnyFunSuite with Matchers {

  private val weird: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf("@", ".", "Dr.", "123", "ssn", " ", "\t", "\n",
      "a@b.io", "!!", "<b>", "&amp;#x200B;", "😀", "mr.", "-45-",
      "4111 1111 1111 1111", "never so good", "kind of", "BUT", "at least"))
      .map(_.mkString(" ")))

  private val samples: Seq[String] =
    (0 until 800).flatMap(i => weird(Gen.Parameters.default, Seed(i.toLong)))

  test("VADER compound always lands in [-1, 1] and never throws") {
    samples.foreach { s =>
      val c = Vader.compound(s)
      withClue(s"input: '$s'") { c should (be >= -1.0 and be <= 1.0) }
    }
  }

  test("VADER score components are probabilities summing to ~1 (or all-zero)") {
    samples.foreach { s =>
      val sc = Vader.polarityScores(s)
      if (sc.pos + sc.neg + sc.neu > 0)
        withClue(s"input: '$s'") { (sc.pos + sc.neg + sc.neu) shouldBe 1.0 +- 0.01 }
    }
  }

  test("PII scan never throws; confidences in (0, 1]; types from the rule set") {
    val types = graft.rules.PiiRules.Patterns.map(_._1).toSet
    samples.foreach { s =>
      PiiScan.scan(s).foreach { row =>
        withClue(s"input: '$s'") {
          types should contain(row.getUTF8String(0).toString)
          row.getDouble(2) should (be > 0.0 and be <= 1.0)
        }
      }
    }
  }

  test("digit-gate semantics: a standalone number nullifies every match") {
    val gate = "(?i)\\b\\d+[km]?b?\\b".r
    samples.foreach { s =>
      if (gate.findFirstIn(s).isDefined)
        withClue(s"input: '$s'") { PiiScan.scan(s) shouldBe empty }
    }
  }
}
