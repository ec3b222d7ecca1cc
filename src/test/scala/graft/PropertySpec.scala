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

  // ---- fused-kernel equivalence: each codegen'd kernel against an
  // independently written brute-force reference of its composed SQL
  // semantics, on randomized inputs (the oracle gate proves the same on
  // corpus data; these pin it on arbitrary input off-Spark).

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
  }
  private def arr(xs: Seq[String]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      xs.map(org.apache.spark.unsafe.types.UTF8String.fromString): Seq[Any])
  private def farr(xs: Seq[Float]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(xs: Seq[Any])
  private val rng = new scala.util.Random(20260816L)

  test("MinHashSig kernel == composed md5/substr reference on random shingle sets") {
    (0 until 200).foreach { _ =>
      val sh = Seq.fill(1 + rng.nextInt(30))(rng.alphanumeric.take(1 + rng.nextInt(12)).mkString).distinct
      val hh = sh.map(s => (0 until 8).map(d => if (d == 0) md5hex(s) else md5hex(d.toString + s)).mkString)
      val expected = (0 until 32).map(j => hh.map(h => h.substring(j * 8, j * 8 + 8)).min)
      val got = graft.functions.MinHashSig.sig(arr(sh))
      (0 until 32).map(got.getUTF8String(_).toString) shouldBe expected
    }
  }

  test("SimHash kernel == composed per-bit reference on random token lists") {
    Seq(4, 8).foreach { hexLen =>
      (0 until 200).foreach { _ =>
        val toks = Seq.fill(1 + rng.nextInt(40))(rng.alphanumeric.take(1 + rng.nextInt(10)).mkString)
        val bits = hexLen * 4
        val hs = toks.map(t => java.lang.Long.parseLong(md5hex(t).take(hexLen), 16))
        val expected = (0 until bits).map { j =>
          val sum = hs.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
          if (sum > 0) 1L << j else 0L
        }.sum
        graft.functions.SimHash.sim(arr(toks), hexLen) shouldBe expected
      }
    }
  }

  test("Cosine kernel == three independent left-to-right double sums") {
    (0 until 200).foreach { _ =>
      val a = Seq.fill(64)(rng.nextFloat() * 2 - 1)
      val b = Seq.fill(64)(rng.nextFloat() * 2 - 1)
      val ab = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val aa = a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      val bb = b.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      val expected = ab / (math.sqrt(aa) * math.sqrt(bb))
      graft.functions.Cosine.cos(farr(a), farr(b)) shouldBe expected // bit-exact, no tolerance
    }
  }

  test("Cosine float×double kernel == three independent left-to-right double sums") {
    def darr(xs: Seq[Double]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(xs: Seq[Any])
    (0 until 200).foreach { _ =>
      val a = Seq.fill(64)(rng.nextFloat() * 2 - 1)
      val b = Seq.fill(64)(rng.nextDouble() * 2 - 1)
      val ab = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y }
      val aa = a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      val bb = b.foldLeft(0.0)((acc, x) => acc + x * x)
      val expected = ab / (math.sqrt(aa) * math.sqrt(bb))
      graft.functions.Cosine.cosFD(farr(a), darr(b)) shouldBe expected // bit-exact
    }
  }

  test("LshBucket kernel == per-plane dot signs") {
    val planes = Seq.fill(8)(Seq.fill(64)(if (rng.nextBoolean()) 1.0 else -1.0))
    (0 until 200).foreach { _ =>
      val v = Seq.fill(64)(rng.nextFloat() * 2 - 1)
      val expected = planes.zipWithIndex.map { case (pl, p) =>
        val dot = v.zip(pl).foldLeft(0.0) { case (acc, (x, w)) => acc + x.toDouble * w }
        if (dot > 0) 1 << p else 0
      }.sum
      graft.functions.LshBucket.compute(farr(v), planes.map(_.toArray).toArray) shouldBe expected
    }
  }

  test("TopKLongsAgg: update/merge/serde agree with sort-take on random streams") {
    import graft.functions.TopKLongsAgg
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    (0 until 100).foreach { _ =>
      val k = 1 + rng.nextInt(7)
      val agg = TopKLongsAgg(BoundReference(0, LongType, nullable = false), k)
      val values = Seq.fill(rng.nextInt(40))(rng.nextLong())
      // split the stream over three partial buffers, serde one of them
      val bufs = Seq.fill(3)(agg.createAggregationBuffer())
      values.zipWithIndex.foreach { case (v, i) =>
        agg.update(bufs(i % 3), InternalRow(v))
      }
      val b1 = agg.deserialize(agg.serialize(bufs(1))) // roundtrip a partial
      val merged = agg.merge(agg.merge(bufs(0), b1), bufs(2))
      val got = agg.eval(merged)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
      got shouldBe values.sorted.reverse.take(k) // sorted desc, k largest
    }
  }

  test("Aho-Corasick any == the (?i)\\b(kw|…)\\b regex on adversarial text") {
    import graft.rules.PiiRules
    val auto = graft.functions.AhoCorasick.automaton(
      PiiRules.ContextKeywords.mkString("\u0001"))
    val rx = java.util.regex.Pattern.compile(
      "\\b(" + PiiRules.ContextKeywords.mkString("|") + ")\\b",
      java.util.regex.Pattern.CASE_INSENSITIVE)
    // seed keyword fragments, case variants, and boundary traps
    val frag = Gen.listOf(Gen.oneOf("ssn", "SSN", "ssns", "xssn", "phone",
      "PHONE!", "telephone", "call me", "call men", "recall me", "email",
      "Email:", "social security", "social  security", "credit card",
      "a", "_ssn_", "9ssn", "ssn9", ".ssn.", " ", "é", "名")).map(_.mkString(""))
    val texts = (0 until 600).flatMap(i => frag(Gen.Parameters.default, Seed(1000L + i)))
    (samples ++ texts).foreach { s =>
      withClue(s"input: '$s'") {
        auto.any(s) shouldBe rx.matcher(s).find()
      }
    }
  }

  test("Aho-Corasick suffix-pair keywords ('credit card'/'card'): fail-chain outputs match regex") {
    // prefix-freeness permits a keyword that is a SUFFIX of another; when
    // the longer match fails its start boundary the shorter must still
    // fire (pre-fix, the terminal's own output shadowed fail-link outputs)
    val kws = Seq("credit card", "card", "social security number", "number")
    val auto = graft.functions.AhoCorasick.automaton(kws.mkString("\u0001"))
    val rx = java.util.regex.Pattern.compile(
      "\\b(" + kws.mkString("|") + ")\\b", java.util.regex.Pattern.CASE_INSENSITIVE)
    val pinned = Seq(
      "xcredit card on file",        // long start-invalid → 'card' must match
      "credit card", "my credit card here", "a card", "cardx", "xcard",
      "credit cardx then card", "social security number",
      "xsocial security number and a number", "numbercredit card",
      "Credit Card and CARD", "credit credit card card")
    val frag = Gen.listOf(Gen.oneOf("credit card", "card", "cards", "xcard",
      "cardx", "credit", "number", "numbers", "social security number",
      "x", " ", "_", "9")).map(_.mkString(""))
    val texts = (0 until 400).flatMap(i => frag(Gen.Parameters.default, Seed(3000L + i)))
    (pinned ++ texts).foreach { s =>
      withClue(s"input: '$s'") {
        auto.any(s) shouldBe rx.matcher(s).find()
        auto.scrub(s, "[X]") shouldBe
          rx.matcher(s).replaceAll(java.util.regex.Matcher.quoteReplacement("[X]"))
      }
    }
  }

  test("Aho-Corasick scrub == Matcher.replaceAll on adversarial text") {
    import graft.rules.PiiRules
    val auto = graft.functions.AhoCorasick.automaton(
      PiiRules.ContextKeywords.mkString("\u0001"))
    val rx = java.util.regex.Pattern.compile(
      "\\b(" + PiiRules.ContextKeywords.mkString("|") + ")\\b",
      java.util.regex.Pattern.CASE_INSENSITIVE)
    val frag = Gen.listOf(Gen.oneOf("ssn", "SSN phone", "Reach Me", "call me",
      "ssn ssn ssn", "social security credit card", "e", " ", "-", "名",
      "my name is x", "driver licensee", "driver license")).map(_.mkString(" "))
    val texts = (0 until 600).flatMap(i => frag(Gen.Parameters.default, Seed(2000L + i)))
    (samples ++ texts).foreach { s =>
      withClue(s"input: '$s'") {
        auto.scrub(s, "[X]") shouldBe
          rx.matcher(s).replaceAll(java.util.regex.Matcher.quoteReplacement("[X]"))
      }
    }
  }

  test("Aho-Corasick count == regex find-loop count on adversarial text") {
    import graft.operators.Toxicity
    val kws = Toxicity.SevereTerms ++ Toxicity.MildTerms
    val auto = graft.functions.AhoCorasick.automaton(kws.mkString("\u0001"))
    val rx = java.util.regex.Pattern.compile(
      "\\b(" + kws.mkString("|") + ")\\b",
      java.util.regex.Pattern.CASE_INSENSITIVE)
    val frag = Gen.listOf(Gen.oneOf("damn", "DAMN stupid", "dumbo", "hateful",
      "hate", "kill yourself", "die in a fire", "die in a", "crap-crap",
      "e", " ", "-", "名", "moronic moron")).map(_.mkString(" "))
    val texts = (0 until 600).flatMap(i => frag(Gen.Parameters.default, Seed(3000L + i)))
    (samples ++ texts).foreach { s =>
      withClue(s"input: '$s'") {
        val m = rx.matcher(s)
        var n = 0
        while (m.find()) n += 1
        auto.countMatches(s) shouldBe n
      }
    }
  }

  test("fused tox kernel == (severe any, mild count, combined scrub) chain") {
    import graft.operators.Toxicity
    val sev = Toxicity.SevereTerms
    val mil = Toxicity.MildTerms
    val sep = "\u0001"
    val comb = graft.functions.AhoCorasick.automaton((sev ++ mil).mkString(sep))
    val sevA = graft.functions.AhoCorasick.automaton(sev.mkString(sep))
    val milA = graft.functions.AhoCorasick.automaton(mil.mkString(sep))
    val frag = Gen.listOf(Gen.oneOf("damn", "DAMN stupid", "dumbo", "hateful",
      "hate", "kill yourself", "die in a fire", "die in a", "crap-crap",
      "e", " ", "-", "名", "moronic moron", "kill yourself damn")).map(_.mkString(" "))
    val texts = (0 until 600).flatMap(i => frag(Gen.Parameters.default, Seed(4000L + i)))
    (samples ++ texts).foreach { s =>
      withClue(s"input: '$s'") {
        comb.tox(s, sev.size, "[X]") shouldBe
          ((sevA.any(s), milA.countMatches(s), comb.scrub(s, "[X]")))
      }
    }
  }

  test("FingerprintMin kernel == brute min over 8-gram md5 prefixes") {
    (0 until 200).foreach { _ =>
      val s = (rng.alphanumeric.take(rng.nextInt(60)) ++ Seq.fill(rng.nextInt(4))('é')).mkString
      val expected =
        if (s.length < 8) md5hex(s).take(16)
        else (0 to s.length - 8).map(i => md5hex(s.substring(i, i + 8)).take(16)).min
      graft.functions.FingerprintMin.min16(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString shouldBe expected
    }
  }
}
