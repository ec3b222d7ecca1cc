package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multi-pattern Aho-Corasick keyword scan (the north star's
 * "codegen'd UDF for multi-pattern Aho-Corasick scrubbing"): one pass
 * over the text against ALL keywords simultaneously, instead of a
 * compiled `(?i)\b(kw1|kw2|…)\b` alternation that backtracks per
 * position per alternative. Two surfaces:
 *
 *  - [[AcAnyExpr]]: does any word-boundary-delimited keyword occur?
 *    (drop-in for the context-boost `rlike` — PiiRules.ContextKeywordRegex)
 *  - [[AcScrubExpr]]: replace every such occurrence with a mask, with
 *    `Matcher.replaceAll` semantics (leftmost match wins, scanning
 *    resumes after the replaced span).
 *
 * Semantics notes, mirrored from the Java-regex baseline so the chain
 * and the DuckDB oracle agree:
 *  - case-insensitive via ASCII folding (the keyword set is plain
 *    `[a-z ]+` and Pattern.CASE_INSENSITIVE without UNICODE_CASE folds
 *    ASCII only);
 *  - `\b` == transition between `[A-Za-z0-9_]` and anything else;
 *  - the keyword set is prefix-free, so at most one keyword can match
 *    at a given start position and alternation order is irrelevant
 *    (asserted at automaton build time — a non-prefix-free set would
 *    need the regex' first-alternative priority);
 *  - keywords that are SUFFIXES of other keywords ('credit card'/'card')
 *    are legal: every fail-chain output is emitted per end position, so
 *    a longer match failing its start boundary can't shadow a shorter
 *    boundary-valid one (AhoCorasickSpec pins this against the regex).
 *
 * The automaton is built once per keyword set and cached statically;
 * codegen emits a static call (same pattern as the other fused
 * kernels), so the scan stays inside whole-stage codegen.
 */
object AhoCorasick {

  final class Automaton(keywords: Seq[String]) {
    private val kws = keywords.map(_.toLowerCase)
    for (a <- kws; b <- kws if a != b)
      require(!b.startsWith(a),
        s"keyword set must be prefix-free for order-free matching: '$a' prefixes '$b'")

    // goto/fail/output over lowercase chars; node 0 = root. Outputs
    // store the KEYWORD INDEX (prefix-freeness ⇒ at most one keyword
    // per terminal node); lengths come from kws(idx) — the index is
    // what lets the fused toxicity kernel tier its matches.
    private val gotoMaps = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    private val out = scala.collection.mutable.ArrayBuffer(-1) // keyword index ending here, -1 none
    kws.zipWithIndex.foreach { case (kw, ki) =>
      var s = 0
      kw.foreach { c =>
        s = gotoMaps(s).getOrElseUpdate(c, {
          gotoMaps += scala.collection.mutable.Map.empty[Char, Int]
          out += -1
          gotoMaps.size - 1
        })
      }
      out(s) = ki
    }
    private val fail = new Array[Int](gotoMaps.size)
    // BFS fail links. Outputs keep the FULL fail-chain set (lengths of
    // every keyword ending at this node, own-first/descending), not just
    // the longest: a terminal's own output must not shadow a shorter
    // suffix keyword ('credit card' vs 'card' — prefix-freeness permits
    // that pair), because when the longer match fails its START-boundary
    // check the regex baseline still matches the shorter one. BFS order
    // guarantees outs(fail(s)) is final before outs(s) is built: fail(s)
    // sits at a strictly smaller depth, and every depth-d node's outs is
    // set while processing its depth-(d-1) parent.
    private val queue = scala.collection.mutable.Queue.empty[Int]
    private val outs = new Array[Array[Int]](gotoMaps.size) // keyword indices
    private def ownOut(s: Int): Array[Int] =
      if (out(s) >= 0) Array(out(s)) else Array.emptyIntArray
    outs(0) = Array.emptyIntArray
    gotoMaps(0).values.foreach { s => fail(s) = 0; outs(s) = ownOut(s); queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoMaps(r).foreach { case (c, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !gotoMaps(f).contains(c)) f = fail(f)
        fail(s) = gotoMaps(f).getOrElse(c, 0)
        outs(s) = ownOut(s) ++ outs(fail(s))
      }
    }

    // Java's \b is unicode-aware even without UNICODE_CHARACTER_CLASS
    // (unlike \w): 'é' is a word char at a boundary — match that, since
    // the rlike chain (Java) and the reference (Python re) both treat it
    // so; the property suite pins the equivalence on adversarial text
    @inline private def isWord(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_'
    @inline private def lower(c: Char): Char =
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

    private def step(s0: Int, c: Char): Int = {
      var s = s0
      while (s != 0 && !gotoMaps(s).contains(c)) s = fail(s)
      gotoMaps(s).getOrElse(c, 0)
    }

    /** Is there any boundary-valid match? Walks every fail-chain output
      * at each end position (end boundary checked once, starts per-
      * keyword) so a longer keyword with an invalid start can't shadow a
      * shorter boundary-valid suffix keyword. */
    def any(text: String): Boolean = {
      var s = 0
      var i = 0
      val n = text.length
      while (i < n) {
        s = step(s, lower(text.charAt(i)))
        val ls = outs(s)
        if (ls.length > 0 && (i + 1 == n || !isWord(text.charAt(i + 1)))) {
          var k = 0
          while (k < ls.length) {
            val start = i - kws(ls(k)).length + 1
            if (start == 0 || !isWord(text.charAt(start - 1))) return true
            k += 1
          }
        }
        i += 1
      }
      false
    }

    /** All boundary-valid (start, endExclusive, keywordIdx) spans, by
      * end order. */
    private def spans(text: String): Seq[(Int, Int, Int)] = {
      val hits = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      var s = 0
      var i = 0
      val n = text.length
      while (i < n) {
        s = step(s, lower(text.charAt(i)))
        val ls = outs(s)
        if (ls.length > 0 && (i + 1 == n || !isWord(text.charAt(i + 1)))) {
          var k = 0
          while (k < ls.length) {
            val start = i - kws(ls(k)).length + 1
            if (start == 0 || !isWord(text.charAt(start - 1)))
              hits += ((start, i + 1, ls(k)))
            k += 1
          }
        }
        i += 1
      }
      hits.toSeq
    }

    /** How many replacements [[scrub]] would make: leftmost-first,
      * non-overlapping — the same count `regexp_extract_all` with the
      * equivalent alternation returns (prefix-freeness makes alternation
      * order irrelevant, so the two agree exactly on ASCII text). */
    def countMatches(text: String): Int = {
      val hits = spans(text).sortBy(_._1)
      var pos = 0
      var n = 0
      hits.foreach { case (a, b, _) => if (a >= pos) { n += 1; pos = b } }
      n
    }

    /** replaceAll semantics: leftmost match first, resume past its end. */
    def scrub(text: String, mask: String): String = {
      val hits = spans(text).sortBy(_._1)
      if (hits.isEmpty) return text
      val sb = new java.lang.StringBuilder(text.length)
      var pos = 0
      hits.foreach { case (a, b, _) =>
        if (a >= pos) { // skip matches overlapping an earlier replacement
          sb.append(text, pos, a).append(mask)
          pos = b
        }
      }
      sb.append(text, pos, text.length)
      sb.toString
    }

    /** The fused toxicity walk: ONE pass over the text computes what
      * the three-expression chain (severe `any` + mild `count` +
      * combined `scrub`) computes — the automaton must be built over
      * severe ++ mild, with `severeCount` marking the tier boundary.
      * Exactly chain-equivalent regardless of cross-tier overlaps:
      * severe-any considers every boundary-valid severe span; the mild
      * count runs its replaceAll selection over MILD spans only (as
      * the mild-only automaton would); the scrub selects over all
      * spans. Property-pinned against the chain in ToxicitySpec /
      * PropertySpec. */
    def tox(text: String, severeCount: Int, mask: String): (Boolean, Int, String) = {
      val hits = spans(text).sortBy(_._1)
      var severe = false
      var mild = 0
      var mpos = 0
      var pos = 0
      val sb = new java.lang.StringBuilder(text.length)
      hits.foreach { case (a, b, ki) =>
        if (ki < severeCount) severe = true
        else if (a >= mpos) { mild += 1; mpos = b }
        if (a >= pos) { sb.append(text, pos, a).append(mask); pos = b }
      }
      sb.append(text, pos, text.length)
      (severe, mild, sb.toString)
    }
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Automaton]()

  /** Static lookup keyed by the joined keyword list (codegen-reachable). */
  def automaton(joined: String): Automaton =
    cache.computeIfAbsent(joined, j => new Automaton(j.split('\u0001').toSeq))

  def anyStatic(text: UTF8String, joined: String): Boolean =
    automaton(joined).any(text.toString)

  def scrubStatic(text: UTF8String, joined: String, mask: String): UTF8String =
    UTF8String.fromString(automaton(joined).scrub(text.toString, mask))

  def countStatic(text: UTF8String, joined: String): Int =
    automaton(joined).countMatches(text.toString)

  def toxStatic(text: UTF8String, joined: String, severeCount: Int,
                mask: String): org.apache.spark.sql.catalyst.InternalRow = {
    val (s, m, t) = automaton(joined).tox(text.toString, severeCount, mask)
    org.apache.spark.sql.catalyst.InternalRow(s, m, UTF8String.fromString(t))
  }

  def any(c: Column, keywords: Seq[String]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(AcAnyExpr(GraftBridge.expression(c), keywords))
  }

  def scrub(c: Column, keywords: Seq[String], mask: String): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(AcScrubExpr(GraftBridge.expression(c), keywords, mask))
  }

  def count(c: Column, keywords: Seq[String]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(AcCountExpr(GraftBridge.expression(c), keywords))
  }

  def tox(c: Column, severe: Seq[String], mild: Seq[String], mask: String): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(AcToxExpr(GraftBridge.expression(c), severe, mild, mask))
  }
}

case class AcAnyExpr(child: Expression, keywords: Seq[String]) extends UnaryExpression {
  private val joined = keywords.mkString("\u0001")
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    AhoCorasick.anyStatic(input.asInstanceOf[UTF8String], joined)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val j = ctx.addReferenceObj("acJoined", joined, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.AhoCorasick.anyStatic($c, $j)")
  }
  override protected def withNewChildInternal(newChild: Expression): AcAnyExpr =
    copy(child = newChild)
  override def prettyName: String = "ac_any"
}

case class AcCountExpr(child: Expression, keywords: Seq[String]) extends UnaryExpression {
  private val joined = keywords.mkString("\u0001")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    AhoCorasick.countStatic(input.asInstanceOf[UTF8String], joined)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val j = ctx.addReferenceObj("acJoined", joined, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.AhoCorasick.countStatic($c, $j)")
  }
  override protected def withNewChildInternal(newChild: Expression): AcCountExpr =
    copy(child = newChild)
  override def prettyName: String = "ac_count"
}

/** The fused toxicity kernel: one automaton pass over severe ++ mild
  * yields (severe_hit, mild_hits, scrubbed) — chain-equivalent to
  * ac_any(severe) + ac_count(mild) + ac_scrub(severe ++ mild) at a
  * third of the text scans (the difference a 100 TB corpus notices). */
case class AcToxExpr(child: Expression, severe: Seq[String], mild: Seq[String],
                     mask: String) extends UnaryExpression {
  private val joined = (severe ++ mild).mkString("\u0001")
  override def dataType: DataType = StructType(Seq(
    StructField("severe_hit", BooleanType, nullable = false),
    StructField("mild_hits", IntegerType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    AhoCorasick.toxStatic(input.asInstanceOf[UTF8String], joined, severe.size, mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val j = ctx.addReferenceObj("acJoined", joined, "java.lang.String")
    val m = ctx.addReferenceObj("acMask", mask, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AhoCorasick.toxStatic($c, $j, ${severe.size}, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): AcToxExpr =
    copy(child = newChild)
  override def prettyName: String = "ac_tox"
}

case class AcScrubExpr(child: Expression, keywords: Seq[String], mask: String)
  extends UnaryExpression {
  private val joined = keywords.mkString("\u0001")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    AhoCorasick.scrubStatic(input.asInstanceOf[UTF8String], joined, mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val j = ctx.addReferenceObj("acJoined", joined, "java.lang.String")
    val m = ctx.addReferenceObj("acMask", mask, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.AhoCorasick.scrubStatic($c, $j, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): AcScrubExpr =
    copy(child = newChild)
  override def prettyName: String = "ac_scrub"
}
