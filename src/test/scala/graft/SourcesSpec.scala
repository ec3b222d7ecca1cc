package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.functions.LlmJson
import graft.sources.RedditJson
import org.apache.spark.sql.functions._

/** S1/S2 JSON-scan parsing and X9 LLM-response parsing golden tests. */
class SourcesSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val fixture: String = {
    // reddit listing shape: top-level array, children with/without body
    val json =
      """[
        |  {"data": {"children": [
        |    {"data": {"title": "a post, no body", "ups": 9, "downs": 0,
        |     "permalink": "/r/x/1", "id": "p1"}},
        |    {"data": {"body": "RaunchyRaccoon that looks a lot like Miami Springs!",
        |     "ups": 5, "downs": 1, "permalink": "/r/x/c1", "id": "c1"}}
        |  ]}},
        |  {"data": {"children": [
        |    {"data": {"body": "&amp;#x200B; spaced\t\tout   text ",
        |     "ups": 2, "downs": 0, "permalink": "/r/x/c2", "id": "c2"}},
        |    {"data": {"body": "   ", "ups": 0, "downs": 0,
        |     "permalink": "/r/x/c3", "id": "c3"}},
        |    {"data": {"body": "newest comment", "ups": 1, "downs": 0,
        |     "permalink": "/r/x/c10", "id": "c10"}}
        |  ]}}
        |]""".stripMargin
    val f = Files.createTempFile("reddit", ".json")
    Files.writeString(f, json)
    f.toString
  }

  test("S1 listing scan: explode children, keep body rows, P1-P3 + F1") {
    val rows = RedditJson.parseListing(spark, fixture).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    rows.size shouldBe 3 // post (no body) and whitespace-only comment dropped
    rows("c1").getAs[String]("text") shouldBe "RaunchyRaccoon that looks a lot like Miami Springs!"
    rows("c1").getAs[Int]("upvotes") shouldBe 5
    // zwsp removed AFTER collapse: leading space is faithful
    rows("c2").getAs[String]("text") shouldBe " spaced out text"
  }

  test("S2/O1/O2 user scan: sort dispatch + limit") {
    RedditJson.parseUser(spark, fixture, sort = "top", limit = 1)
      .head().getAs[String]("id") shouldBe "c1"
    // "new" compares base-36 ids NUMERICALLY: c10 (len 3) > c2 despite
    // 'c2' > 'c10' lexicographically
    RedditJson.parseUser(spark, fixture, sort = "new", limit = 1)
      .head().getAs[String]("id") shouldBe "c10"
  }

  test("O1 hot/controversial dispatch: published _sorts.pyx formulas client-side") {
    // hot = sign·log10(max(|ups-downs|,1)) + (created-1134028003)/45000.
    // c1 (net +4, log10(4)=.602) outranks the newer c10/c2 whose ordinal
    // recency gap (~.03 of a score point) is smaller than its vote order.
    RedditJson.parseUser(spark, fixture, sort = "hot", limit = 3)
      .collect().map(_.getAs[String]("id")).toSeq shouldBe Seq("c1", "c10", "c2")
    // controversy = (ups+downs)^(min/max balance), 0 unless both sides
    // voted: only c1 (5 up / 1 down) scores; zero ties break by id asc
    RedditJson.parseUser(spark, fixture, sort = "controversial", limit = 3)
      .collect().map(_.getAs[String]("id")).toSeq shouldBe Seq("c1", "c10", "c2")
    import graft.rules.Ranking
    val c = spark.range(1).select(
      Ranking.controversyScore(lit(5), lit(1)).as("c")).head().getDouble(0)
    c shouldBe math.pow(6.0, 0.2) +- 1e-6
  }

  test("models-endpoint listing: data[].id extraction + loud empty failure") {
    import graft.sources.ModelsJson
    def write(json: String) = {
      val f = Files.createTempFile("models", ".json")
      Files.writeString(f, json)
      f.toString
    }
    // one id-less entry dropped, order preserved fields kept
    val ok = write("""{"object":"list","data":[
      {"id":"gpt-4o","object":"model"},
      {"object":"model"},
      {"id":"llama3:8b","object":"model"}]}""")
    ModelsJson.parseModels(spark, ok).collect().map(_.getString(0)).sorted shouldBe
      Array("gpt-4o", "llama3:8b")
    // reference raises ModelFetchError on an empty/id-less listing
    val empty = write("""{"object":"list","data":[{"object":"model"}]}""")
    an[ModelsJson.ModelFetchError] should be thrownBy
      ModelsJson.parseModels(spark, empty)
    // Python truthiness: `if m.get("id")` also drops EMPTY-string ids —
    // an all-empty listing must raise, not return rows
    val blank = write("""{"object":"list","data":[{"id":"","object":"model"}]}""")
    an[ModelsJson.ModelFetchError] should be thrownBy
      ModelsJson.parseModels(spark, blank)
    val mixed = write("""{"object":"list","data":[
      {"id":"","object":"model"},{"id":"phi3","object":"model"}]}""")
    ModelsJson.parseModels(spark, mixed).collect().map(_.getString(0)) shouldBe
      Array("phi3")
  }

  private lazy val treeFixture: String = {
    // comment-tree shape: replies nest listings recursively; one "more"
    // stub (kind=more, skipped), one deleted body (null), depth 3
    val json =
      """{"kind": "Listing", "data": {"children": [
        |  {"kind": "t1", "data": {"id": "a", "body": "root comment A", "ups": 4, "downs": 0,
        |    "replies": {"kind": "Listing", "data": {"children": [
        |      {"kind": "t1", "data": {"id": "a1", "body": "reply to A", "ups": 2, "downs": 0,
        |        "replies": {"kind": "Listing", "data": {"children": [
        |          {"kind": "t1", "data": {"id": "a1x", "body": "deep reply", "ups": 1, "downs": 0}},
        |          {"kind": "more", "data": {"id": "m1", "count": 12}}
        |        ]}}}},
        |      {"kind": "t1", "data": {"id": "a2", "body": null, "ups": 0, "downs": 0}}
        |    ]}}}},
        |  {"kind": "t1", "data": {"id": "b", "body": "root comment B", "ups": 7, "downs": 1}},
        |  {"kind": "more", "data": {"id": "m0", "count": 3}}
        |]}}""".stripMargin
    val f = Files.createTempFile("tree", ".json")
    Files.writeString(f, json)
    f.toString
  }

  test("S3 tree expansion: recursive flatten with depth + parent lineage") {
    val rows = RedditJson.parseTree(spark, treeFixture).collect()
      .map(r => r.getAs[String]("id") ->
        (r.getAs[String]("parent_id"), r.getAs[Int]("depth"), r.getAs[String]("text"))).toMap
    // a2 (null body) and the two "more" stubs are excluded
    rows.keySet shouldBe Set("a", "b", "a1", "a1x")
    rows("a") shouldBe ((null, 0, "root comment A"))
    rows("b") shouldBe ((null, 0, "root comment B"))
    rows("a1") shouldBe (("a", 1, "reply to A"))
    rows("a1x") shouldBe (("a1", 2, "deep reply"))
  }

  test("X9: direct JSON, fenced JSON, think-prefixed, and garbage responses") {
    import spark.implicits._
    val direct = """{"has_pii": true, "confidence": 0.9, "details": [{"type": "email", "example": "a@b.c"}], "reasoning": "found email", "risk_factors": ["email"]}"""
    val fenced = "Sure! Here is the analysis:\n```json\n" + direct + "\n```\nHope that helps."
    val think = "<think>hmm, let me look</think>" + direct
    val noPii = """{"has_pii": false, "confidence": 0.8, "reasoning": "nothing found"}"""
    val garbage = "I am sorry, I cannot respond in JSON."
    val unterminated = "analysis follows\n```json\n" + direct // truncated response, no closing fence
    val doubleThink = "<think>a</think>middle</think>tail" // split[1] == "middle" only
    val df = Seq(direct, fenced, think, noPii, garbage, unterminated, doubleThink).toDF("raw")
    val (risk, findings, error) = LlmJson.verdictColumns(col("raw"))
    val out = df.select(risk.as("risk"), findings.as("f"), error.as("err")).collect()

    out(0).getDouble(0) shouldBe 0.9
    out(0).getStruct(1).getAs[Boolean]("has_pii") shouldBe true
    out(1).getDouble(0) shouldBe 0.9 // recovered from the fenced block
    out(2).getDouble(0) shouldBe 0.9 // think prefix stripped
    out(3).getDouble(0) shouldBe 0.0 // has_pii=false ⇒ risk 0 + canonical record
    out(3).getStruct(1).getAs[String]("reasoning") shouldBe "No PII detected"
    out(4).getDouble(0) shouldBe 0.0
    out(4).isNullAt(1) shouldBe true
    out(4).getString(2) should include("parsing failed")
    // no-PII canonical record carries EMPTY lists, not nulls (llm_detector.py:134-139)
    out(3).getStruct(1).getSeq[Any](2) shouldBe Seq()
    out(3).getStruct(1).getSeq[String](4) shouldBe Seq()
    out(5).getDouble(0) shouldBe 0.9 // unterminated fence still parses
    out(6).getDouble(0) shouldBe 0.0 // only the between-markers segment is parsed
    out(6).getString(2) should include("parsing failed")
  }

  test("X11: detail formatting") {
    import spark.implicits._
    val df = Seq(("email", "line1\nline2")).toDF("type", "example")
    df.select(LlmJson.formatDetail(struct(col("type"), col("example"))).as("d"))
      .head().getString(0) shouldBe "email: line1 line2"
  }
}
