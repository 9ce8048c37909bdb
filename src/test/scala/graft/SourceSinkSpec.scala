package graft

import graft.model.EntityType
import graft.sink.HttpBatchSink
import graft.source.{EntityApiSource, Json}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

object SourceSinkSpec {
  val bodies = new ConcurrentLinkedQueue[String]()
}

/** Envelope parsing (S1/S2), page->DataFrame normalization, and sink batch
  * math (K1: ceil(n/max) bodies, skip-empty, targetBody.hbs join).
  */
class SourceSinkSpec extends SparkSpec {
  import spark.implicits._
  import SourceSinkSpec._

  test("envelope split handles nested strings/braces and partialResults") {
    val body =
      """{"items": [{"id": "a{b", "s": "{Code: 80,Name: stopped}", "n": 1}, {"id": "c\"d", "n": 2}], "partialResults": true}"""
    val (items, partial) = Json.splitEnvelope(body)
    assert(partial && items.size == 2)
    assert(items.head.contains("a{b"))
    val (none, p2) = Json.splitEnvelope("""{"items": [], "partialResults": false}""")
    assert(none.isEmpty && !p2)
  }

  test("parseFlatObject: exponent numbers parse; nested values are skipped whole") {
    val m = Json.parseFlatObject(
      """{"a": 1.5e9, "b": -2E-3, "neg": -7, "s": "x\"y", "t": true, "z": null,
        |"nested": {"inner": "HOISTED?", "deep": {"k": 1}}, "arr": [1, {"inArr": "no"}],
        |"after": "kept"}""".stripMargin)
    assert(m("a") == "1.5e9" && m("b") == "-2E-3" && m("neg") == "-7")
    assert(m("s") == "x\"y" && m("t") == "true" && m("z") == "null")
    assert(m("after") == "kept")
    // nested object/array pairs must NOT be hoisted to the top level
    assert(!m.contains("inner") && !m.contains("k") && !m.contains("inArr"))
    assert(!m.contains("nested") && !m.contains("arr"))
  }

  test("type catalog parse (S1, app.js:71-74)") {
    val types = EntityApiSource.fetchEntityTypes(
      _ => """[{"name": "awsEc2", "uniqueIdField": "AWSUniqueId"}, {"name": "gce", "uniqueIdField": "gcp_id"}]""",
      "stub://types")
    assert(types == Seq(EntityType("awsEc2", "AWSUniqueId"), EntityType("gce", "gcp_id")))
  }

  test("pageToDf normalizes to (id, updatedOnMs, attrs) with string-cast values") {
    val page = EntityApiSource.Page(Seq(
      """{"AWSUniqueId": "u1", "aws_region": "us-west-2", "n": 7, "updatedOnMs": 1582304819692}""",
      """{"aws_region": "eu-1", "updatedOnMs": 5}"""), partialResults = false)
    val df = EntityApiSource.pageToDf(spark, page, EntityType("awsEc2", "AWSUniqueId"))
    val rows = df.select("id", "updatedOnMs").as[(Option[String], Option[Long])].collect().toSet
    assert(rows == Set((Some("u1"), Some(1582304819692L)), (None, Some(5L))))
    val attrs = df.where($"id" === "u1").select("attrs").as[Map[String, String]].head()
    assert(attrs("aws_region") == "us-west-2" && attrs("n") == "7")
  }

  test("sink: ceil(n/max) batches per partition, [a,b] body shape, empty skipped") {
    bodies.clear()
    val docs = (1 to 5).map(i => s"""{"i":$i}""").toDF("doc").coalesce(1)
    val sent = HttpBatchSink.send(docs, maxBatchSize = 2,
      () => b => SourceSinkSpec.bodies.add(b))
    assert(sent == 3) // ceil(5/2)
    val bs = bodies.asScala.toSeq
    assert(bs.forall(b => b.startsWith("[{") && b.endsWith("}]")))
    assert(bs.map(b => b.count(_ == '{')).sum == 5)

    bodies.clear()
    val none = HttpBatchSink.send(docs.limit(0), 2, () => b => SourceSinkSpec.bodies.add(b))
    assert(none == 0 && bodies.isEmpty) // skip-empty, app.js:89-91
  }
}
