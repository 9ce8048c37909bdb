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

  test("envelope flag scoping: item fields named partialResults do not force pagination") {
    // the envelope says false; an ITEM carries partialResults:true
    val body =
      """{"items": [{"id": "x", "partialResults": true}], "partialResults": false}"""
    val (items, partial) = Json.splitEnvelope(body)
    assert(items.size == 1 && !partial)
    // non-array items value: no items, no crash, flag still read
    val (none, p) = Json.splitEnvelope("""{"items": null, "partialResults": true}""")
    assert(none.isEmpty && p)
    // '[' appearing later in the body must not be misparsed as the item list
    val (none2, _) = Json.splitEnvelope("""{"items": null, "other": [1, 2]}""")
    assert(none2.isEmpty)
  }

  test("a page with no id column anywhere maps to null ids (F3 drop), not an analysis error") {
    import graft.source.EntityApiSource
    import graft.model.EntityType
    val page = EntityApiSource.Page(
      Seq("""{"color": "red", "updatedOnMs": 5}""", """{"color": "blue"}"""), partialResults = false)
    val df = EntityApiSource.pageToDf(spark, page, EntityType("t", "uid"))
    assert(df.count() == 2)
    assert(graft.cdc.ChangeFilter.dropMissingId(df, "id").count() == 0)
  }

  test("normalizeScalar reproduces the v1 json-read stringification: nulls drop, numbers normalize, strings pass") {
    import graft.source.Json.{normalizeScalar, parseFlatObjectTyped}
    val m = parseFlatObjectTyped(
      """{"s": "1.50", "d": 1.50, "i": 2, "big": 12345678901234567890, "t": true, "z": null, "e": 1.5e9}""")
    def norm(k: String) = normalizeScalar(m(k))
    assert(norm("s").contains("1.50"))  // STRING "1.50" stays verbatim
    assert(norm("d").contains("1.5"))   // NUMBER 1.50 renders like a double cast
    assert(norm("i").contains("2"))     // integral stays integral (no ".0")
    assert(norm("big").contains("12345678901234567890")) // beyond Long: digits kept
    assert(norm("t").contains("true"))
    assert(norm("z").isEmpty)           // JSON null drops, like v1's map_filter
    assert(norm("e").contains("1.5E9")) // exponent renders like Double.toString
  }

  test("header templates fail fast at construction: malformed or unset env refs") {
    import graft.template.TemplateCompiler
    val env = Map("TOKEN" -> "abc")
    // valid: resolvable ref and plain literal pass
    TemplateCompiler.validateHeaderTemplates(
      Map("Authorization" -> "Bearer {{env.TOKEN}}", "Accept" -> "application/json"), env)
    // unset env var: error names the header and the var
    val missing = intercept[IllegalArgumentException] {
      TemplateCompiler.validateHeaderTemplates(Map("Authorization" -> "Bearer {{env.NOPE}}"), env)
    }
    assert(missing.getMessage.contains("Authorization") && missing.getMessage.contains("NOPE"))
    // malformed template: unbalanced mustache is a construction error, not a send-time one
    val malformed = intercept[IllegalArgumentException] {
      TemplateCompiler.validateHeaderTemplates(Map("X-Bad" -> "oops {{env.TOKEN"), env)
    }
    assert(malformed.getMessage.contains("X-Bad"))
    // both transports validate at construction
    intercept[IllegalArgumentException] {
      HttpBatchSink.httpSender("http://x", "PUT",
        Map("Authorization" -> "Bearer {{env.NOPE}}"), env = () => env)
    }
    intercept[IllegalArgumentException] {
      EntityApiSource.httpFetcher(Map("Authorization" -> "Bearer {{env.NOPE}}"), env = () => env)
    }
  }

  test("property: parseFlatObject agrees with spark.read.json on generated flat payloads") {
    // deterministic generator (fixed seed): ~80 payloads mixing strings with
    // escapes/unicode, integer/decimal/exponent numbers, booleans, nulls,
    // and nested composites (which parseFlatObject must skip, not hoist)
    val rnd = new scala.util.Random(42)
    val stringAlphabet = "abcXYZ 09_\"\\\n\té√"
    def jsonEscape(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\t' => "\\t"; case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // per-field: (json fragment, expected parsed value or None when skipped)
    def genField(name: String): (String, Option[String]) = rnd.nextInt(7) match {
      case 0 => val v = rnd.between(-1000000L, 1000000L); (s""""$name": $v""", Some(v.toString))
      case 1 => val v = s"${rnd.between(1, 99)}.${rnd.between(0, 99)}e${rnd.between(-9, 9)}"
                (s""""$name": $v""", Some(v))
      case 2 => val v = s"-${rnd.between(0, 99)}.${rnd.between(1, 99)}"
                (s""""$name": $v""", Some(v))
      case 3 => val v = rnd.nextBoolean().toString; (s""""$name": $v""", Some(v))
      case 4 => (s""""$name": null""", Some("null"))
      case 5 => // nested composite: skipped whole by the flat parser
        val inner = if (rnd.nextBoolean()) """{"x": 1, "y": [2, {"z": "3"}]}""" else """[1, {"a": "b"}, []]"""
        (s""""$name": $inner""", None)
      case _ =>
        val v = (0 until rnd.between(0, 12)).map(_ => stringAlphabet(rnd.nextInt(stringAlphabet.length))).mkString
        (s""""$name": "${jsonEscape(v)}"""", Some(v))
    }
    val payloads = (0 until 80).map { j =>
      val fields = (0 until rnd.between(1, 8)).map(i => genField(s"p${j}_f$i"))
      (s"{${fields.map(_._1).mkString(", ")}}", fields)
    }
    val parsed = payloads.map(p => Json.parseFlatObject(p._1))
    // spark.read.json over the same payloads: the schema-merged DataFrame is
    // the ground truth for which fields exist and what they contain
    val df = spark.read.json(spark.createDataset(payloads.map(_._1)))
    val rows = df.collect()
    val schema = df.schema
    rows.zip(parsed).zipWithIndex.foreach { case ((row, flat), j) =>
      schema.fields.foreach { f =>
        val sv = row.get(row.fieldIndex(f.name))
        f.dataType match {
          case _: org.apache.spark.sql.types.StructType | _: org.apache.spark.sql.types.ArrayType =>
            // nested: the flat parser must not expose the key at all
            assert(!flat.contains(f.name), s"payload $j: nested ${f.name} hoisted")
          case _ if sv == null =>
            // absent in this payload, or a JSON null literal
            assert(!flat.contains(f.name) || flat(f.name) == "null",
              s"payload $j: ${f.name} null in spark but '${flat.get(f.name)}' in flat parser")
          case _: org.apache.spark.sql.types.StringType =>
            assert(flat(f.name) == sv.asInstanceOf[String],
              s"payload $j: ${f.name} string mismatch")
          case _: org.apache.spark.sql.types.BooleanType =>
            assert(flat(f.name).toBoolean == sv.asInstanceOf[Boolean])
          case _ => // long or double: compare numerically (raw text is kept)
            assert(flat(f.name).toDouble == sv.toString.toDouble,
              s"payload $j: ${f.name} number mismatch: flat=${flat(f.name)} spark=$sv")
        }
      }
      // completeness the other way: every flat-parsed key is a real field
      flat.keys.foreach(k => assert(schema.fieldNames.contains(k), s"payload $j: phantom key $k"))
    }
  }

  test("numberToLong: integer, decimal-whole, and exponent forms; rejects fractional") {
    assert(Json.numberToLong("1705276800000").contains(1705276800000L))
    assert(Json.numberToLong("1.5e9").contains(1500000000L))
    assert(Json.numberToLong("1.5E12").contains(1500000000000L))
    assert(Json.numberToLong("-2e3").contains(-2000L))
    assert(Json.numberToLong("1.5").isEmpty)   // not a whole ms value
    assert(Json.numberToLong("1e60").isEmpty)  // beyond exact double range
    assert(Json.numberToLong("abc").isEmpty)
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
