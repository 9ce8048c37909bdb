package graft

import graft.template.TemplateCompiler
import graft.template.TemplateCompiler._
import org.apache.spark.sql.functions._

/** Golden renders for the template compiler — the E1-E8 construct surface of
  * the reference's 20 shipped templates (SURVEY.md §2.4), including the
  * awsElb golden pair from the reference's own test
  * (test/templates.test.js:24-43, FIXTURES.md A4).
  */
class TemplateCompilerSpec extends SparkSpec {
  import spark.implicits._

  private def render(tpl: String, entity: Map[String, String],
                     env: Map[String, String] = Map.empty, escape: Boolean = false): String =
    Seq(entity).toDF("attrs")
      .select(TemplateCompiler.compileTemplate(tpl, mapResolver(col("attrs"), env), escape).as("doc"))
      .head().getString(0)

  // The awsElb-shaped golden pair (reference test/templates.test.js:24-43):
  // rename + #with coalesce + literal passthrough.
  private val elbLike =
    """{"cmdb_ci": "{{entity.aws_arn}}", "asset": "{{entity.AWSUniqueId}}", "install_date": "{{entity.aws_create_time}}", "name": "{{#with entity.aws_tag_Name}}{{.}}{{else}}{{entity.aws_arn}}{{/with}}", "type": "{{entity.type}}"}"""

  test("golden: elb-like template renders rename/coalesce/literals") {
    val out = render(elbLike, Map(
      "aws_arn" -> "arn-1", "AWSUniqueId" -> "awsuid-2",
      "aws_create_time" -> "2020-05-12T12:34:56.123Z", "aws_tag_Name" -> "name-3",
      "type" -> "ELB"))
    assert(out ==
      """{"cmdb_ci": "arn-1", "asset": "awsuid-2", "install_date": "2020-05-12T12:34:56.123Z", "name": "name-3", "type": "ELB"}""")
  }

  test("#with falls back when the tested field is missing OR empty (E3)") {
    val out = render(elbLike, Map("aws_arn" -> "arn-1", "aws_tag_Name" -> "", "type" -> "T"))
    assert(out.contains(""""name": "arn-1""""))
    val out2 = render(elbLike, Map("aws_arn" -> "arn-1", "type" -> "T"))
    assert(out2.contains(""""name": "arn-1""""))
  }

  test("missing keys render as empty string (E1, Handlebars default)") {
    val out = render("""a={{entity.nope}};b={{entity.b}}""", Map("b" -> "B"))
    assert(out == "a=;b=B")
  }

  test("interpolation and literal text concat (E4/E5)") {
    val out = render("""AWS Lambda/{{entity.rt}} v{{entity.ver}}""", Map("rt" -> "java17", "ver" -> "2"))
    assert(out == "AWS Lambda/java17 v2")
  }

  test("escaping: default-off keeps raw; escape mode escapes stash but not triple-stash (E2/E8)") {
    val e = Map("x" -> "a&b", "y" -> "c<d")
    assert(render("""{{entity.x}}|{{{entity.y}}}""", e) == "a&b|c<d")
    assert(render("""{{entity.x}}|{{{entity.y}}}""", e, escape = true) == "a&amp;b|c<d")
  }

  test("env substitution (E9) resolves at compile time") {
    assert(render("""tok={{env.TOKEN}}""", Map.empty, env = Map("TOKEN" -> "s3cr3t")) == "tok=s3cr3t")
  }

  test("nested #with inside fallback") {
    val tpl = """{{#with entity.a}}A={{.}}{{else}}{{#with entity.b}}B={{.}}{{else}}none{{/with}}{{/with}}"""
    assert(render(tpl, Map("a" -> "1", "b" -> "2")) == "A=1")
    assert(render(tpl, Map("b" -> "2")) == "B=2")
    assert(render(tpl, Map.empty) == "none")
  }

  test("renderString drives driver-side URL templating (E10, templates.js:36-40)") {
    val url = TemplateCompiler.renderString(
      "https://host/v2/entities?type={{type}}&updatedFromMs={{updatedFromMs}}",
      Map("type" -> "awsEc2", "updatedFromMs" -> "1700000000000"))
    assert(url == "https://host/v2/entities?type=awsEc2&updatedFromMs=1700000000000")
  }

  test("loadTemplateDir scans *.hbs files generically (templates.js:15-28)") {
    val dir = java.nio.file.Files.createTempDirectory("tpl")
    java.nio.file.Files.writeString(dir.resolve("awsEc2.hbs"), """{"a": "{{entity.x}}"}""")
    java.nio.file.Files.writeString(dir.resolve("gce.hbs"), """{"b": "{{entity.y}}"}""")
    java.nio.file.Files.writeString(dir.resolve("notes.txt"), "ignored")
    val loaded = TemplateCompiler.loadTemplateDir(dir)
    assert(loaded.keySet == Set("awsEc2", "gce"))
    assert(loaded("awsEc2").contains("entity.x"))
    assert(TemplateCompiler.loadTemplateDir(dir.resolve("missing")).isEmpty)
  }

  test("parse rejects unbalanced constructs") {
    intercept[IllegalArgumentException](TemplateCompiler.parse("{{#with entity.a}}no close"))
    intercept[IllegalArgumentException](TemplateCompiler.parse("{{unterminated"))
  }
}
