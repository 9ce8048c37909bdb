package graft

import graft.model.EntityType
import graft.pipeline.EntityEtlJob
import graft.sink.HttpBatchSink
import graft.source.EntityApiSource
import graft.state.EntityStateStore
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** End-to-end pipeline behavior with a stubbed API + collecting sink:
  * pagination (S3/W4), CDC suppression across pages (F2), at-least-once
  * ordering (W2: send fails => state NOT committed), batch slicing (K1).
  */
object PipelineSpec {
  // static collectors: executors share the JVM in local mode
  val sentBodies = new ConcurrentLinkedQueue[String]()
  @volatile var failSends = false
  def collectingSender: HttpBatchSink.SenderFactory = () => body => {
    if (failSends) throw new RuntimeException("injected sink failure")
    sentBodies.add(body)
  }
}

class PipelineSpec extends SparkSpec {
  import PipelineSpec._

  private val tpl = """{"id": "{{entity.id}}", "x": "{{entity.x}}"}"""

  private def mkJob(store: EntityStateStore, pages: Map[Long, EntityApiSource.Page]): EntityEtlJob = {
    // fetcher keyed on the rendered updatedFromMs — exercises URL templating (E10)
    val fetch: EntityApiSource.Fetcher = url => {
      val ckpt = url.split("updatedFromMs=")(1).toLong
      val page = pages.getOrElse(ckpt, EntityApiSource.Page(Nil, partialResults = false))
      val items = page.items.mkString("[", ",", "]")
      s"""{"items": $items, "partialResults": ${page.partialResults}}"""
    }
    new EntityEtlJob(spark, store, fetch,
      entitiesUrlTemplate = "stub://e?type={{type}}&updatedFromMs={{updatedFromMs}}",
      senderFactory = collectingSender,
      templates = Map("t" -> tpl),
      maxBatchSize = 2, ttlMs = 1000000, now = () => 5000)
  }

  private def entity(id: Int, x: String, ts: Long): String =
    s"""{"id": "$id", "x": "$x", "updatedOnMs": $ts}"""

  test("pagination loop + CDC suppression + batch slicing end-to-end") {
    sentBodies.clear(); failSends = false
    val store = new EntityStateStore(spark, Files.createTempDirectory("pl").toString)
    val pages = Map(
      1L -> EntityApiSource.Page(Seq(entity(1, "a", 10), entity(2, "b", 20), entity(3, "c", 20)), partialResults = true),
      20L -> EntityApiSource.Page(Seq(entity(3, "c", 20), entity(4, "d", 30)), partialResults = false))
    val stats = mkJob(store, pages).runType(EntityType("t", "id"))

    assert(stats.map(_.fetched) == Seq(3, 2))
    // page 2 re-fetches id=3 (inclusive checkpoint boundary, W3) but CDC suppresses it
    assert(stats.map(_.emitted) == Seq(3, 1))
    assert(stats.last.checkpoint == 30)
    // batching is PER PARTITION (parallel load): page1's 3 docs produce
    // 2..3 bodies depending on partition placement, each <= maxBatchSize
    assert(stats.head.batches >= 2 && stats.head.batches <= 3 && stats.last.batches == 1)
    val bodies = sentBodies.asScala.toSeq
    assert(bodies.forall(b => b.startsWith("[") && b.endsWith("]")))
    assert(bodies.map(b => b.count(_ == '{')).sum == 4) // 3 + 1 docs, <=2 each
    assert(bodies.forall(b => b.count(_ == '{') <= 2))
    assert(bodies.mkString.contains(""""x": "d""""))
    // state has all 4 ids, updatedOnMs stripped from cached json
    val (state, ckpt) = store.load("t")
    assert(ckpt == 30 && state.count() == 4)
    assert(!state.select("entityJson").collect().map(_.getString(0)).exists(_.contains("updatedOnMs")))
  }

  test("at-least-once: failed send aborts before state commit (W2, app.js:55-58)") {
    sentBodies.clear(); failSends = true
    val store = new EntityStateStore(spark, Files.createTempDirectory("pl2").toString)
    val pages = Map(1L -> EntityApiSource.Page(Seq(entity(1, "a", 10)), partialResults = false))
    intercept[Exception] { mkJob(store, pages).runType(EntityType("t", "id")) }
    // nothing committed: next run re-fetches from the default checkpoint
    val (state, ckpt) = store.load("t")
    assert(state.count() == 0 && ckpt == 1)
    // recovery: the retry re-sends and commits (effectively-once via F2+idempotent PUT)
    failSends = false
    val stats = mkJob(store, pages).runType(EntityType("t", "id"))
    assert(stats.head.emitted == 1 && store.load("t")._2 == 10)
  }

  test("parallelism=4 run ≡ serial run: per-type PageStats and final state identical") {
    sentBodies.clear(); failSends = false
    val names = (0 until 4).map(i => s"pt$i")
    // per-type two-page feeds with DISTINCT ids/timestamps so any
    // cross-type state bleed would shift a checkpoint or a count
    def pagesFor(i: Int): Map[Long, EntityApiSource.Page] = Map(
      1L -> EntityApiSource.Page(
        Seq(entity(100 * i + 1, s"a$i", 10 + i), entity(100 * i + 2, s"b$i", 20 + i)),
        partialResults = true),
      (20L + i) -> EntityApiSource.Page(
        Seq(entity(100 * i + 3, s"c$i", 30 + i)), partialResults = false))
    val fetch: EntityApiSource.Fetcher = url => {
      val tpe = url.split("type=")(1).split("&")(0)
      val ckpt = url.split("updatedFromMs=")(1).toLong
      val page = pagesFor(tpe.stripPrefix("pt").toInt)
        .getOrElse(ckpt, EntityApiSource.Page(Nil, partialResults = false))
      s"""{"items": ${page.items.mkString("[", ",", "]")}, "partialResults": ${page.partialResults}}"""
    }
    def mk(root: String, par: Int) = new EntityEtlJob(spark,
      new EntityStateStore(spark, root), fetch,
      entitiesUrlTemplate = "stub://e?type={{type}}&updatedFromMs={{updatedFromMs}}",
      senderFactory = collectingSender,
      templates = names.map(_ -> tpl).toMap,
      maxBatchSize = 2, ttlMs = 1000000, now = () => 5000, parallelism = par)
    val types = names.map(n => EntityType(n, "id"))
    val serialRoot = Files.createTempDirectory("pl-ser").toString
    val parRoot = Files.createTempDirectory("pl-par").toString
    val serial = mk(serialRoot, 1).run(types)
    val parallel = mk(parRoot, 4).run(types)
    assert(parallel == serial,
      s"per-type stats diverge under parallelism=4: $parallel vs $serial")
    names.foreach { n =>
      val (ss, sc) = new EntityStateStore(spark, serialRoot).load(n)
      val (ps, pc) = new EntityStateStore(spark, parRoot).load(n)
      assert(pc == sc, s"checkpoint diverges for $n")
      val key = ss.columns.toSeq
      assert(ps.collect().map(_.toString).sorted.toSeq ==
        ss.collect().map(_.toString).sorted.toSeq, s"state diverges for $n ($key)")
    }
  }

  test("parallel run refuses duplicate type names (cross-type state-path collision)") {
    sentBodies.clear(); failSends = false
    val store = new EntityStateStore(spark, Files.createTempDirectory("pl-dup").toString)
    val job = new EntityEtlJob(spark, store,
      url => """{"items": [], "partialResults": false}""",
      entitiesUrlTemplate = "stub://e?type={{type}}&updatedFromMs={{updatedFromMs}}",
      senderFactory = collectingSender, templates = Map("t" -> tpl),
      maxBatchSize = 2, ttlMs = 1000000, now = () => 5000, parallelism = 2)
    val dup = Seq(EntityType("t", "id"), EntityType("t", "id"))
    val e = intercept[IllegalArgumentException] { job.run(dup) }
    assert(e.getMessage.contains("state path"),
      s"expected loud state-path collision refusal, got: ${e.getMessage}")
  }

  test("types without a template are skipped (app.js:22-25); CLI filter respected (F1)") {
    sentBodies.clear(); failSends = false
    val store = new EntityStateStore(spark, Files.createTempDirectory("pl3").toString)
    val job = mkJob(store, Map.empty)
    val ran = job.run(Seq(EntityType("t", "id"), EntityType("untemplated", "id")))
    assert(ran.keySet == Set("t"))
    assert(job.run(Seq(EntityType("t", "id")), requested = Seq("other")).isEmpty)
  }

  test("EtlConfig loads the reference config.json shape (config.json:1-23, app.js:11)") {
    import graft.pipeline.EtlConfig
    // the real reference config is the golden input, like the .hbs goldens
    val cfg = EtlConfig.load(java.nio.file.Paths.get("/root/reference/config.json"))
    assert(cfg.logLevel == "info")
    assert(cfg.sfxHeaders == Map("X-SF-TOKEN" -> "{{env.SIGNALFX_ACCESS_TOKEN}}"))
    assert(cfg.typesUrl == "https://api.us1.signalfx.com/v2/entities/types")
    assert(cfg.entitiesUrlTemplate ==
      "https://api.us1.signalfx.com/v2/entities?type={{type}}&updatedFromMs={{updatedFromMs}}")
    assert(cfg.targetMethod == "PUT" && cfg.maxBatchSize == 10000)
    assert(cfg.targetHeaders("Content-Type") == "application/json")
    assert(cfg.ttlMs == 8L * 3600 * 1000)
    // url.resolve semantics (http.js:12): absolute endpoint replaces the
    // server's trailing slash; {{type}}/{{env.X}} render per type
    assert(cfg.targetUrlFor("vm", Map("BAR" -> "baz")) == "http://localhost:9090/sample/vm?foo=baz")
    // wiring fails fast when a header's env var is unset at construction
    intercept[IllegalArgumentException] {
      EtlConfig.buildJob(spark, new EntityStateStore(spark,
        Files.createTempDirectory("plc").toString), cfg, Map("vm" -> "{}"), "vm",
        env = () => Map("MY_SECRET_TOKEN" -> "t", "BAR" -> "b")) // SIGNALFX token missing
    }
    // with every referenced var present, the job wires end-to-end
    val job = EtlConfig.buildJob(spark, new EntityStateStore(spark,
      Files.createTempDirectory("plc2").toString), cfg, Map("vm" -> "{}"), "vm",
      env = () => Map("SIGNALFX_ACCESS_TOKEN" -> "s", "MY_SECRET_TOKEN" -> "t", "BAR" -> "b"))
    assert(job != null)
  }

  test("resolveUrl: an absolute endpoint replaces the server's base path (node url.resolve)") {
    import graft.pipeline.EtlConfig
    val cfg = EtlConfig.fromJson(
      """{"sfx": {"server": "https://host/api", "entitiesEndpoint": "/v2/entities?type={{type}}"}}""")
    // node: url.resolve("https://host/api", "/v2/...") == "https://host/v2/..."
    assert(cfg.entitiesUrlTemplate == "https://host/v2/entities?type={{type}}")
    // relative endpoint appends
    val rel = EtlConfig.fromJson(
      """{"sfx": {"server": "https://host/api", "entitiesEndpoint": "v2/e"}}""")
    assert(rel.entitiesUrlTemplate == "https://host/api/v2/e")
  }
}
