package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.model.EntityType
import graft.pipeline.EntityEtlJob
import graft.sink.HttpBatchSink
import graft.source.EntityApiSource
import graft.state.EntityStateStore
import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** End-to-end loopback over the REAL HTTP stack (java.net.http client against
  * an in-process com.sun.net.httpserver): extract -> CDC -> template ->
  * batched PUT load -> state commit, plus fail-fast on non-2xx (reference
  * http.js:19) — the layer the reference ships untested (SURVEY.md §5).
  */
object HttpLoopbackSpec {
  val received = new ConcurrentLinkedQueue[(String, String)]() // (method, body)
  val tokens = new ConcurrentLinkedQueue[String]() // X-Token header per request
  @volatile var failPuts = false
  @volatile var liveToken = "tok-1" // simulated rotating credential
  // idempotent-target state: applied bodies keyed by Idempotency-Key; a
  // replayed key ACKs 200 without re-applying (the standard contract)
  val applied = new java.util.concurrent.ConcurrentHashMap[String, String]()
  val keyedRequests = new ConcurrentLinkedQueue[String]() // every key seen
  @volatile var failAfterFirstApply = false
}

class HttpLoopbackSpec extends SparkSpec {
  import HttpLoopbackSpec._

  private def withServer[A](f: Int => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val pages = Map(
      1L ->
        """{"items": [{"uid": "a", "color": "red", "updatedOnMs": 100},
          |           {"uid": "b", "color": "blue", "updatedOnMs": 200}], "partialResults": true}""".stripMargin,
      200L ->
        """{"items": [{"uid": "b", "color": "blue", "updatedOnMs": 200},
          |           {"uid": "c", "color": "green", "updatedOnMs": 300}], "partialResults": false}""".stripMargin)
    server.createContext("/v2/entities", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val query = Option(ex.getRequestURI.getQuery).getOrElse("")
        val ckpt = query.split("&").collectFirst {
          case kv if kv.startsWith("updatedFromMs=") => kv.stripPrefix("updatedFromMs=").toLong
        }.getOrElse(1L)
        val body = pages.getOrElse(ckpt, """{"items": [], "partialResults": false}""")
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    server.createContext("/v2/types", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        Option(ex.getRequestHeaders.getFirst("X-Token")).foreach(tokens.add)
        val body = """[{"name": "widget", "uniqueIdField": "uid"}]"""
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body.getBytes); ex.close()
      }
    })
    server.createContext("/load", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        Option(ex.getRequestHeaders.getFirst("X-Token")).foreach(tokens.add)
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        if (failPuts) { ex.sendResponseHeaders(503, -1); ex.close() }
        else {
          received.add((ex.getRequestMethod, body))
          ex.sendResponseHeaders(200, -1); ex.close()
        }
      }
    })
    server.createContext("/load-idem", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val key = Option(ex.getRequestHeaders.getFirst("Idempotency-Key")).getOrElse("")
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        keyedRequests.add(key)
        if (applied.containsKey(key)) {
          // replayed batch: acknowledge, do NOT re-apply
          ex.sendResponseHeaders(200, -1); ex.close()
        } else if (failAfterFirstApply && applied.size() >= 1) {
          // injected mid-page failure: the SECOND distinct batch 503s
          ex.sendResponseHeaders(503, -1); ex.close()
        } else {
          applied.put(key, body)
          ex.sendResponseHeaders(200, -1); ex.close()
        }
      }
    })
    server.start()
    try f(server.getAddress.getPort) finally server.stop(0)
  }

  test("full pipeline over live HTTP: types scan, paginated fetch, CDC, batched PUT, commit") {
    received.clear(); failPuts = false
    withServer { port =>
      val fetch = EntityApiSource.httpFetcher(Map("X-Token" -> "t"))
      val types = EntityApiSource.fetchEntityTypes(fetch, s"http://127.0.0.1:$port/v2/types")
      assert(types == Seq(EntityType("widget", "uid")))

      val store = new EntityStateStore(spark, Files.createTempDirectory("http-e2e").toString)
      val job = new EntityEtlJob(spark, store, fetch,
        entitiesUrlTemplate = s"http://127.0.0.1:$port/v2/entities?type={{type}}&updatedFromMs={{updatedFromMs}}",
        senderFactory = HttpBatchSink.httpSender(s"http://127.0.0.1:$port/load", "PUT", Map("X-Token" -> "t")),
        templates = Map("widget" -> """{"id": "{{entity.uid}}", "color": "{{entity.color}}"}"""),
        maxBatchSize = 10)
      val stats = job.run(types)("widget")

      assert(stats.map(_.fetched) == Seq(2, 2))
      // page 2 re-fetches uid=b (inclusive boundary) -> suppressed by CDC
      assert(stats.map(_.emitted) == Seq(2, 1))
      assert(stats.last.checkpoint == 300)
      val bodies = received.asScala.toSeq
      assert(bodies.forall(_._1 == "PUT"))
      val all = bodies.map(_._2).mkString
      assert(all.contains(""""color": "green"""") && all.contains(""""id": "a""""))
      assert(store.load("widget")._1.count() == 3)
    }
  }

  test("per-request env header rendering: a rotated token reaches the next request (E9, http.js:22-28)") {
    import spark.implicits._
    received.clear(); tokens.clear(); failPuts = false
    liveToken = "tok-1"
    withServer { port =>
      // source side: header template re-renders against the live env per fetch
      val fetch = EntityApiSource.httpFetcher(
        Map("X-Token" -> "Bearer {{env.TOKEN}}"), env = () => Map("TOKEN" -> liveToken))
      fetch(s"http://127.0.0.1:$port/v2/types")
      liveToken = "tok-2"
      fetch(s"http://127.0.0.1:$port/v2/types")
      assert(tokens.asScala.toSeq == Seq("Bearer tok-1", "Bearer tok-2"))

      // sink side: same semantics across two send() calls
      tokens.clear()
      val sender = HttpBatchSink.httpSender(s"http://127.0.0.1:$port/load", "PUT",
        Map("X-Token" -> "{{env.TOKEN}}"), env = () => Map("TOKEN" -> liveToken))
      val docs = Seq("""{"id":"1"}""").toDF("doc")
      HttpBatchSink.send(docs, 10, sender)
      liveToken = "tok-3"
      HttpBatchSink.send(docs, 10, sender)
      assert(tokens.asScala.toSeq == Seq("tok-2", "tok-3"))
    }
  }

  test("user-supplied targetBody template wraps the batch (templates.js:43, app.js:106)") {
    import spark.implicits._
    received.clear(); failPuts = false
    withServer { port =>
      val sender = HttpBatchSink.httpSender(s"http://127.0.0.1:$port/load", "PUT", Map.empty)
      val docs = Seq("""{"id":"1"}""", """{"id":"2"}""").toDF("doc").coalesce(1)
      val tpl = """{"entities": [{{#each entities}}{{{.}}}{{#unless @last}},{{/unless}}{{/each}}]}"""
      HttpBatchSink.send(docs, 10, sender, Some(tpl))
      assert(received.asScala.toSeq.map(_._2) ==
        Seq("""{"entities": [{"id":"1"},{"id":"2"}]}"""))
    }
  }

  test("idempotent-key sink: replay after mid-page failure applies every batch exactly once (W2 upgrade)") {
    import spark.implicits._
    applied.clear(); keyedRequests.clear()
    withServer { port =>
      val sender = HttpBatchSink.httpKeyedSender(
        s"http://127.0.0.1:$port/load-idem", "PUT", Map.empty)
      // one page = 4 docs in 2 batches of 2; context = type + checkpoint
      // (the unit of replay)
      val docs = Seq("""{"id":"1"}""", """{"id":"2"}""", """{"id":"3"}""", """{"id":"4"}""")
        .toDF("doc").coalesce(1)
      val ctx = "widget:200"

      // attempt 1: batch 1 applies, batch 2 hits the injected 503 → the
      // send (and the run's commit) fails, checkpoint stays — the
      // reference's crash-before-commit shape
      failAfterFirstApply = true
      intercept[Exception] { HttpBatchSink.sendIdempotent(docs, 2, sender, ctx) }
      assert(applied.size() == 1)

      // attempt 2 (the replay from the uncommitted checkpoint): batch 1's
      // key collides → ACKed without re-applying; batch 2 applies
      failAfterFirstApply = false
      val n = HttpBatchSink.sendIdempotent(docs, 2, sender, ctx)
      assert(n == 2)
      assert(applied.size() == 2, "each batch applied EXACTLY once across the replay")
      val allApplied = applied.values().asScala.mkString
      assert(Seq("1", "2", "3", "4").forall(i => allApplied.contains(s"""{"id":"$i"}""")))
      // the wire saw each batch twice (batch 2's first attempt reached the
      // server and 503'd; at-least-once delivery is unchanged) but only
      // TWO distinct keys — the key is what suppressed the duplicate apply
      val k = keyedRequests.asScala.toSeq
      assert(k.size == 4 && k.distinct.size == 2)

      // a LATER page (new checkpoint) with identical content must NOT
      // collide with history: keys namespace by context
      val n2 = HttpBatchSink.sendIdempotent(docs, 2, sender, "widget:300")
      assert(n2 == 2 && applied.size() == 4)
    }
  }

  test("non-2xx from the target fails fast and nothing commits (W2)") {
    received.clear(); failPuts = true
    withServer { port =>
      val fetch = EntityApiSource.httpFetcher(Map.empty)
      val store = new EntityStateStore(spark, Files.createTempDirectory("http-e2e2").toString)
      val job = new EntityEtlJob(spark, store, fetch,
        entitiesUrlTemplate = s"http://127.0.0.1:$port/v2/entities?type={{type}}&updatedFromMs={{updatedFromMs}}",
        senderFactory = HttpBatchSink.httpSender(s"http://127.0.0.1:$port/load", "PUT", Map.empty),
        templates = Map("widget" -> """{"id": "{{entity.uid}}"}"""),
        maxBatchSize = 10)
      intercept[Exception] { job.runType(EntityType("widget", "uid")) }
      val (state, ckpt) = store.load("widget")
      assert(state.count() == 0 && ckpt == 1) // at-least-once: replay next run
    }
  }
}
