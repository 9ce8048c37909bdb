package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Batched HTTP load sink (SURVEY.md §2 row K1, §2.10 W2).
  *
  * The reference slices rendered documents into <=maxBatchSize chunks, wraps
  * each in `[doc1,doc2,...]` (targetBody.hbs:2) and PUTs them serially
  * (reference app.js:88-112). Spark-first: each *partition* streams its rows
  * through `Iterator.grouped(maxBatchSize)` and posts its own batches —
  * partitions load in parallel (the reference is fully serial; SURVEY.md §3),
  * memory stays bounded (no collect), and batch assembly is a plain
  * `mkString(",")` exactly like targetBody.hbs.
  *
  * Delivery is at-least-once: the send happens before the state commit
  * (reference app.js:55-58), and a retried Spark task re-sends its
  * partition. The reference has the same property across crashed runs and
  * relies on an idempotent target method (PUT) — we document the same
  * requirement (SURVEY.md §7.5 risk 3).
  */
object HttpBatchSink {

  /** Pluggable transport: (body) => (). Must throw on failure (fail-fast,
    * reference http.js:19). Instantiated per partition on the executor.
    */
  type SenderFactory = () => String => Unit

  /** Header VALUES are templates re-rendered against `env()` on every
    * request (reference http.js:22-28): `Authorization: Bearer {{env.TOKEN}}`
    * picks up a rotated token without restarting the run.
    *
    * The DEFAULT env is a snapshot of the DRIVER's sys.env taken here, at
    * construction — the same map validation runs against. The request
    * closure executes on EXECUTORS, whose process env does not carry the
    * driver's exported variables on a real cluster manager; a live
    * `() => sys.env` default would validate TOKEN on the driver and then
    * render "" on every executor (the exact 401 the fail-fast exists to
    * prevent). Pass a custom `env` for live rotation — it evaluates
    * wherever the request runs.
    */
  def httpSender(url: String, method: String, headers: Map[String, String],
                 timeout: Duration = Duration.ofSeconds(60),
                 env: () => Map[String, String] = { val snap = sys.env; () => snap }): SenderFactory = {
    // construction-time fail-fast: malformed header templates and env vars
    // missing at startup are config errors, not per-request 401s
    graft.template.TemplateCompiler.validateHeaderTemplates(headers, env())
    () => {
      val client = HttpClient.newBuilder().connectTimeout(timeout).build()
      body => {
        val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout)
          .method(method, HttpRequest.BodyPublishers.ofString(body))
        val e = env()
        headers.foreach { case (k, v) =>
          b.header(k, graft.template.TemplateCompiler.renderWithEnv(v, Map.empty, e))
        }
        val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode / 100 == 2, s"$method $url -> HTTP ${resp.statusCode}")
      }
    }
  }

  /** Keyed transport for effectively-once delivery:
    * (idempotencyKey, body) => Unit. Must throw on failure.
    */
  type KeyedSenderFactory = () => (String, String) => Unit

  /** [[httpSender]] that also stamps each request with its batch's
    * idempotency key in `keyHeader` (the `Idempotency-Key` convention) —
    * the transport half of [[sendIdempotent]].
    */
  def httpKeyedSender(url: String, method: String, headers: Map[String, String],
                      keyHeader: String = "Idempotency-Key",
                      timeout: Duration = Duration.ofSeconds(60),
                      env: () => Map[String, String] = { val snap = sys.env; () => snap })
    : KeyedSenderFactory = {
    graft.template.TemplateCompiler.validateHeaderTemplates(headers, env())
    () => {
      val client = HttpClient.newBuilder().connectTimeout(timeout).build()
      (key, body) => {
        val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout)
          .method(method, HttpRequest.BodyPublishers.ofString(body))
        val e = env()
        headers.foreach { case (k, v) =>
          b.header(k, graft.template.TemplateCompiler.renderWithEnv(v, Map.empty, e))
        }
        b.header(keyHeader, key)
        val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode / 100 == 2, s"$method $url -> HTTP ${resp.statusCode}")
      }
    }
  }

  /** Send `docs` (a single string column of rendered documents) in batches.
    * Skips empty input without a request (reference app.js:89-91).
    *
    * @return number of batches sent (driver-visible, via accumulator).
    *         Task retries re-send AND re-count — the value can exceed
    *         ceil(n/maxBatchSize) under failures, consistent with the
    *         at-least-once delivery contract (W2).
    */
  def send(docs: DataFrame, maxBatchSize: Int, senderFactory: SenderFactory,
           targetBody: Option[String] = None): Long = {
    require(maxBatchSize > 0, "maxBatchSize must be positive")
    val sent: LongAccumulator = docs.sparkSession.sparkContext.longAccumulator("graft.batchesSent")
    val colName = docs.columns.head
    // targetBody is replaceable data like every other template
    // (reference templates.js:43, app.js:106); the default fast path is the
    // shipped targetBody.hbs:2 semantics as a plain mkString
    val assemble: Seq[String] => String = targetBody match {
      case Some(t) => chunk => graft.template.TemplateCompiler.renderBatchBody(t, chunk)
      case None    => chunk => chunk.mkString("[", ",", "]")
    }
    docs.select(col(colName).cast("string")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val send = senderFactory()
          it.map(_.getString(0)).grouped(maxBatchSize).foreach { chunk =>
            send(assemble(chunk))
            sent.add(1)
          }
        }
    }
    sent.value
  }

  /** The at-least-once → EFFECTIVELY-ONCE upgrade the reference's design
    * keeps promising and never ships ("the idempotent target method makes
    * it effectively-once", README-level W2 discussion): every batch
    * carries a DETERMINISTIC idempotency key
    * `sha256(context ⊕ slice position ⊕ batch body)`, so a target that records applied
    * keys (the standard `Idempotency-Key` contract) applies each batch
    * exactly once however many times a Spark task retry, a crashed run's
    * replay from the uncommitted checkpoint, or a duplicate page re-sends
    * it.
    *
    * `context` should name the UNIT OF REPLAY — `s"$entityType:$checkpoint"`
    * — so re-sends of the same page under the same checkpoint collide (as
    * they must) while a later incremental pass with a new checkpoint never
    * collides with history. The slice identity inside the page is the
    * batch CONTENT hash mixed with the batch's (partition id, ordinal):
    * content alone would alias two DISTINCT batches with identical bodies
    * under one checkpoint — an idempotency-honoring APPEND target would
    * apply only one, silent loss, the failure mode this key must never
    * have — while position alone would collide across checkpoints.
    *
    * The replay-collision guarantee, stated honestly: keys collide across
    * task retries and whole-run replays whenever the replay re-plans
    * IDENTICALLY — deterministic upstream plan AND the same partitioning
    * (parallelism, `spark.sql.files.maxPartitionBytes`, upstream file
    * layout unchanged), which is what a Spark task retry and a same-config
    * crash replay give. A replay that re-plans with DIFFERENT partitioning
    * re-slices the page into different batches (different bodies — there
    * is nothing batch-grained left to collide), so its keys are fresh and
    * delivery for the overlapping content degrades to the documented
    * at-least-once floor; an idempotent target needs row-grained dedup to
    * absorb that case. Positional mixing is the safe side of this
    * trade-off: the alternative (content-only keys) turns the same
    * re-planned replay into silent LOSS instead of duplicates. Against a
    * target that ignores the key entirely, delivery is plain
    * at-least-once — never worse.
    */
  def sendIdempotent(docs: DataFrame, maxBatchSize: Int,
                     senderFactory: KeyedSenderFactory, context: String,
                     targetBody: Option[String] = None): Long = {
    require(maxBatchSize > 0, "maxBatchSize must be positive")
    val sent: LongAccumulator = docs.sparkSession.sparkContext.longAccumulator("graft.batchesSent")
    val colName = docs.columns.head
    val assemble: Seq[String] => String = targetBody match {
      case Some(t) => chunk => graft.template.TemplateCompiler.renderBatchBody(t, chunk)
      case None    => chunk => chunk.mkString("[", ",", "]")
    }
    docs.select(col(colName).cast("string")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val send = senderFactory()
          val md = java.security.MessageDigest.getInstance("SHA-256")
          // (partition id, batch ordinal) ride the key alongside the body
          // hash: two DISTINCT batches with identical bodies under one
          // checkpoint must not share a key (an idempotency-honoring
          // append target would apply only one — silent loss). Both are
          // stable across task retries for a deterministic plan, so
          // replays still collide as the contract requires.
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var ordinal = 0L
          it.map(_.getString(0)).grouped(maxBatchSize).foreach { chunk =>
            val body = assemble(chunk)
            md.reset()
            md.update(context.getBytes("UTF-8"))
            md.update(0.toByte) // unambiguous context/body separator
            md.update(s"$pid:$ordinal".getBytes("UTF-8"))
            md.update(0.toByte)
            md.update(body.getBytes("UTF-8"))
            val key = md.digest().map("%02x".format(_)).mkString
            ordinal += 1
            send(key, body)
            sent.add(1)
          }
        }
    }
    sent.value
  }
}
