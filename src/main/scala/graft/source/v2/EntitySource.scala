package graft.source.v2

import graft.model.{EntityType, Model}
import graft.source.{EntityApiSource, Json}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 connector for the incremental entity API (SURVEY.md §2.1
  * S1-S3, §2.10 W1/W4) — `spark.read.format("graft-entities")` /
  * `spark.readStream.format("graft-entities")`.
  *
  * The streaming offset IS the reference's per-type checkpoint (epoch-millis
  * `updatedFromMs`, reference cache.js:18/app.js:77): Spark's streaming
  * checkpoint persists it, `latestOffset` advances it by draining the
  * paginated fetch loop (app.js:48-59) including the stall-breaker bump
  * (cache.js:114-117), and the predicate travels inside the URL — the
  * reference's hand-built pushdown, kept (SURVEY.md §4).
  *
  * Options:
  *   - `urlTemplate`     e.g. http://host/v2/entities?type={{type}}&updatedFromMs={{updatedFromMs}}
  *   - `type`            entity type name
  *   - `uniqueIdField`   per-type id key (reference app.js:46)
  *   - `checkpoint`      initial updatedFromMs (default 1 = full history)
  *   - `fetcherClass`    FQCN of a [[FetcherFactory]] (tests plug stubs;
  *                       default is the java.net.http transport)
  *   - `header.<name>`   HTTP headers for the default transport
  *   - `maxPagesPerBatch` admission control: at most this many pages are
  *                       drained per micro-batch (default unbounded). The
  *                       first run against a deep backlog (checkpoint=1 =>
  *                       full history) would otherwise drain EVERYTHING into
  *                       driver memory as one batch; with the cap the
  *                       backlog walks forward across micro-batches, each
  *                       committing its own checkpoint.
  */
class EntityTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-entities"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Model.entityBatchSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EntityTable(EntitySourceConfig.from(new CaseInsensitiveStringMap(properties)))
}

/** Pluggable page transport, instantiated by FQCN on the driver. */
trait FetcherFactory extends Serializable {
  def fetcher(options: Map[String, String]): EntityApiSource.Fetcher
}

final class HttpFetcherFactory extends FetcherFactory {
  override def fetcher(options: Map[String, String]): EntityApiSource.Fetcher = {
    val headers = options.collect { case (k, v) if k.startsWith("header.") => k.stripPrefix("header.") -> v }
    EntityApiSource.httpFetcher(headers)
  }
}

final case class EntitySourceConfig(
    urlTemplate: String, entityType: EntityType, startCheckpoint: Long,
    fetcherClass: String, options: Map[String, String],
    maxPagesPerBatch: Int = Int.MaxValue) {
  def fetch: EntityApiSource.Fetcher =
    Class.forName(fetcherClass).getDeclaredConstructor().newInstance()
      .asInstanceOf[FetcherFactory].fetcher(options)
}

object EntitySourceConfig {
  def from(options: CaseInsensitiveStringMap): EntitySourceConfig = {
    val m = options.asCaseSensitiveMap().asScala.toMap
    EntitySourceConfig(
      urlTemplate = options.get("urlTemplate"),
      entityType = EntityType(options.get("type"), options.get("uniqueIdField")),
      startCheckpoint = Option(options.get("checkpoint")).map(_.toLong).getOrElse(Model.DefaultCheckpoint),
      fetcherClass = Option(options.get("fetcherClass")).getOrElse(classOf[HttpFetcherFactory].getName),
      options = m,
      maxPagesPerBatch = Option(options.get("maxPagesPerBatch")).map(_.toInt).getOrElse(Int.MaxValue))
  }
}

class EntityTable(config: EntitySourceConfig) extends Table with SupportsRead {
  override def name(): String = s"graft-entities(${config.entityType.name})"
  override def schema(): StructType = Model.entityBatchSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new EntityScan(config)
    }
}

/** Drains the pagination loop from `from` until !partialResults; returns
  * (raw item json strings, final checkpoint). Driver-side, like the
  * reference (pages are causally sequential — each page's window starts at
  * the previous page's max event time).
  */
object PageDrain {
  /** Drained items grouped BY PAGE: v1's `spark.read.json` infers one type
    * per column per page, so page membership decides which integral values
    * render through the double path (see [[EntityScan.pageWidenKeys]]) —
    * flattening here would lose that and re-introduce v1<->v2 hash drift.
    */
  def drain(config: EntitySourceConfig, from: Long,
            maxPages: Int = Int.MaxValue): (Seq[Seq[String]], Long) =
    walk(config, from, maxPages, retain = true)

  /** Walk the pagination loop to the current backlog end WITHOUT retaining
    * items — O(one page) memory. Used by the AvailableNow prepare step to
    * fix the run's end offset; the per-batch drains then re-fetch pages
    * under their own cap.
    */
  def probeEnd(config: EntitySourceConfig, from: Long): Long =
    walk(config, from, Int.MaxValue, retain = false)._2

  private def walk(config: EntitySourceConfig, from: Long, maxPages: Int,
                   retain: Boolean): (Seq[Seq[String]], Long) = {
    val fetch = config.fetch
    val items = Seq.newBuilder[Seq[String]]
    var checkpoint = from
    var partial = true
    var pages = 0
    while (partial && pages < maxPages) {
      pages += 1
      val page = EntityApiSource.fetchPage(fetch, config.urlTemplate, config.entityType, checkpoint)
      if (retain && page.items.nonEmpty) items += page.items
      val maxTs = page.items.flatMap(Json.parseFlatObject(_).get(Model.UpdatedOnMs))
        .flatMap(Json.numberToLong)
      // checkpoint = max(updatedOnMs) over all fetched items (cache.js:100-108);
      // invalid/absent keeps previous; stall bump under partialResults (:114-117)
      val next = if (maxTs.isEmpty) checkpoint else math.max(checkpoint, maxTs.max)
      checkpoint = if (page.partialResults && next == checkpoint) checkpoint + 1 else next
      partial = page.partialResults
    }
    (items.result(), checkpoint)
  }
}

class EntityScan(config: EntitySourceConfig) extends Scan {
  override def readSchema(): StructType = Model.entityBatchSchema
  override def description(): String = s"graft-entities scan (${config.entityType.name})"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val (items, _) = PageDrain.drain(config, config.startCheckpoint)
      EntityScan.partition(items, config.entityType.uniqueIdField)
    }
    override def createReaderFactory(): PartitionReaderFactory = EntityReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EntityMicroBatchStream(config)
}

object EntityScan {
  /** Keys v1's PER-PAGE schema inference types as DOUBLE because at least
    * one item on the page carries a fractional/exponent value for them: the
    * reader must render INTEGRAL values of those keys through the double
    * path too ("2" -> "2.0"), or a page mixing {"n":2} and {"n":2.5} hashes
    * differently through the two source paths and the entity is re-emitted
    * on a v1<->v2 migration. (A page whose values for a key are uniformly
    * integral keeps the long rendering, matching v1's long column.)
    */
  private[v2] def pageWidenKeys(page: Seq[String]): Set[String] =
    page.iterator.flatMap(item => Json.parseFlatObjectTyped(item).collect {
      case (k, s) if s.kind == Json.Scalar.Num && !s.raw.matches("-?\\d+") => k
    }).toSet

  /** Split drained pages into input partitions (rows were fetched on the
    * driver; executors parse them — parallelism in parse + downstream).
    * Each item carries its page's widen-key set so chunking is free to
    * cross page boundaries.
    */
  def partition(pages: Seq[Seq[String]], idField: String, slices: Int = 8): Array[InputPartition] = {
    val tagged = pages.flatMap { page =>
      val widen = pageWidenKeys(page)
      page.map(item => (item, widen))
    }
    if (tagged.isEmpty) Array.empty
    else tagged.grouped(math.max(1, math.ceil(tagged.size.toDouble / slices).toInt))
      .map(chunk => EntityInputPartition(chunk.map(_._1).toArray, idField,
        chunk.map(_._2).toArray): InputPartition).toArray
  }
}

final case class EntityInputPartition(items: Array[String], idField: String,
    widenKeys: Array[Set[String]]) extends InputPartition

/** Streaming offset = the entity checkpoint (epoch millis). */
final case class CheckpointOffset(ms: Long) extends Offset {
  override def json(): String = ms.toString
}

class EntityMicroBatchStream(config: EntitySourceConfig)
    extends MicroBatchStream with SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  // pages drained for the current (start, end] window, keyed by end offset
  @volatile private var pending: (Long, Seq[Seq[String]]) = (config.startCheckpoint, Seq.empty)
  // AvailableNow: the backlog end fixed at prepare time; batches never pass it
  @volatile private var availableNowEnd: Option[Long] = None
  @volatile private var availableNowActive: Boolean = false

  override def initialOffset(): Offset = CheckpointOffset(config.startCheckpoint)
  override def deserializeOffset(json: String): Offset = CheckpointOffset(json.toLong)

  /** The page cap is the admission-control unit here (pages arrive serially
    * from the remote API; rows-per-page is the server's choice), so the
    * ReadLimit argument is not consulted — the cap always applies.
    */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Trigger.AvailableNow contract: fix the CURRENT backlog end as this
    * run's target, then let the capped micro-batches walk to it — without
    * this, Spark's generic wrapper captures ONE capped drain as the whole
    * run and a deep backlog stops after maxPagesPerBatch pages. The probe
    * walks pages without retaining items (O(page) memory); rows arriving
    * after the probe are excluded by the same bound the replay path uses
    * and picked up by the next run, exactly like the reference's cron
    * (crontab:1) picks up from the committed checkpoint.
    *
    * The probe is DEFERRED to the first `latestOffset` call: prepare runs
    * before Spark hands the source its restored offset, so probing here
    * would have to start from `config.startCheckpoint` and re-walk the
    * full API history on every cron run of a long-lived pipeline; the
    * first `latestOffset` receives the committed checkpoint and probes
    * only the actual backlog.
    */
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowActive = true
    availableNowEnd = None
  }

  /** Drain at most `maxPagesPerBatch` pages past `start`; a deep backlog
    * surfaces as successive micro-batches, each advancing the persisted
    * checkpoint, instead of one unbounded driver-memory batch (W4).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CheckpointOffset].ms
    if (availableNowActive && availableNowEnd.isEmpty)
      availableNowEnd = Some(PageDrain.probeEnd(config, from))
    val (drained, drainedNext) = PageDrain.drain(config, from, config.maxPagesPerBatch)
    // under AvailableNow, cap at the prepared end: items newer than the
    // target belong to the next run, and the offset must converge to the
    // target so the query terminates even while new data keeps arriving
    val (items, next) = availableNowEnd match {
      case Some(end) =>
        // filter WITHIN each page: page membership decides type widening
        (drained.map(_.filter(Json.parseFlatObject(_).get(Model.UpdatedOnMs)
          .flatMap(Json.numberToLong).forall(_ <= end))),
          math.min(drainedNext, end))
      case None => (drained, drainedNext)
    }
    if (next != from) pending = (next, items)
    CheckpointOffset(math.max(next, from))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is called for SupportsAdmissionControl sources")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val endMs = end.asInstanceOf[CheckpointOffset].ms
    val items =
      if (pending._1 == endMs) pending._2
      else {
        // recovery replay: re-drain from `start` with the SAME page cap (a
        // deterministic fetcher then replays the exact page sequence), and
        // BOUND the batch at the committed end offset — rows newer than
        // endMs belong to the next batch (they re-arrive because the next
        // start is endMs); without the bound a replayed batch would differ
        // from its original contents
        val drained =
          PageDrain.drain(config, start.asInstanceOf[CheckpointOffset].ms, config.maxPagesPerBatch)._1
        drained.map(_.filter { item =>
          Json.parseFlatObject(item).get(Model.UpdatedOnMs)
            .flatMap(Json.numberToLong)
            .forall(_ <= endMs)
        })
      }
    EntityScan.partition(items, config.entityType.uniqueIdField)
  }

  override def createReaderFactory(): PartitionReaderFactory = EntityReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object EntityReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EntityInputPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.items.length }
      override def get(): InternalRow = {
        // flat string->scalar entities (SURVEY.md §1.1). Values normalize
        // through Json.normalizeScalar — the SAME strings the v1 pageToDf
        // path (spark.read.json + string cast) produces, with JSON nulls
        // dropped: an entity parsed by either source path yields an
        // identical attrs map, hence an identical content hash; raw
        // literals ("1.50", "null") would mark every such entity changed
        // on a v1<->v2 migration.
        val obj = Json.parseFlatObjectTyped(p.items(i))
        // the item's PAGE decides per-key double widening (v1 infers one
        // type per column per page — EntityScan.pageWidenKeys)
        val widen = p.widenKeys(i)
        val id = obj.get(p.idField).flatMap(s => Json.normalizeScalar(s, widen(p.idField)))
          .map(UTF8String.fromString).orNull
        val updated = obj.get(Model.UpdatedOnMs).map(_.raw).flatMap(Json.numberToLong)
        val attrs = (obj - Model.UpdatedOnMs).flatMap { case (k, s) =>
          Json.normalizeScalar(s, widen(k)).map(k -> _)
        }
        val keys = attrs.keys.toArray.map(k => UTF8String.fromString(k): AnyRef)
        val vals = attrs.values.toArray.map(v => UTF8String.fromString(v): AnyRef)
        InternalRow(id,
          updated.map(Long.box).orNull,
          ArrayBasedMapData(keys, vals))
      }
      override def close(): Unit = ()
    }
  }
}
