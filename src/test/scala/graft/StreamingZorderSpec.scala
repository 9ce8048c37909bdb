package graft

import graft.streaming.StreamingZorder
import graft.ops.Layout
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

object StreamingZorderSpec {
  // top-level (not suite-nested) so the encoder compiles under codegen
  case class Ev(event_id: Long, user_id: Long, ts_ms: Long)
  case class Ev3(event_id: Long, user_id: Long, ts_ms: Long, vkey: Long)
}

/** The streaming OPTIMIZE pattern must deliver (a) exactly-once reads
  * whatever the compaction cadence — every ingest batch is either covered
  * by the latest clustered generation or in the live tail, never both or
  * neither — and (b) a re-clustered layout whose 2-D pruning matches the
  * one-shot batch z-order write of the same rows: compaction cannot cost
  * clustering quality, only write amplification.
  */
class StreamingZorderSpec extends SparkSpec {
  import spark.implicits._
  import StreamingZorderSpec.Ev

  /** Per-file (min,max) boxes of both dimensions for a parquet dir. */
  private def boxes(path: String): Array[(Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .groupBy("f").agg(
        min("user_id").as("ul"), max("user_id").as("uh"),
        min("ts_ms").as("tl"), max("ts_ms").as("th"))
      .select("ul", "uh", "tl", "th").as[(Long, Long, Long, Long)].collect()

  /** Files a min/max-pruning scan must read for a 2-D box predicate. */
  private def filesRead(bx: Array[(Long, Long, Long, Long)],
                        u: (Long, Long), t: (Long, Long)): Int =
    bx.count { case (ul, uh, tl, th) =>
      uh >= u._1 && ul <= u._2 && th >= t._1 && tl <= t._2
    }

  test("stream-compacted table reads exactly-once and prunes like the batch z-order write") {
    val evRaw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val et = graft.functions.EventTime.bind(evRaw)
    val rows = evRaw.select(col("event_id"), col("user_id"), et.ms.as("ts_ms"))
      .as[(Long, Long, Long)].collect().map { case (e, u, m) => Ev(e, u, m) }

    val root = Files.createTempDirectory("zorder-stream").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = input.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamingZorder.appendBatch(df, root, id)
      }
      .option("checkpointLocation", Files.createTempDirectory("zs-ckpt").toString)
      .start()
    val batches = rows.grouped(250).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      input.addData(b.toSeq: _*); q.processAllAvailable()
      // mid-stream compaction after the second batch: later batches land in
      // the tail and the read below must union gen + tail seamlessly
      if (i == 1) StreamingZorder.optimize(spark, root, "user_id", "ts_ms", 16)
      val seen = StreamingZorder.read(spark, root).count()
      val fed = batches.take(i + 1).map(_.length).sum
      assert(seen == fed, s"after batch $i: read $seen rows, fed $fed")
    }
    q.stop()

    // final OPTIMIZE: everything cold, tail empty, one covering generation
    StreamingZorder.optimize(spark, root, "user_id", "ts_ms", 16)
    val streamed = StreamingZorder.read(spark, root)
      .select("event_id", "user_id", "ts_ms").as[(Long, Long, Long)].collect().sorted
    assert(streamed.toSeq == rows.map(e => (e.event_id, e.user_id, e.ts_ms)).toSeq.sorted,
      "compacted table must hold exactly the streamed rows (no loss, no dup)")
    // idempotence: optimizing with nothing new is a no-op
    val genBefore = StreamingZorder.latestClusteredPath(root).get
    StreamingZorder.optimize(spark, root, "user_id", "ts_ms", 16)
    assert(StreamingZorder.latestClusteredPath(root).get == genBefore,
      "optimize with an empty tail must not write a new generation")

    // pruning parity: one-shot batch write of the SAME rows on the SAME
    // curve (optimize defaults to the measured-better Hilbert rank now)
    val batchDir = Files.createTempDirectory("zorder-batch").toString + "/t"
    val df = rows.toSeq.toDF("event_id", "user_id", "ts_ms")
    Layout.hilbertWrite(df, "user_id", "ts_ms", batchDir, numFiles = 16)
    val sb = boxes(genBefore)
    val bb = boxes(batchDir)
    assert(sb.length == 16 && bb.length == 16)
    // same clustering quality: mean per-file bounding-box area within 25%
    // (range-sample boundaries may differ; the LAYOUT quality must not)
    def meanArea(b: Array[(Long, Long, Long, Long)]) =
      b.map { case (ul, uh, tl, th) => (uh - ul + 1).toDouble * (th - tl + 1) }.sum / b.length
    assert(meanArea(sb) <= meanArea(bb) * 1.25,
      s"stream-compacted boxes ${meanArea(sb)} vs batch ${meanArea(bb)}")
    // same pruning on quarter-domain probes of each dimension + conjunction
    val us = rows.map(_.user_id); val ts = rows.map(_.ts_ms)
    val uq = (us.min, us.min + (us.max - us.min) / 4)
    val tq = (ts.min, ts.min + (ts.max - ts.min) / 4)
    val full = (Long.MinValue, Long.MaxValue)
    Seq((uq, full), (full, tq), (uq, tq)).foreach { case (u, t) =>
      val (s, b) = (filesRead(sb, u, t), filesRead(bb, u, t))
      assert(math.abs(s - b) <= 1, s"probe u=$u t=$t: stream reads $s files, batch $b")
      assert(s < 16, s"probe u=$u t=$t: no pruning at all ($s of 16 files)")
    }
  }

  test("vacuum drops superseded generations and covered batches; reads stay exact") {
    import StreamingZorderSpec.Ev
    val rows = (0L until 1000L).map(i => Ev(i, i % 37L, 1700000000000L + i * 1000L))
    val root = Files.createTempDirectory("zorder-vac").toString
    // 4 appends, optimize after batch 1 and batch 3: two generations
    rows.grouped(250).zipWithIndex.foreach { case (b, i) =>
      StreamingZorder.appendBatch(b.toDF(), root, i.toLong)
      if (i == 1 || i == 3) StreamingZorder.optimize(spark, root, "user_id", "ts_ms", 8)
    }
    def dirs(sub: String) = {
      val d = new java.io.File(s"$root/$sub")
      if (!d.exists()) Array.empty[String] else d.listFiles().map(_.getName).sorted
    }
    assert(dirs("clustered").length == 2 && dirs("ingest").length == 4)
    val before = StreamingZorder.read(spark, root)
      .select("event_id").as[Long].collect().sorted.toSeq

    // keep 2 generations: nothing deletable except batches covered by BOTH
    val (g2, b2) = StreamingZorder.vacuum(root, keepGenerations = 2)
    assert(g2 == 0 && b2 == 2, s"keep-2 vacuum removed gens=$g2 batches=$b2")
    assert(dirs("clustered").length == 2 && dirs("ingest").length == 2)
    assert(StreamingZorder.read(spark, root)
      .select("event_id").as[Long].collect().sorted.toSeq == before)

    // default keep-1: the superseded generation and its covered batches go
    val (g1, b1) = StreamingZorder.vacuum(root)
    assert(g1 == 1 && b1 == 2, s"keep-1 vacuum removed gens=$g1 batches=$b1")
    assert(dirs("clustered").length == 1 && dirs("ingest").isEmpty)
    assert(StreamingZorder.read(spark, root)
      .select("event_id").as[Long].collect().sorted.toSeq == before)

    // idempotent: a second vacuum is a no-op; appends after vacuum flow
    assert(StreamingZorder.vacuum(root) == ((0, 0)))
    StreamingZorder.appendBatch(rows.take(10).toDF(), root, 4L)
    assert(StreamingZorder.read(spark, root).count() == 1010L)
  }

  test("d-column streaming OPTIMIZE clusters like the one-shot 3-D hilbert write") {
    import StreamingZorderSpec.Ev3
    val evRaw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val et = graft.functions.EventTime.bind(evRaw)
    // third dimension INDEPENDENT of (user, ts) — the SCALING r11 rule:
    // only independent selectivity earns its rank bits
    val rows = evRaw.select(col("event_id"), col("user_id"), et.ms.as("ts_ms"))
      .as[(Long, Long, Long)].collect()
      .map { case (e, u, m) => Ev3(e, u, m, (e * 7919L) % 1000L) }

    val root = Files.createTempDirectory("zorder3-stream").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev3]
    val q = input.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamingZorder.appendBatch(df, root, id)
      }
      .option("checkpointLocation", Files.createTempDirectory("zs3-ckpt").toString)
      .start()
    val cols = Seq("user_id", "ts_ms", "vkey")
    val batches = rows.grouped(250).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      input.addData(b.toSeq: _*); q.processAllAvailable()
      if (i == 1) StreamingZorder.optimizeN(spark, root, cols, 16)
      val seen = StreamingZorder.read(spark, root).count()
      val fed = batches.take(i + 1).map(_.length).sum
      assert(seen == fed, s"after batch $i: read $seen rows, fed $fed")
    }
    q.stop()
    StreamingZorder.optimizeN(spark, root, cols, 16)
    val gen = StreamingZorder.latestClusteredPath(root).get
    assert(StreamingZorder.read(spark, root).count() == rows.length)

    // 3-D per-file boxes vs the one-shot batch twin of the same rows
    def boxes3(path: String): Array[(Long, Long, Long, Long, Long, Long)] =
      spark.read.parquet(path).withColumn("f", input_file_name())
        .groupBy("f").agg(
          min("user_id").as("ul"), max("user_id").as("uh"),
          min("ts_ms").as("tl"), max("ts_ms").as("th"),
          min("vkey").as("vl"), max("vkey").as("vh"))
        .select("ul", "uh", "tl", "th", "vl", "vh")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
    val batchDir = Files.createTempDirectory("zorder3-batch").toString + "/t"
    Layout.hilbertWriteN(rows.toSeq.toDF("event_id", "user_id", "ts_ms", "vkey")
      .select("user_id", "ts_ms", "vkey", "event_id"), cols, batchDir,
      numFiles = 16, bits = Layout.HBits3)
    val (sb, bb) = (boxes3(gen), boxes3(batchDir))
    assert(sb.length == 16 && bb.length == 16)
    def meanVol(b: Array[(Long, Long, Long, Long, Long, Long)]) =
      b.map { case (ul, uh, tl, th, vl, vh) =>
        (uh - ul + 1).toDouble * (th - tl + 1) * (vh - vl + 1) }.sum / b.length
    assert(meanVol(sb) <= meanVol(bb) * 1.25,
      s"stream-compacted 3-D boxes ${meanVol(sb)} vs batch ${meanVol(bb)}")
    // a middle-quarter box on the INDEPENDENT third dimension prunes
    val (vLo, vHi) = (375L, 625L)
    val vRead = sb.count { case (_, _, _, _, vl, vh) => vh >= vLo && vl <= vHi }
    assert(vRead < 16, s"vkey box read $vRead of 16 files — no 3-D pruning")
  }
}
