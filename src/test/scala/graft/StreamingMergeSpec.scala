package graft

import graft.streaming.StreamingCdc
import graft.streaming.StreamingCdc.{Action, Change}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** K5 streaming: [[StreamingCdc.mergeStream]] must agree with the batch
  * [[graft.state.Merge.merge]] applied commit-by-commit over the same
  * micro-batch slices — an interleaved insert/update/delete feed folds to
  * the identical final state through either path (the StreamingScd2Spec
  * discipline), deletes clear state (a re-appearing id is "new" again),
  * unmatched deletes emit nothing, and stale tombstones are suppressed.
  */
class StreamingMergeSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[Action]], name: String): Seq[Change] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Action]
    val q = StreamingCdc.mergeStream(input.toDS(), ttlMs = 0L)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("merge-ckpt").toString)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[Change].collect().toSeq
  }

  test("stream merge equals commit-by-commit batch Merge.merge on an interleaved feed") {
    // deterministic interleaved feed: 60 ids, 6 waves; every (id+wave) % 4
    // == 0 action is a tombstone, the rest are upserts with evolving
    // payloads; ~1/5 of upserts repeat the previous content (suppression
    // path) — one action per (id, wave), so waves are the batch pages
    val waves: Seq[Seq[Action]] = (0 until 6).map { w =>
      (0 until 60).flatMap { id =>
        if ((id + w) % 3 == 2) None // id sits this wave out
        else if ((id + w) % 4 == 0)
          Some(Action(s"e$id", 1000L + w * 100L, "delete", null))
        else {
          val body = if ((id + w) % 5 == 0 && w > 0) s"p$id-${w - 1}" else s"p$id-$w"
          Some(Action(s"e$id", 1000L + w * 100L, "upsert", body))
        }
      }
    }
    val streamed = runStream(waves, "merge_out")

    // batch twin: fold the same waves through Merge.merge from empty state
    var state = Seq.empty[(String, Long, String)]
      .toDF("id", "ms", "payload")
    waves.foreach { w =>
      val batch = w.map(a => (a.id, a.updatedOnMs, a.payload, a.op))
        .toDF("id", "ms", "payload", "op")
      state = graft.state.Merge.merge(state, batch, "id", "op", Seq("ms", "payload"))
        .localCheckpoint(true) // 6 self-joins: truncate lineage
    }
    val batchFinal = state.select("id", "payload").as[(String, String)]
      .collect().toMap

    // fold the stream's change log to a final state: last change per id
    // (waves have distinct ms per id; "deleted" removes the key)
    val streamFinal = streamed.groupBy(_.id).flatMap { case (id, cs) =>
      val last = cs.maxBy(_.updatedOnMs)
      if (last.changeType == "deleted") None else Some(id -> last.payload)
    }.toMap

    assert(batchFinal.nonEmpty && streamFinal.nonEmpty)
    assert(streamFinal == batchFinal,
      s"final states diverge: onlyStream=${(streamFinal.toSet -- batchFinal.toSet).take(3)} " +
        s"onlyBatch=${(batchFinal.toSet -- streamFinal.toSet).take(3)}")
  }

  test("delete clears state (reinsert is 'new'), unmatched deletes and stale tombstones emit nothing") {
    val batches = Seq(
      Seq(Action("a", 100L, "upsert", "v1"),
        Action("ghost", 100L, "delete", null)), // unmatched: no-op
      Seq(Action("a", 200L, "delete", null)),
      Seq(Action("a", 150L, "delete", null)),   // stale tombstone: suppressed
      Seq(Action("a", 300L, "upsert", "v1")))   // same content as v1: still "new"
    val out = runStream(batches, "merge_edge")
    assert(!out.exists(_.id == "ghost"), "unmatched delete must emit nothing")
    val a = out.filter(_.id == "a").sortBy(_.updatedOnMs)
    assert(a.map(c => (c.updatedOnMs, c.changeType)) ==
      Seq((100L, "new"), (200L, "deleted"), (300L, "new")),
      s"got ${a.map(c => (c.updatedOnMs, c.changeType))}")
  }

  test("equal-ms (upsert, delete) tie folds to the same final state under every paging") {
    // the SAME action pair fed three ways: one batch, upsert-then-delete
    // across batches, delete-then-upsert across batches — final state
    // must be identical (upsert-wins), or at-least-once replays that
    // re-page the feed would fold to different states (r12 ADVICE)
    val pair = Seq(Action("t", 50L, "upsert", "seed"))
    val pagings = Seq(
      Seq(pair, Seq(Action("t", 100L, "delete", null),
        Action("t", 100L, "upsert", "vT"))),
      Seq(pair, Seq(Action("t", 100L, "upsert", "vT")),
        Seq(Action("t", 100L, "delete", null))),
      Seq(pair, Seq(Action("t", 100L, "delete", null)),
        Seq(Action("t", 100L, "upsert", "vT"))))
    val finals = pagings.zipWithIndex.map { case (batches, i) =>
      val out = runStream(batches, s"merge_page$i").filter(_.id == "t")
      val last = out.maxBy(c => (c.updatedOnMs, c.changeType != "deleted"))
      if (last.changeType == "deleted") None else Some(last.payload)
    }
    assert(finals.distinct == Seq(Some("vT")),
      s"paging-dependent tie fold: $finals")
  }

  test("equal-ms tombstone + upsert resolves upsert-wins, deterministically") {
    val batches = Seq(Seq(
      Action("x", 100L, "upsert", "v0")),
      Seq(Action("x", 200L, "delete", null),
        Action("x", 200L, "upsert", "v1")))
    val out = runStream(batches, "merge_tie").filter(_.id == "x")
      .sortBy(c => (c.updatedOnMs, c.changeType))
    // delete folds first (clears v0, emits tombstone), the upsert then
    // re-inserts — final state holds v1
    assert(out.map(_.changeType) == Seq("new", "deleted", "new"))
    assert(out.last.payload == "v1")
  }
}
