package graft.streaming

import graft.ops.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming ingest with periodic z-order re-clustering — the OPTIMIZE
  * ZORDER pattern ([[graft.ops.Layout.zorderWrite]]'s batch layout
  * maintained under continuous arrival). A stream can only ever append in
  * ARRIVAL order, which clusters nothing: every appended file spans the
  * full user domain, so the pruning the z-order layout exists to buy
  * (SCALING.md's measured 12.5%-vs-100% row-group reads) decays as the
  * unclustered tail grows. The fix every lakehouse format ships is
  * compaction: appends land in a hot tail, and a periodic OPTIMIZE pass
  * rewrites the accumulated COLD data into the clustered layout.
  *
  * Table layout under one root:
  *   - `ingest/batch=<id>/` — one parquet dir per micro-batch, written by
  *     [[appendBatch]] in arrival order (cheap, no exchange);
  *   - `clustered/gen=<g>_upto=<b>/` — clustered generations written by
  *     [[optimize]]: generation g covers every ingest batch id ≤ b plus
  *     all prior generations. The covered-through watermark lives IN the
  *     dir name, so the table needs no side manifest and a killed
  *     compaction leaves the previous generation intact (readers never
  *     see a half-written gen: [[read]] takes the max COMPLETE gen —
  *     parquet dirs are only discoverable after their _SUCCESS commit).
  *
  * [[read]] = latest clustered generation ∪ ingest batches newer than its
  * watermark: exactly-once row semantics whatever the compaction cadence,
  * because a batch is EITHER covered by the generation (id ≤ upto) OR in
  * the live tail (id > upto), never both. Old generations and compacted
  * ingest dirs become garbage to vacuum out-of-band (kept here: dropping
  * them is an rm, replaying them is impossible — the Delta/Iceberg
  * retention trade).
  *
  * Scale shape: appends are map-only; each OPTIMIZE pays one range
  * exchange over (previous gen + new cold batches) — the same cost class
  * as the batch write, amortized over every pruned scan until the next
  * pass. At 100 TB the cadence knob trades write amplification (each
  * optimize rewrites the whole clustered set — compact less often /
  * partition the table by day and re-cluster only closed days) against
  * tail scan cost (the unclustered tail is read 100% by every query).
  */
object StreamingZorder {

  /** foreachBatch append leg: write micro-batch `id` to the hot tail in
    * arrival order. No exchange — the stream's write path stays cheap.
    */
  def appendBatch(df: DataFrame, root: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$root/ingest/batch=$batchId")

  /** The OPTIMIZE pass: rewrite (previous generation + every ingest batch
    * newer than its watermark) into one clustered generation. No-op when
    * nothing new arrived. Returns the new watermark batch id.
    *
    * `curve` picks the layout: "hilbert" (default — the measured-better
    * rank: unit-step locality cuts boundary files ~19 vs Morton's 29 on
    * the 128-file fixture, SCALING r10, and the streaming-cadence probe
    * r11 confirms the gap survives multi-generation rewrites) or
    * "morton" (the classic interleave; generations of a table must stay
    * on ONE curve — the two ranks are not bit-compatible, so switching
    * mid-table re-clusters everything on the next pass, which is safe
    * but pays a full rewrite).
    */
  def optimize(spark: SparkSession, root: String, aCol: String, bCol: String,
               numFiles: Int, curve: String = "hilbert"): Long = {
    val (gen, upto) = latestGen(root)
    val fresh = ingestBatches(root).filter(_._1 > upto)
    if (fresh.isEmpty) return upto
    val newUpto = fresh.map(_._1).max
    val freshDf = spark.read.parquet(fresh.map(_._2): _*)
    val all = if (gen == 0L) freshDf
      else freshDf.unionByName(spark.read.parquet(genPath(root, gen, upto)))
    val dest = genPath(root, gen + 1, newUpto)
    curve match {
      case "hilbert" => Layout.hilbertWrite(all, aCol, bCol, dest, numFiles)
      case "morton"  => Layout.zorderWrite(all, aCol, bCol, dest, numFiles)
      case other => throw new IllegalArgumentException(
        s"optimize: unknown curve '$other' (hilbert | morton)")
    }
    newUpto
  }

  /** The d-COLUMN OPTIMIZE pass ([[graft.ops.Layout.hilbertWriteN]],
    * Skilling's dimension-generic form) — production OPTIMIZE ZORDER
    * takes 3+ columns routinely, and the streaming cadence is no
    * different: same watermark protocol as [[optimize]], the rank is
    * just d-dimensional. Same one-curve-per-table rule; `bits` per
    * dimension must satisfy d·bits ≤ 63 ([[graft.ops.Layout.HBits3]]
    * for 3 columns). Interleave only dimensions with INDEPENDENT
    * selectivity — the measured SCALING r11 rule: a correlated third
    * column spends rank bits on information the 2-D layout delivers
    * free and prunes WORSE.
    */
  def optimizeN(spark: SparkSession, root: String, cols: Seq[String],
                numFiles: Int, bits: Int = Layout.HBits3): Long = {
    val (gen, upto) = latestGen(root)
    val fresh = ingestBatches(root).filter(_._1 > upto)
    if (fresh.isEmpty) return upto
    val newUpto = fresh.map(_._1).max
    val freshDf = spark.read.parquet(fresh.map(_._2): _*)
    val all = if (gen == 0L) freshDf
      else freshDf.unionByName(spark.read.parquet(genPath(root, gen, upto)))
    Layout.hilbertWriteN(all, cols, genPath(root, gen + 1, newUpto), numFiles, bits)
    newUpto
  }

  /** Retention cleanup — the VACUUM half of the OPTIMIZE story (the
    * scaladoc above calls superseded generations and compacted ingest
    * batches "garbage to vacuum out-of-band"; this is that band).
    * Deletes clustered generations older than the newest
    * `keepGenerations` COMPLETE ones, and ingest batches covered by
    * every kept generation (id ≤ the OLDEST kept watermark — a reader
    * pinned to any kept generation still finds its whole tail).
    * [[read]] is untouched by construction: it only ever opens the
    * latest generation and batches past its watermark. The
    * `keepGenerations` knob is the Delta/Iceberg retention trade made
    * explicit — a long-running reader that resolved the PREVIOUS
    * generation before vacuum ran needs it kept; how long is a policy,
    * not something the table can infer. Incomplete (no `_SUCCESS`)
    * generation dirs older than the newest complete one are dead
    * compaction attempts and are removed too. Returns
    * (generations deleted, batches deleted).
    */
  def vacuum(root: String, keepGenerations: Int = 1): (Int, Int) = {
    require(keepGenerations >= 1, "vacuum: must keep at least the latest generation")
    val all = listDirs(s"$root/clustered").flatMap { p =>
      p.getName match {
        case s if s.startsWith("gen=") && s.contains("_upto=") =>
          val parts = s.stripPrefix("gen=").split("_upto=")
          val complete = hadoopFs(p).exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
          Some((parts(0).toLong, parts(1).toLong, p, complete))
        case _ => None
      }
    }.sortBy(-_._1)
    val complete = all.filter(_._4)
    if (complete.isEmpty) return (0, 0) // nothing committed: delete nothing
    val kept = complete.take(keepGenerations)
    val newestGen = complete.head._1
    val dropGens = all.filter { case (g, _, _, c) =>
      (c && !kept.exists(_._1 == g)) || (!c && g < newestGen)
    }
    dropGens.foreach { case (_, _, p, _) => hadoopFs(p).delete(p, true) }
    val keepUpto = kept.map(_._2).min
    val dropBatches = ingestBatches(root).filter(_._1 <= keepUpto)
    dropBatches.foreach { case (_, dir) =>
      val p = new org.apache.hadoop.fs.Path(dir)
      hadoopFs(p).delete(p, true)
    }
    (dropGens.size, dropBatches.size)
  }

  /** The live table: latest clustered generation + the unclustered tail. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val (gen, upto) = latestGen(root)
    val tail = ingestBatches(root).filter(_._1 > upto).map(_._2)
    val parts = (if (gen == 0L) Nil else Seq(genPath(root, gen, upto))) ++ tail
    require(parts.nonEmpty, s"empty z-order table at $root")
    spark.read.parquet(parts: _*)
  }

  /** Path of the latest clustered generation, if any (probe surface). */
  def latestClusteredPath(root: String): Option[String] = {
    val (gen, upto) = latestGen(root)
    if (gen == 0L) None else Some(genPath(root, gen, upto))
  }

  private def genPath(root: String, gen: Long, upto: Long): String =
    s"$root/clustered/gen=${gen}_upto=$upto"

  /** Listing goes through the Hadoop FileSystem of the ROOT's scheme (with
    * the active session's hadoop conf, so store credentials and fs
    * overrides apply) — the watermark-in-dirname protocol must work on
    * HDFS/S3/anything Spark writes to, not just local disk (a
    * java.io.File listing returns nothing on a remote store, which would
    * silently restart the table at gen 0 and re-cluster nothing).
    */
  private def hadoopFs(p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration()))

  private def listDirs(dir: String): Seq[org.apache.hadoop.fs.Path] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = hadoopFs(path)
    if (!fs.exists(path)) Nil
    else fs.listStatus(path).toIndexedSeq.filter(_.isDirectory).map(_.getPath)
  }

  private def latestGen(root: String): (Long, Long) = {
    val gens = listDirs(s"$root/clustered").flatMap { p =>
      p.getName match {
        case s if s.startsWith("gen=") && s.contains("_upto=") =>
          val parts = s.stripPrefix("gen=").split("_upto=")
          // only COMPLETE generations count: parquet commits _SUCCESS last
          if (hadoopFs(p).exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
            Some((parts(0).toLong, parts(1).toLong))
          else None
        case _ => None
      }
    }
    if (gens.isEmpty) (0L, -1L) else gens.maxBy(_._1)
  }

  private def ingestBatches(root: String): Seq[(Long, String)] =
    listDirs(s"$root/ingest")
      .filter(_.getName.startsWith("batch="))
      .map(p => (p.getName.stripPrefix("batch=").toLong, p.toString))
      .sortBy(_._1)
}
