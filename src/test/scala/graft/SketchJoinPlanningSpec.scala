package graft

import graft.ops.SketchCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** [[graft.plans.SketchJoinPlanning]]: the stored-artifact planner rule.
  * Asserted here: the executed join STRATEGY provably follows what the
  * catalog artifact claims (broadcast when it says small, sort-merge when
  * it says large — with Catalyst's own size-based broadcast disabled, so
  * the artifact is the only possible cause), the 3-chain join ORDER
  * rotates to the pair whose CMS inner product is smaller, results stay
  * hash-identical to the un-ruled plan, and the rule is inert without an
  * activated catalog and deferent to user hints.
  */
class SketchJoinPlanningSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft-sjp").toString
    import spark.implicits._
    // dim: 40 rows; fact: 4000 rows, 100 per key
    (0L until 40L).map(k => (k, s"seg${k % 4}")).toDF("d_key", "d_seg")
      .repartition(2).write.parquet(s"$d/dim.parquet")
    (0L until 4000L).map(i => (i % 40L, i, (i % 7).toDouble))
      .toDF("f_key", "f_id", "f_val")
      .repartition(4).write.parquet(s"$d/fact.parquet")
    // third table joining the dim on a second key: 40 rows
    (0L until 40L).map(k => (k, k * 10L)).toDF("e_key", "e_weight")
      .repartition(2).write.parquet(s"$d/extra.parquet")
    // runtime-filter fixture: big probe (1000 distinct keys) vs a hot
    // build whose key SET is a 5% subset — selective by key overlap
    (0L until 10000L).map(i => (i % 1000L, i)).toDF("b_key", "b_id")
      .repartition(4).write.parquet(s"$d/big.parquet")
    (0L until 200L).map(i => (i % 50L, s"h${i % 50L}")).toDF("h_key", "h_tag")
      .repartition(2).write.parquet(s"$d/hot.parquet")
    d
  }

  private def physicalJoins(df: DataFrame): Seq[SparkPlan] = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    root.collect {
      case b: BroadcastHashJoinExec => b
      case s: SortMergeJoinExec     => s
    }
  }

  /** Does some broadcast-hash join BUILD on a subtree containing a hash
    * aggregate — i.e. did the rollup side win the broadcast? One
    * definition for every aggregate-pricing test so a change to the
    * build-side detection cannot silently diverge between them.
    */
  private def aggOnBuildSide(df: DataFrame): Boolean =
    physicalJoins(df).exists {
      case b: BroadcastHashJoinExec =>
        val build = b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
          case _                                                 => b.right
        }
        build.exists(_.isInstanceOf[
          org.apache.spark.sql.execution.aggregate.BaseAggregateExec])
      case _ => false
    }

  private def joinFrame(): DataFrame = {
    val fact = spark.read.parquet(s"$dir/fact.parquet")
    val dim = spark.read.parquet(s"$dir/dim.parquet")
    fact.join(dim, col("f_key") === col("d_key"))
      .groupBy("d_seg").agg(count(lit(1)).as("n"), sum("f_val").as("s"))
      .orderBy("d_seg")
  }

  private def harvestAll(): String = {
    val cat = SketchCatalog.harvest(spark, s"$dir/dim.parquet", Seq("d_key"))
      .unionByName(SketchCatalog.harvest(spark, s"$dir/fact.parquet", Seq("f_key")))
      .unionByName(SketchCatalog.harvest(spark, s"$dir/extra.parquet", Seq("e_key")))
    val path = s"$dir/catalog"
    SketchCatalog.save(cat, path)
    path
  }

  test("broadcast hint follows the artifact, both directions; results unchanged") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plainRows = joinFrame().collect().toSeq
      // no catalog: SMJ (auto-broadcast off, nothing to consult)
      SketchCatalog.deactivate(spark)
      assert(physicalJoins(joinFrame()).forall(_.isInstanceOf[SortMergeJoinExec]))

      // artifact says the dim is small -> the rule broadcasts it
      val path = harvestAll()
      SketchCatalog.activate(spark, path)
      val planned = joinFrame()
      val joins = physicalJoins(planned)
      assert(joins.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"expected BHJ from artifact, got: $joins")
      assert(planned.collect().toSeq == plainRows)

      // artifact says EVERYTHING is huge -> back to sort-merge
      val cat = SketchCatalog.lookup(spark.conf.get(SketchCatalog.ConfKey)).get
      SketchCatalog.activateEntries(spark, "huge",
        cat.entries.map(_.copy(nRows = 1L << 32, nBytes = 1L << 40)))
      assert(physicalJoins(joinFrame()).forall(_.isInstanceOf[SortMergeJoinExec]))
      assert(joinFrame().collect().toSeq == plainRows)
      SketchCatalog.deactivate(spark)
    }
  }

  test("aggregate leaf priced from the grouping key's HLL distinct: the rollup earns its broadcast; parity holds") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val path = harvestAll()
      // the pre-aggregated-dim shape: a per-key rollup of the fact joined
      // back under the fact — the rollup side has NO file size, and
      // size-only estimation scales the CHILD's bytes, so only the
      // artifact (HLL distinct of f_key = 40 rows out) can price it
      def frame(): DataFrame = {
        val per = spark.read.parquet(s"$dir/fact.parquet")
          .groupBy("f_key").agg(sum("f_val").as("key_total"))
          .withColumnRenamed("f_key", "agg_key")
        spark.read.parquet(s"$dir/fact.parquet")
          .join(per, col("f_key") === col("agg_key"))
          .groupBy((col("f_key") % 4).as("g"))
          .agg(count(lit(1)).as("n"), sum("key_total").as("s"))
          .orderBy("g")
      }
      // threshold pinned relative to the catalogued fact bytes: the fact
      // itself must stay over it (no broadcast from file size alone), the
      // 40-row rollup orders of magnitude under
      val factBytes = spark.read.parquet(path).where(col("key") === "f_key")
        .select("n_bytes").head().getLong(0)
      withSQLConf(SketchCatalog.BroadcastBytesKey ->
          math.max(1L, factBytes / 2).toString) {
        SketchCatalog.deactivate(spark)
        val plainRows = frame().collect().toSeq
        assert(physicalJoins(frame()).forall(_.isInstanceOf[SortMergeJoinExec]),
          "control: with auto-broadcast off and no catalog, the rollup join must stay sort-merge")
        SketchCatalog.activate(spark, path)
        try {
          assert(aggOnBuildSide(frame()),
            "activated: the aggregate side must be the broadcast build side")
          assert(frame().collect().toSeq == plainRows,
            "aggregate-leaf broadcast must be invisible to results")
          // never-understate: a grouping key claiming a HUGE distinct
          // count caps at the base's row count — the rollup then prices
          // over the threshold and the hint must NOT fire
          val cat = SketchCatalog.lookup(spark.conf.get(SketchCatalog.ConfKey)).get
          SketchCatalog.activateEntries(spark, "wide-distinct",
            cat.entries.map(e =>
              if (e.key == "f_key") e.copy(distinctEst = 1e9) else e))
          assert(physicalJoins(frame()).forall(_.isInstanceOf[SortMergeJoinExec]),
            "a wide-distinct grouping key must price the rollup past the threshold")
          assert(frame().collect().toSeq == plainRows)
        } finally SketchCatalog.deactivate(spark)
      }
    }
  }

  test("aggregate leaf in the reorder chain: the selective dim sinks below the rollup; parity holds") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // chain written worst-first: fact joins its own per-key rollup FIRST
    // (output = |fact| rows — every fact row has a group) and a
    // 1/8-selective flat dim LAST. Only the aggregate-leaf subtree
    // pricing can see the rollup edge's true cost relative to the
    // selective one: the rollup leaf prices as base x collapse fan-out
    // (aggRowBound / baseRows), so greedy sinks fact ⋈ sel to the bottom.
    val selPath = s"$dir/sel_agg.parquet"
    if (!new java.io.File(selPath).exists()) {
      import spark.implicits._
      (0L until 40L).filter(_ % 8 == 0).map(k => (k, k / 8))
        .toDF("sel_key", "sel_grp").repartition(1).write.parquet(selPath)
    }
    val catPath = {
      val cat = SketchCatalog.harvest(spark, s"$dir/fact.parquet", Seq("f_key"))
        .unionByName(SketchCatalog.harvest(spark, selPath, Seq("sel_key")))
      val p = s"$dir/catalog_agg"
      SketchCatalog.save(cat, p)
      p
    }
    def frame(): DataFrame = {
      val rollup = spark.read.parquet(s"$dir/fact.parquet")
        .groupBy("f_key").agg(sum("f_val").as("key_total"))
        .withColumnRenamed("f_key", "agg_key")
      spark.read.parquet(s"$dir/fact.parquet")
        .join(rollup, col("f_key") === col("agg_key"))
        .join(spark.read.parquet(selPath), col("f_key") === col("sel_key"))
        .groupBy("sel_grp")
        .agg(count(lit(1)).as("n"), sum("key_total").as("s"))
        .orderBy("sel_grp")
    }
    // the bottom join of the PLANNED run touches exactly fact + sel with
    // no aggregate below it; in the written order every join above the
    // bottom-most has 3 scans, and the 2-scan bottom join contains the
    // rollup's hash aggregate
    def bottomFactSelNoAgg(df: DataFrame): Boolean =
      physicalJoins(df).exists { j =>
        val scans = j.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.head.toString
        }
        scans.size == 2 && scans.exists(_.contains("sel_agg")) &&
          scans.exists(_.contains("fact")) &&
          j.collectFirst { case a: BaseAggregateExec => a }.isEmpty
      }
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        SketchCatalog.BroadcastBytesKey -> "0") {
      SketchCatalog.deactivate(spark)
      val plainRows = frame().collect().toSeq
      assert(physicalJoins(frame()).size == 2 && !bottomFactSelNoAgg(frame()),
        "control: the written order joins the rollup first")
      SketchCatalog.activate(spark, catPath)
      try {
        assert(bottomFactSelNoAgg(frame()),
          "activated: greedy must sink fact ⋈ sel below the rollup join")
        assert(frame().collect().toSeq == plainRows,
          "aggregate-leaf reorder must be invisible to results")
      } finally SketchCatalog.deactivate(spark)
    }
  }

  test("composite-grouping aggregate prices through the tuple artifact; product fallback stays sound") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // 4000 rows; (g1, g2) has 40 distinct tuples, but g1 and g2 each have
    // 40 distinct values — the per-column PRODUCT bound (1600) is 40×
    // looser than the tuple bound (40). Thresholds pinned between the two
    // so only the tuple artifact earns the broadcast.
    val cgPath = s"$dir/cgfact.parquet"
    if (!new java.io.File(cgPath).exists()) {
      spark.range(0L, 4000L)
        .select((col("id") % 40).as("g1"), ((col("id") + 7) % 40).as("g2"),
          col("id").as("cg_id"), (col("id") % 5).cast("double").as("cg_val"))
        .repartition(4).write.parquet(cgPath)
    }
    def cat(withTuple: Boolean): String = {
      val c = SketchCatalog.harvest(spark, cgPath, Seq("g1", "g2"),
        tuples = if (withTuple) Seq(Seq("g1", "g2")) else Nil)
      val p = s"$dir/catalog_cg_$withTuple"
      SketchCatalog.save(c, p)
      p
    }
    def frame(): DataFrame = {
      val rollup = spark.read.parquet(cgPath)
        .groupBy("g1", "g2").agg(sum("cg_val").as("pair_total"))
        .withColumnRenamed("g1", "a1").withColumnRenamed("g2", "a2")
      spark.read.parquet(cgPath)
        .join(rollup, col("g1") === col("a1") && col("g2") === col("a2"))
        .groupBy("g1").agg(count(lit(1)).as("n"), sum("pair_total").as("s"))
        .orderBy("g1")
    }
    val tuplePath = cat(withTuple = true)
    val factBytes = spark.read.parquet(tuplePath).where(col("key") === "g1")
      .select("n_bytes").head().getLong(0)
    val perRowDisk = math.max(1L, factBytes / 4000L)
    // rollup output defaultSize: two longs + a double = 24; bound bytes =
    // rows × (perRowDisk + 24). Tuple bound ≈ 48 rows; product bound ≈
    // min(1.2×1600-ish, 4000) rows. Pin the threshold at the 400-row
    // class — far above the tuple estimate, far below the product's.
    val thr = 400L * (perRowDisk + 24L)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        SketchCatalog.BroadcastBytesKey -> thr.toString) {
      SketchCatalog.deactivate(spark)
      val plainRows = frame().collect().toSeq
      SketchCatalog.activate(spark, cat(withTuple = false))
      try {
        assert(!aggOnBuildSide(frame()),
          "singles-only catalog: the per-column product bound must price past the threshold")
        SketchCatalog.activate(spark, tuplePath)
        assert(aggOnBuildSide(frame()),
          "tuple catalog: the composite-grouping bound must earn the broadcast")
        assert(frame().collect().toSeq == plainRows)
      } finally SketchCatalog.deactivate(spark)
    }
  }

  test("manifest-refined range pricing: a narrow time-window filter earns the broadcast; stale manifest declines") {
    import graft.ops.{DataSkipping, ScanPrune}
    // range-clustered table so a range predicate provably excludes files:
    // 4000 rows over 8 range-partitioned files; r_grp is the join key
    val rfPath = s"$dir/rangefact.parquet"
    if (!new java.io.File(rfPath).exists()) {
      spark.range(0L, 4000L)
        .select(col("id").as("r_key"), (col("id") % 40).as("r_grp"),
          (col("id") % 11).cast("double").as("r_val"))
        .repartitionByRange(8, col("r_key")).sortWithinPartitions("r_key")
        .write.parquet(rfPath)
    }
    def freshCat(): String = {
      val cat = SketchCatalog.harvest(spark, rfPath, Seq("r_grp"))
        .unionByName(SketchCatalog.harvest(spark, s"$dir/fact.parquet", Seq("f_key")))
      val p = s"$dir/catalog_range"
      SketchCatalog.save(cat, p)
      p
    }
    val catPath = freshCat()
    def frame(): DataFrame =
      spark.read.parquet(rfPath).where(col("r_key") < 500L)
        .join(spark.read.parquet(s"$dir/fact.parquet"),
          col("r_grp") === col("f_key"))
        .groupBy("r_grp").agg(count(lit(1)).as("n"), sum("f_val").as("s"))
        .orderBy("r_grp")
    val rfBytes = spark.read.parquet(catPath).where(col("key") === "r_grp")
      .select("n_bytes").head().getLong(0)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        SketchCatalog.BroadcastBytesKey -> math.max(1L, rfBytes / 4).toString) {
      ScanPrune.deactivate(spark, rfPath)
      SketchCatalog.deactivate(spark)
      val plainRows = frame().collect().toSeq
      SketchCatalog.activate(spark, catPath)
      try {
        // catalog alone: the CMS point bounds cannot price `r_key < 500`
        // — the filtered fact stays unpriceable-small, join stays merge
        assert(physicalJoins(frame()).forall(_.isInstanceOf[SortMergeJoinExec]),
          "catalog-only control must stay sort-merge: ranges are invisible to CMS points")
        // + activated manifest: the range bound (500 of 4000 rows) prices
        // the filtered side under the threshold
        ScanPrune.activateManifest(spark, rfPath,
          DataSkipping.statsManifest(spark, rfPath, Seq("r_key")))
        assert(physicalJoins(frame()).exists(_.isInstanceOf[BroadcastHashJoinExec]),
          "manifest range bound must earn the filtered side its broadcast")
        assert(frame().collect().toSeq == plainRows,
          "manifest-refined pricing must be invisible to results")
        // joint-coverage guard: append rows, re-harvest the CATALOG only
        // (now claims 5000 rows) while the manifest still totals 4000 —
        // the bound must decline and the hint must NOT fire
        spark.range(4000L, 5000L)
          .select(col("id").as("r_key"), (col("id") % 40).as("r_grp"),
            (col("id") % 11).cast("double").as("r_val"))
          .coalesce(1).write.mode("append").parquet(rfPath)
        SketchCatalog.activate(spark, freshCat())
        val stale = frame()
        assert(physicalJoins(stale).forall(_.isInstanceOf[SortMergeJoinExec]),
          "a manifest that predates the catalogued row count must decline the bound")
        val freshRows = frame().collect().toSeq
        ScanPrune.deactivate(spark, rfPath)
        SketchCatalog.deactivate(spark)
        assert(freshRows == frame().collect().toSeq,
          "stale-manifest runs must still see every appended row")
      } finally {
        ScanPrune.deactivate(spark, rfPath)
        SketchCatalog.deactivate(spark)
      }
    }
  }

  test("stream-static join: artifact broadcast fires on the static side inside microbatches; parity holds") {
    import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The planner rule runs inside IncrementalExecution's optimizer too —
    // a stream-static equi-join (the StreamingAnnServe / dim-enrichment
    // shape) must pick up the artifact broadcast on its STATIC side, the
    // only side the catalog can price (the stream side has no relation to
    // resolve, and broadcasting it would be wrong anyway: it grows per
    // batch). Asserted exactly like the batch cases: auto-broadcast off,
    // plan probed from lastExecution, results bit-equal either way.
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val factRows = (0L until 4000L).map(i => (i % 40L, i))
      def run(name: String): (Seq[String], Boolean) = {
        val input = MemoryStream[(Long, Long)]
        val joined = input.toDS().toDF("s_key", "s_id")
          .join(spark.read.parquet(s"$dir/dim.parquet"),
            col("s_key") === col("d_key"))
          .groupBy("d_seg").agg(count(lit(1)).as("n"), sum("s_id").as("s"))
        val q = joined.writeStream.format("memory").queryName(name)
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory(s"graft-ss-$name").toString)
          .outputMode("complete").start()
        try {
          // two arrival waves: the hint must hold across re-planned batches
          factRows.grouped(2500).foreach { b =>
            input.addData(b: _*); q.processAllAvailable()
          }
          val plan = q.asInstanceOf[StreamingQueryWrapper]
            .streamingQuery.lastExecution.executedPlan
          val bhj = plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty
          val rows = spark.table(name).orderBy("d_seg").collect()
            .map(_.toString).toSeq
          (rows, bhj)
        } finally q.stop()
      }
      SketchCatalog.deactivate(spark)
      val (plainRows, plainBhj) = run("ss_plain")
      assert(!plainBhj,
        "control: with auto-broadcast off and no catalog, no BHJ can appear")
      SketchCatalog.activate(spark, harvestAll())
      try {
        val (plannedRows, plannedBhj) = run("ss_planned")
        assert(plannedBhj,
          "artifact must broadcast the catalogued static dim inside the microbatch plan")
        assert(plannedRows == plainRows,
          "stream-static artifact broadcast must be invisible to results")
      } finally SketchCatalog.deactivate(spark)
    }
  }

  test("3-chain reorders to the smaller estimated pair, hash parity holds") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val path = harvestAll()
      val fact = spark.read.parquet(s"$dir/fact.parquet")
      val dim = spark.read.parquet(s"$dir/dim.parquet")
      val extra = spark.read.parquet(s"$dir/extra.parquet")
      // written WORST-first: fact⋈dim (est 4000) then ⋈extra; the
      // dim⋈extra pair estimates 40 — the rule must rotate it inward
      def chain() = fact
        .join(dim, col("f_key") === col("d_key"))
        .join(extra, col("d_key") === col("e_key"))
        .groupBy("d_seg")
        .agg(count(lit(1)).as("n"), sum(col("f_val") * col("e_weight")).as("s"))
        .orderBy("d_seg")

      SketchCatalog.deactivate(spark)
      val plainRows = chain().collect().toSeq

      SketchCatalog.activate(spark, path)
      val planned = chain()
      // the BOTTOM physical join must now be dim⋈extra: its subtree
      // scans must NOT include the fact table
      val joins = physicalJoins(planned)
      assert(joins.size == 2, s"expected 2 joins, got $joins")
      val bottom = joins.last // collect is pre-order; last = deepest
      val bottomScans = bottom.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.head.toString
      }
      assert(bottomScans.nonEmpty &&
        bottomScans.forall(!_.contains("fact.parquet")),
        s"fact table still in the bottom join: $bottomScans")
      // AND the broadcast pass must see through the rotation: the bottom
      // pair broadcasts by leaf bytes, and the rotated INTERMEDIATE
      // (est 40 rows × per-row bytes — the estBytes Join branch, a size
      // Catalyst itself can never know) broadcasts against the fact side
      assert(joins.forall(_.isInstanceOf[BroadcastHashJoinExec]),
        s"expected both joins broadcast from artifacts, got $joins")
      assert(planned.collect().toSeq == plainRows)
      SketchCatalog.deactivate(spark)
    }
  }

  test("4-chain greedy reorder sinks the fact table to the top; hash parity holds") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // fourth table: joins extra on its own key, 10 rows — the cheapest
      // pair in the chain (extra⋈tiny est 40·(10/40)=10 — must join first)
      import spark.implicits._
      (0L until 10L).map(k => (k * 4L, s"t$k")).toDF("y_key", "y_tag")
        .repartition(1).write.mode("overwrite").parquet(s"$dir/tiny.parquet")
      val path = {
        val cat = SketchCatalog.harvest(spark, s"$dir/dim.parquet", Seq("d_key"))
          .unionByName(SketchCatalog.harvest(spark, s"$dir/fact.parquet", Seq("f_key")))
          .unionByName(SketchCatalog.harvest(spark, s"$dir/extra.parquet", Seq("e_key")))
          .unionByName(SketchCatalog.harvest(spark, s"$dir/tiny.parquet", Seq("y_key")))
        val p = s"$dir/catalog4"
        SketchCatalog.save(cat, p)
        p
      }
      val fact = spark.read.parquet(s"$dir/fact.parquet")
      val dim = spark.read.parquet(s"$dir/dim.parquet")
      val extra = spark.read.parquet(s"$dir/extra.parquet")
      val tiny = spark.read.parquet(s"$dir/tiny.parquet")
      // written WORST-first: the fact pair joins first, the cheapest
      // (extra ⋈ tiny) last
      def chain() = fact
        .join(dim, col("f_key") === col("d_key"))
        .join(extra, col("d_key") === col("e_key"))
        .join(tiny, col("e_key") === col("y_key"))
        .groupBy("d_seg")
        .agg(count(lit(1)).as("n"), sum(col("f_val") * col("e_weight")).as("s"))
        .orderBy("d_seg")

      SketchCatalog.deactivate(spark)
      val plainRows = chain().collect().toSeq

      SketchCatalog.activate(spark, path)
      val planned = chain()
      val joins = physicalJoins(planned)
      assert(joins.size == 3, s"expected 3 joins, got $joins")
      // deepest join must be over the two SMALLEST tables; the fact scan
      // must appear only under the TOP join (largest intermediate last)
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
        p.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.head.toString
        }
      val bottom = scansOf(joins.last)
      assert(bottom.nonEmpty && bottom.forall(s =>
        !s.contains("fact.parquet") && !s.contains("dim.parquet")),
        s"bottom join must be extra x tiny, scans: $bottom")
      val midScans = scansOf(joins(1))
      assert(midScans.forall(!_.contains("fact.parquet")),
        s"fact must attach LAST, mid-join scans: $midScans")
      assert(planned.collect().toSeq == plainRows)
      SketchCatalog.deactivate(spark)
    }
  }

  test("runtime filter injected exactly when the key-overlap artifact is selective") {
    import org.apache.spark.sql.execution.FilterExec
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      SketchCatalog.BroadcastBytesKey -> "0") { // pass 2 off: shuffle path
      def bloomFilters(df: DataFrame): Seq[FilterExec] = {
        val root = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p                        => p
        }
        root.collect {
          case f: FilterExec
              if f.condition.exists(_.isInstanceOf[graft.functions.BloomContains]) => f
        }
      }
      def joinBigHot(): DataFrame =
        spark.read.parquet(s"$dir/big.parquet")
          .join(spark.read.parquet(s"$dir/hot.parquet"),
            col("b_key") === col("h_key"))
          .groupBy("h_tag").agg(count(lit(1)).as("n"), sum("b_id").as("s"))
          .orderBy("h_tag")
      def joinBigDim1000(): DataFrame = // overlap ≈ 1: every big key is hot
        spark.read.parquet(s"$dir/big.parquet")
          .join(spark.read.parquet(s"$dir/big.parquet")
            .select(col("b_key").as("h_key")).distinct(), // not catalogued
            col("b_key") === col("h_key"))
          .agg(count(lit(1)).as("n"))

      SketchCatalog.deactivate(spark)
      val plainRows = joinBigHot().collect().toSeq
      assert(bloomFilters(joinBigHot()).isEmpty, "no catalog, no filter")

      val cat = SketchCatalog.harvest(spark, s"$dir/big.parquet", Seq("b_key"))
        .unionByName(SketchCatalog.harvest(spark, s"$dir/hot.parquet", Seq("h_key")))
      val path = s"$dir/rf_catalog"
      SketchCatalog.save(cat, path)
      SketchCatalog.activate(spark, path)

      // selective overlap (50 of 1000 probe keys) -> filter on the PROBE
      // side, results identical to the plain join
      val planned = joinBigHot()
      val filters = bloomFilters(planned)
      assert(filters.size == 1, s"expected one bloom runtime filter, got $filters")
      val scans = filters.head.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.head.toString
      }
      assert(scans.exists(_.contains("big.parquet")),
        s"filter must sit above the PROBE scan, found scans: $scans")
      assert(planned.collect().toSeq == plainRows)

      // a side the catalog doesn't know -> rule stays out
      assert(bloomFilters(joinBigDim1000()).isEmpty)

      // overlap artifact missing (old catalog without hll) -> no injection
      val active = SketchCatalog.lookup(spark.conf.get(SketchCatalog.ConfKey)).get
      SketchCatalog.activateEntries(spark, "nohll",
        active.entries.map(_.copy(hll = null)))
      assert(bloomFilters(joinBigHot()).isEmpty, "no hll artifact, no filter")
      assert(joinBigHot().collect().toSeq == plainRows)

      // non-selective by artifact: pretend hot has the SAME key sketch as
      // big (overlap fraction ~1) -> the artifact says don't bother
      val bigE = active.entries.find(_.key == "b_key").get
      SketchCatalog.activateEntries(spark, "dense",
        active.entries.map(e =>
          if (e.key == "h_key") e.copy(hll = bigE.hll, distinctEst = bigE.distinctEst)
          else e))
      assert(bloomFilters(joinBigHot()).isEmpty, "dense overlap, no filter")
      SketchCatalog.deactivate(spark)
    }
  }

  test("a compacted delta-harvest catalog plans identically to the one-shot harvest") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plainRows = joinFrame().collect().toSeq
      // fact harvested as two disjoint file slices; dim as one full row
      val files = graft.ops.DataSkipping.listDataFiles(spark, s"$dir/fact.parquet")
      val (a, b) = files.splitAt(files.size / 2)
      val store = s"$dir/delta_catalog"
      SketchCatalog.save(
        SketchCatalog.harvestFiles(spark, s"$dir/fact.parquet", a, Seq("f_key"))
          .unionByName(SketchCatalog.harvest(spark, s"$dir/dim.parquet", Seq("d_key"))),
        store)
      SketchCatalog.save(
        SketchCatalog.harvestFiles(spark, s"$dir/fact.parquet", b, Seq("f_key")),
        store, append = true)
      SketchCatalog.compact(spark, store)
      SketchCatalog.activate(spark, store)
      val planned = joinFrame()
      assert(physicalJoins(planned).exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "compacted delta catalog must drive the same broadcast flip")
      assert(planned.collect().toSeq == plainRows)
      // compact is idempotent: a second pass changes nothing the rule sees
      SketchCatalog.compact(spark, store)
      SketchCatalog.activate(spark, store)
      assert(physicalJoins(joinFrame()).exists(_.isInstanceOf[BroadcastHashJoinExec]))
      SketchCatalog.deactivate(spark)
    }
  }

  test("maintained catalog flips the plan as the table grows under appends") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft-sjp-grow").toString
    // big dim: always above the broadcast threshold chosen below
    (0L until 20000L).map(k => (k % 40L, s"seg${k % 4}", k.toString * 8))
      .toDF("d_key", "d_seg", "d_pad")
      .repartition(2).write.parquet(s"$d2/dim.parquet")
    // fact v1: small — the artifact should broadcast it
    (0L until 500L).map(i => (i % 40L, i)).toDF("f_key", "f_id")
      .repartition(2).write.mode("overwrite").parquet(s"$d2/fact.parquet")
    val store = s"$d2/catalog"
    def filesOf() = graft.ops.DataSkipping.listDataFiles(spark, s"$d2/fact.parquet")
    val v1Files = filesOf()
    SketchCatalog.save(
      SketchCatalog.harvestFiles(spark, s"$d2/fact.parquet", v1Files, Seq("f_key"))
        .unionByName(SketchCatalog.harvest(spark, s"$d2/dim.parquet", Seq("d_key"))),
      store)
    SketchCatalog.compact(spark, store)
    val factV1Bytes = spark.read.parquet(store)
      .where(col("key") === "f_key").select("n_bytes").head().getLong(0)

    def join() = spark.read.parquet(s"$d2/fact.parquet")
      .join(spark.read.parquet(s"$d2/dim.parquet"), col("f_key") === col("d_key"))
      .groupBy("d_seg").agg(count(lit(1)).as("n"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // threshold above fact-v1 bytes, below everything after growth
      SketchCatalog.BroadcastBytesKey -> (factV1Bytes * 4).toString) {
      SketchCatalog.activate(spark, store)
      assert(physicalJoins(join()).exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "small fact must broadcast from the maintained artifact")

      // the table grows 40x; harvest ONLY the new files, compact, refresh
      (0L until 20000L).map(i => (i % 40L, i)).toDF("f_key", "f_id")
        .repartition(8).write.mode("append").parquet(s"$d2/fact.parquet")
      val newFiles = filesOf().filterNot(v1Files.toSet)
      assert(newFiles.nonEmpty && newFiles.size < filesOf().size)
      SketchCatalog.save(
        SketchCatalog.harvestFiles(spark, s"$d2/fact.parquet", newFiles, Seq("f_key")),
        store, append = true)
      SketchCatalog.compact(spark, store)
      SketchCatalog.activate(spark, store)
      // maintained row == one-shot re-harvest of the grown table
      val maintained = spark.read.parquet(store)
        .where(col("key") === "f_key").select("n_rows").head().getLong(0)
      assert(maintained == 20500L)
      // and the plan now reflects the growth: nothing small remains
      assert(physicalJoins(join()).forall(_.isInstanceOf[SortMergeJoinExec]),
        "grown fact must stop broadcasting without a re-scan of history")
      SketchCatalog.deactivate(spark)
    }
  }

  test("the rule plans SQL-path queries identically (temp views, spark.sql)") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val path = harvestAll()
      spark.read.parquet(s"$dir/fact.parquet").createOrReplaceTempView("sjp_fact")
      spark.read.parquet(s"$dir/dim.parquet").createOrReplaceTempView("sjp_dim")
      def sqlJoin() = spark.sql(
        """SELECT d_seg, count(*) AS n, sum(f_val) AS s
          |FROM sjp_fact JOIN sjp_dim ON f_key = d_key
          |GROUP BY d_seg ORDER BY d_seg""".stripMargin)
      SketchCatalog.deactivate(spark)
      val plainRows = sqlJoin().collect().toSeq
      assert(physicalJoins(sqlJoin()).forall(_.isInstanceOf[SortMergeJoinExec]))
      SketchCatalog.activate(spark, path)
      val planned = sqlJoin()
      assert(physicalJoins(planned).exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "SQL-path join must get the artifact broadcast (the rule is plan-level, not API-level)")
      assert(planned.collect().toSeq == plainRows)
      SketchCatalog.deactivate(spark)
    }
  }

  test("user hints win; rule inert on non-equi conditions") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val path = harvestAll()
      SketchCatalog.activate(spark, path)
      val fact = spark.read.parquet(s"$dir/fact.parquet")
      val dim = spark.read.parquet(s"$dir/dim.parquet")
      // user pinned merge: the rule must not override it
      val hinted = fact.join(dim.hint("merge"), col("f_key") === col("d_key"))
        .groupBy("d_seg").agg(count(lit(1)).as("n"))
      assert(physicalJoins(hinted).forall(_.isInstanceOf[SortMergeJoinExec]))
      // non-equi condition: nothing to hash-join, rule leaves it alone
      val theta = fact.join(dim, col("f_key") < col("d_key"))
        .agg(count(lit(1)).as("n"))
      assert(theta.collect().head.getLong(0) > 0)
      SketchCatalog.deactivate(spark)
    }
  }

  test("reorder survives an uncatalogued chain table: prefix reorders, unknown stays put") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-mixed").toString
    // opaque: a table the catalog never sees, joined on the dim's key
    (0L until 40L).map(k => (k, s"z$k")).toDF("z_key", "z_tag")
      .repartition(2).write.parquet(s"$d/zdim.parquet")
    val path = harvestAll()
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      def chain() = spark.read.parquet(s"$dir/fact.parquet")
        .join(spark.read.parquet(s"$dir/dim.parquet"), col("f_key") === col("d_key"))
        .join(spark.read.parquet(s"$dir/extra.parquet"), col("d_key") === col("e_key"))
        .join(spark.read.parquet(s"$d/zdim.parquet"), col("e_key") === col("z_key"))
        .groupBy("d_seg").agg(count(lit(1)).as("n"), sum("e_weight").as("w"))
        .orderBy("d_seg")
      SketchCatalog.deactivate(spark)
      val plain = chain().collect().toSeq
      SketchCatalog.activate(spark, path)
      try {
        val joins = physicalJoins(chain())
        // 3 joins; the topmost (pre-order first) must scan the
        // uncatalogued zdim (written position), the prefix below may
        // reorder; results are identical either way
        assert(joins.size == 3)
        val top = joins.headOption.toSeq.flatMap(_.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.head.toString
        })
        assert(top.exists(_.contains("zdim")), s"uncatalogued table must keep its written position, got $top")
        assert(chain().collect().toSeq == plain)
      } finally SketchCatalog.deactivate(spark)
    }
  }

  test("semi/anti stack reorders most-selective-first from HLL overlap; parity holds") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-semistack").toString
    // base: 4000 rows over 400 keys; selective dim: 5% of keys; wide dim: 90%
    (0L until 4000L).map(i => (i % 400L, i)).toDF("b_key", "b_id")
      .repartition(4).write.parquet(s"$d/base.parquet")
    (0L until 400L).filter(_ % 20 == 0).map(k => Tuple1(k)).toDF("sel_k")
      .repartition(1).write.parquet(s"$d/sel.parquet")
    (0L until 400L).filter(_ % 10 != 0).map(k => Tuple1(k)).toDF("wide_k")
      .repartition(1).write.parquet(s"$d/wide.parquet")
    val cat = SketchCatalog.harvest(spark, s"$d/base.parquet", Seq("b_key"))
      .unionByName(SketchCatalog.harvest(spark, s"$d/sel.parquet", Seq("sel_k")))
      .unionByName(SketchCatalog.harvest(spark, s"$d/wide.parquet", Seq("wide_k")))
    SketchCatalog.save(cat, s"$d/cat")
    def chain() = spark.read.parquet(s"$d/base.parquet")
      .join(spark.read.parquet(s"$d/wide.parquet"),
        col("b_key") === col("wide_k"), "left_semi")
      .join(spark.read.parquet(s"$d/sel.parquet"),
        col("b_key") === col("sel_k"), "left_semi")
      .agg(count(lit(1)).as("n"), sum("b_id").as("s"))
    def bottomScan(df: DataFrame): Seq[String] =
      physicalJoins(df).lastOption.toSeq.flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.head.toString
      })
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      SketchCatalog.deactivate(spark)
      val plain = chain().collect().toSeq
      assert(bottomScan(chain()).exists(_.contains("wide")),
        "control: written order applies the wide filter first")
      SketchCatalog.activate(spark, s"$d/cat")
      try {
        assert(bottomScan(chain()).exists(_.contains("sel")),
          "the 5% filter must sink below the 90% one")
        assert(chain().collect().toSeq == plain)
      } finally SketchCatalog.deactivate(spark)
    }
  }

  test("skew pass salts exactly the joins the heavy-key artifact indicts; hash parity holds") {
    import org.apache.spark.sql.execution.GenerateExec
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // skewed fact: key 7 holds ~40% of 10k rows; control fact: uniform
    (0L until 10000L).map(i =>
        (if (i % 5 < 2) 7L else i % 500L, i, (i % 11).toDouble))
      .toDF("s_key", "s_id", "s_val")
      .repartition(4).write.parquet(s"$d/skfact.parquet")
    (0L until 10000L).map(i => (i % 500L, i, (i % 11).toDouble))
      .toDF("u_key", "u_id", "u_val")
      .repartition(4).write.parquet(s"$d/unifact.parquet")
    (0L until 500L).map(k => (k, s"g${k % 5}")).toDF("m_key", "m_grp")
      .repartition(2).write.parquet(s"$d/mid.parquet")
    val cat = SketchCatalog.harvest(spark, s"$d/skfact.parquet", Seq("s_key"))
      .unionByName(SketchCatalog.harvest(spark, s"$d/unifact.parquet", Seq("u_key")))
      .unionByName(SketchCatalog.harvest(spark, s"$d/mid.parquet", Seq("m_key")))
    SketchCatalog.save(cat, s"$d/cat")

    def gens(df: DataFrame): Int = {
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p                        => p
      }
      root.collect { case g: GenerateExec => g }.size
    }
    def skJoin(): DataFrame =
      spark.read.parquet(s"$d/skfact.parquet")
        .join(spark.read.parquet(s"$d/mid.parquet"),
          col("s_key") === col("m_key"))
        .groupBy("m_grp").agg(count(lit(1)).as("n"),
          sum("s_val").cast("long").as("s"))
        .orderBy("m_grp")
    def uniJoin(): DataFrame =
      spark.read.parquet(s"$d/unifact.parquet")
        .join(spark.read.parquet(s"$d/mid.parquet"),
          col("u_key") === col("m_key"))
        .groupBy("m_grp").agg(count(lit(1)).as("n"))
        .orderBy("m_grp")

    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      SketchCatalog.BroadcastBytesKey -> "0") {
      SketchCatalog.deactivate(spark)
      val plain = skJoin().collect().toSeq
      assert(gens(skJoin()) == 0, "control: no salt without a catalog")
      SketchCatalog.activate(spark, s"$d/cat")
      try {
        // the skewed join salts: a Generate replicates the mid table and
        // the join carries the salt key; results are hash-identical
        assert(gens(skJoin()) == 1, "skewed join must be salted")
        assert(physicalJoins(skJoin()).nonEmpty)
        assert(skJoin().collect().toSeq == plain,
          "salting must be invisible to results")
        // the uniform control join must NOT salt under the same catalog
        assert(gens(uniJoin()) == 0, "uniform join must stay unsalted")
      } finally SketchCatalog.deactivate(spark)
    }
  }

  test("planted demotions decline plan decisions; runtime filter survives") {
    import org.apache.spark.sql.execution.FilterExec
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val path = harvestAll()
      SketchCatalog.deactivate(spark)
      val plainRows = joinFrame().collect().toSeq
      val cat = SketchCatalog.activate(spark, path)
      // control: the artifact broadcasts the join
      assert(physicalJoins(joinFrame()).exists(_.isInstanceOf[BroadcastHashJoinExec]))
      // demote both sides' keys: the broadcast pass must decline their
      // table stats and the join falls back to sort-merge — results
      // untouched (demoting only one side would just flip the broadcast
      // to the other tiny table, which is correct and uninteresting)
      val dimTable = SketchCatalog.normalizePath(spark, s"$dir/dim.parquet")
      val factTable = SketchCatalog.normalizePath(spark, s"$dir/fact.parquet")
      SketchCatalog.activateEntries(spark, "demoted", cat.entries,
        demoted = Set((dimTable, "d_key"), (factTable, "f_key")))
      assert(physicalJoins(joinFrame()).forall(_.isInstanceOf[SortMergeJoinExec]),
        "a demoted artifact must not drive a broadcast")
      assert(joinFrame().collect().toSeq == plainRows)
      // the runtime filter is result-safe and deliberately IGNORES
      // demotion: the selective big⋈hot join still gets its Bloom with
      // both entries demoted
      def bloomFilters(df: DataFrame): Seq[FilterExec] = {
        val root = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p                        => p
        }
        root.collect {
          case f: FilterExec
              if f.condition.exists(_.isInstanceOf[graft.functions.BloomContains]) => f
        }
      }
      def joinBigHot(): DataFrame =
        spark.read.parquet(s"$dir/big.parquet")
          .join(spark.read.parquet(s"$dir/hot.parquet"),
            col("b_key") === col("h_key"))
          .groupBy("h_tag").agg(count(lit(1)).as("n"), sum("b_id").as("s"))
          .orderBy("h_tag")
      withSQLConf(SketchCatalog.BroadcastBytesKey -> "0") {
        val rfCat = SketchCatalog.harvest(spark, s"$dir/big.parquet", Seq("b_key"))
          .unionByName(SketchCatalog.harvest(spark, s"$dir/hot.parquet", Seq("h_key")))
        SketchCatalog.save(rfCat, s"$dir/rf_demoted_catalog")
        val loaded = SketchCatalog.activate(spark, s"$dir/rf_demoted_catalog")
        SketchCatalog.activateEntries(spark, "rf_demoted", loaded.entries,
          demoted = loaded.entries.map(e => (e.table, e.key)).toSet)
        val plainBigHot = {
          SketchCatalog.deactivate(spark)
          joinBigHot().collect().toSeq
        }
        spark.conf.set(SketchCatalog.ConfKey, "rf_demoted")
        assert(bloomFilters(joinBigHot()).size == 1,
          "runtime filter must survive demotion (result-safe)")
        assert(joinBigHot().collect().toSeq == plainBigHot)
      }
      SketchCatalog.deactivate(spark)
    }
  }

  test("audit store demotes the poisoned artifact at activate; fingerprint recovery") {
    import graft.ops.PlannerAudit
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val honestPath = harvestAll()
      // poisoned catalog: the dim key's CMS swapped for a x16-replicated
      // harvest (honest n_rows/bytes, 16x-lying counts — the stale sketch)
      import spark.implicits._
      spark.read.parquet(s"$dir/dim.parquet").select(col("d_key"))
        .crossJoin(spark.range(16)).select(col("d_key"))
        .write.mode("overwrite").parquet(s"$dir/fatdim.parquet")
      val fatCms = SketchCatalog.harvest(spark, s"$dir/fatdim.parquet", Seq("d_key"))
        .select(col("cms")).head().getAs[Array[Byte]](0)
      val poisonedPath = s"$dir/catalog_poisoned"
      SketchCatalog.save(
        spark.read.parquet(honestPath).withColumn("cms",
          when(col("key") === "d_key", lit(fatCms)).otherwise(col("cms"))),
        poisonedPath)
      spark.conf.unset(SketchCatalog.AuditStoreKey)
      val pcat = SketchCatalog.activate(spark, poisonedPath)
      SketchCatalog.deactivate(spark)
      // three real audited executions of fact ⋈ dim against the poisoned
      // artifact: est ~16x actual, far past the eps*na*nb slack
      val auditPath = s"$dir/audit_store"
      PlannerAudit.record(spark, auditPath, (1 to 3).map { _ =>
        PlannerAudit.auditEquiJoin(spark, pcat, s"$dir/fact.parquet", "f_key",
          s"$dir/dim.parquet", "d_key")
      }, append = false)
      assert(PlannerAudit.report(spark, auditPath)
        .where(!col("overcount_bounded")).count() == 3L)
      try {
        spark.conf.set(SketchCatalog.AuditStoreKey, auditPath)
        val demotedCat = SketchCatalog.activate(spark, poisonedPath)
        val dimTable = SketchCatalog.normalizePath(spark, s"$dir/dim.parquet")
        val factTable = SketchCatalog.normalizePath(spark, s"$dir/fact.parquet")
        assert(demotedCat.demoted((dimTable, "d_key")),
          "the poisoned sketch must demote")
        // demoted: no broadcast from the condemned artifact; parity holds
        SketchCatalog.deactivate(spark)
        val plainRows = joinFrame().collect().toSeq
        SketchCatalog.activate(spark, poisonedPath)
        assert(physicalJoins(joinFrame()).forall(_.isInstanceOf[SortMergeJoinExec]))
        assert(joinFrame().collect().toSeq == plainRows)
        // recovery is fingerprint-keyed: the honest (re-harvested) dim
        // sketch has a clean record and trusts again — while the fact
        // sketch that participated in every bad estimate stays demoted
        val honestCat = SketchCatalog.activate(spark, honestPath)
        assert(!honestCat.demoted((dimTable, "d_key")),
          "re-harvested bytes must recover")
        assert(honestCat.demoted((factTable, "f_key")),
          "the co-audited sketch stays conservatively demoted")
        SketchCatalog.deactivate(spark)
      } finally spark.conf.unset(SketchCatalog.AuditStoreKey)
    }
  }

  test("aggregate-bound audit: an understating sketch is caught on real executions, demotes, and the rollup broadcast declines") {
    import graft.ops.PlannerAudit
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // table: 4000 rows, 40 distinct g1 (written by the composite-grouping
    // test's fixture shape; rebuilt here standalone for ordering safety)
    val agPath = s"$dir/agfact.parquet"
    if (!new java.io.File(agPath).exists()) {
      spark.range(0L, 4000L)
        .select((col("id") % 40).as("g1"), col("id").as("ag_id"),
          (col("id") % 5).cast("double").as("ag_val"))
        .repartition(4).write.parquet(agPath)
    }
    val honestPath = {
      val p = s"$dir/catalog_ag"
      SketchCatalog.save(SketchCatalog.harvest(spark, agPath, Seq("g1")), p)
      p
    }
    // poisoned: g1's distinct/cms swapped for a single-group harvest —
    // the stale sketch that predates a 40× group-count explosion
    spark.range(0L, 4000L).select(lit(7L).as("g1"))
      .write.mode("overwrite").parquet(s"$dir/thin_ag.parquet")
    val thin = SketchCatalog.harvest(spark, s"$dir/thin_ag.parquet", Seq("g1"))
      .select(col("distinct_est"), col("cms")).head()
    val poisonedPath = s"$dir/catalog_ag_poisoned"
    SketchCatalog.save(
      spark.read.parquet(honestPath)
        .withColumn("distinct_est",
          when(col("key") === "g1", lit(thin.getDouble(0))).otherwise(col("distinct_est")))
        .withColumn("cms",
          when(col("key") === "g1", lit(thin.getAs[Array[Byte]](1))).otherwise(col("cms"))),
      poisonedPath)
    def frame(): DataFrame = {
      val rollup = spark.read.parquet(agPath)
        .groupBy("g1").agg(sum("ag_val").as("g_total"))
        .withColumnRenamed("g1", "a1")
      spark.read.parquet(agPath)
        .join(rollup, col("g1") === col("a1"))
        .groupBy((col("g1") % 4).as("g")).agg(count(lit(1)).as("n"), sum("g_total").as("s"))
        .orderBy("g")
    }
    val factBytes = spark.read.parquet(honestPath).where(col("key") === "g1")
      .select("n_bytes").head().getLong(0)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        SketchCatalog.BroadcastBytesKey -> math.max(1L, factBytes / 4).toString) {
      spark.conf.unset(SketchCatalog.AuditStoreKey)
      SketchCatalog.deactivate(spark)
      val plainRows = frame().collect().toSeq
      // the hazard: the lying artifact prices the rollup at ~2 rows and
      // broadcasts it — correct results (hints are semantics-safe), but
      // exactly the estimate the audit exists to catch
      val pcat = SketchCatalog.activate(spark, poisonedPath)
      assert(aggOnBuildSide(frame()),
        "the understating sketch must (unsafely) earn the broadcast pre-audit")
      assert(frame().collect().toSeq == plainRows)
      SketchCatalog.deactivate(spark)
      // three audited real executions of the GROUP BY: est ≈ 2, actual 40
      val auditPath = s"$dir/audit_store_ag"
      PlannerAudit.record(spark, auditPath, (1 to 3).flatMap { _ =>
        PlannerAudit.auditAggBound(spark, pcat, agPath, Seq("g1"))
      }, append = false)
      assert(PlannerAudit.report(spark, auditPath)
        .where(!col("never_undercount")).count() == 3L,
        "every audited execution must record the undercount violation")
      try {
        spark.conf.set(SketchCatalog.AuditStoreKey, auditPath)
        val demoted = SketchCatalog.activate(spark, poisonedPath)
        val agTable = SketchCatalog.normalizePath(spark, agPath)
        assert(demoted.demoted((agTable, "g1")), "the lying sketch must demote")
        // demoted: aggGroupBound declines, the join stays sort-merge
        assert(physicalJoins(frame()).forall(_.isInstanceOf[SortMergeJoinExec]),
          "a demoted grouping-key artifact must not price the rollup")
        assert(frame().collect().toSeq == plainRows)
        // fingerprint recovery: the honest harvest (different bytes) has a
        // clean record and earns the broadcast again
        SketchCatalog.activate(spark, honestPath)
        assert(aggOnBuildSide(frame()),
          "the honest re-harvest must recover by fingerprint")
        assert(frame().collect().toSeq == plainRows)
        SketchCatalog.deactivate(spark)
      } finally spark.conf.unset(SketchCatalog.AuditStoreKey)
    }
  }

  test("schema evolution: renamed/retyped keys degrade the rule to inert, parity holds") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val path = harvestAll()
      // RENAMED: the dim rewritten under a new column name at a NEW path —
      // the catalog knows neither the path nor the name; the rule must
      // stay out entirely (no estimate is not a guess) and results hold
      spark.read.parquet(s"$dir/dim.parquet")
        .select(col("d_key").as("renamed_key"), col("d_seg"))
        .write.mode("overwrite").parquet(s"$dir/dim_renamed.parquet")
      def renamedJoin() = spark.read.parquet(s"$dir/fact.parquet")
        .join(spark.read.parquet(s"$dir/dim_renamed.parquet"),
          col("f_key") === col("renamed_key"))
        .groupBy("d_seg").agg(count(lit(1)).as("n"), sum("f_val").as("s"))
        .orderBy("d_seg")
      SketchCatalog.deactivate(spark)
      val plain = renamedJoin().collect().toSeq
      SketchCatalog.activate(spark, path)
      // the fact side is catalogued and tiny, so a broadcast of FACT from
      // its honest bytes is fine; what must NOT happen is a crash or a
      // wrong result from the unknown side
      assert(renamedJoin().collect().toSeq == plain)

      // RETYPED: the catalogued dim path rewritten with d_key as STRING;
      // the join now carries an implicit cast, which the rule's
      // equi-pair scope declines — inert (sort-merge), parity holds
      val retypedDir = s"$dir/dim_retyped.parquet"
      spark.read.parquet(s"$dir/dim.parquet")
        .select(col("d_key").cast("string").as("d_key"), col("d_seg"))
        .write.mode("overwrite").parquet(retypedDir)
      val retypedCat = SketchCatalog.harvest(spark, s"$dir/fact.parquet", Seq("f_key"))
        .unionByName(SketchCatalog.harvest(spark, s"$dir/dim.parquet", Seq("d_key")))
      // relabel the STALE long-keyed dim artifact onto the retyped path —
      // the pre-evolution catalog pointing at the evolved table
      val stale = retypedCat.withColumn("table",
        when(col("table").contains("dim.parquet"),
          lit(SketchCatalog.normalizePath(spark, retypedDir)))
          .otherwise(col("table")))
      SketchCatalog.save(stale, s"$dir/catalog_stale_retyped")
      def retypedJoin() = spark.read.parquet(s"$dir/fact.parquet")
        .join(spark.read.parquet(retypedDir),
          col("f_key") === col("d_key"))
        .groupBy("d_seg").agg(count(lit(1)).as("n"), sum("f_val").as("s"))
        .orderBy("d_seg")
      SketchCatalog.deactivate(spark)
      val plainRe = retypedJoin().collect().toSeq
      SketchCatalog.activate(spark, s"$dir/catalog_stale_retyped")
      withSQLConf(SketchCatalog.BroadcastBytesKey -> "0") {
        // equi-pair scope declines the cast-wrapped condition: no hints,
        // no reorder, no runtime filter from the stale long-keyed sketch
        assert(physicalJoins(retypedJoin()).forall(_.isInstanceOf[SortMergeJoinExec]))
        assert(retypedJoin().collect().toSeq == plainRe)
      }
      SketchCatalog.deactivate(spark)
    }
  }

  test("AQE composition: salted exchange not re-split by AQE skew join; artifact broadcast survives to the final plan") {
    import spark.implicits._
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val d3 = java.nio.file.Files.createTempDirectory("graft-sjp-aqe").toString
    // ~60% of 50k rows on key 7 — with the lowered AQE thresholds below,
    // the UNSALTED join's hot partition is decisively AQE-skew-splittable
    // (compressed map-output sizes, not raw bytes, feed the skew test)
    (0L until 50000L).map(i =>
        (if (i % 5 < 3) 7L else i % 500L, i, (i % 11).toDouble))
      .toDF("s_key", "s_id", "s_val")
      .repartition(4).write.parquet(s"$d3/aqfact.parquet")
    (0L until 500L).map(k => (k, s"g${k % 5}")).toDF("m_key", "m_grp")
      .repartition(2).write.parquet(s"$d3/aqmid.parquet")
    val cat = SketchCatalog.harvest(spark, s"$d3/aqfact.parquet", Seq("s_key"))
      .unionByName(SketchCatalog.harvest(spark, s"$d3/aqmid.parquet", Seq("m_key")))
    SketchCatalog.save(cat, s"$d3/cat")
    def join(): DataFrame =
      spark.read.parquet(s"$d3/aqfact.parquet")
        .join(spark.read.parquet(s"$d3/aqmid.parquet"), col("s_key") === col("m_key"))
        .groupBy("m_grp").agg(count(lit(1)).as("n"), sum("s_val").cast("long").as("s"))
        .orderBy("m_grp")
    // FINAL adaptive plan (after execution), where AQE's skew handling
    // is visible as SortMergeJoinExec.isSkewJoin. collect() stops at
    // QueryStageExec boundaries (stages have no children), so the walk
    // descends into each stage's materialized plan explicitly.
    def deepNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(deepNodes)
    }
    def finalNodes(df: DataFrame): Seq[SparkPlan] = {
      df.collect()
      deepNodes(df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      })
    }
    def finalSmjSkew(df: DataFrame): (Boolean, Int) = {
      val nodes = finalNodes(df)
      (nodes.exists { case s: SortMergeJoinExec => s.isSkewJoin; case _ => false },
        nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.GenerateExec]))
    }
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.5",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      SketchCatalog.BroadcastBytesKey -> "0") {
      SketchCatalog.deactivate(spark)
      val plain = join().collect().toSeq
      // control: with no catalog the knobs ARM AQE — its own skew split
      // fires on the bare sort-merge join (proves the thresholds bite)
      val (bareSkew, bareGens) = finalSmjSkew(join())
      assert(bareGens == 0)
      assert(bareSkew, "control: AQE's skew join must fire on the unsalted hot key")
      SketchCatalog.activate(spark, s"$d3/cat")
      try {
        // salted plan under the SAME armed AQE: the Generate survives to
        // the final plan, and NO SMJ is AQE-skew-split — the salt already
        // balanced the exchange, so the two mitigations do not fight
        val planned = join()
        val rows = planned.collect().toSeq
        assert(rows == plain, "salting under AQE must be invisible to results")
        val (saltedSkew, saltedGens) = finalSmjSkew(join())
        assert(saltedGens == 1, "salted Generate must survive AQE re-planning")
        assert(!saltedSkew,
          "AQE must find nothing to skew-split in the salted exchange")
      } finally SketchCatalog.deactivate(spark)
    }
    // artifact broadcast under AQE: the hint must survive to the FINAL
    // adaptive plan (AQE can only upgrade toward broadcast, never revert
    // a logical-side hint)
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      SketchCatalog.deactivate(spark)
      val plain = joinFrame().collect().toSeq
      SketchCatalog.activate(spark, harvestAll())
      try {
        val df = joinFrame()
        val got = df.collect().toSeq
        assert(finalNodes(df).exists(_.isInstanceOf[BroadcastHashJoinExec]),
          "artifact broadcast must survive to the final adaptive plan")
        assert(got == plain)
      } finally SketchCatalog.deactivate(spark)
    }
  }

  test("snowflake subtree priced as a composite edge: selective dim sinks below it; parity holds") {
    import spark.implicits._
    val d2 = java.nio.file.Files.createTempDirectory("graft-sjp-snow").toString
    // sub-dim amplifies the 40-key dim x4; sel keeps 1/8 of the fact keys
    (0L until 40L).flatMap(k => (0L until 4L).map(w => (k % 8L, k * 4 + w)))
      .toDF("x_sub", "x_w").repartition(2).write.parquet(s"$d2/xsub.parquet")
    (0L until 40L).map(k => (k, k % 8L)).toDF("sd_key", "sd_sub")
      .repartition(2).write.parquet(s"$d2/sdim.parquet")
    (0L until 40L).filter(_ % 8 == 0).map(k => (k, s"s$k")).toDF("z_key", "z_tag")
      .repartition(1).write.parquet(s"$d2/zsel.parquet")
    val cat = SketchCatalog.harvest(spark, s"$dir/fact.parquet", Seq("f_key"))
      .unionByName(SketchCatalog.harvest(spark, s"$d2/sdim.parquet", Seq("sd_key", "sd_sub")))
      .unionByName(SketchCatalog.harvest(spark, s"$d2/xsub.parquet", Seq("x_sub")))
      .unionByName(SketchCatalog.harvest(spark, s"$d2/zsel.parquet", Seq("z_key")))
    SketchCatalog.save(cat, s"$d2/cat")
    def chain(): DataFrame = {
      val snow = spark.read.parquet(s"$d2/sdim.parquet")
        .join(spark.read.parquet(s"$d2/xsub.parquet"), col("sd_sub") === col("x_sub"))
      spark.read.parquet(s"$dir/fact.parquet")
        .join(snow, col("f_key") === col("sd_key"))
        .join(spark.read.parquet(s"$d2/zsel.parquet"), col("f_key") === col("z_key"))
        .groupBy("z_tag").agg(count(lit(1)).as("n"), sum("x_w").as("w"))
        .orderBy("z_tag")
    }
    def scansOf(j: SparkPlan): Set[String] = j.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.head.toString
    }.toSet
    def bottomFactSel(df: DataFrame): Boolean =
      physicalJoins(df).exists { j =>
        val s = scansOf(j)
        s.nonEmpty && s.forall(p => p.contains("fact") || p.contains("zsel")) &&
          s.exists(_.contains("fact")) && s.exists(_.contains("zsel"))
      }
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      SketchCatalog.BroadcastBytesKey -> "0") {
      SketchCatalog.deactivate(spark)
      val plain = chain().collect().toSeq
      assert(!bottomFactSel(chain()), "written-worst order joins the snowflake first")
      SketchCatalog.activate(spark, s"$d2/cat")
      try {
        val planned = chain()
        assert(bottomFactSel(planned),
          "composite-priced snowflake must let the selective dim sink to the bottom")
        assert(planned.collect().toSeq == plain,
          "snowflake reorder must be invisible to results")
      } finally SketchCatalog.deactivate(spark)
    }
  }

  test("bushy subtree (right-nested, depth 2) priced recursively: selective dim still sinks; parity holds") {
    import spark.implicits._
    val d3 = java.nio.file.Files.createTempDirectory("graft-sjp-bushy").toString
    // dim -> sub -> subsub, with the leaf written RIGHT-NESTED:
    // dim JOIN (sub JOIN subsub) — the 2-table subtree pricing (q28 form)
    // declined this shape and the chain kept its written-worst order
    (0L until 40L).map(k => (k, k % 8L)).toDF("bd_key", "bd_sub")
      .repartition(2).write.parquet(s"$d3/bdim.parquet")
    (0L until 8L).map(s => (s, s % 4L)).toDF("bs_sub", "bs_cat")
      .repartition(1).write.parquet(s"$d3/bsub.parquet")
    (0L until 4L).flatMap(c => (0L until 4L).map(w => (c, c * 4 + w)))
      .toDF("bc_cat", "bc_w").repartition(1).write.parquet(s"$d3/bsubsub.parquet")
    (0L until 40L).filter(_ % 8 == 0).map(k => (k, s"b$k")).toDF("bz_key", "bz_tag")
      .repartition(1).write.parquet(s"$d3/bzsel.parquet")
    val cat = SketchCatalog.harvest(spark, s"$dir/fact.parquet", Seq("f_key"))
      .unionByName(SketchCatalog.harvest(spark, s"$d3/bdim.parquet", Seq("bd_key", "bd_sub")))
      .unionByName(SketchCatalog.harvest(spark, s"$d3/bsub.parquet", Seq("bs_sub", "bs_cat")))
      .unionByName(SketchCatalog.harvest(spark, s"$d3/bsubsub.parquet", Seq("bc_cat")))
      .unionByName(SketchCatalog.harvest(spark, s"$d3/bzsel.parquet", Seq("bz_key")))
    SketchCatalog.save(cat, s"$d3/cat")
    def chain(): DataFrame = {
      val bushy = spark.read.parquet(s"$d3/bdim.parquet")
        .join(spark.read.parquet(s"$d3/bsub.parquet")
            .join(spark.read.parquet(s"$d3/bsubsub.parquet"),
              col("bs_cat") === col("bc_cat")),
          col("bd_sub") === col("bs_sub"))
      spark.read.parquet(s"$dir/fact.parquet")
        .join(bushy, col("f_key") === col("bd_key"))
        .join(spark.read.parquet(s"$d3/bzsel.parquet"), col("f_key") === col("bz_key"))
        .groupBy("bz_tag").agg(count(lit(1)).as("n"), sum("bc_w").as("w"))
        .orderBy("bz_tag")
    }
    def scansOf(j: SparkPlan): Set[String] = j.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.head.toString
    }.toSet
    def bottomFactSel(df: DataFrame): Boolean =
      physicalJoins(df).exists { j =>
        val s = scansOf(j)
        s.nonEmpty && s.forall(p => p.contains("fact") || p.contains("bzsel")) &&
          s.exists(_.contains("fact")) && s.exists(_.contains("bzsel"))
      }
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      SketchCatalog.BroadcastBytesKey -> "0") {
      SketchCatalog.deactivate(spark)
      val plain = chain().collect().toSeq
      assert(!bottomFactSel(chain()), "written-worst order joins the bushy arm first")
      SketchCatalog.activate(spark, s"$d3/cat")
      try {
        val planned = chain()
        assert(bottomFactSel(planned),
          "recursively-priced bushy subtree must let the selective dim sink to the bottom")
        assert(planned.collect().toSeq == plain,
          "bushy reorder must be invisible to results")
      } finally SketchCatalog.deactivate(spark)
    }
  }

  test("catalogued dim STACK (depth-2 arm) earns the broadcast under the fact join; parity holds") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val d4 = java.nio.file.Files.createTempDirectory("graft-sjp-armbc").toString
    (0L until 40L).map(k => (k, k % 8L)).toDF("ad_key", "ad_sub")
      .repartition(2).write.parquet(s"$d4/adim.parquet")
    (0L until 8L).map(s => (s, s % 4L)).toDF("as_sub", "as_cat")
      .repartition(1).write.parquet(s"$d4/asub.parquet")
    (0L until 4L).flatMap(c => (0L until 2L).map(w => (c, c * 2 + w)))
      .toDF("ac_cat", "ac_w").repartition(1).write.parquet(s"$d4/asubsub.parquet")
    val cat = SketchCatalog.harvest(spark, s"$dir/fact.parquet", Seq("f_key"))
      .unionByName(SketchCatalog.harvest(spark, s"$d4/adim.parquet", Seq("ad_key", "ad_sub")))
      .unionByName(SketchCatalog.harvest(spark, s"$d4/asub.parquet", Seq("as_sub", "as_cat")))
      .unionByName(SketchCatalog.harvest(spark, s"$d4/asubsub.parquet", Seq("ac_cat")))
    SketchCatalog.save(cat, s"$d4/cat")
    def chain(): DataFrame = {
      val arm = spark.read.parquet(s"$d4/adim.parquet")
        .join(spark.read.parquet(s"$d4/asub.parquet")
            .join(spark.read.parquet(s"$d4/asubsub.parquet"),
              col("as_cat") === col("ac_cat")),
          col("ad_sub") === col("as_sub"))
      spark.read.parquet(s"$dir/fact.parquet")
        .join(arm, col("f_key") === col("ad_key"))
        .groupBy("ad_sub").agg(count(lit(1)).as("n"), sum("ac_w").as("w"))
        .orderBy("ad_sub")
    }
    // the broadcast EXCHANGE subtree must hold exactly the three arm
    // tables — the whole catalogued dim stack built as one hash side
    def armBroadcast(df: DataFrame): Boolean = {
      val root = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      root.collect { case e: BroadcastExchangeExec =>
        e.collect { case f: FileSourceScanExec =>
          f.relation.location.rootPaths.head.toString }.toSet
      }.exists(s => s.exists(_.contains("adim")) && s.exists(_.contains("asub")) &&
        s.exists(_.contains("asubsub")) && !s.exists(_.contains("fact")))
    }
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      SketchCatalog.deactivate(spark)
      val plain = chain().collect().toSeq
      assert(!armBroadcast(chain()),
        "control: no catalog, auto-broadcast off - the arm cannot broadcast")
      SketchCatalog.activate(spark, s"$d4/cat")
      try {
        val planned = chain()
        assert(armBroadcast(planned),
          "estBytes must price the depth-2 arm through subTree and broadcast it whole")
        assert(planned.collect().toSeq == plain,
          "arm broadcast must be invisible to results")
      } finally SketchCatalog.deactivate(spark)
    }
  }

  test("left-outer joins: broadcast/salt/filter fire only in result-safe directions; parity holds") {
    import org.apache.spark.sql.execution.GenerateExec
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-sjp-outer").toString
    // left fact: key 7 holds ~40% (skewed preserved side); dim covers
    // only keys < 300 of the fact's 500, so ~40% of fact rows are
    // null-extended — outer semantics ride every parity check
    (0L until 10000L).map(i =>
        (if (i % 5 < 2) 7L else i % 500L, i, (i % 11).toDouble))
      .toDF("s_key", "s_id", "s_val")
      .repartition(4).write.parquet(s"$d/ofact.parquet")
    (0L until 300L).map(k => (k, s"g${k % 5}")).toDF("m_key", "m_grp")
      .repartition(2).write.parquet(s"$d/odim.parquet")
    // mirror tables with the skew on the NON-preserved side: outer must
    // NOT salt there (replicating the preserved side duplicates its
    // null-extended rows)
    (0L until 500L).map(k => (k, s"g${k % 5}")).toDF("p_key", "p_grp")
      .repartition(2).write.parquet(s"$d/opres.parquet")
    (0L until 10000L).map(i =>
        (if (i % 5 < 2) 7L else i % 500L, i)).toDF("w_key", "w_id")
      .repartition(4).write.parquet(s"$d/oskewdim.parquet")
    val cat = SketchCatalog.harvest(spark, s"$d/ofact.parquet", Seq("s_key"))
      .unionByName(SketchCatalog.harvest(spark, s"$d/odim.parquet", Seq("m_key")))
      .unionByName(SketchCatalog.harvest(spark, s"$d/opres.parquet", Seq("p_key")))
      .unionByName(SketchCatalog.harvest(spark, s"$d/oskewdim.parquet", Seq("w_key")))
    SketchCatalog.save(cat, s"$d/cat")
    def gens(df: DataFrame): Int = {
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p                        => p
      }
      root.collect { case g: GenerateExec => g }.size
    }
    def outerJoin(): DataFrame =
      spark.read.parquet(s"$d/ofact.parquet")
        .join(spark.read.parquet(s"$d/odim.parquet"),
          col("s_key") === col("m_key"), "left")
        .groupBy(coalesce(col("m_grp"), lit("none")).as("grp"))
        .agg(count(lit(1)).as("n"), sum("s_val").cast("long").as("s"))
        .orderBy("grp")
    def rightSkewOuter(): DataFrame =
      spark.read.parquet(s"$d/opres.parquet")
        .join(spark.read.parquet(s"$d/oskewdim.parquet"),
          col("p_key") === col("w_key"), "left")
        .groupBy("p_grp").agg(count(lit(1)).as("n"))
        .orderBy("p_grp")

    // (a) broadcast: non-preserved dim under the threshold gets the hint
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      SketchCatalog.deactivate(spark)
      val plain = outerJoin().collect().toSeq
      assert(physicalJoins(outerJoin()).forall(_.isInstanceOf[SortMergeJoinExec]))
      SketchCatalog.activate(spark, s"$d/cat")
      try {
        val planned = outerJoin()
        assert(physicalJoins(planned).exists(_.isInstanceOf[BroadcastHashJoinExec]),
          "artifact must broadcast the non-preserved dim of a left-outer join")
        assert(planned.collect().toSeq == plain,
          "outer broadcast must preserve null-extended rows")
      } finally SketchCatalog.deactivate(spark)
    }
    // (b) skew: preserved-side skew salts (parity incl. null-extension);
    //     non-preserved-side skew must NOT salt (unsafe direction)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      SketchCatalog.BroadcastBytesKey -> "0") {
      SketchCatalog.deactivate(spark)
      val plain = outerJoin().collect().toSeq
      val plainRight = rightSkewOuter().collect().toSeq
      SketchCatalog.activate(spark, s"$d/cat")
      try {
        assert(gens(outerJoin()) == 1, "preserved-side skew must salt the left-outer join")
        assert(outerJoin().collect().toSeq == plain,
          "outer salting must be invisible to results")
        assert(gens(rightSkewOuter()) == 0,
          "non-preserved-side skew must NOT salt a left-outer join")
        assert(rightSkewOuter().collect().toSeq == plainRight)
      } finally SketchCatalog.deactivate(spark)
    }
  }

  test("composite-key tuple artifact prices the join; permuted conditions match; partial falls back") {
    // cfact: every single key 200-ways shared, tuples 10-ways (20x gap
    // between single-column and tuple inner products); cdim: 20 distinct
    // tuples, one row each
    val d = java.nio.file.Files.createTempDirectory("graft-sjp-tuple").toString
    import spark.implicits._
    (0L until 4000L).map(i => (i % 20L, (i / 20L) % 20L, i))
      .toDF("a1", "a2", "a_id")
      .repartition(4).write.parquet(s"$d/cfact.parquet")
    (0L until 20L).map(j => (j, (j * 7L + 3L) % 20L, s"g${j % 3}"))
      .toDF("b1", "b2", "b_grp")
      .repartition(2).write.parquet(s"$d/cdim.parquet")
    // outer probe table, deliberately UNCATALOGUED (no leaf-bytes hint
    // can fire from it): the decision under test is whether the
    // composite INTERMEDIATE (cfact ⋈ cdim) broadcasts — the q25 shape
    (0L until 4000L).map(i => (i, i % 7L)).toDF("o_id", "o_w")
      .repartition(4).write.parquet(s"$d/couter.parquet")
    def joined(permuted: Boolean): DataFrame = {
      val f = spark.read.parquet(s"$d/cfact.parquet")
      val dm = spark.read.parquet(s"$d/cdim.parquet")
      val o = spark.read.parquet(s"$d/couter.parquet")
      val cond =
        if (permuted) col("a2") === col("b2") && col("a1") === col("b1")
        else col("a1") === col("b1") && col("a2") === col("b2")
      o.join(f.join(dm, cond), col("o_id") === col("a_id"))
        .groupBy("b_grp").agg(count(lit(1)).as("n"), sum("o_w").as("w"))
        .orderBy("b_grp")
    }
    // pre-order head of physicalJoins = the TOP (outer ⋈ intermediate)
    // join — the inner join may legitimately broadcast the tiny dim by
    // its own table bytes in every catalog state
    def topJoin(df: DataFrame) = physicalJoins(df).head
    def harvest(factTuple: Boolean, dimTuple: Boolean): String = {
      val t2 = Seq(Seq("a1", "a2")); val t2d = Seq(Seq("b1", "b2"))
      val cat = SketchCatalog.harvest(spark, s"$d/cfact.parquet",
          Seq("a1", "a2"), tuples = if (factTuple) t2 else Nil)
        .unionByName(SketchCatalog.harvest(spark, s"$d/cdim.parquet",
          Seq("b1", "b2"), tuples = if (dimTuple) t2d else Nil))
      val path = s"$d/catalog_${factTuple}_$dimTuple"
      SketchCatalog.save(cat, path)
      path
    }
    // threshold between the tuple estimate (~200 rows) and the single
    // estimate (~4000 rows), scaled by the joined per-row bytes the rule
    // derives from the catalog — read them back so the pin is exact
    val both = harvest(factTuple = true, dimTuple = true)
    val rows = spark.read.parquet(both).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    val perRow = math.max(1L, rows("a1")._2 / rows("a1")._1) +
      math.max(1L, rows("b1")._2 / rows("b1")._1)
    val thr = 1000L * perRow // 200 << 1000 << 4000
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        SketchCatalog.BroadcastBytesKey -> thr.toString) {
      val plain = joined(permuted = false).collect().toSeq
      SketchCatalog.deactivate(spark)
      assert(physicalJoins(joined(permuted = false)).forall(_.isInstanceOf[SortMergeJoinExec]))

      // singles only: min-over-pairs estimate (~4000 rows) stays over
      // the threshold — the top join must not flip (the pre-r14 view)
      SketchCatalog.activate(spark, harvest(factTuple = false, dimTuple = false))
      assert(topJoin(joined(permuted = false)).isInstanceOf[SortMergeJoinExec],
        "singles-only catalog must not flip a 20x-overpriced composite join")

      // tuple on BOTH sides: composite estimate (~200 rows) flips the
      // intermediate to broadcast; results identical; the PERMUTED
      // condition (a2 first) must match the same artifacts through
      // pair reordering
      SketchCatalog.activate(spark, both)
      val planned = joined(permuted = false)
      assert(topJoin(planned).isInstanceOf[BroadcastHashJoinExec],
        "tuple artifact must flip the composite intermediate to broadcast")
      assert(planned.collect().toSeq == plain)
      val perm = joined(permuted = true)
      assert(topJoin(perm).isInstanceOf[BroadcastHashJoinExec],
        "permuted condition order must resolve the same tuple artifacts")
      assert(perm.collect().toSeq == plain)

      // tuple on ONE side only: no pairable tuple artifact -> falls back
      // to the single-column min (over threshold) -> no flip, no crash
      SketchCatalog.activate(spark, harvest(factTuple = true, dimTuple = false))
      assert(topJoin(joined(permuted = false)).isInstanceOf[SortMergeJoinExec],
        "one-sided tuple harvest must fall back to single-column pricing")
      assert(joined(permuted = false).collect().toSeq == plain)
      SketchCatalog.deactivate(spark)
    }
  }
}
