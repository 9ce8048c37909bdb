package graft

import org.apache.spark.sql.functions._
import graft.ops.{DataSkipping, Layout}

class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def zTable(n: Long, files: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-skip-spec").toString
    val df = spark.range(n).select(
      col("id").as("a"),
      ((col("id") * 7919L) % n).as("b"),
      (col("id") % 100).cast("double").as("v"))
    Layout.zorderWrite(df, "a", "b", dir, numFiles = files)
    dir
  }

  test("X9ds manifest agrees with a full-scan recount per file") {
    val dir = zTable(20000, 8)
    // join on the basename: listDataFiles and input_file_name render the
    // scheme differently (file:/ vs file:///)
    def base(c: org.apache.spark.sql.Column) = element_at(split(c, "/"), -1)
    val m = DataSkipping.statsManifest(spark, dir, Seq("a", "b", "v"))
      .withColumn("fname", base(col("file"))).cache()
    val truth = spark.read.parquet(dir)
      .groupBy(base(input_file_name()).as("fname"))
      .agg(count(lit(1)).as("t_rows"),
        min("a").as("ta_min"), max("a").as("ta_max"),
        min("b").as("tb_min"), max("b").as("tb_max"),
        min("v").as("tv_min"), max("v").as("tv_max"))
    assert(m.count() == 8)
    val joined = m.join(truth, "fname").cache()
    val bad = joined.where(
      col("n_rows") =!= col("t_rows") ||
        col("a_min") =!= col("ta_min") || col("a_max") =!= col("ta_max") ||
        col("b_min") =!= col("tb_min") || col("b_max") =!= col("tb_max") ||
        col("v_min") =!= col("tv_min") || col("v_max") =!= col("tv_max") ||
        col("a_nulls") =!= 0L || col("b_nulls") =!= 0L || col("v_nulls") =!= 0L)
    assert(joined.count() == 8 && bad.count() == 0)
  }

  test("X9ds pruned read equals full scan on every probe box, and skips files") {
    val dir = zTable(20000, 16)
    val m = DataSkipping.statsManifest(spark, dir, Seq("a", "b")).cache()
    val full = spark.read.parquet(dir)
    var skippedSomewhere = false
    val boxes = Seq((0L, 999L, 0L, 999L), (5000L, 7000L, 5000L, 7000L),
      (19000L, 19999L, 0L, 19999L), (0L, 19999L, 100L, 120L))
    boxes.foreach { case (alo, ahi, blo, bhi) =>
      val cand = DataSkipping.candidateFiles(m,
        Seq(DataSkipping.longRange("a", alo, ahi), DataSkipping.longRange("b", blo, bhi)))
      val nCand = cand.count()
      if (nCand < 16) skippedSomewhere = true
      val want = full.where(col("a").between(alo, ahi) && col("b").between(blo, bhi))
      val got = DataSkipping.prunedRead(spark, dir, cand)
        .where(col("a").between(alo, ahi) && col("b").between(blo, bhi))
      val (wn, ws) = want.agg(count(lit(1)), coalesce(sum("a"), lit(0L)))
        .as[(Long, Long)].head()
      val (gn, gs) = got.agg(count(lit(1)), coalesce(sum("a"), lit(0L)))
        .as[(Long, Long)].head()
      assert(wn == gn && ws == gs, s"box ($alo,$ahi)x($blo,$bhi): $wn/$ws vs $gn/$gs from $nCand files")
    }
    assert(skippedSomewhere, "no probe box skipped any file on a z-ordered 16-file table")
  }

  test("X9ds metadata box count == recount on every box; whole-domain box opens ZERO files") {
    val dir = zTable(20000, 16)
    val m = DataSkipping.statsManifest(spark, dir, Seq("a", "b")).cache()
    val full = spark.read.parquet(dir)
    val boxes = Seq((0L, 19999L, 0L, 19999L), // whole domain
      (2000L, 18000L, 2000L, 18000L), (0L, 999L, 0L, 999L))
    boxes.zipWithIndex.foreach { case ((alo, ahi, blo, bhi), i) =>
      val ranges = Seq(DataSkipping.longRange("a", alo, ahi),
        DataSkipping.longRange("b", blo, bhi))
      val rowFilter = col("a").between(alo, ahi) && col("b").between(blo, bhi)
      val r = DataSkipping.metadataBoxCount(spark, dir, m, ranges, rowFilter).head()
      val want = full.where(rowFilter).count()
      assert(r.getAs[Long]("n_rows") == want,
        s"box $i: ${r.getAs[Long]("n_rows")} != $want")
      assert(r.getAs[Long]("n_files_total") == 16L)
      if (i == 0) { // whole domain: every file provably interior
        assert(r.getAs[Long]("n_files_scanned") == 0L &&
          r.getAs[Long]("n_rows_from_metadata") == 20000L)
      }
    }
  }

  test("X9ds a null-bearing column blocks the interior proof but not the count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skip-meta-null").toString
    Seq[(Long, Option[Long])]((1L, Some(5L)), (2L, Some(6L)), (3L, None))
      .toDF("a", "g").coalesce(1).write.mode("overwrite").parquet(dir)
    val m = DataSkipping.statsManifest(spark, dir, Seq("g"))
    val ranges = Seq(DataSkipping.longRange("g", 0L, 100L))
    val r = DataSkipping.metadataBoxCount(spark, dir, m, ranges,
      col("g").between(0L, 100L)).head()
    // min/max inside the box but a null row exists: the file must be
    // scanned (metadata would overcount the null row)
    assert(r.getAs[Long]("n_rows") == 2L &&
      r.getAs[Long]("n_rows_from_metadata") == 0L &&
      r.getAs[Long]("n_files_scanned") == 1L)
  }

  test("X9bl bloom index finds every key, prunes most files; min/max is blind on scattered ids") {
    // layout clustered on (b, c) = id-locality dims; 'a' is a
    // pseudo-random permutation — the hash-id shape range stats cannot
    // prune
    val dir2 = java.nio.file.Files.createTempDirectory("graft-bloomidx-spec").toString
    val df = spark.range(20000).select(
      ((col("id") * 2654435761L) % 2000003L).as("a"),
      col("id").as("b"), (col("id") % 97L).as("c"))
    graft.ops.Layout.zorderWrite(df, "b", "c", dir2, numFiles = 16)
    val idx = DataSkipping.bloomIndex(spark, dir2, "a", 2000L, fpp = 0.01).cache()
    assert(idx.count() == 16)
    // min/max on the scattered id: nearly every file is a candidate
    val m = DataSkipping.statsManifest(spark, dir2, Seq("a"))
    val keys = df.where(col("b").isin(17L, 9999L, 19999L))
      .select("a").as[Long].collect().toSeq
    assert(keys.size == 3)
    keys.foreach { k =>
      val rangeCand = DataSkipping.candidateFiles(m,
        Seq(DataSkipping.longRange("a", k, k))).count()
      assert(rangeCand >= 14, s"id $k: min/max unexpectedly pruned to $rangeCand")
      val cand = DataSkipping.candidateFilesByKey(idx, lit(k))
      val nCand = cand.count()
      assert(nCand >= 1 && nCand <= 3, s"id $k: bloom candidates $nCand")
      val rows = DataSkipping.prunedRead(spark, dir2, cand)
        .where(col("a") === k).collect()
      assert(rows.length == 1 && rows.head.getAs[Long]("a") == k)
    }
    // absent key: usually zero candidates, never a missed row
    val ghost = DataSkipping.candidateFilesByKey(idx, lit(123456789L)).count()
    assert(ghost <= 2, s"absent key matched $ghost files")
  }

  test("X9ds empty candidate set short-circuits to an empty typed frame") {
    val dir = zTable(1000, 4)
    val m = DataSkipping.statsManifest(spark, dir, Seq("a"))
    val cand = DataSkipping.candidateFiles(m, Seq(DataSkipping.longRange("a", -10L, -1L)))
    assert(cand.count() == 0)
    val out = DataSkipping.prunedRead(spark, dir, cand)
    assert(out.count() == 0 && out.columns.toSeq == Seq("a", "b", "v"))
  }

  test("X9ds unknown stats keep a file candidate; all-null columns skip it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skip-null").toString
    // file with a present column and an all-null column
    Seq((1L, Option.empty[Long]), (2L, None), (3L, None)).toDF("a", "g")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val m = DataSkipping.statsManifest(spark, dir, Seq("a", "g")).cache()
    val row = m.head()
    assert(row.getAs[Long]("g_nulls") == 3L && row.isNullAt(m.columns.indexOf("g_min")))
    // range on the all-null column prunes the file (NULL matches no range)
    assert(DataSkipping.candidateFiles(m, Seq(DataSkipping.longRange("g", 0L, 100L))).count() == 0)
    // range on the populated column keeps it
    assert(DataSkipping.candidateFiles(m, Seq(DataSkipping.longRange("a", 2L, 2L))).count() == 1)
    // stats wiped (simulating a writer without stats) -> conservatively kept
    val wiped = m.withColumn("a_min", lit(null).cast("long"))
      .withColumn("a_max", lit(null).cast("long"))
      .withColumn("a_nulls", lit(null).cast("long"))
    assert(DataSkipping.candidateFiles(wiped, Seq(DataSkipping.longRange("a", -5L, -1L))).count() == 1)
  }

  test("X9ss string manifest agrees with a full-scan recount per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skip-str").toString
    val df = spark.range(4000).select(
      col("id").as("a"),
      concat(lit("2024-01-"), lpad((col("id") % 28 + 1).cast("string"), 2, "0"))
        .as("day"))
    df.repartitionByRange(8, col("day"), col("a"))
      .sortWithinPartitions("day", "a")
      .write.mode("overwrite").parquet(dir)
    def base(c: org.apache.spark.sql.Column) = element_at(split(c, "/"), -1)
    val m = DataSkipping.statsManifest(spark, dir, Seq("day"))
      .withColumn("fname", base(col("file"))).cache()
    val truth = spark.read.parquet(dir)
      .groupBy(base(input_file_name()).as("fname"))
      .agg(min("day").as("t_min"), max("day").as("t_max"))
    val joined = m.join(truth, "fname")
    assert(joined.count() == m.count() && m.count() > 1)
    assert(joined.where(col("day_min") =!= col("t_min") ||
      col("day_max") =!= col("t_max") || col("day_nulls") =!= 0L).count() == 0)
    // a one-day probe prunes files and matches the full scan
    val cand = DataSkipping.candidateFiles(m,
      Seq(DataSkipping.stringRange("day", "2024-01-05", "2024-01-05")))
    assert(cand.count() > 0 && cand.count() < m.count())
    val got = DataSkipping.prunedRead(spark, dir, cand)
      .where(col("day") === "2024-01-05").count()
    val want = spark.read.parquet(dir).where(col("day") === "2024-01-05").count()
    assert(got == want && want > 0)
  }

  test("X9in OR-of-ranges candidates = union of per-range candidates; chaining gives AND-of-ORs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skip-in").toString
    val df = spark.range(4000).select(
      col("id").as("a"),
      concat(lit("2024-01-"), lpad((col("id") % 28 + 1).cast("string"), 2, "0"))
        .as("day"))
    df.repartitionByRange(8, col("day"), col("a"))
      .sortWithinPartitions("day", "a")
      .write.mode("overwrite").parquet(dir)
    val m = DataSkipping.statsManifest(spark, dir, Seq("day", "a")).cache()
    val days = Seq("2024-01-03", "2024-01-25")
    val ranges = days.map(d => DataSkipping.stringRange("day", d, d))
    val any = DataSkipping.candidateFilesAny(m, ranges)
    val union = ranges.map(r => DataSkipping.candidateFiles(m, Seq(r))
      .select("file")).reduce(_ unionByName _).distinct()
    assert(any.select("file").collect().map(_.getString(0)).sorted.toSeq ==
      union.collect().map(_.getString(0)).sorted.toSeq)
    assert(any.count() > 0 && any.count() < m.count())
    val got = DataSkipping.prunedRead(spark, dir, any)
      .where(col("day").isin(days: _*)).count()
    assert(got == spark.read.parquet(dir).where(col("day").isin(days: _*)).count()
      && got > 0)
    // AND-of-ORs by chaining: (day IN days) AND (a in a range)
    val both = DataSkipping.candidateFiles(
      DataSkipping.candidateFilesAny(m, ranges),
      Seq(DataSkipping.longRange("a", 0L, 999L)))
    assert(both.count() <= any.count())
    val gotBoth = DataSkipping.prunedRead(spark, dir, both)
      .where(col("day").isin(days: _*) && col("a").between(0L, 999L)).count()
    assert(gotBoth == spark.read.parquet(dir)
      .where(col("day").isin(days: _*) && col("a").between(0L, 999L)).count())
  }

  test("X9mc derived post-compaction manifest = fresh harvest; unknown inputs poison their bin only") {
    import graft.ops.Compaction
    val dir = java.nio.file.Files.createTempDirectory("graft-mc").toString
    spark.range(4000).select(col("id").as("a"),
        when(col("id") % 5 =!= 0, col("id") * 2).as("b")) // b sparsely null
      .repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(dir)
    val m0 = DataSkipping.statsManifest(spark, dir, Seq("a", "b")).cache()
    val sizes = Compaction.fileSizes(spark, dir)
    val total = sizes.agg(sum(col("bytes"))).head().getLong(0)
    val plan = Compaction.compactionPlan(sizes, math.max(1L, total / 3)).cache()
    val out = java.nio.file.Files.createTempDirectory("graft-mc-out").toString + "/t"
    Compaction.compact(spark, dir, plan, out)
    val binFiles = DataSkipping.compactedFiles(spark, out).cache()
    val derived = DataSkipping.manifestAfterCompaction(m0, plan, binFiles)
    val harvested = DataSkipping.statsManifestFiles(spark,
      binFiles.select("file").collect().map(_.getString(0)).toIndexedSeq,
      spark.read.parquet(dir).schema, Seq("a", "b"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().sortBy(_.getAs[String]("file")).toSeq
    assert(rows(derived) == rows(harvested) && derived.count() < 8)
    // soundness: wiping ONE source file's stats for `a` must make exactly
    // the bins containing it unknown for `a` — and leave `b` untouched
    val victim = m0.select("file").head().getString(0)
    val wiped = m0.withColumn("a_min",
        when(col("file") === victim, lit(null)).otherwise(col("a_min")))
      .withColumn("a_max",
        when(col("file") === victim, lit(null)).otherwise(col("a_max")))
      .withColumn("a_nulls",
        when(col("file") === victim, lit(null)).otherwise(col("a_nulls")))
    val derived2 = DataSkipping.manifestAfterCompaction(wiped, plan, binFiles).cache()
    val victimBins = plan.where(col("file") === victim)
      .select("bin").collect().map(_.getLong(0)).toSet
    val binOf = binFiles.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    derived2.collect().foreach { r =>
      val poisoned = victimBins.contains(binOf(r.getAs[String]("file")))
      assert(r.isNullAt(r.fieldIndex("a_min")) == poisoned,
        s"bin of ${r.getAs[String]("file")}: a_min unknown=${r.isNullAt(r.fieldIndex("a_min"))}, want $poisoned")
      assert(!r.isNullAt(r.fieldIndex("b_nulls")), "b stats must be untouched")
    }
  }

  test("X9ss truncated string stats stay sound past the truncation length") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skip-trunc").toString
    // keys share a long common prefix and differ only BEYOND the stats
    // truncation length: truncated min stays a prefix lower bound,
    // truncated max is byte-incremented to stay an upper bound
    val df = spark.range(1000).select(
      concat(lit("tenant-alpha-prefix-"), lpad(col("id").cast("string"), 6, "0"))
        .as("k"),
      col("id").as("v"))
    df.repartitionByRange(4, col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite")
      .option("parquet.statistics.truncate.length", "8")
      .parquet(dir)
    val m = DataSkipping.statsManifest(spark, dir, Seq("k")).cache()
    // prove the stats really ARE truncated (the case is vacuous otherwise):
    // min = 8-byte prefix, max = byte-incremented 8-byte bound
    val r0 = m.head()
    assert(r0.getAs[String]("k_min").length == 8 &&
      r0.getAs[String]("k_max").length <= 8 &&
      r0.getAs[String]("k_max") > r0.getAs[String]("k_min"))
    val full = spark.read.parquet(dir)
    // with an 8-byte truncation every file's stats collapse to the shared
    // prefix bounds — no pruning possible, but NEVER a lost row
    Seq(("tenant-alpha-prefix-000100", "tenant-alpha-prefix-000199"),
        ("tenant-alpha-prefix-000900", "tenant-alpha-prefix-999999"),
        ("a", "z")).foreach { case (lo, hi) =>
      val cand = DataSkipping.candidateFiles(m, Seq(DataSkipping.stringRange("k", lo, hi)))
      val got = DataSkipping.prunedRead(spark, dir, cand)
        .where(col("k").between(lo, hi)).count()
      val want = full.where(col("k").between(lo, hi)).count()
      assert(got == want, s"probe [$lo, $hi]: pruned $got != full $want")
    }
    // and a probe DISJOINT from the prefix region still prunes everything
    val off = DataSkipping.candidateFiles(m,
      Seq(DataSkipping.stringRange("k", "zz", "zzz")))
    assert(off.count() == 0)
  }

  test("X9nl null-modality candidates are exact per file; unknown counts stay candidates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skip-null").toString
    // 4 files: ids 0-999 per file; payload null except in file regions
    val df = spark.range(4000).select(
      col("id").as("a"),
      when(col("id") < 1000 || (col("id") >= 2000 && col("id") < 2500),
        concat(lit("p"), col("id"))).as("payload"))
    df.repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(dir)
    val m = DataSkipping.statsManifest(spark, dir, Seq("payload")).cache()
    assert(m.count() == 4)
    // truth: which files actually hold non-nulls / nulls (range-partition
    // boundaries are sampled, so derive, don't hardcode)
    def base(c: org.apache.spark.sql.Column) = element_at(split(c, "/"), -1)
    val truth = spark.read.parquet(dir)
      .groupBy(base(input_file_name()).as("fname"))
      .agg(sum(col("payload").isNotNull.cast("long")).as("nn"),
        sum(col("payload").isNull.cast("long")).as("nl")).cache()
    val filesWithNonNull = truth.where(col("nn") > 0).count()
    val filesWithNull = truth.where(col("nl") > 0).count()
    assert(filesWithNonNull < 4, "fixture must leave at least one all-null file")
    // IS NOT NULL: keeps exactly the files holding any non-null
    val nn = DataSkipping.nullCandidates(m, "payload", wantNull = false)
    assert(nn.count() == filesWithNonNull)
    val got = DataSkipping.prunedRead(spark, dir, nn)
      .where(col("payload").isNotNull).count()
    assert(got == 1500 &&
      got == spark.read.parquet(dir).where(col("payload").isNotNull).count())
    // IS NULL: keeps exactly the files holding any null
    val nl = DataSkipping.nullCandidates(m, "payload", wantNull = true)
    assert(nl.count() == filesWithNull)
    assert(DataSkipping.prunedRead(spark, dir, nl)
      .where(col("payload").isNull).count() == 2500)
    // wiped counts (unknown) keep every file, both modalities
    val wiped = m.withColumn("payload_nulls", lit(null).cast("long"))
    assert(DataSkipping.nullCandidates(wiped, "payload", wantNull = true).count() == 4)
    assert(DataSkipping.nullCandidates(wiped, "payload", wantNull = false).count() == 4)
  }

  test("X9ts timestamp/date manifest agrees with a recount; time boxes prune and match") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skip-ts").toString
    val df = spark.range(4000).select(
      col("id").as("a"),
      timestamp_millis(lit(1704067200000L) + col("id") * 60000L).as("ts"), // minute grid from 2024-01-01
      to_date(timestamp_millis(lit(1704067200000L) + col("id") * 60000L)).as("d"))
    withSQLConf("spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS") {
      df.repartitionByRange(8, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(dir)
    }
    def base(c: org.apache.spark.sql.Column) = element_at(split(c, "/"), -1)
    val m = DataSkipping.statsManifest(spark, dir, Seq("ts", "d"))
      .withColumn("fname", base(col("file"))).cache()
    val truth = spark.read.parquet(dir)
      .groupBy(base(input_file_name()).as("fname"))
      .agg(min("ts").as("t_min"), max("ts").as("t_max"),
        min("d").as("td_min"), max("d").as("td_max"))
    val joined = m.join(truth, "fname")
    assert(joined.count() == m.count() && m.count() > 1)
    assert(joined.where(col("ts_min") =!= col("t_min") ||
      col("ts_max") =!= col("t_max") || col("ts_nulls") =!= 0L ||
      col("d_min") =!= col("td_min") || col("d_max") =!= col("td_max")).count() == 0)
    // one-hour time box: prunes files, answers exactly the full scan
    val lo = java.time.Instant.ofEpochMilli(1704067200000L + 1000L * 60000L)
    val hi = java.time.Instant.ofEpochMilli(1704067200000L + 1059L * 60000L)
    val cand = DataSkipping.candidateFiles(m,
      Seq(DataSkipping.timestampRange("ts", lo, hi)))
    assert(cand.count() > 0 && cand.count() < m.count())
    val box = col("ts").between(lit(lo), lit(hi))
    val got = DataSkipping.prunedRead(spark, dir, cand).where(box).count()
    val want = spark.read.parquet(dir).where(box).count()
    assert(got == want && want == 60)
    // one-day date box on the DATE column
    val d0 = java.time.LocalDate.of(2024, 1, 2)
    val dcand = DataSkipping.candidateFiles(m,
      Seq(DataSkipping.dateRange("d", d0, d0)))
    assert(dcand.count() > 0 && dcand.count() < m.count())
    val dGot = DataSkipping.prunedRead(spark, dir, dcand)
      .where(col("d") === lit(d0)).count()
    assert(dGot == spark.read.parquet(dir).where(col("d") === lit(d0)).count()
      && dGot == 1440)
  }

  test("X9dc decimal manifest is exact for INT64 and FLBA encodings, incl. negatives; scale mismatch degrades") {
    import org.apache.spark.sql.types.DecimalType
    val dir = java.nio.file.Files.createTempDirectory("graft-skip-dec").toString
    // d18 fits INT64 (precision 12); d25 forces FIXED_LEN_BYTE_ARRAY
    // (precision 25 > 18); values span NEGATIVE to positive so the
    // signed big-endian decode is exercised where an unsigned-lex
    // misread would invert the order
    val df = spark.range(2000).select(
      col("id").as("a"),
      ((col("id") - 1000L) * 7L).cast(DecimalType(12, 2)).as("d18"),
      ((col("id") - 1000L) * 1234567L).cast(DecimalType(25, 3)).as("d25"))
    df.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(dir)
    def base(c: org.apache.spark.sql.Column) = element_at(split(c, "/"), -1)
    val m = DataSkipping.statsManifest(spark, dir, Seq("d18", "d25"))
      .withColumn("fname", base(col("file"))).cache()
    val truth = spark.read.parquet(dir)
      .groupBy(base(input_file_name()).as("fname"))
      .agg(min("d18").as("t18_min"), max("d18").as("t18_max"),
        min("d25").as("t25_min"), max("d25").as("t25_max"))
    val joined = m.join(truth, "fname")
    assert(joined.count() == m.count() && m.count() > 1)
    assert(joined.where(col("d18_min") =!= col("t18_min") ||
      col("d18_max") =!= col("t18_max") || col("d18_nulls") =!= 0L ||
      col("d25_min") =!= col("t25_min") || col("d25_max") =!= col("t25_max") ||
      col("d25_nulls") =!= 0L).count() == 0,
      "footer decimal stats must equal a full recount, both encodings")
    // a NEGATIVE-range box on the FLBA column prunes and matches exactly
    val lo = new java.math.BigDecimal("-900000000.000")
    val hi = new java.math.BigDecimal("-500000000.000")
    val cand = DataSkipping.candidateFiles(m,
      Seq(DataSkipping.decimalRange("d25", lo, hi)))
    assert(cand.count() > 0 && cand.count() < m.count())
    val box = col("d25").between(lit(lo), lit(hi))
    val got = DataSkipping.prunedRead(spark, dir, cand).where(box).count()
    assert(got == spark.read.parquet(dir).where(box).count() && got > 0)
    // precision/scale mismatch: declaring a DIFFERENT scale than the
    // files carry must degrade to unknown (null stats), never rescale
    val files = DataSkipping.listDataFiles(spark, dir)
    val wrong = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("d18", DecimalType(12, 3))))
    val m2 = DataSkipping.statsManifestFiles(spark, files, wrong, Seq("d18"))
    assert(m2.where(col("d18_min").isNotNull || col("d18_max").isNotNull ||
      col("d18_nulls").isNotNull).count() == 0,
      "scale mismatch must degrade every file to unknown")
  }

  test("X9ts NTZ timestamps manifest at their own type; INT96 degrades to unknown, never wrong") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skip-ntz").toString
    val df = spark.range(2000).select(
      col("id").as("a"),
      timestamp_millis(lit(1704067200000L) + col("id") * 60000L)
        .cast("timestamp_ntz").as("tn"))
    df.repartitionByRange(4, col("tn")).sortWithinPartitions("tn")
      .write.mode("overwrite").parquet(dir)
    val m = DataSkipping.statsManifest(spark, dir, Seq("tn")).cache()
    assert(m.schema("tn_min").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val lo = java.time.LocalDateTime.of(2024, 1, 1, 5, 0)
    val hi = java.time.LocalDateTime.of(2024, 1, 1, 5, 59)
    val cand = DataSkipping.candidateFiles(m,
      Seq(DataSkipping.timestampNtzRange("tn", lo, hi)))
    assert(cand.count() > 0 && cand.count() < m.count())
    val box = col("tn").between(lit(lo), lit(hi))
    val got = DataSkipping.prunedRead(spark, dir, cand).where(box).count()
    assert(got == spark.read.parquet(dir).where(box).count() && got == 60)

    // INT96 writes carry no usable ordering — the manifest must report
    // UNKNOWN stats (every file a candidate), not a wrong bound
    val dir96 = java.nio.file.Files.createTempDirectory("graft-skip-96").toString
    withSQLConf("spark.sql.parquet.outputTimestampType" -> "INT96") {
      spark.range(100).select(
          timestamp_millis(lit(1704067200000L) + col("id") * 1000L).as("ts"))
        .repartition(2).write.mode("overwrite").parquet(dir96)
    }
    val m96 = DataSkipping.statsManifest(spark, dir96, Seq("ts"))
    assert(m96.where(col("ts_min").isNotNull || col("ts_max").isNotNull).count() == 0)
    val all = DataSkipping.candidateFiles(m96,
      Seq(DataSkipping.timestampRange("ts",
        java.time.Instant.ofEpochMilli(0L),
        java.time.Instant.ofEpochMilli(1L))))
    assert(all.count() == m96.count(), "unknown stats must keep every file")
  }

  test("retype-CONFLICTED table: manifest builds (one-footer fallback), mismatched chunks degrade to unknown") {
    // two batches that CONFLICT on k's primitive type: Spark's
    // mergeSchema THROWS on long-vs-string, so inferredSchema must fall
    // back to one-footer inference and chunkStat's physical-type guards
    // must degrade the other batch's chunks to (null, null) instead of
    // ClassCastException-ing the manifest build
    val dir = java.nio.file.Files.createTempDirectory("graft-retype-spec").toString + "/tbl"
    spark.range(100).select(col("id").as("k"), col("id").as("x"))
      .coalesce(1).write.parquet(dir)
    spark.range(100).select(concat(lit("s"), col("id")).as("k"), col("id").as("x"))
      .coalesce(1).write.mode("append").parquet(dir)
    for (cols <- Seq(Seq("k"), Seq("k", "x"))) {
      val m = DataSkipping.statsManifest(spark, dir, cols).cache()
      assert(m.count() == 2, "both files manifest")
      // exactly one file's k-chunks match the inferred type; the other
      // degrades to unknown (NULL min/max) — never a wrong bound
      assert(m.where(col("k_min").isNull).count() == 1)
      assert(m.where(col("k_min").isNotNull).count() == 1)
      if (cols.contains("x"))
        assert(m.where(col("x_min").isNull).count() == 0,
          "the un-conflicted column stays exact on every file")
      m.unpersist()
    }
    val rg = DataSkipping.rowGroupManifest(spark, dir, Seq("k"))
    assert(rg.count() >= 2 && rg.where(col("k_min").isNull).count() >= 1)
  }

  test("X9rg row-group manifest folds exactly to the file manifest; grains agree") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rg-spec").toString + "/tbl"
    spark.range(4000).select(col("id").as("a"),
        (col("id") % 50).cast("double").as("v"))
      .repartition(2, col("id")).sortWithinPartitions("a")
      .write.option("parquet.block.size", "2048")
      .option("parquet.page.size", "512").parquet(dir)
    val rg = DataSkipping.rowGroupManifest(spark, dir, Seq("a", "v")).cache()
    val fm = DataSkipping.statsManifest(spark, dir, Seq("a", "v"))
    // multiple row groups per file, ordinals dense from 0
    val perFile = rg.groupBy("file").agg(count(lit(1)).as("n_rgs"),
      min("row_group").as("lo"), max("row_group").as("hi"))
    assert(perFile.where(col("n_rgs") < 2).count() == 0, "fixture must split files")
    assert(perFile.where(col("lo") =!= 0L ||
      col("hi") =!= col("n_rgs") - 1L).count() == 0)
    // file-grain rows must be EXACTLY the fold of the row-group rows
    val folded = rg.groupBy("file").agg(
      sum("n_rows").as("f_rows"),
      min("a_min").as("fa_min"), max("a_max").as("fa_max"), sum("a_nulls").as("fa_nulls"),
      min("v_min").as("fv_min"), max("v_max").as("fv_max"), sum("v_nulls").as("fv_nulls"))
    val joined = fm.join(folded, "file")
    assert(joined.count() == fm.count())
    assert(joined.where(
      col("n_rows") =!= col("f_rows") ||
        col("a_min") =!= col("fa_min") || col("a_max") =!= col("fa_max") ||
        col("a_nulls") =!= col("fa_nulls") ||
        col("v_min") =!= col("fv_min") || col("v_max") =!= col("fv_max") ||
        col("v_nulls") =!= col("fv_nulls")).count() == 0)
    rg.unpersist()
  }

  test("X9rg aligned box: metadataBoxCountRg counts from metadata where file grain must scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rg-meta").toString + "/tbl"
    // ONE file, unique sorted values -> adjacent row groups never share a
    // value, so a box ending exactly on a group's max has NO boundary group
    spark.range(3000).select(col("id").as("a"), col("id").cast("double").as("v"))
      .coalesce(1).sortWithinPartitions("a")
      .write.option("parquet.block.size", "2048")
      .option("parquet.page.size", "512").parquet(dir)
    val rg = DataSkipping.rowGroupManifest(spark, dir, Seq("a")).cache()
    assert(rg.count() >= 3, "need >= 3 row groups")
    // box = [global min, second row group's max]: groups 0-1 interior,
    // the rest provably dead, NO boundary group
    val bounds = rg.orderBy("row_group").limit(2)
      .agg(min("a_min").as("lo"), max("a_max").as("hi")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val ranges = Seq(DataSkipping.longRange("a", lo, hi))
    val rowFilter = col("a").between(lo, hi)
    val expected = spark.read.parquet(dir).where(rowFilter).count()
    val metaRg = DataSkipping.metadataBoxCountRg(spark, dir, rg, ranges, rowFilter).head()
    assert(metaRg.getLong(0) == expected, "rg box count must match recount")
    assert(metaRg.getLong(1) == expected && metaRg.getLong(2) == 0L,
      s"aligned box must count purely from metadata, got $metaRg")
    // file grain on the same box MUST scan (the file range exceeds the box)
    val fm = DataSkipping.statsManifest(spark, dir, Seq("a"))
    val metaFile = DataSkipping.metadataBoxCount(spark, dir, fm, ranges, rowFilter).head()
    assert(metaFile.getLong(0) == expected)
    assert(metaFile.getLong(2) == 1L, "file grain must scan the boundary file")
    // survivors accounting: candidate rows strictly under the file total
    val surv = DataSkipping.rowGroupSurvivors(rg, ranges).head()
    assert(surv.getLong(4) < surv.getLong(3), "candidate rows must shrink")
    rg.unpersist()
  }

  test("X9rg unaligned box never double counts; gap box opens only straddlers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rg-gap").toString + "/tbl"
    // band-gap file: low band [0,1000) and far high band [100000,101000)
    val df = spark.range(2000).select(
      when(col("id") < 1000, col("id")).otherwise(col("id") + 99000L).as("a"),
      col("id").cast("double").as("v"))
    df.coalesce(1).sortWithinPartitions("a")
      .write.option("parquet.block.size", "2048")
      .option("parquet.page.size", "512").parquet(dir)
    val rg = DataSkipping.rowGroupManifest(spark, dir, Seq("a")).cache()
    assert(rg.count() >= 3)
    // box strictly inside the gap: file-grain candidate (range spans the
    // gap), row-group candidates = at most the one straddling group
    val gapRanges = Seq(DataSkipping.longRange("a", 5000L, 50000L))
    val surv = DataSkipping.rowGroupSurvivors(rg, gapRanges).head()
    assert(surv.getLong(2) <= 1L, s"gap box: at most the straddler survives, got $surv")
    val fm = DataSkipping.statsManifest(spark, dir, Seq("a"))
    assert(DataSkipping.candidateFiles(fm, gapRanges).count() == 1L,
      "file grain keeps the file (its range spans the gap)")
    val meta = DataSkipping.metadataBoxCountRg(spark, dir, rg, gapRanges,
      col("a").between(5000L, 50000L)).head()
    assert(meta.getLong(0) == 0L, "gap holds no rows")
    // unaligned box over half the low band: scan path and metadata path
    // partition the files exactly (no double counting)
    val ranges = Seq(DataSkipping.longRange("a", 0L, 499L))
    val meta2 = DataSkipping.metadataBoxCountRg(spark, dir, rg, ranges,
      col("a").between(0L, 499L)).head()
    assert(meta2.getLong(0) == 500L, s"expected 500 rows, got $meta2")
    rg.unpersist()
  }
}
