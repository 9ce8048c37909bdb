package graft

import graft.ops.{OpCaches, Sampling}
import org.apache.spark.sql.functions._

/** Sampling/curation operator semantics: split determinism and stability,
  * stratified exactness and nesting, quota budget-respect and maximality.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 400L).map { i =>
    val src = s"s${i % 4}"
    // text length varies by id so token counts differ per doc
    (i, src, ("tok " * (5 + (i % 37).toInt)).trim)
  }.toDF("doc_id", "source", "text")

  test("assignSplit is a total, deterministic partition of the input") {
    val out = Sampling.assignSplit(docs, "doc_id").select("doc_id", "split")
    assert(out.count() == 400)
    val again = Sampling.assignSplit(docs, "doc_id").select("doc_id", "split")
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    val bySplit = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // 90/5/5 within loose binomial tolerance on 400 rows
    assert(bySplit("train") > 320 && bySplit("val") < 50 && bySplit("test") < 50)
  }

  test("assignSplit is stable under corpus growth (no doc changes split)") {
    val small = Sampling.assignSplit(docs.where($"doc_id" < 100), "doc_id")
      .select("doc_id", "split")
    val big = Sampling.assignSplit(docs, "doc_id")
      .select("doc_id", "split").where($"doc_id" < 100)
    assert(small.except(big).isEmpty && big.except(small).isEmpty)
  }

  test("assignSplit rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("stratifiedSample takes exactly ceil(fraction * n) per stratum, nested") {
    val quarter = Sampling.stratifiedSample(docs, "doc_id", Seq("source"), 0.25)
    val perStratum = quarter.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perStratum.values.toSet == Set(25L)) // 100 per stratum * 0.25
    val half = Sampling.stratifiedSample(docs, "doc_id", Seq("source"), 0.5)
    // nesting: the 25% sample is a subset of the 50% sample
    assert(quarter.select("doc_id").except(half.select("doc_id")).isEmpty)
  }

  test("sampleByHash matches the split-interval semantics") {
    val s = Sampling.sampleByHash(docs, "doc_id", 0.3).select("doc_id")
    val viaUnit = docs.where(Sampling.hashUnit($"doc_id") < 0.3).select("doc_id")
    assert(s.except(viaUnit).isEmpty && viaUnit.except(s).isEmpty)
    // deterministic: same rows every run
    assert(s.count() == Sampling.sampleByHash(docs, "doc_id", 0.3).count())
  }

  test("tokenQuota strict: admitted prefix respects budget and is maximal") {
    val budget = 300L
    val out = Sampling.tokenQuota(docs, "doc_id", $"text", Seq("source"), budget, strict = true)
    val maxCum = out.groupBy("source").agg(max("cum_tokens").as("m"))
      .as[(String, Long)].collect().toMap
    maxCum.values.foreach(m => assert(m <= budget))
    // maximality: for each source the NEXT doc in priority order would blow
    // the budget — recompute the unfiltered running sum and check the first
    // excluded row
    val all = Sampling.tokenQuota(docs, "doc_id", $"text", Seq("source"), Long.MaxValue, strict = true)
    val firstExcluded = all.where($"cum_tokens" > budget)
      .groupBy("source").agg(min("cum_tokens").as("c")).as[(String, Long)].collect().toMap
    firstExcluded.foreach { case (src, c) =>
      assert(c > budget, s"source $src admitted beyond budget")
    }
  }

  test("tokenQuota greedy admits docs strict skips, never over budget") {
    val budget = 300L
    val strict = Sampling.tokenQuota(docs, "doc_id", $"text", Seq("source"), budget, strict = true)
    val greedy = Sampling.tokenQuota(docs, "doc_id", $"text", Seq("source"), budget)
    // greedy is a superset of strict (same priority order, skips instead of stopping)
    assert(strict.select("source", "doc_id").except(greedy.select("source", "doc_id")).isEmpty)
    // greedy cum_tokens stays within budget per source
    val maxCum = greedy.groupBy("source").agg(max("cum_tokens").as("m")).as[(String, Long)].collect()
    maxCum.foreach { case (src, m) => assert(m <= budget, s"greedy $src over budget: $m") }
    // greedy total >= strict total (it fills remaining budget with later docs)
    val gTot = greedy.agg(sum("n_tokens")).head().getLong(0)
    val sTot = strict.agg(sum("n_tokens")).head().getLong(0)
    assert(gTot >= sTot)
  }

  test("greedy quota equals a reference fold on the driver") {
    val budget = 300L
    val greedy = Sampling.tokenQuota(docs, "doc_id", $"text", Seq("source"), budget)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    // reference: per source, walk docs in (hashUnit, id) order, admit if fits
    val rows = Sampling.tokenQuota(docs, "doc_id", $"text", Seq("source"), Long.MaxValue, strict = true)
      .select($"source", $"doc_id", $"n_tokens", Sampling.hashUnit($"doc_id").as("u"))
      .as[(String, Long, Long, Double)].collect()
    val expect = rows.toSeq.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      var tot = 0L
      ds.sortBy(d => (d._4, d._2)).flatMap { d =>
        if (tot + d._3 <= budget) { tot += d._3; Some((src, d._2)) } else None
      }
    }.toSet
    assert(greedy == expect)
    OpCaches.release()
  }

  test("mixtureSample: long groups thin to quota, short groups pass whole, selection is md5-exact") {
    // groups a=200, b=100, c=100 rows; weights (.25, .5, .25), target 50% of
    // 400 = 200 docs -> quotas (50, 100, 50) -> f = (.25, 1.0, .5)
    val mixed = (0L until 400L).map { i =>
      (i, if (i < 200) "a" else if (i < 300) "b" else "c")
    }.toDF("doc_id", "grp")
    val weights = Map("a" -> 0.25, "b" -> 0.5, "c" -> 0.25)
    val out = Sampling.mixtureSample(mixed, "doc_id", "grp", weights, targetFraction = 0.5)
    val by = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(by("b") == 100, s"f=1 group must pass whole: $by")
    // hash-thinned groups land near quota (binomial tolerance)
    assert(math.abs(by("a") - 50) <= 20 && math.abs(by("c") - 50) <= 20, by.toString)
    // selection is EXACTLY hashUnit < f per group — recompute independently
    val expect = mixed.select($"grp", $"doc_id", Sampling.hashUnit($"doc_id").as("u"))
      .as[(String, Long, Double)].collect()
      .filter { case (g, _, u) => u < math.min(1.0, weights(g) * 200.0 / (if (g == "a") 200 else 100)) }
      .map { case (g, id, _) => (g, id) }.toSet
    assert(out.select("grp", "doc_id").as[(String, Long)].collect().toSet == expect)
    // deterministic re-run
    assert(Sampling.mixtureSample(mixed, "doc_id", "grp", weights, 0.5)
      .select("doc_id").except(out.select("doc_id")).isEmpty)
  }

  test("mixtureSample: unweighted groups are dropped; weights must sum to 1") {
    val mixed = (0L until 100L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "grp")
    val out = Sampling.mixtureSample(mixed, "doc_id", "grp", Map("a" -> 1.0), targetFraction = 0.4)
    assert(out.select("grp").distinct().as[String].collect().toSeq == Seq("a"))
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(mixed, "doc_id", "grp", Map("a" -> 0.5, "b" -> 0.4), 0.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(mixed, "doc_id", "grp", Map("a" -> 1.0), 0.0)
    }
  }

  test("temperatureMixtureSample: sqrt-flattened shares, short-group saturation, md5-exact draw") {
    // groups a=320, b=75, c=5 rows; T=2 -> shares proportional to sqrt(n):
    // corpus shares (.80, .1875, .0125) flatten toward (0.64, 0.31, 0.08)
    val mixed = (0L until 400L).map { i =>
      (i, if (i < 320) "a" else if (i < 395) "b" else "c")
    }.toDF("doc_id", "grp")
    val out = Sampling.temperatureMixtureSample(mixed, "doc_id", "grp",
      temperature = 2.0, targetFraction = 0.5)
    val probs = out.select("grp", "sample_prob").distinct()
      .as[(String, Double)].collect().toMap
    // sqrt flattening sits strictly between corpus-proportional and uniform
    assert(probs("a") < 320.0 / 400 && probs("a") > 1.0 / 3, probs.toString)
    assert(probs("b") > 75.0 / 400 && probs("b") < 1.0 / 3, probs.toString)
    // shares from the independently recomputed formula (round6 sqrt / sum)
    val ns = Map("a" -> 320.0, "b" -> 75.0, "c" -> 5.0)
    val s6 = ns.view.mapValues(n => BigDecimal(math.sqrt(n))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    val den = s6.values.map(BigDecimal(_)).sum.toDouble
    ns.keys.foreach { g =>
      val q = BigDecimal(s6(g) / den).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(probs(g) == q, s"$g: ${probs(g)} vs $q")
    }
    // tiny group saturates (f = 1): every c row admitted
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp("c") == 5, byGrp.toString)
    // re-run reproduces the draw exactly
    assert(Sampling.temperatureMixtureSample(mixed, "doc_id", "grp", 2.0, 0.5)
      .select("doc_id").except(out.select("doc_id")).isEmpty)
    // T=1 (pow path) reproduces the corpus distribution as shares
    val t1 = Sampling.temperatureMixtureSample(mixed, "doc_id", "grp", 1.0, 0.5)
      .select("grp", "sample_prob").distinct().as[(String, Double)].collect().toMap
    assert(t1("a") == 0.8 && t1("c") == 0.0125, t1.toString)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixtureSample(mixed, "doc_id", "grp", 0.5, 0.5)
    }
  }

  test("shuffleShards: total balanced partition, contiguous positions, seed-keyed permutation") {
    val out = Sampling.shuffleShards(docs, "doc_id", nShards = 8, seed = "t")
      .select($"doc_id", $"shard", $"pos").as[(Long, Int, Long)].collect()
    assert(out.length == 400 && out.map(_._1).distinct.length == 400)
    // every shard populated, sizes within loose multinomial spread of 400/8
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0 until 8).toSet, s"shards seen: ${sizes.keySet}")
    assert(sizes.values.forall(n => n > 20 && n < 80), s"shard sizes skewed: $sizes")
    // positions are exactly 1..size within each shard (a trainer can read
    // any shard independently and see a gapless local order)
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"shard $s positions gapped")
    }
    // deterministic: re-run identical; reseeded: same sizes discipline but
    // a genuinely different permutation
    val again = Sampling.shuffleShards(docs, "doc_id", nShards = 8, seed = "t")
      .select($"doc_id", $"shard", $"pos").as[(Long, Int, Long)].collect()
    assert(out.toSet == again.toSet)
    val reseeded = Sampling.shuffleShards(docs, "doc_id", nShards = 8, seed = "u")
      .select($"doc_id", $"shard", $"pos").as[(Long, Int, Long)].collect()
    assert(reseeded.toSet != out.toSet, "a new seed must reshuffle")
    // stability: a doc's (shard, pos-order relative to peers) is a pure
    // function of (seed, id) — growing the corpus never moves a doc to
    // another shard (positions may shift as new docs interleave)
    val small = Sampling.shuffleShards(docs.where($"doc_id" < 100), "doc_id", 8, "t")
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    val bigShards = out.map(r => r._1 -> r._2).toMap
    assert(small.forall { case (id, s) => bigShards(id) == s })
    intercept[IllegalArgumentException] {
      Sampling.shuffleShards(docs, "doc_id", nShards = 0)
    }
  }

  test("ppsSample: weighted draw is exact-integer, size-tracking, saturating, deterministic") {
    import graft.ops.Dedup
    val w = length($"text").cast("long") // weight proxy: doc length
    val totalW = docs.agg(sum(length($"text"))).as[Long].head()
    // deterministic: two runs identical
    val once = Sampling.ppsSample(docs, "doc_id", w, expectedDocs = 100L)
      .select("doc_id").as[Long].collect().toSet
    val again = Sampling.ppsSample(docs, "doc_id", w, expectedDocs = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(once == again)
    // the draw equals a driver-side replay of the exact integer rule
    val rows = docs.select($"doc_id", length($"text").cast("long"),
      Dedup.md5Hash32($"doc_id".cast("string"), 1)).as[(Long, Long, Long)].collect()
    val expect = rows.collect { case (id, wi, h)
      if BigInt(h) * BigInt(totalW) < BigInt(wi) * BigInt(100L) * BigInt(4294967296L) => id }.toSet
    assert(once == expect)
    // E[sample size] = 100 while no weight saturates (max w << W/100);
    // binomial spread on 400 docs keeps 3x bounds extremely safe
    assert(rows.map(_._2).max * 100L < totalW, "fixture must not saturate")
    assert(once.size > 33 && once.size < 300, s"sample size ${once.size} vs expected 100")
    // the PPS property: the admitted set is token-denser than the corpus
    val meanAll = totalW.toDouble / rows.length
    val meanAdm = rows.filter(r => once(r._1)).map(_._2).sum.toDouble / once.size
    assert(meanAdm > meanAll, "weighted draw must favor long docs")
    // saturation: n >= corpus size with flat-ish weights admits everything
    assert(Sampling.ppsSample(docs, "doc_id", w, 400L * 40).count() == docs.count())
    assert(Sampling.ppsSample(docs, "doc_id", w, 0L).count() == 0)
  }

  test("writeShards: one file per shard directory, rows stored in permutation order, re-run identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Sampling.writeShards(docs, "doc_id", dir, nShards = 4, seed = "t")
    val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.map(_.getName).toSet == (0 until 4).map(k => s"shard=$k").toSet)
    shardDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName}: expected exactly one shard file")
    }
    // in-file physical order IS the permutation order (trainer reads the
    // shard sequentially, no sort needed on its side)
    val assign = Sampling.shuffleShards(docs, "doc_id", 4, "t")
      .select($"doc_id", $"shard", $"pos").as[(Long, Int, Long)].collect()
      .groupBy(_._2).view.mapValues(_.sortBy(_._3).map(_._1).toSeq).toMap
    (0 until 4).foreach { k =>
      val stored = spark.read.parquet(s"$dir/shard=$k").select("doc_id")
        .as[Long].collect().toSeq // parquet row order, no orderBy
      assert(stored == assign(k), s"shard $k file order != permutation order")
    }
    // reproducibility: a second export produces identical shard contents
    val dir2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    Sampling.writeShards(docs, "doc_id", dir2, nShards = 4, seed = "t")
    (0 until 4).foreach { k =>
      val a = spark.read.parquet(s"$dir/shard=$k").select("doc_id").as[Long].collect().toSeq
      val b = spark.read.parquet(s"$dir2/shard=$k").select("doc_id").as[Long].collect().toSeq
      assert(a == b, s"shard $k not reproducible across exports")
    }
  }

  test("fixedKSample: exactly min(k, |group|) per group, deterministic, seed-independent") {
    val df = spark.range(1000).select(
      col("id"), (col("id") % 7).cast("string").as("g"))
      // one deliberately tiny group: 3 rows
      .unionByName(spark.range(1000, 1003).select(
        col("id"), lit("tiny").as("g")))
    val s1 = Sampling.fixedKSample(df, "id", Seq("g"), k = 20, seed = "a")
    val counts = s1.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("tiny") == 3 && (0 until 7).forall(i => counts(i.toString) == 20))
    // ranks are 1..n contiguous per group
    val ranks = s1.where(col("g") === "0").select("rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 20L))
    // deterministic replay; a different seed draws a different set
    val s1b = Sampling.fixedKSample(df, "id", Seq("g"), k = 20, seed = "a")
    assert(s1.collect().toSeq.sortBy(_.toString) == s1b.collect().toSeq.sortBy(_.toString))
    val s2 = Sampling.fixedKSample(df, "id", Seq("g"), k = 20, seed = "b")
    val ids1 = s1.select("id").as[Long].collect().toSet
    val ids2 = s2.select("id").as[Long].collect().toSet
    assert(ids1 != ids2 && (ids1 & ids2).nonEmpty)
    // sampled ids are a subset of the corpus
    assert(ids1.subsetOf((0L until 1003L).toSet))
  }
}
