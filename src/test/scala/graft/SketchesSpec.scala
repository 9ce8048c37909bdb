package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** The HLL sketch store's load-bearing property is MERGEABILITY: unioning
  * per-group sketches of any partition of the data must give the same
  * estimate as one sketch over the whole (register merge is per-register
  * max — order- and grouping-insensitive), and the estimate must honor
  * the sketch's error contract on a cardinality far above the register
  * count.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("X10hll union of per-group sketches == one-shot sketch; 5% contract at 100k distinct") {
    val n = 300000L
    // 100k distinct keys, each seen ~3 times, spread over 16 groups
    val df = spark.range(n).select(
      (col("id") % 16).as("g"),
      concat(lit("user_"), (col("id") % 100000).cast("string")).as("k"))
    val sketches = Sketches.hllGroupSketches(df, col("g"), col("k"))
    assert(sketches.count() == 16)
    val est = Sketches.hllUnionEstimate(sketches)
      .select(col("n_groups"), col("n_rows"), col("distinct_approx"))
      .as[(Long, Long, Long)].head()
    assert(est._1 == 16 && est._2 == n)
    assert(math.abs(est._3 - 100000L) <= 5000L,
      s"estimate ${est._3} outside 5% of 100000")
    // one-shot sketch over the ungrouped data: estimates must be EQUAL,
    // not merely close — the union reconstructs identical registers
    val oneShot = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("k"), lit(12))).as("d"))
      .as[Long].head()
    assert(est._3 == oneShot, s"union=${est._3} one-shot=$oneShot")
    // a DIFFERENT partitioning unions to the same estimate too
    val est2 = Sketches.hllUnionEstimate(
      Sketches.hllGroupSketches(
        spark.range(n).select((col("id") % 7).as("g"),
          concat(lit("user_"), (col("id") % 100000).cast("string")).as("k")),
        col("g"), col("k")))
      .select(col("distinct_approx")).as[Long].head()
    assert(est2 == oneShot, s"7-way union=$est2 one-shot=$oneShot")
  }

  test("X10hlo pair overlap by inclusion-exclusion within 5% of union; disjoint pairs near zero") {
    // A = 0..9999, B = 5000..14999 (|A∩B| = 5000, |A∪B| = 15000), C disjoint
    val df = spark.range(10000).select(lit("A").as("g"), concat(lit("u"), col("id")).as("k"))
      .unionByName(spark.range(5000, 15000).select(lit("B").as("g"), concat(lit("u"), col("id")).as("k")))
      .unionByName(spark.range(100000, 108000).select(lit("C").as("g"), concat(lit("u"), col("id")).as("k")))
    val pairs = Sketches.hllPairOverlaps(
      Sketches.hllGroupSketches(df, col("g"), col("k")))
      .select(col("group_a"), col("group_b"), col("est_intersect"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs.size == 3)
    assert(math.abs(pairs(("A", "B")) - 5000L) <= 750L,
      s"A-B overlap ${pairs(("A", "B"))} outside 5% of the 15000 union")
    assert(math.abs(pairs(("A", "C"))) <= 900L &&
      math.abs(pairs(("B", "C"))) <= 900L,
      s"disjoint overlaps not near zero: $pairs")
  }

  // Zipf-ish fixture: key j appears 2000/j times for j in 1..200 plus a
  // long tail of singletons — the skew regime CMS is for
  private def cmsFixture = {
    val heavy = spark.range(1, 201).select(explode(
      transform(sequence(lit(1), (lit(2000) / col("id")).cast("int")),
        _ => concat(lit("hh_"), col("id")))).as("k"),
      (col("id") % 8).as("g"))
    val tail = spark.range(50000).select(
      concat(lit("tail_"), col("id")).as("k"), (col("id") % 8).as("g"))
    heavy.unionByName(tail)
  }

  test("X6cms union of per-group CMS sketches is byte-identical to one-shot; estimates one-sided within eps*N") {
    val df = cmsFixture
    val sketches = Sketches.cmsGroupSketches(df, col("g"), col("k"))
    assert(sketches.count() == 8)
    val merged = Sketches.cmsUnionSketch(sketches)
    val (nGroups, n, unionBytes) = merged
      .select(col("n_groups"), col("n_rows"), col("sketch"))
      .as[(Long, Long, Array[Byte])].head()
    assert(nGroups == 8)
    val oneShotBytes = df.agg(
      count_min_sketch(col("k"), lit(1e-4), lit(0.999), lit(42)).as("s"))
      .as[Array[Byte]].head()
    // cell-wise addition reconstructs the one-shot table EXACTLY
    assert(java.util.Arrays.equals(unionBytes, oneShotBytes),
      "union sketch differs from one-shot sketch")
    // every true count bounded below by its estimate; over by <= eps*N
    val truth = df.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
    val checked = truth
      .crossJoin(broadcast(merged.select(col("sketch"), col("n_rows"))))
      .select(col("cnt"), Sketches.cmsEstimate(col("sketch"), col("k")).as("est"),
        col("n_rows"))
      .as[(Long, Long, Long)].collect()
    assert(checked.length == 50200 && checked.forall { case (_, _, nr) => nr == n })
    assert(checked.forall { case (cnt, est, _) => est >= cnt },
      "CMS under-estimated a key (one-sided error violated)")
    val over = checked.count { case (cnt, est, nr) => est > cnt + 1e-4 * nr }
    assert(over == 0, s"$over keys over-estimated beyond eps*N")
  }

  test("X10qs union of per-group GK sketches honors the rank bound; reload answers identically") {
    val n = 300000L
    // skewed values: rank structure matters, uniform would be too easy
    val df = spark.range(n).select((col("id") % 16).as("g"),
      (pow(col("id") % 1000, 2.0) / lit(1000.0)).as("v"))
    val sketches = Sketches.qsGroupSketches(df, col("g"), col("v"),
      relativeError = 0.001)
    assert(sketches.count() == 16)
    val merged = Sketches.qsUnionSketch(sketches)
    val (ng, nr, bytes) = merged.select(col("n_groups"), col("n_rows"), col("sketch"))
      .as[(Long, Long, Array[Byte])].head()
    assert(ng == 16 && nr == n)
    val values = df.select(col("v")).as[Double].collect().sorted
    Seq(0.5, 0.9, 0.99).foreach { p =>
      val est = Sketches.qsUnionSketch(sketches)
        .select(Sketches.qsQuantile(col("sketch"), p)).as[Double].head()
      val rank = values.count(_ <= est).toDouble / n
      // merged error ≤ sum of leg errors; 1% slack is 5× that
      assert(math.abs(rank - p) <= 0.01,
        s"p=$p estimate $est sits at rank $rank")
    }
    // a reloaded sketch answers bit-identically to the stored one
    val q1 = graft.functions.QuantileCodec.fromBytes(bytes).query(0.9)
    val q2 = graft.functions.QuantileCodec
      .fromBytes(graft.functions.QuantileCodec.toBytes(
        graft.functions.QuantileCodec.fromBytes(bytes))).query(0.9)
    assert(q1 == q2 && q1.isDefined)
  }

  test("X10qr rank query inverts the quantile query within the GK bound; boundary conventions hold") {
    val n = 200000L
    val eps = 0.001
    val df = spark.range(n).select((col("id") % 8).as("g"),
      (pow(col("id") % 3000, 1.5)).as("v"))
    val merged = Sketches.qsUnionSketch(
      Sketches.qsGroupSketches(df, col("g"), col("v"), eps))
    val bytes = merged.select("sketch").as[Array[Byte]].head()
    val values = df.select(col("v")).as[Double].collect().sorted
    val rk = graft.functions.QuantileSketchRank(
      org.apache.spark.sql.catalyst.expressions.Literal(bytes),
      org.apache.spark.sql.catalyst.expressions.Literal(0.0))
    // probe actual data values at several depths: est within 2*eps of
    // the true tie-aware rank window
    Seq(0.01, 0.25, 0.5, 0.75, 0.99).foreach { q =>
      val v = values(((n - 1) * q).toInt)
      val est = rk.rankOf(bytes, v).asInstanceOf[Double]
      val lo = values.count(_ < v).toDouble / n
      val hi = values.count(_ <= v).toDouble / n
      assert(est >= lo - 2 * eps && est <= hi + 2 * eps,
        s"rank($v)=$est outside [$lo, $hi] ± ${2 * eps}")
    }
    // boundary conventions
    assert(rk.rankOf(bytes, -1.0) == 0.0)
    assert(rk.rankOf(bytes, values.last + 1.0) == 1.0)
    // plan path == kernel (codegen parity through the registered function)
    graft.functions.GraftFunctions.register(spark)
    val viaPlan = df.limit(100)
      .crossJoin(broadcast(merged.select(col("sketch"))))
      .select(col("v"), Sketches.qsRank(col("sketch"), col("v")).as("r"))
      .as[(Double, Double)].collect()
    viaPlan.foreach { case (v, r) => assert(r == rk.rankOf(bytes, v)) }
  }

  test("X6jc serialized-CMS layout parses; inner product exact on collision-free keys") {
    import graft.functions.CmsCodec
    // layout pin: a producer-built sketch parses to the geometry formulas
    // (width = ceil(2/eps), depth = ceil(ln(1/(1-conf))/ln2)) and every
    // table row sums to the insert count
    val df = (1 to 500).map(i => ("g", s"k${i % 7}")).toDF("g", "k")
    val bytes = Sketches.cmsGroupSketches(df, col("g"), col("k"))
      .select("sketch").as[Array[Byte]].head()
    val p = CmsCodec.parse(bytes)
    assert(p.depth == 10 && p.width == 20000 && p.hashA.length == 10)
    (0 until p.depth).foreach { d =>
      val rowSum = (d * p.width until (d + 1) * p.width).map(p.table(_)).sum
      assert(rowSum == 500L, s"row $d sums to $rowSum")
    }
    // collision-free regime (7 keys << 20k width): inner product is EXACT
    val a = Seq.tabulate(30)(i => s"k${i % 3}").toDF("k") // f = (10,10,10)
    val b = (Seq.fill(4)("k0") ++ Seq.fill(6)("k1") ++ Seq.fill(100)("kZ")).toDF("k")
    val est = Sketches.cmsJoinCardinality(a, col("k"), b, col("k"))
      .select("n_a", "n_b", "join_card_est").as[(Long, Long, Long)].head()
    assert(est == ((30L, 110L, 10L * 4 + 10L * 6)), s"got $est")
  }

  test("X6jc self inner product brackets F2 within the eps*N^2 bound") {
    val df = (0 until 50000).map(i => (i * 31L) % 1000L).toDF("k")
    val exactF2 = df.groupBy("k").count()
      .agg(sum(col("count") * col("count"))).as[Long].head()
    val est = Sketches.cmsJoinCardinality(df, col("k"), df, col("k"))
      .select("join_card_est").as[Long].head()
    assert(est >= exactF2, s"inner product $est undercounts F2 $exactF2")
    assert(est <= exactF2 + (1e-4 * 50000.0 * 50000.0).toLong,
      s"inner product $est above the eps*N^2 bound over $exactF2")
  }

  test("X6jc mismatched geometry or seed fails the inner product loudly") {
    val df = (1 to 100).map(i => s"k$i").toDF("k")
    def sketchOf(eps: Double, seed: Int): org.apache.spark.sql.DataFrame =
      df.agg(count_min_sketch(col("k"), lit(eps), lit(0.999), lit(seed)).as("s"))
    def inner(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) = {
      graft.functions.GraftFunctions.register(spark)
      l.select(col("s").as("sa")).crossJoin(r.select(col("s").as("sb")))
        .select(call_function("graft_cms_inner", col("sa"), col("sb")))
        .collect()
    }
    val exGeom = intercept[Exception] { inner(sketchOf(1e-4, 42), sketchOf(1e-3, 42)) }
    assert(causesOf(exGeom).exists(c => Option(c.getMessage)
      .exists(_.contains("incompatible count-min geometries"))), s"got $exGeom")
    val exSeed = intercept[Exception] { inner(sketchOf(1e-4, 42), sketchOf(1e-4, 7)) }
    assert(causesOf(exSeed).exists(c => Option(c.getMessage)
      .exists(_.contains("different seeds"))), s"got $exSeed")
  }

  private def causesOf(t: Throwable): Seq[Throwable] =
    if (t == null) Nil else t +: causesOf(t.getCause)

  test("X6cms incompatible sketch geometries fail the merge loudly") {
    val df = cmsFixture.limit(1000)
    val a = Sketches.cmsGroupSketches(df, col("g"), col("k"), eps = 1e-4)
    val b = Sketches.cmsGroupSketches(df, col("g"), col("k"), eps = 1e-3)
    val ex = intercept[Exception] {
      Sketches.cmsUnionSketch(a.unionByName(b)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      c.getClass.getName.contains("IncompatibleMerge") ||
        Option(c.getMessage).exists(_.toLowerCase.contains("cannot merge"))),
      s"expected an incompatible-merge failure, got $ex")
  }
}
