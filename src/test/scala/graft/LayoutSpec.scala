package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order layout: the Morton code must match a plain-Scala reference
  * bit-for-bit, stay injective on a grid, and the clustered write must
  * bound BOTH dimensions per file — the property single-column sorting
  * cannot deliver (its files always span the full other dimension).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refRank(v: Long, min: Long, max: Long, bits: Int): Long =
    if (max == min) 0L else (v - min) * ((1L << bits) - 1) / (max - min)

  private def refInterleave(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum

  test("X9z z-value matches the reference fold and is injective on a grid") {
    val n = 64
    val grid = (0 until n).flatMap(u => (0 until n).map(t => (u.toLong, t.toLong)))
      .toDF("user_id", "ts_ms")
    val out = Layout.withZValue(grid, "user_id", "ts_ms")
      .select("user_id", "ts_ms", "zval").as[(Long, Long, Long)].collect()
    assert(out.length == n * n)
    assert(out.map(_._3).distinct.length == n * n, "z-values injective on distinct pairs")
    out.take(500).foreach { case (u, t, z) =>
      val expect = refInterleave(
        refRank(u, 0, n - 1, Layout.ZBits), refRank(t, 0, n - 1, Layout.ZBits), Layout.ZBits)
      assert(z == expect, s"zval mismatch at ($u, $t): $z != $expect")
    }
    // degenerate dimension ranks 0 everywhere: zval reduces to the other axis
    val flat = Seq((5L, 1L), (5L, 2L)).toDF("user_id", "ts_ms")
    val fz = Layout.withZValue(flat, "user_id", "ts_ms")
      .select("zval").as[Long].collect().toSet
    assert(fz.size == 2, "degenerate min=max column must not collapse distinct rows")
  }

  test("X9h hilbert index: order-1 square, exhaustive order-5 bijection + unit-step curve") {
    import graft.functions.HilbertIndex
    import org.apache.spark.sql.catalyst.expressions.Literal
    def h(bits: Int)(x: Long, y: Long): Long =
      HilbertIndex(Literal(0L), Literal(0L), bits).hilbert(x, y)
    // the canonical order-1 U: (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3
    assert(h(1)(0, 0) == 0 && h(1)(0, 1) == 1 && h(1)(1, 1) == 2 && h(1)(1, 0) == 3)
    // order 5: 32x32 — a bijection onto [0,1024) whose consecutive
    // indices are MANHATTAN-DISTANCE-1 grid cells (the Hilbert property
    // Morton lacks: refInterleave jumps diagonally at quadrant seams)
    val n = 32
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val byD = cells.map { case (x, y) => h(5)(x, y) -> ((x, y)) }.sortBy(_._1)
    assert(byD.map(_._1) == (0L until (n.toLong * n)).toVector.map(identity),
      "order-5 hilbert is not a bijection onto [0,1024)")
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (d2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps at d=$d2: ($x1,$y1)->($x2,$y2)")
    }
    // the Morton fold does NOT have the unit-step property (sanity that
    // the assertion above is non-vacuous): count its jumps
    val mortonJumps = cells.map { case (x, y) => refInterleave(x, y, 5) -> ((x, y)) }
      .sortBy(_._1).sliding(2).count {
        case Seq((_, (x1, y1)), (_, (x2, y2))) =>
          math.abs(x1 - x2) + math.abs(y1 - y2) > 1
      }
    assert(mortonJumps > 0)
    // codegen path (DataFrame) == the kernel
    val df = cells.toDF("x", "y")
    graft.functions.GraftFunctions.register(spark)
    val fromPlan = df.select(col("x"), col("y"),
        call_function("graft_hilbert", col("x"), col("y"), lit(5)))
      .as[(Long, Long, Long)].collect()
    fromPlan.foreach { case (x, y, d) => assert(d == h(5)(x, y)) }
  }

  test("X9h3 d-dim hilbert: exhaustive 3-D order-4 bijection + unit-step curve, codegen parity") {
    import graft.functions.HilbertIndexNd
    import org.apache.spark.sql.catalyst.expressions.Literal
    def h(bits: Int)(xs: Long*): Long =
      HilbertIndexNd(xs.map(_ => Literal(0L)), bits).hilbert(xs.toArray)
    // 3-D order 4: 16^3 = 4096 cells — bijection onto [0, 4096) with
    // every consecutive pair a Manhattan-distance-1 grid step (the
    // dimension-generic Hilbert property)
    val n = 16
    val cells = for (x <- 0 until n; y <- 0 until n; z <- 0 until n)
      yield (x.toLong, y.toLong, z.toLong)
    val byD = cells.map { case (x, y, z) => h(4)(x, y, z) -> ((x, y, z)) }.sortBy(_._1)
    assert(byD.map(_._1) == (0L until (n.toLong * n * n)).toVector,
      "3-D order-4 hilbert is not a bijection onto [0,4096)")
    byD.sliding(2).foreach { case Seq((_, (x1, y1, z1)), (d2, (x2, y2, z2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
        s"3-D curve jumps at d=$d2: ($x1,$y1,$z1)->($x2,$y2,$z2)")
    }
    // 4-D order 3 spot check: bijection onto [0, 4096) too
    val cells4 = for (a <- 0 until 8; b <- 0 until 8; c <- 0 until 8; d <- 0 until 8)
      yield (a.toLong, b.toLong, c.toLong, d.toLong)
    val ds4 = cells4.map { case (a, b, c, d) => h(3)(a, b, c, d) }.sorted
    assert(ds4 == (0L until 4096L).toVector, "4-D order-3 hilbert not a bijection")
    // codegen path (DataFrame) == the kernel; null propagates
    val df = cells.toDF("x", "y", "z")
    graft.functions.GraftFunctions.register(spark)
    val fromPlan = df.select(col("x"), col("y"), col("z"),
        call_function("graft_hilbert_nd", col("x"), col("y"), col("z"), lit(4)))
      .as[(Long, Long, Long, Long)].collect()
    fromPlan.foreach { case (x, y, z, d) => assert(d == h(4)(x, y, z)) }
    val withNull = spark.sql(
      "SELECT graft_hilbert_nd(CAST(NULL AS BIGINT), 1L, 1L, 4)").head()
    assert(withNull.isNullAt(0))
  }

  test("X9h3 withHValueN write bounds all three dimensions per file") {
    val n = 16
    val grid = (0 until n).flatMap(u => (0 until n).flatMap(t =>
      (0 until n).map(v => (u.toLong, t.toLong, v.toLong))))
      .toDF("a", "b", "c")
    val dir = java.nio.file.Files.createTempDirectory("graft-h3").toString
    Layout.hilbertWriteN(grid, Seq("a", "b", "c"), dir, numFiles = 16,
      bits = Layout.HBits3)
    // per-file spans must be bounded in EVERY dimension (a single-column
    // sort bounds one); hilbert files cover ~1/16 of the cube each, so
    // each dimension's average span must be well under the full extent
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"),
        (max("c") - min("c")).as("sc"))
      .agg(avg("sa"), avg("sb"), avg("sc")).head()
    Seq(0, 1, 2).foreach { i =>
      assert(spans.getDouble(i) < n - 1,
        s"dimension $i unbounded per file: ${spans.getDouble(i)}")
    }
  }

  test("X9z over-span columns raise in-plan instead of silently wrapping") {
    // span just past 2^42 at the default 21 bits: the product guard
    val wide = Seq((0L, 0L), ((1L << 43), 1L)).toDF("user_id", "ts_ms")
    val e1 = intercept[Exception] {
      Layout.withZValue(wide, "user_id", "ts_ms").collect()
    }
    assert(e1.getMessage.contains("would overflow"), e1.getMessage)
    // range >= 2^63: the span SUBTRACTION itself wraps negative, which the
    // >= maxSpan product guard cannot see — the dedicated negative branch
    val huge = Seq((Long.MinValue + 1, 0L), (Long.MaxValue, 1L)).toDF("user_id", "ts_ms")
    val e2 = intercept[Exception] {
      Layout.withZValue(huge, "user_id", "ts_ms").collect()
    }
    assert(e2.getMessage.contains("span subtraction"), e2.getMessage)
  }

  test("X9z clustered write bounds BOTH dimensions per file (single-sort cannot)") {
    val n = 64
    val grid = (0 until n).flatMap(u => (0 until n).map(t => (u.toLong, t.toLong)))
      .toDF("user_id", "ts_ms")
    val dir = Files.createTempDirectory("zorder").toString + "/t"
    Layout.zorderWrite(grid, "user_id", "ts_ms", dir, numFiles = 16)
    val perFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f").agg(
        (max("user_id") - min("user_id") + 1).as("uspan"),
        (max("ts_ms") - min("ts_ms") + 1).as("tspan"),
        count(lit(1)).as("rows"))
      .as[(String, Long, Long, Long)].collect()
    assert(perFile.length == 16 && perFile.forall(_._4 > 0))
    val uspans = perFile.map(_._2).sorted
    val tspans = perFile.map(_._3).sorted
    // median span of EACH dimension at most half its domain — a file from a
    // user-sorted layout would span the full ts domain (tspan = 64) always
    assert(uspans(8) <= n / 2, s"median user span too wide: ${uspans.toSeq}")
    assert(tspans(8) <= n / 2, s"median ts span too wide: ${tspans.toSeq}")
    // mean bounding-box area far below the full grid: real 2-D clustering
    val meanArea = perFile.map(f => f._2 * f._3).sum.toDouble / perFile.length
    assert(meanArea <= (n * n) / 4.0, s"mean per-file bounding box $meanArea not clustered")
  }
}
