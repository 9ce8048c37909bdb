package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: what does [[graft.ops.SetJoin.jaccardJoin]]'s rarest-first
  * prefix filter buy under stop-shingle skew?
  *
  * Fixture: N docs of 20 bounded-occupancy tokens each (token j of doc i
  * is t_{(i·7+j) mod (N/2)} — every token occurs ~40 times at any N, the
  * linear regime the unfiltered form's exp ≈ 1 was measured under), PLUS
  * one corpus-frequent stop token planted in 30% of docs. The naive
  * shared-token self-join's candidate volume is Σ C(occ, 2): the stop
  * token alone contributes C(0.3N, 2) ≈ 0.045·N² pairs — quadratic in N
  * however bounded everything else is. Under the prefix filter the stop
  * token is the corpus's MOST frequent, sorts last in the canonical
  * order, and lands in no prefix (prefix ≈ 11 of its 21 tokens), so
  * candidate volume stays linear by construction.
  *
  * Both legs run at ×1; the naive leg is capped (default ×10 — its ×100
  * candidate count is ~45G rows by arithmetic, which is the point) while
  * the filtered leg runs ×1/×10/×100. At ×1 the probe asserts both forms
  * agree pair-for-pair in count.
  *
  * Usage: runMain graft.tools.SetJoinSkewProbe [nBase] [naiveMaxScale]
  */
object SetJoinSkewProbe {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 10000L
    val naiveMax = if (args.length > 1) args(1).toInt else 10
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs(n: Long) = spark.range(n).select(col("id"),
      when(col("id") % 10 < 3,
        array_append(baseTokens(n), lit("STOP"))).otherwise(baseTokens(n))
        .as("toks"))
    def baseTokens(n: Long) = transform(sequence(lit(0), lit(19)),
      j => concat(lit("t"), ((col("id") * 7 + j) % (n / 2)).cast("string")))

    /** The r9 unfiltered form, verbatim: full shared-token self-join with
      * count-based verify — Σ C(occ,2) candidate rows into the aggregate.
      */
    def naivePairs(n: Long) = {
      val d = docs(n).where(size(col("toks")) > 0)
        .select(col("id").as("__id"), col("toks").as("__tk"))
      val toks = d.select(col("__id"), explode(col("__tk")).as("__t"))
      val sizes = d.select(col("__id"), size(col("__tk")).cast("long").as("__n"))
      toks.select(col("__t"), col("__id").as("id_a"))
        .join(toks.select(col("__t"), col("__id").as("id_b")).hint("merge"), Seq("__t"))
        .where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("__id").as("id_a"), col("__n").as("__na")), Seq("id_a"))
        .join(sizes.select(col("__id").as("id_b"), col("__n").as("__nb")), Seq("id_b"))
        .where(col("inter") * 2 >= (col("__na") + col("__nb") - col("inter")) * 1)
    }

    def filteredPairs(n: Long) =
      graft.ops.SetJoin.jaccardJoin(docs(n), "id", col("toks"), 1, 2)

    def time(label: String, f: => Long): Long = {
      val t0 = System.nanoTime()
      val cnt = f
      println(f"$label pairs=$cnt time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      cnt
    }

    time("warm filtered x0.1", { val c = filteredPairs(nBase / 10).count(); graft.ops.OpCaches.release(); c })
    val f1 = time(s"filtered x1 (n=$nBase)", { val c = filteredPairs(nBase).count(); graft.ops.OpCaches.release(); c })
    val n1 = time(s"naive    x1 (n=$nBase)", naivePairs(nBase).count())
    require(f1 == n1, s"prefix filter lost pairs: filtered=$f1 naive=$n1")
    Seq(10, 100).foreach { s =>
      time(s"filtered x$s (n=${nBase * s})",
        { val c = filteredPairs(nBase * s).count(); graft.ops.OpCaches.release(); c })
      if (s <= naiveMax) time(s"naive    x$s (n=${nBase * s})", naivePairs(nBase * s).count())
      else println(f"naive    x$s skipped: stop-token candidates alone ≈ ${0.045 * (nBase * s).toDouble * (nBase * s).toDouble / 1e9}%.0fG rows by arithmetic")
    }
    spark.stop()
  }
}
