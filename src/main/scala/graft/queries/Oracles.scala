package graft.queries

/** DuckDB oracle SQL twins for [[Queries.all]] — one per SQL-expressible
  * query, mirroring the Spark plan expression-for-expression so results
  * hash-match bit-exactly (decimal-cast sums, epoch-ms timestamps, ratios
  * rounded identically, identical tie-breaks). The ONLY query without a
  * twin is x3_ivf_topk: its probe selection depends on data-derived
  * centroids whose ranking is approximate BY DESIGN, so the driver records
  * a rows-only check for it. Everything hash-based is portable because the
  * operators hash with md5 slices (Dedup.md5Hash60/md5Hash32,
  * Similarity.planeComponent) rather than Spark's internal xxhash64.
  */
object Oracles {

  private val norm = """regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"""
  private val wordsOf = s"""list_filter(string_split($norm, ' '), x -> len(x) > 0)"""

  /** md5-derived uniform in [0,1) over the doc id — the twin of
    * [[graft.ops.Sampling.hashUnit]] (identical IEEE division of the same
    * 32-bit integer).
    */
  private val hashUnit =
    """('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0"""

  /** The minhash-LSH candidate/estimate CTE chain (mirrors
    * Dedup.minhashNearDupPairs: portable md5 base hash, 64 affine
    * permutations, 16x4 banding, signature-agreement estimate), over any
    * (doc_id, text) relation `src`. Shared by the pair query, the cluster
    * queries and the composed pipeline so the oracles cannot drift. CTE
    * names are mh-prefixed so the chain composes with other chains.
    */
  private def minhashChain(src: String) =
    s"""mhw AS (SELECT doc_id, $wordsOf AS ws FROM $src),
       |mhsh AS (SELECT DISTINCT doc_id,
       |         unnest(CASE WHEN len(ws) >= 3
       |           THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
       |           ELSE [array_to_string(ws, ' ')] END) AS s
       |       FROM mhw),
       |mhhx AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS x FROM mhsh),
       |mhperms AS (SELECT i, ((i+1)*2654435761) % 2147483647 AS a, ((i+1)*40503 + 7) % 2147483647 AS b
       |          FROM generate_series(0, 63) t(i)),
       |mhsig AS (SELECT doc_id, i, min((a*x + b) % 2147483647) AS h
       |        FROM mhhx CROSS JOIN mhperms GROUP BY 1, 2),
       |mhsigarr AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM mhsig GROUP BY 1),
       |mhbands AS (SELECT doc_id, b, array_to_string(sig[b*4+1 : b*4+4], ',') AS bandkey
       |          FROM mhsigarr CROSS JOIN generate_series(0, 15) t(b)),
       |mhcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM mhbands a JOIN mhbands b ON a.b = b.b AND a.bandkey = b.bandkey
       |         WHERE a.doc_id < b.doc_id),
       |est AS (SELECT c.id_a, c.id_b,
       |          len(list_filter(range(1, 65), i -> x.sig[i] = y.sig[i])) / 64.0 AS e
       |        FROM mhcand c JOIN mhsigarr x ON x.doc_id = c.id_a JOIN mhsigarr y ON y.doc_id = c.id_b)""".stripMargin

  private val minhashPairChain = minhashChain("documents")

  /** The RHP sign-LSH bucket CTE chain (mirrors the bucket math of
    * Similarity.randomHyperplaneNearDupPairs / rhpMultiProbePairs:
    * md5-seeded hyperplanes, 6-dp-rounded projections, `bands` bands of
    * `bits` sign bits); ends with `rhp_buck(vec_id, band, bkt)`. Shared by
    * the pair query, the recall audit and the multi-probe query so the
    * twins cannot drift.
    */
  private def rhpBucketChain(bands: Int, bits: Int): String = {
    val nPlanes = bands * bits
    s"""rhp_planes AS (
       |  SELECT k, list_transform(generate_series(0, 63),
       |           i -> ('0x' || substr(md5('hp_' || k || '_' || i), 1, 8))::BIGINT / 2147483648.0 - 1.0) AS p
       |  FROM generate_series(0, ${nPlanes - 1}) t(k)),
       |rhp_proj AS (
       |  SELECT e.vec_id, pl.k // $bits AS band,
       |    CASE WHEN round(list_sum(list_transform(generate_series(1, 64),
       |                i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i])), 6) >= 0
       |         THEN 1 << (pl.k % $bits) ELSE 0 END AS bit
       |  FROM embeddings e CROSS JOIN rhp_planes pl),
       |rhp_buck AS (SELECT vec_id, band, CAST(sum(bit) AS BIGINT) AS bkt FROM rhp_proj GROUP BY 1, 2)""".stripMargin
  }

  /** The corpus-sized variant of [[rhpBucketChain]] (mirrors the r14
    * registered x2_rhp_* plans): bits per band are DERIVED from the
    * corpus count exactly as Similarity.rhpBitsFor does — integer-exact
    * bitLength(ceil(n/occ) - 1) clamped to [4, 24], computed here as a
    * count of set-bit positions so no float log can disagree across
    * engines. `occ` is the target bucket occupancy: 16 for the exact-
    * collision plans, 1 for the multiprobe plan (which spends its probe
    * multiplier on hash selectivity — see x2_rhp_multiprobe's scaladoc).
    * Ends with `rhp_bits(bits)` and `rhp_buck(vec_id, band,
    * bkt)`. Plane indexing matches the Spark side: plane k serves band
    * k // bits, sign bit k % bits, so both engines pick the SAME md5
    * hyperplanes for whatever bits the count implies.
    */
  private def rhpBucketChainDyn(bands: Int, occ: Int = 16): String =
    s"""rhp_bits AS (
       |  SELECT least(24, greatest(4, CAST((
       |    SELECT count(*) FROM generate_series(0, 62) g(b)
       |    WHERE ((((SELECT count(*) FROM embeddings) + ${occ - 1}) // $occ) - 1) >> b > 0) AS INT))) AS bits),
       |rhp_planes AS (
       |  SELECT k, list_transform(generate_series(0, 63),
       |           i -> ('0x' || substr(md5('hp_' || k || '_' || i), 1, 8))::BIGINT / 2147483648.0 - 1.0) AS p
       |  FROM rhp_bits CROSS JOIN generate_series(0, ${bands * 24 - 1}) t(k) WHERE k < $bands * bits),
       |rhp_proj AS (
       |  SELECT e.vec_id, pl.k // rb.bits AS band,
       |    CASE WHEN round(list_sum(list_transform(generate_series(1, 64),
       |                i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i])), 6) >= 0
       |         THEN CAST(1 << (pl.k % rb.bits) AS BIGINT) ELSE 0 END AS bit
       |  FROM embeddings e CROSS JOIN rhp_planes pl CROSS JOIN rhp_bits rb),
       |rhp_buck AS (SELECT vec_id, band, CAST(sum(bit) AS BIGINT) AS bkt FROM rhp_proj GROUP BY 1, 2)""".stripMargin

  /** Exact-cosine verification of `rhp_cand(id_a, id_b)`; ends with
    * `rhp_v(id_a, id_b, cosine)`.
    */
  private val RhpVerify =
    """rhp_v AS (SELECT c.id_a, c.id_b, round(
      |    list_sum(list_transform(generate_series(1, 64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))) /
      |    (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE)))) *
      |     sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))))), 6) AS cosine
      |  FROM rhp_cand c JOIN embeddings a ON a.vec_id = c.id_a JOIN embeddings b ON b.vec_id = c.id_b)""".stripMargin

  /** Per-doc blended-quality CTE chain (mirrors TextAnalysis.blendedScore;
    * the score expression is copied verbatim from x5_quality's
    * quality_score so the two cannot drift). Ends with
    * `qs(doc_id, source, score)`. Shared by x5_domain_stats,
    * x5_domain_filter and x7_curriculum.
    */
  private val QualityScoreChain =
    s"""qsb AS (SELECT doc_id, source, $norm AS nt FROM documents),
       |qsw AS (SELECT doc_id, source, list_filter(string_split(nt, ' '), x -> len(x) > 0) AS ws FROM qsb),
       |qsm AS (SELECT doc_id, source, len(ws) AS nw,
       |        coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS sumlen,
       |        len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','the','a','and','of','to','in','is','el','la','de','y','que','los','un','le','et','les','des','une','de0','shi0','le0','bu0','wo0','zai0','you0'], x))) AS nstop
       |      FROM qsw),
       |qs AS (SELECT doc_id, source,
       |  round((least(nw/50.0, 1.0)
       |       + (CASE WHEN sumlen*1.0/greatest(nw, 1) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
       |       + least((nstop*1.0/greatest(nw, 1))*5, 1.0))/3.0, 6) AS score
       |FROM qsm)""".stripMargin

  /** Per-domain trust CTE (mirrors Domains.domainStats over
    * [[QualityScoreChain]]): exact-decimal mean of the 6dp scores, bottom-4
    * domains untrusted. Ends with `dmr(source, n_docs, mean_quality, r)`.
    */
  private val DomainTrustChain =
    s"""$QualityScoreChain,
       |dm AS (SELECT source, count(*) AS n_docs,
       |        round(CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_quality
       |      FROM qs GROUP BY source),
       |dmr AS (SELECT source, n_docs, mean_quality,
       |        row_number() OVER (ORDER BY mean_quality ASC, source ASC) AS r FROM dm)""".stripMargin

  /** NB quality-classifier CTE chain (mirrors Classify.nbFitOnDomainTrust
    * + nbScore): domain-trust weak labels from [[DomainTrustChain]],
    * add-one per-class token logps rounded 6dp at the model boundary,
    * per-doc log-odds through exact DECIMAL(18,6) differences and
    * order-free sums, priors/floors from the one-row totals aggregate.
    * Ends with `nbs(doc_id, n_tokens, llr)`. Shared by x5_nb_quality and
    * x8_curation_v5 so the composed filter cannot drift from the scorer.
    */
  private val NbScoreChain =
    s"""$DomainTrustChain,
       |nbl AS (SELECT d.doc_id, (dmr.r > 4) AS pos, $wordsOf AS ws
       |        FROM documents d JOIN dmr ON dmr.source = d.source),
       |nbp AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
       |               sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn FROM nbl),
       |nbt AS (SELECT pos, unnest(ws) AS token FROM nbl),
       |nbc AS (SELECT token, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
       |               sum(CASE WHEN pos THEN 0 ELSE 1 END) AS cn FROM nbt GROUP BY 1),
       |nbtv AS (SELECT sum(cp) AS ctp, sum(cn) AS ctn, CAST(count(*) AS BIGINT) AS v FROM nbc),
       |nbm AS (SELECT token,
       |    round(ln(CAST(cp + 1 AS DOUBLE) / CAST(ctp + v AS DOUBLE)), 6) AS lp_p,
       |    round(ln(CAST(cn + 1 AS DOUBLE) / CAST(ctn + v AS DOUBLE)), 6) AS lp_n
       |  FROM nbc, nbtv),
       |nbk AS (SELECT
       |    round(ln(1.0 / CAST(ctp + v AS DOUBLE)), 6) AS fp,
       |    round(ln(1.0 / CAST(ctn + v AS DOUBLE)), 6) AS fneg,
       |    round(ln(CAST(np AS DOUBLE) / CAST(np + nn AS DOUBLE)), 6) AS pp,
       |    round(ln(CAST(nn AS DOUBLE) / CAST(np + nn AS DOUBLE)), 6) AS pn
       |  FROM nbtv, nbp),
       |nbd AS (SELECT doc_id,
       |    unnest(CASE WHEN len(ws) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE ws END) AS token
       |  FROM (SELECT doc_id, $wordsOf AS ws FROM documents)),
       |nbj AS (SELECT nbd.doc_id, nbk.pp, nbk.pn,
       |    CASE WHEN nbd.token IS NULL THEN CAST(0 AS DECIMAL(18,6))
       |         ELSE CAST(coalesce(nbm.lp_p, nbk.fp) AS DECIMAL(18,6)) -
       |              CAST(coalesce(nbm.lp_n, nbk.fneg) AS DECIMAL(18,6)) END AS d,
       |    CASE WHEN nbd.token IS NULL THEN 0 ELSE 1 END AS t
       |  FROM nbd LEFT JOIN nbm ON nbm.token = nbd.token CROSS JOIN nbk),
       |nbs AS (SELECT doc_id, CAST(sum(t) AS BIGINT) AS n_tokens,
       |    round(CAST(CAST(max(pp) AS DECIMAL(18,6)) - CAST(max(pn) AS DECIMAL(18,6)) + sum(d) AS DOUBLE), 6) AS llr
       |  FROM nbj GROUP BY doc_id)""".stripMargin

  /** Logreg quality-classifier CTE chain (mirrors
    * Classify.logregFitOnDomainTrust + logregScore): domain-trust weak
    * labels over [[DomainTrustChain]], 4 features 6-dp at the boundary,
    * then LogregIters full-batch GD steps UNROLLED as CTEs — z and the
    * gradient in exact DECIMAL, sigma(z) the one double op per row
    * (rounded 6 dp), weight update w - (lr * (g/n)) replayed with the
    * driver's operation order. Ends with `lrsc(doc_id, score)`. Shared by
    * x5_logreg_quality and x8_curation_v11 so the composed gate cannot
    * drift from the scorer.
    */
  /** The logreg-specific CTE tail (everything after [[DomainTrustChain]])
    * — kept separate so a twin already carrying the trust chain (e.g. via
    * [[NbScoreChain]]) can append it without redefining qsb/qsw/qsm/qs.
    */
  private val LogregTail: String = {
    val iters = graft.ops.Classify.LogregIters
    val lr = graft.ops.Classify.LogregLr
    def z = (1 to 4).map(j =>
      s"CAST(w$j AS DECIMAL(18,6)) * CAST(x$j AS DECIMAL(18,6))").mkString(" + ")
    def sig = s"round(1.0/(1.0 + exp(-CAST($z AS DOUBLE))), 6)"
    val iterCtes = (1 to iters).map { k =>
      s"""lrp$k AS (SELECT f.*, $sig AS p FROM lrf f CROSS JOIN lrit${k - 1}),
         |lrg$k AS (SELECT count(*) AS n,
         |  ${(1 to 4).map(j => s"sum((CAST(p AS DECIMAL(18,6)) - y) * CAST(x$j AS DECIMAL(18,6))) AS g$j").mkString(", ")}
         |  FROM lrp$k),
         |lrit$k AS (SELECT ${(1 to 4).map(j => s"round(w$j - ($lr * (CAST(g$j AS DOUBLE) / n)), 6) AS w$j").mkString(", ")}
         |  FROM lrit${k - 1} CROSS JOIN lrg$k)""".stripMargin
    }.mkString(",\n")
    s"""lrf AS (SELECT q.doc_id,
       |    CASE WHEN dmr.r > 4 THEN CAST(1 AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END AS y,
       |    CAST(1.0 AS DOUBLE) AS x1,
       |    q.score AS x2,
       |    round(least(m.nw/100.0, 1.0), 6) AS x3,
       |    round(len(regexp_replace(b.nt, '[^a-z]', '', 'g'))*1.0/greatest(len(b.nt), 1), 6) AS x4
       |  FROM qs q JOIN qsm m USING (doc_id) JOIN qsb b USING (doc_id)
       |  JOIN dmr ON dmr.source = q.source),
       |lrit0 AS (SELECT ${(1 to 4).map(j => s"CAST(0.0 AS DOUBLE) AS w$j").mkString(", ")}),
       |$iterCtes,
       |lrsc AS (SELECT f.doc_id, $sig AS score FROM lrf f CROSS JOIN lrit$iters)""".stripMargin
  }

  /** Full logreg chain: [[DomainTrustChain]] + [[LogregTail]]; ends with
    * `lrsc(doc_id, score)`. Shared by x5_logreg_quality and
    * x8_curation_v11.
    */
  private val LogregScoreChain: String = s"$DomainTrustChain,\n$LogregTail"

  /** Substring-span CTE chain (mirrors Dedup.substringSpans at window
    * length k): positions via scalar generate_series + unnest (DuckDB's
    * table-function form rejects lateral column bounds), 60-bit md5 gram
    * hashes mod the Mersenne prime, total-occurrence duplicate counting,
    * and the per-doc island merge as two window passes. Ends with
    * `ssw(doc_id, ws)` and `ssb(doc_id, s, e, isl)`; shared by
    * x1_substring_spans and x1_substring_scrub so apply cannot drift from
    * find.
    */
  private def SubstringSpanChain(k: Int = 10, src: String = "documents"): String =
    s"""ssw AS (SELECT doc_id, $wordsOf AS ws FROM $src),
       |ssp AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${k - 1})) AS p FROM ssw),
       |ssg AS (SELECT doc_id, p,
       |    ('0x' || substr(md5(array_to_string(ws[p:p+${k - 1}], ' ')), 1, 15))::BIGINT % 2147483647 AS x
       |  FROM ssp),
       |ssd AS (SELECT x FROM ssg GROUP BY x HAVING count(*) > 1),
       |ssh AS (SELECT g.doc_id, CAST(g.p AS BIGINT) AS s, CAST(g.p + ${k - 1} AS BIGINT) AS e
       |        FROM ssg g JOIN ssd USING (x)),
       |ssa AS (SELECT doc_id, s, e,
       |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |          OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
       |         THEN 1 ELSE 0 END AS nw
       |  FROM ssh),
       |ssb AS (SELECT doc_id, s, e, sum(nw) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM ssa)""".stripMargin

  /** DSIR fit + scoring CTE chain (mirrors Dsir.fitLogRatios + Dsir.score
    * at buckets=4096, target = doc_id % 20 = 0): unigram+bigram
    * occurrences, 60-bit md5 bucket hash, add-one-smoothed per-bucket
    * log-likelihood ratios over a dense bucket spine (each ln rounded
    * 6 dp, difference re-rounded). Ends with `dsj(doc_id, log_ratio)` —
    * one row per SOURCE-doc gram occurrence. Shared by x7_dsir_score and
    * x7_dsir_topk.
    */
  private def DsirScoreChain(src: String = "documents"): String =
    s"""dsw AS (SELECT doc_id, $wordsOf AS ws FROM $src),
       |dsg AS (SELECT doc_id, unnest(list_concat(ws,
       |    CASE WHEN len(ws) >= 2
       |      THEN list_transform(generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1])
       |      ELSE [] END)) AS gm FROM dsw),
       |dsb AS (SELECT doc_id, ('0x' || substr(md5(gm), 1, 15))::BIGINT % 4096 AS bucket FROM dsg),
       |dst AS (SELECT bucket, count(*) AS ct FROM dsb WHERE doc_id % 20 = 0 GROUP BY 1),
       |dss AS (SELECT bucket, count(*) AS cs FROM dsb WHERE doc_id % 20 <> 0 GROUP BY 1),
       |dstt AS (SELECT coalesce(sum(ct), 0) AS v FROM dst),
       |dsts AS (SELECT coalesce(sum(cs), 0) AS v FROM dss),
       |dsr AS (SELECT sp.bucket,
       |    round(round(ln(CAST(coalesce(dst.ct, 0) + 1 AS DOUBLE) / CAST(dstt.v + 4096 AS DOUBLE)), 6)
       |        - round(ln(CAST(coalesce(dss.cs, 0) + 1 AS DOUBLE) / CAST(dsts.v + 4096 AS DOUBLE)), 6), 6) AS log_ratio
       |  FROM (SELECT unnest(generate_series(0, 4095)) AS bucket) sp
       |  LEFT JOIN dst USING (bucket) LEFT JOIN dss USING (bucket)
       |  CROSS JOIN dstt CROSS JOIN dsts),
       |dsj AS (SELECT b.doc_id, r.log_ratio FROM dsb b JOIN dsr r USING (bucket)
       |        WHERE b.doc_id % 20 <> 0)""".stripMargin

  /** Power-iteration PCA CTE chain (mirrors Similarity.pcaProject at
    * dim=64, iters=5, the kmeansCellChain unroll technique): exact-decimal
    * corpus mean, then five stages of s = round6(index-order centered
    * dot) → per-dimension DECIMAL(18,6) accumulators → re-normalized
    * re-rounded component. Ends with `ed(vec_id, ev)`, `ml(mv)` and
    * `v5(vv)`.
    */
  private val PcaChain: String = {
    val iters = (1 to 5).map { t =>
      s"""pcs$t AS (SELECT e.vec_id, e.ev,
         |    round(list_sum(list_transform(generate_series(1, 64),
         |      i -> (e.ev[i] - ml.mv[i]) * v${t - 1}.vv[i])), 6) AS s
         |  FROM ed e CROSS JOIN ml CROSS JOIN v${t - 1}),
         |pcw$t AS (SELECT gs.i,
         |    CAST(sum(CAST(round(s.s * (s.ev[gs.i] - ml.mv[gs.i]), 6) AS DECIMAL(18,6))) AS DOUBLE) AS w
         |  FROM pcs$t s CROSS JOIN ml CROSS JOIN generate_series(1, 64) gs(i) GROUP BY 1),
         |pcl$t AS (SELECT list(w ORDER BY i) AS wv FROM pcw$t),
         |v$t AS (SELECT list_transform(wv,
         |    x -> round(x / sqrt(list_sum(list_transform(wv, y -> y * y))), 6)) AS vv FROM pcl$t)""".stripMargin
    }.mkString(",\n")
    s"""ed AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
       |pcmu AS (SELECT gs.i,
       |    CAST(sum(CAST(CAST(e.embedding[gs.i] AS DOUBLE) AS DECIMAL(27,10))) AS DOUBLE) / count(*) AS m
       |  FROM embeddings e CROSS JOIN generate_series(1, 64) gs(i) GROUP BY 1),
       |ml AS (SELECT list(m ORDER BY i) AS mv FROM pcmu),
       |v0 AS (SELECT list_transform(generate_series(1, 64),
       |    i -> round(CAST(1 AS DOUBLE) / sqrt(CAST(64 AS DOUBLE)), 6)) AS vv),
       |$iters""".stripMargin
  }

  /** Gopher rule-filter CTE chain (mirrors TextAnalysis.gopherRules with
    * the registered thresholds). Requires a preceding CTE `b(doc_id, nt)`;
    * ends with `m(doc_id, nt, nw, sumlen, nstop)` and
    * `rep(doc_id, rule_top_word, rule_dup_2gram)`. Shared by
    * x5_gopher_rules and x8_curation_v2 so the composed pipeline cannot
    * drift from the per-stage twin.
    */
  private val GopherChain =
    """w AS (SELECT doc_id, nt, list_filter(string_split(nt, ' '), x -> len(x) > 0) AS ws FROM b),
      |m AS (SELECT doc_id, nt, len(ws) AS nw,
      |        coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS sumlen,
      |        len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','the','a','and','of','to','in','is','el','la','de','y','que','los','un','le','et','les','des','une','de0','shi0','le0','bu0','wo0','zai0','you0'], x))) AS nstop
      |      FROM w),
      |t AS (SELECT doc_id, unnest(ws) AS tk FROM w),
      |wc AS (SELECT doc_id, tk, count(*) AS c FROM t GROUP BY 1, 2),
      |wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nw2, max(c) AS top FROM wc GROUP BY 1),
      |g AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
      |        THEN list_distinct(list_transform(generate_series(1, len(ws)-1), i -> array_to_string(ws[i:i+1], ' ')))
      |        ELSE [array_to_string(ws, ' ')] END) AS gm
      |      FROM w),
      |ga AS (SELECT doc_id, count(*) AS n2d FROM g GROUP BY 1),
      |rep AS (SELECT wa.doc_id,
      |        (round(top*1.0/nw2, 6) <= 0.15) AS rule_top_word,
      |        ((CASE WHEN nw2 <= 1 THEN 0.0 ELSE round(1.0 - n2d*1.0/(nw2-1), 6) END) <= 0.3) AS rule_dup_2gram
      |      FROM wa JOIN ga ON wa.doc_id = ga.doc_id)""".stripMargin

  /** The gopher keep conjunction over `m` LEFT JOIN `rep` columns — the
    * single definition both the per-rule query and the composed pipeline's
    * keeper filter interpolate.
    */
  private val GopherKeep =
    """(nw BETWEEN 30 AND 100000)
      |   AND (round(sumlen*1.0/greatest(nw, 1), 6) BETWEEN 3.0 AND 10.0)
      |   AND (round(len(regexp_replace(nt, '[^a-z]', '', 'g'))*1.0/greatest(len(nt), 1), 6) >= 0.8)
      |   AND (nstop >= 1)
      |   AND coalesce(rule_top_word, FALSE)
      |   AND coalesce(rule_dup_2gram, FALSE)""".stripMargin

  /** Char-trigram grams of a normalized-text column `nt`. */
  private val LmGrams =
    "CASE WHEN len(nt) >= 3 THEN list_transform(generate_series(1, len(nt)-2), i -> substr(nt, i, 3)) ELSE [nt] END"

  /** Char-trigram LM CTE chain (mirrors TextAnalysis.charTrigramLmFit +
    * lmScore's model/floor/per-gram stages, 20% md5 sample). Requires
    * `b(doc_id, nt)`; ends with `j(doc_id, lp, oov)`. Shared by
    * x5_lm_score and x8_curation_v2.
    */
  private val LmChain =
    s"""samp AS (SELECT nt FROM b WHERE $hashUnit < 0.2),
       |sg AS (SELECT unnest($LmGrams) AS gram FROM samp),
       |cnt AS (SELECT gram, CAST(count(*) AS BIGINT) AS c FROM sg GROUP BY 1),
       |tv AS (SELECT sum(c) AS tot, CAST(count(*) AS BIGINT) AS v FROM cnt),
       |lm AS (SELECT gram, round(ln(CAST(c + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE)), 6) AS logp FROM cnt, tv),
       |fl AS (SELECT round(ln(1.0 / CAST(tot + v AS DOUBLE)), 6) AS floorp FROM tv),
       |dg AS (SELECT doc_id, unnest($LmGrams) AS gram FROM b),
       |j AS (SELECT doc_id, coalesce(lm.logp, fl.floorp) AS lp,
       |        CASE WHEN lm.gram IS NULL THEN 1 ELSE 0 END AS oov
       |      FROM dg LEFT JOIN lm ON lm.gram = dg.gram CROSS JOIN fl)""".stripMargin

  /** Mirrors Similarity.semanticDedup end to end at the given quantizer
    * width: cells = `bitsPerCell` sign bits of RHP band 0 (the
    * x3_ivf_lsh_topk quantizer), centroids = exact DECIMAL(27,10) means,
    * keep-priority = (6-dp centroid cosine ASC, id), drop rule = any
    * same-cell ≥-threshold neighbor of lower priority. ONE definition for
    * the 4-bit and 8-bit registrations so the twins cannot drift.
    * NOTE the double-hop CAST(CAST(f AS DOUBLE) AS DECIMAL): DuckDB's
    * direct FLOAT→DECIMAL goes through the float's SHORTEST decimal repr
    * (0.0178204628f → 0.0178204624), while Spark rounds the exact binary
    * value (→ 0.0178204626); hopping through DOUBLE makes both engines
    * round the same binary value. Same fix applied in x3_ivf_lsh_topk.
    */
  private def semDedupSql(bitsPerCell: Int, threshold: Double): String = {
    def cos(a: String, b: String) =
      s"""round(
         |    list_sum(list_transform(generate_series(1, 64), i -> $a[i] * $b[i])) /
         |    (sqrt(list_sum(list_transform(generate_series(1, 64), i -> $a[i] * $a[i]))) *
         |     sqrt(list_sum(list_transform(generate_series(1, 64), i -> $b[i] * $b[i])))), 6)""".stripMargin
    s"""WITH ${rhpBucketChain(1, bitsPerCell)},
       |cells AS (SELECT vec_id, CAST(bkt AS INT) AS cell FROM rhp_buck),
       |ed AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
       |expd AS (SELECT c.cell, i, CAST(CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(27,10)) AS xd
       |        FROM embeddings e JOIN cells c ON c.vec_id = e.vec_id
       |        CROSS JOIN generate_series(1, 64) t(i)),
       |cent AS (SELECT cell, i, CAST(sum(xd) AS DOUBLE) / count(*) AS m FROM expd GROUP BY 1, 2),
       |centarr AS (SELECT cell, list(m ORDER BY i) AS cv FROM cent GROUP BY 1),
       |keyed AS (SELECT c.cell, e.vec_id, e.ev, ${cos("e.ev", "ca.cv")} AS ccos
       |        FROM ed e JOIN cells c ON c.vec_id = e.vec_id JOIN centarr ca ON ca.cell = c.cell),
       |dropped AS (SELECT DISTINCT b.vec_id
       |        FROM keyed a JOIN keyed b ON a.cell = b.cell
       |          AND (a.ccos, a.vec_id) < (b.ccos, b.vec_id)
       |        WHERE ${cos("a.ev", "b.ev")} >= $threshold)
       |SELECT k.vec_id, k.cell, k.ccos AS centroid_cos, (d.vec_id IS NULL) AS kept
       |FROM keyed k LEFT JOIN dropped d ON d.vec_id = k.vec_id
       |ORDER BY k.vec_id""".stripMargin
  }

  /** Registered ANN probe-set size — mirrors Queries.AnnAnchorK: every
    * X3/X11 twin draws its query anchors as the FIRST K rows by
    * (md5(vec_id as varchar), vec_id) — the fixed-count md5-rank
    * discipline (r15; replaces the fractional `vec_id % 100 = 0`
    * predicate whose probe count grew with the corpus). Lowercase-hex
    * md5 orders identically in every engine, so the anchor set is
    * bit-reproducible against Spark's TakeOrdered plan.
    */
  private val AnnAnchorK = 200

  /** The ORDER BY ... LIMIT tail that realizes the md5-rank anchor set
    * inside a CTE — shared verbatim by every X3/X11 twin's query-side
    * CTE so the anchor definition cannot drift between chains.
    */
  private val AnchorRank =
    s"ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $AnnAnchorK"

  /** 6-dp-rounded cosine over two 64-dim DOUBLE list expressions —
    * `list_sum` folds in index order, exactly like the JVM loop and the
    * `graft_dot` codegen kernel, so the pre-round double is bit-identical
    * across all three engines.
    */
  private def listCos(a: String, b: String) =
    s"""round(
       |    list_sum(list_transform(generate_series(1, 64), i -> $a[i] * $b[i])) /
       |    (sqrt(list_sum(list_transform(generate_series(1, 64), i -> $a[i] * $a[i]))) *
       |     sqrt(list_sum(list_transform(generate_series(1, 64), i -> $b[i] * $b[i])))), 6)""".stripMargin

  /** The deterministic k-means quantizer twin (mirrors
    * Similarity.kmeansCells + KmeansLocal.fit STAGE FOR STAGE, with the
    * cell count DERIVED from the corpus exactly as Similarity.ivfCellsFor
    * does — r15): md5-ordered
    * bounded fit sample, maxmin seeding unrolled into gated CTE stages
    * (argmin of the 6-dp-rounded nearest-seed cosine, ties to the first
    * sample row), `iters` Lloyd stages (assignment = max_by on the rounded
    * cosine with ties to the larger cell — and means through the exact
    * DECIMAL(27,10) addend discipline, so centroids are bit-identical to
    * the JVM fit), then the full-corpus assignment. Ends with
    * `ed(vec_id, ev)` and `cells(vec_id, cell)`. The fit is the iterative
    * piece that kept the k-means IVF queries rows-only through round 5;
    * unrolling it (the x6_bpe_merges technique) puts the whole operator
    * under the hash gate.
    */
  private def kmeansCellChain(kMaxUnroll: Int = 48, iters: Int = 3,
                              sampleLimit: Int = 4096,
                              targetCellSize: Int = 50, maxCells: Int = 512): String = {
    // kc is CORPUS-DERIVED — the Similarity.ivfCellsFor derivation
    // (ceil(n/targetCellSize) clamped to [2, maxCells]) replayed as
    // integer SQL, the same count→regime discipline as rhpBucketChainDyn.
    // The seeding unroll is static (CTE stages cannot be data-dependent)
    // but each stage past kc adds NO seed (the WHERE gate), so the chain
    // replays any kc ≤ kMaxUnroll bit-for-bit. 48 stages cover all three
    // gated fixtures (n = 500 → kc = 10 at sf0.001/sf0.01; n = 2000 →
    // kc = 40 at sf0.1 — the r15 review caught the prior 16-stage
    // ceiling silently shrinking the twin's scale coverage to the two
    // small fixtures); each no-op stage costs one gated scan of the
    // bounded sample, so the widened unroll stays check.py-cheap. A
    // fixture whose derived kc exceeded the unroll would produce a WRONG
    // twin — the ivf_kc CASE guard makes that loud (error() instead of a
    // silently under-seeded fit; ivf_kc is consumed by every seeding
    // gate, so it cannot be pruned away).
    val seeding = (2 to kMaxUnroll).map { s =>
      s"""nr$s AS MATERIALIZED (SELECT i.idx, max(${listCos("i.ev", "sd.ev")}) AS nr
         |  FROM smp i CROSS JOIN seeds${s - 1} sd GROUP BY 1),
         |seeds$s AS MATERIALIZED (SELECT sid, ev FROM seeds${s - 1}
         |  UNION ALL
         |  SELECT ${s - 1} AS sid, s2.ev
         |  FROM (SELECT idx FROM nr$s ORDER BY nr ASC, idx ASC LIMIT 1) p
         |  JOIN smp s2 USING (idx)
         |  WHERE $s <= (SELECT kc FROM ivf_kc))""".stripMargin
    }.mkString(",\n")
    val lloyd = (1 to iters).map { t =>
      val prev = s"ct${t - 1}"
      s"""asg$t AS MATERIALIZED (SELECT idx, cid FROM (
         |    SELECT i.idx, c.cid,
         |      row_number() OVER (PARTITION BY i.idx ORDER BY ${listCos("i.ev", "c.ev")} DESC, c.cid DESC) AS rk
         |    FROM smp i CROSS JOIN $prev c) WHERE rk = 1),
         |mu$t AS MATERIALIZED (SELECT a.cid, gs.i,
         |    CAST(sum(CAST(s.ev[gs.i] AS DECIMAL(27,10))) AS DOUBLE) / count(*) AS m
         |  FROM asg$t a JOIN smp s USING (idx) CROSS JOIN generate_series(1, 64) gs(i)
         |  GROUP BY 1, 2),
         |nc$t AS MATERIALIZED (SELECT cid, list(m ORDER BY i) AS ev FROM mu$t GROUP BY 1),
         |ct$t AS MATERIALIZED (SELECT c.cid, coalesce(n.ev, c.ev) AS ev FROM $prev c LEFT JOIN nc$t n USING (cid))""".stripMargin
    }.mkString(",\n")
    s"""ivf_kc0 AS (SELECT least($maxCells, greatest(2, CAST(
       |    ((SELECT count(*) FROM embeddings) + ${targetCellSize - 1}) // $targetCellSize
       |    AS INT))) AS kc),
       |ivf_kc AS (SELECT CASE WHEN kc <= $kMaxUnroll THEN kc
       |    ELSE CAST(error('kmeansCellChain: derived kc exceeds the $kMaxUnroll-stage unroll') AS INT)
       |    END AS kc FROM ivf_kc0),
       |ed AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
       |smp AS MATERIALIZED (SELECT vec_id, ev, idx FROM (
       |    SELECT vec_id, ev,
       |      row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS idx
       |    FROM ed) WHERE idx <= $sampleLimit),
       |seeds1 AS MATERIALIZED (SELECT 0 AS sid, ev FROM smp WHERE idx = 1),
       |$seeding,
       |ct0 AS MATERIALIZED (SELECT sid AS cid, ev FROM seeds$kMaxUnroll),
       |$lloyd,
       |cells AS MATERIALIZED (SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, CAST(c.cid AS INT) AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${listCos("e.ev", "c.ev")} DESC, c.cid DESC) AS rk
       |    FROM ed e CROSS JOIN ct$iters c) WHERE rk = 1)""".stripMargin
  }

  /** IVF probe + cell-restricted top-k twin (mirrors Similarity.ivfTopK):
    * full-corpus exact-decimal centroids per cell, 6-dp probe ranking, and
    * the within-probed-cells top-k. Requires prior CTEs `ed(vec_id, ev)`
    * and `cells(vec_id, cell)`; ends with `ivfr(qid, nid, cos, rn)`.
    * Shared by x3_ivf_lsh_topk, x3_ivf_topk and x3_ivf_recall so the
    * search mechanism cannot drift between quantizers.
    */
  private val IvfSearchChain =
    s"""iexpd AS (SELECT c.cell, gs.i, CAST(CAST(e.embedding[gs.i] AS DOUBLE) AS DECIMAL(27,10)) AS xd
       |        FROM embeddings e JOIN cells c ON c.vec_id = e.vec_id
       |        CROSS JOIN generate_series(1, 64) gs(i)),
       |icent AS (SELECT cell, i, CAST(sum(xd) AS DOUBLE) / count(*) AS m FROM iexpd GROUP BY 1, 2),
       |icentarr AS (SELECT cell, list(m ORDER BY i) AS cv FROM icent GROUP BY 1),
       |iq AS (SELECT vec_id AS qid, ev AS qe FROM ed $AnchorRank),
       |ipr AS (SELECT qid, qe, cell FROM (
       |    SELECT iq.qid, iq.qe, ca.cell,
       |      row_number() OVER (PARTITION BY iq.qid ORDER BY ${listCos("iq.qe", "ca.cv")} DESC, ca.cell) AS rnk
       |    FROM iq CROSS JOIN icentarr ca) WHERE rnk <= 3),
       |isc AS (SELECT ipr.qid, e.vec_id AS nid, ${listCos("ipr.qe", "e.ev")} AS cos
       |    FROM ipr JOIN cells cc ON cc.cell = ipr.cell
       |    JOIN ed e ON e.vec_id = cc.vec_id AND e.vec_id <> ipr.qid),
       |ivfr AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) rn FROM isc)""".stripMargin

  /** Brute-force cosine top-k truth chain (mirrors Similarity.cosineTopK:
    * 6-dp-rounded scores, rank by (cos DESC, nid), self-pairs excluded);
    * ends with `ranked(qid, nid, cos, rn)`. Shared by x3_knn_cosine and
    * the x3_ivf_recall_gate truth side so the two cannot drift.
    */
  private val KnnTruthChain =
    s"""q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings $AnchorRank),
      |c AS (SELECT vec_id AS nid, embedding AS ce FROM embeddings),
      |s AS (SELECT qid, nid, round(
      |    list_sum(list_transform(generate_series(1, len(qe)), i -> CAST(qe[i] AS DOUBLE)*CAST(ce[i] AS DOUBLE))) /
      |    (sqrt(list_sum(list_transform(generate_series(1, len(qe)), i -> CAST(qe[i] AS DOUBLE)*CAST(qe[i] AS DOUBLE)))) *
      |     sqrt(list_sum(list_transform(generate_series(1, len(ce)), i -> CAST(ce[i] AS DOUBLE)*CAST(ce[i] AS DOUBLE))))), 6) AS cos
      |  FROM q, c WHERE nid <> qid),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) rn FROM s)""".stripMargin

  /** Product-quantization chain (mirrors Similarity.pqCodes /
    * pqFitCodebooks / pqTopK at dim=64, m=32, bits=4 — the registered
    * regime, chosen because its measured recall matches the k-means IVF's
    * at a 16× memory cut): per-subspace sign-LSH codes over planes
    * k = s·bits+j of sub-dimension width dim/m, exact-DECIMAL(27,10)
    * codebook centroids, round6→DECIMAL(18,6) cross-subspace sums for
    * both the ADC numerator and the reconstruction norm, final 6-dp
    * cosine ranked with neighbor-id ties. Ends with
    * `pq_r(qid, nid, cos, rn)`. Shared by x3_pq_topk and x3_pq_recall so
    * the search cannot drift from its audit. All constants derive from
    * (PqM, PqBits) below — they cannot drift from each other.
    */
  private val PqM = 32
  private val PqBits = 4
  private val PqSubDim = 64 / PqM

  /** Encode + fit half: codes, exact-decimal codebooks with round6 norms,
    * and the query set with its norm — ends at `pq_centn` / `pq_q`.
    */
  private val PqCodeChain =
    s"""pq_planes AS (
       |  SELECT k, list_transform(generate_series(0, ${PqSubDim - 1}),
       |           i -> ('0x' || substr(md5('hp_' || k || '_' || i), 1, 8))::BIGINT / 2147483648.0 - 1.0) AS p
       |  FROM generate_series(0, ${PqM * PqBits - 1}) t(k)),
       |ed AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
       |pq_proj AS (
       |  SELECT e.vec_id, pl.k // $PqBits AS s,
       |    CASE WHEN round(list_sum(list_transform(generate_series(1, $PqSubDim),
       |                i -> e.ev[(pl.k // $PqBits) * $PqSubDim + i] * pl.p[i])), 6) >= 0
       |         THEN 1 << (pl.k % $PqBits) ELSE 0 END AS bit
       |  FROM ed e CROSS JOIN pq_planes pl),
       |pq_code AS (SELECT vec_id, s, CAST(sum(bit) AS INT) AS code FROM pq_proj GROUP BY 1, 2),
       |pq_expd AS (SELECT c.s, c.code, gs.i, CAST(e.ev[c.s * $PqSubDim + gs.i] AS DECIMAL(27,10)) AS xd
       |        FROM ed e JOIN pq_code c ON c.vec_id = e.vec_id
       |        CROSS JOIN generate_series(1, $PqSubDim) gs(i)),
       |pq_cent AS (SELECT s, code, i, CAST(sum(xd) AS DOUBLE) / count(*) AS m FROM pq_expd GROUP BY 1, 2, 3),
       |pq_centarr AS (SELECT s, code, list(m ORDER BY i) AS cv FROM pq_cent GROUP BY 1, 2),
       |pq_centn AS (SELECT s, code, cv,
       |    round(list_sum(list_transform(generate_series(1, $PqSubDim), i -> cv[i] * cv[i])), 6) AS n2
       |  FROM pq_centarr),
       |pq_q AS (SELECT vec_id AS qid, ev AS qv,
       |    sqrt(list_sum(list_transform(generate_series(1, 64), i -> ev[i] * ev[i]))) AS qn
       |  FROM ed $AnchorRank)""".stripMargin

  /** ADC scoring tail over a candidate CTE `pq_cand(qid, qv, nid)` —
    * round6 per-subspace sums through DECIMAL(18,6), 6-dp cosine ranked
    * with neighbor-id ties; ends with `pq_r(qid, nid, cos, rn)`. Shared
    * by the flat and the IVF-restricted search so ADC cannot drift.
    */
  private val PqScoreTail =
    s"""pq_sub AS (SELECT pc.qid, pc.nid, c.s,
       |    round(list_sum(list_transform(generate_series(1, $PqSubDim), i -> pc.qv[c.s * $PqSubDim + i] * cn.cv[i])), 6) AS sd,
       |    cn.n2
       |  FROM pq_cand pc JOIN pq_code c ON c.vec_id = pc.nid
       |  JOIN pq_centn cn ON cn.s = c.s AND cn.code = c.code),
       |pq_sc AS (SELECT qid, nid,
       |    CAST(sum(CAST(sd AS DECIMAL(18,6))) AS DOUBLE) AS num,
       |    CAST(sum(CAST(n2 AS DECIMAL(18,6))) AS DOUBLE) AS rn2
       |  FROM pq_sub GROUP BY 1, 2),
       |pq_r AS (SELECT sc.qid, sc.nid,
       |    round(sc.num / (q.qn * sqrt(sc.rn2)), 6) AS cos,
       |    row_number() OVER (PARTITION BY sc.qid
       |      ORDER BY round(sc.num / (q.qn * sqrt(sc.rn2)), 6) DESC, sc.nid) AS rn
       |  FROM pq_sc sc JOIN pq_q q ON q.qid = sc.qid)""".stripMargin

  /** Flat PQ search (mirrors Similarity.pqTopK at dim=64, m=32, bits=4 —
    * the registered regime, chosen because its measured recall matches the
    * k-means IVF's at a 16× memory cut; all constants derive from
    * (PqM, PqBits) so Spark and twin cannot drift): every query meets
    * every code. Ends with `pq_r`.
    */
  private val PqChain =
    s"""$PqCodeChain,
       |pq_cand AS (SELECT q.qid, q.qv, e.vec_id AS nid
       |  FROM pq_q q CROSS JOIN ed e WHERE e.vec_id <> q.qid),
       |$PqScoreTail""".stripMargin

  /** IVF-PQ search (mirrors Similarity.ivfPqTopK at corpus-derived
    * bitsPerCell = ivfBitsFor(n) — rhpBucketChainDyn at occ=32 —
    * nProbe=3, m=32, bits=4): coarse cells = sign bits of RHP band 0
    * (the x3_ivf_lsh_topk quantizer), exact-decimal cell centroids, 6-dp
    * probe ranking with cell-id ties, candidates restricted to probed
    * cells by an equi-join, then the shared ADC tail. Ends with `pq_r`.
    */
  private val IvfPqChain =
    s"""${rhpBucketChainDyn(1, occ = 32)},
       |cells AS (SELECT vec_id, CAST(bkt AS INT) AS cell FROM rhp_buck),
       |$PqCodeChain,
       |iexpd AS (SELECT c.cell, gs.i, CAST(CAST(e.embedding[gs.i] AS DOUBLE) AS DECIMAL(27,10)) AS xd
       |        FROM embeddings e JOIN cells c ON c.vec_id = e.vec_id
       |        CROSS JOIN generate_series(1, 64) gs(i)),
       |icent AS (SELECT cell, i, CAST(sum(xd) AS DOUBLE) / count(*) AS m FROM iexpd GROUP BY 1, 2),
       |icentarr AS (SELECT cell, list(m ORDER BY i) AS cv FROM icent GROUP BY 1),
       |ipq AS (SELECT qid, qv, cell FROM (
       |    SELECT q.qid, q.qv, ca.cell,
       |      row_number() OVER (PARTITION BY q.qid ORDER BY ${listCos("q.qv", "ca.cv")} DESC, ca.cell) AS rnk
       |    FROM pq_q q CROSS JOIN icentarr ca) WHERE rnk <= 3),
       |pq_cand AS (SELECT p.qid, p.qv, cl.vec_id AS nid
       |  FROM ipq p JOIN cells cl ON cl.cell = p.cell WHERE cl.vec_id <> p.qid),
       |$PqScoreTail""".stripMargin

  /** 8-band, corpus-derived-bits candidate chain ending at `rhp_v` — the
    * registered base parameterization since r14 (fixed 8×8 was the r7–r13
    * form; it broke at ×100, SCALING.md r13; the 16×4 coarse-band regime
    * is a spec-level demo only).
    */
  private val RhpChain =
    s"""${rhpBucketChainDyn(8)},
       |rhp_cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |         FROM rhp_buck a JOIN rhp_buck b ON a.band = b.band AND a.bkt = b.bkt AND a.vec_id < b.vec_id),
       |$RhpVerify""".stripMargin

  /** The X4d dHash chain, ending at `dh(doc_id, dhash)`. Mirrors
    * Multimodal.encodePpmPatch (raster = source bytes cycled over 273
    * positions + text-prefix bytes cycled over the trailing 78 — the last
    * two pixel rows) and Multimodal.ppmDHash byte-for-byte:
    * nearest-neighbor 9×8 grid over the 13×9 raster (px = gx·13//9,
    * py = gy·9//8), brightness = r+g+b, bit gy·8+gx = strict
    * right-minus-left gradient sign, assembled through HUGEINT with the
    * same two's-complement fold as the simhash twin.
    */
  /** Rebuilds the encodeWavPatch PCM byte-for-byte (634 base-cycled bytes
    * = samples 0..316, 32 patch-cycled bytes = samples 317..332), recovers
    * signed 16-bit LE samples from hex pairs, folds the 65 floor-boundary
    * spans ([333·j/65, 333·(j+1)/65), 1-based inclusive slice in DuckDB)
    * to exact Σv² energies, compares MEAN energies via exact integer
    * cross-products (e·ln), and packs the gradient-sign bits into the same
    * two's-complement BIGINT the Spark kernel emits (HUGEINT fold for
    * bit 63, as in DHashChain).
    */
  private val AWavChain =
    s"""awav AS (SELECT doc_id,
       |    ${(0 until 20).map(k => s"md5(CAST(doc_id // 25 AS VARCHAR) || '-$k')").mkString(" || ")} AS b0,
       |    coalesce(nullif(substr(text, 1, 12), ''), 'x') AS p0
       |  FROM documents),
       |awhx AS (SELECT doc_id,
       |    substr(hex(encode(repeat(b0, CAST((634 + octet_length(encode(b0)) - 1) // octet_length(encode(b0)) AS INT)))), 1, 1268) ||
       |    substr(hex(encode(repeat(p0, CAST((32 + octet_length(encode(p0)) - 1) // octet_length(encode(p0)) AS INT)))), 1, 64) AS hx
       |  FROM awav),
       |awr AS (SELECT doc_id, list_transform(generate_series(0, 332),
       |    i -> ('0x' || substr(hx, 4*i+1, 2))::BIGINT + 256*('0x' || substr(hx, 4*i+3, 2))::BIGINT) AS u
       |  FROM awhx),
       |aws AS (SELECT doc_id,
       |    list_transform(u, v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS smp
       |  FROM awr),
       |awseg AS (SELECT doc_id, j,
       |    coalesce(list_sum(list_transform(
       |      smp[CAST(333*j//65 + 1 AS INT) : CAST(333*(j+1)//65 AS INT)], v -> v*v)), 0) AS e,
       |    333*(j+1)//65 - 333*j//65 AS ln
       |  FROM aws CROSS JOIN generate_series(0, 64) t(j)),
       |awbits AS (SELECT a.doc_id, a.j AS i,
       |    CASE WHEN b.e * a.ln > a.e * b.ln THEN 1 ELSE 0 END AS bit
       |  FROM awseg a JOIN awseg b ON a.doc_id = b.doc_id AND b.j = a.j + 1
       |  WHERE a.j < 64),
       |ah AS (SELECT doc_id, CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
       |    THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS ahash
       |  FROM (SELECT doc_id, sum(CASE WHEN bit = 1 THEN
       |      (CASE WHEN i = 63 THEN 9223372036854775808::HUGEINT ELSE ((1::BIGINT << i))::HUGEINT END)
       |      ELSE 0::HUGEINT END) AS s FROM awbits GROUP BY 1))""".stripMargin

  /** Rebuilds Multimodal.gvidTemporalHash over the encodeGvidPatch
    * fixture (Queries.vidMedia). Per-frame brightness in the base region
    * comes from PREFIX SUMS over the 640-byte group cycle (computed once
    * per 25-doc GROUP, S(x) = (x÷640)·cyc + pre[x mod 640], frame f =
    * S(90(f+1)) − S(90f)) instead of per-byte reconstruction — 640 ascii()
    * calls per group rather than ~9000 substr() calls per doc, which keeps
    * the twin runnable at sf0.1; the 180 patch bytes (2 trailing frames)
    * are rebuilt per-doc from hex pairs exactly like AWavChain (the base
    * cycle is md5 hex text, pure ASCII, so ascii() per char is the byte;
    * the text-prefix patch can be multi-byte UTF-8, so it goes through
    * encode/hex). Frame f's span is j = ((f+1)·65 − 1) ÷ nf (the exact
    * inverse of the floor-boundary partition [j·nf/65, (j+1)·nf/65)),
    * mean-brightness bits via exact integer cross-products, packed into
    * the same two's-complement BIGINT the Spark kernel emits (HUGEINT
    * fold for bit 63, as in DHashChain).
    */
  private val VidChain =
    s"""vgrp AS (SELECT DISTINCT doc_id // 25 AS g FROM documents),
       |vb0 AS (SELECT g,
       |    ${(0 until 20).map(k => s"md5(CAST(g AS VARCHAR) || '-$k')").mkString(" || ")} AS b0
       |  FROM vgrp),
       |vcb AS (SELECT g, i, ascii(substr(b0, CAST(i + 1 AS INT), 1)) AS v
       |  FROM vb0 CROSS JOIN generate_series(0, 639) t(i)),
       |vpsl AS (SELECT g, list_prepend(0::BIGINT,
       |      list(CAST(ps AS BIGINT) ORDER BY i)) AS pre
       |  FROM (SELECT g, i, sum(v) OVER (PARTITION BY g ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ps FROM vcb)
       |  GROUP BY g),
       |vdoc AS (SELECT doc_id, doc_id // 25 AS g,
       |    CAST(72 + (doc_id // 25) % 41 AS BIGINT) AS nf,
       |    coalesce(nullif(substr(text, 1, 12), ''), 'x') AS p0
       |  FROM documents),
       |vphx AS (SELECT doc_id,
       |    substr(hex(encode(repeat(p0, CAST((180 + octet_length(encode(p0)) - 1) // octet_length(encode(p0)) AS INT)))), 1, 360) AS phx
       |  FROM vdoc),
       |vpf AS (SELECT doc_id, i // 90 AS pf, sum(('0x' || substr(phx, CAST(2*i+1 AS INT), 2))::BIGINT) AS bright
       |  FROM vphx CROSS JOIN generate_series(0, 179) t(i) GROUP BY 1, 2),
       |vfr AS (SELECT doc_id, g, nf, unnest(generate_series(0, nf - 1)) AS f FROM vdoc),
       |vbrt AS (SELECT vfr.doc_id, nf, f,
       |    CASE WHEN f < nf - 2 THEN
       |      (90*(f+1) // 640 - 90*f // 640) * pre[641]
       |        + pre[CAST(90*(f+1) % 640 AS INT) + 1] - pre[CAST(90*f % 640 AS INT) + 1]
       |    ELSE vpf.bright END AS bright
       |  FROM vfr JOIN vpsl USING (g)
       |  LEFT JOIN vpf ON vpf.doc_id = vfr.doc_id AND vpf.pf = f - (nf - 2)),
       |vseg AS (SELECT doc_id, ((f+1)*65 - 1) // nf AS j,
       |    sum(bright) AS e, count(*) AS ln
       |  FROM vbrt GROUP BY 1, 2),
       |vbits AS (SELECT a.doc_id, a.j AS i,
       |    CASE WHEN b.e * a.ln > a.e * b.ln THEN 1 ELSE 0 END AS bit
       |  FROM vseg a JOIN vseg b ON a.doc_id = b.doc_id AND b.j = a.j + 1
       |  WHERE a.j < 64),
       |vh AS (SELECT doc_id, CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
       |    THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS vhash
       |  FROM (SELECT doc_id, sum(CASE WHEN bit = 1 THEN
       |      (CASE WHEN i = 63 THEN 9223372036854775808::HUGEINT ELSE ((1::BIGINT << i))::HUGEINT END)
       |      ELSE 0::HUGEINT END) AS s FROM vbits GROUP BY 1))""".stripMargin

  /** BPE learn chain constants/builders shared by the merge-learning twin
    * and the tokenization twin (Bpe.learnMerges defaults: 8 merges over the
    * top-500 vocabulary, 8 replace passes per merge).
    */
  private val BpeN = 8
  private val BpeVocabCap = 500
  private val BpePasses = 8

  /** `passes` nested leftmost non-overlapping replaces of the pair held by
    * the correlated `x` row — the exact JVM [[graft.ops.Bpe.applyMerge]]
    * primitive.
    */
  private def BpeApplySql(seg: String): String =
    (1 to BpePasses).foldLeft(seg)((s, _) =>
      s"replace($s, ' '||x.a||' '||x.b||' ', ' '||x.a||x.b||' ')")

  /** Mirrors Bpe.learnMerges stage for stage: the iterative merge loop is
    * UNROLLED into N CTE stages (SQL cannot aggregate in a recursive term);
    * each stage applies the previous best pair as nested plain `replace()`
    * calls on the padded symbol string, re-counts adjacent pairs and picks
    * the (weight desc, lhs, rhs) argmax. An exhausted vocabulary empties
    * every later stage in both engines identically. Ends with
    * `best1..bestN(a, b, w)` and `segN` in scope.
    */
  private val BpeLearnChain: String = {
    val stages = (1 to BpeN).map { k =>
      val prev = if (k == 1) "seg0" else s"seg${k - 1}"
      s"""toks$k AS (SELECT freq, list_filter(string_split(seg, ' '), t -> len(t) > 0) AS t FROM $prev),
         |pairs$k AS (SELECT pr[1] AS a, pr[2] AS b, CAST(sum(freq) AS BIGINT) AS w
         |  FROM (SELECT freq, unnest(list_transform(generate_series(1, len(t)-1), i -> [t[i], t[i+1]])) AS pr
         |        FROM toks$k WHERE len(t) > 1)
         |  GROUP BY 1, 2),
         |best$k AS (SELECT a, b, w FROM pairs$k ORDER BY w DESC, a, b LIMIT 1),
         |seg$k AS (SELECT word, freq, ${BpeApplySql("seg")} AS seg FROM $prev, best$k x)""".stripMargin
    }.mkString(",\n")
    s"""vocab AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($wordsOf) AS word FROM documents)
       |  GROUP BY word ORDER BY freq DESC, word LIMIT $BpeVocabCap),
       |seg0 AS (SELECT word, freq, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seg FROM vocab),
       |$stages""".stripMargin
  }

  /** The v8 cross-modal curation chain (image ∩ audio ∩ video keeper gate
    * + per-lang token quota running sum), shared by the v8 and v9 twins;
    * ends with `v8c(lang, doc_id, n_tokens, cum_tokens)` in scope.
    */
  private lazy val V8Chain =
    s"""$DHashChain,
       |$AWavChain,
       |$VidChain,
       |v8tok AS (SELECT doc_id, CAST(len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS ntk
       |        FROM documents),
       |v8v AS (SELECT dh.doc_id,
       |        row_number() OVER (PARTITION BY dh.dhash ORDER BY t.ntk DESC, dh.doc_id) AS rn
       |      FROM dh JOIN v8tok t USING (doc_id)),
       |v8a AS (SELECT ah.doc_id,
       |        row_number() OVER (PARTITION BY ah.ahash ORDER BY t.ntk DESC, ah.doc_id) AS rn
       |      FROM ah JOIN v8tok t USING (doc_id)),
       |v8w AS (SELECT vh.doc_id,
       |        row_number() OVER (PARTITION BY vh.vhash ORDER BY t.ntk DESC, vh.doc_id) AS rn
       |      FROM vh JOIN v8tok t USING (doc_id)),
       |v8k AS (SELECT v.doc_id FROM v8v v JOIN v8a a USING (doc_id) JOIN v8w w USING (doc_id)
       |      WHERE v.rn = 1 AND a.rn = 1 AND w.rn = 1),
       |v8q AS (SELECT d.lang, d.doc_id, t.ntk AS n_tokens, $hashUnit AS u
       |      FROM documents d JOIN v8k USING (doc_id) JOIN v8tok t USING (doc_id)),
       |v8c AS (SELECT lang, doc_id, n_tokens,
       |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY u, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |      FROM v8q)""".stripMargin

  /** 128-bit SimHash rebuild: ±1 votes per bit from all four 32-bit md5
    * words, sign-folded into two BIGINTs (HUGEINT fold for each word's
    * top bit, as in the 64-bit twin).
    */
  private val Simhash128Chain =
    s"""w128 AS (SELECT doc_id, $wordsOf AS ws FROM documents),
       |t128 AS (SELECT doc_id, unnest(ws) AS t FROM w128),
       |h128 AS (SELECT doc_id,
       |    ('0x' || substr(md5(t), 1, 8))::BIGINT AS w0,
       |    ('0x' || substr(md5(t), 9, 8))::BIGINT AS w1,
       |    ('0x' || substr(md5(t), 17, 8))::BIGINT AS w2,
       |    ('0x' || substr(md5(t), 25, 8))::BIGINT AS w3
       |  FROM t128),
       |b128 AS (SELECT doc_id, i,
       |    sum(CASE WHEN (((CASE i // 32 WHEN 0 THEN w0 WHEN 1 THEN w1 WHEN 2 THEN w2 ELSE w3 END) >> (i % 32)) & 1) = 1
       |        THEN 1 ELSE -1 END) AS c
       |  FROM h128 CROSS JOIN generate_series(0, 127) t(i) GROUP BY 1, 2),
       |sh128 AS (SELECT doc_id,
       |    CAST(CASE WHEN shi >= 9223372036854775808::HUGEINT THEN shi - 18446744073709551616::HUGEINT ELSE shi END AS BIGINT) AS simhash_hi,
       |    CAST(CASE WHEN slo >= 9223372036854775808::HUGEINT THEN slo - 18446744073709551616::HUGEINT ELSE slo END AS BIGINT) AS simhash_lo
       |  FROM (SELECT doc_id,
       |      sum(CASE WHEN i >= 64 AND c >= 0 THEN
       |            (CASE WHEN i = 127 THEN 9223372036854775808::HUGEINT ELSE ((1::BIGINT << (i - 64)))::HUGEINT END)
       |          ELSE 0::HUGEINT END) AS shi,
       |      sum(CASE WHEN i < 64 AND c >= 0 THEN
       |            (CASE WHEN i = 63 THEN 9223372036854775808::HUGEINT ELSE ((1::BIGINT << i))::HUGEINT END)
       |          ELSE 0::HUGEINT END) AS slo
       |    FROM b128 GROUP BY 1))""".stripMargin

  private val DHashChain =
    s"""img AS (SELECT doc_id,
       |    md5(CAST(doc_id // 25 AS VARCHAR)) AS b0,
       |    coalesce(nullif(substr(text, 1, 12), ''), 'x') AS p0
       |  FROM documents),
       |ihx AS (SELECT doc_id,
       |    substr(hex(encode(repeat(b0, CAST((273 + octet_length(encode(b0)) - 1) // octet_length(encode(b0)) AS INT)))), 1, 546) ||
       |    substr(hex(encode(repeat(p0, CAST((78 + octet_length(encode(p0)) - 1) // octet_length(encode(p0)) AS INT)))), 1, 156) AS hx
       |  FROM img),
       |grid AS (SELECT doc_id, gy, gx,
       |    ('0x' || substr(hx, 2*(((gy*9//8)*13 + (gx*13//9))*3) + 1, 2))::BIGINT
       |  + ('0x' || substr(hx, 2*(((gy*9//8)*13 + (gx*13//9))*3 + 1) + 1, 2))::BIGINT
       |  + ('0x' || substr(hx, 2*(((gy*9//8)*13 + (gx*13//9))*3 + 2) + 1, 2))::BIGINT AS bright
       |  FROM ihx CROSS JOIN generate_series(0, 7) ty(gy) CROSS JOIN generate_series(0, 8) tx(gx)),
       |dbits AS (SELECT a.doc_id, a.gy*8 + a.gx AS i,
       |    CASE WHEN b.bright > a.bright THEN 1 ELSE 0 END AS bit
       |  FROM grid a JOIN grid b ON a.doc_id = b.doc_id AND a.gy = b.gy AND b.gx = a.gx + 1
       |  WHERE a.gx < 8),
       |dh AS (SELECT doc_id, CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
       |    THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS dhash
       |  FROM (SELECT doc_id, sum(CASE WHEN bit = 1 THEN
       |      (CASE WHEN i = 63 THEN 9223372036854775808::HUGEINT ELSE ((1::BIGINT << i))::HUGEINT END)
       |      ELSE 0::HUGEINT END) AS s FROM dbits GROUP BY 1))""".stripMargin

  /** Minhash pairs closed into components: appends the symmetric edge
    * list, recursive reachability and min-label CTEs to [[minhashChain]];
    * ends with `comp(id, component)`.
    */
  private def componentsChain(src: String) =
    s"""${minhashChain(src)},
       |p AS (SELECT id_a, id_b FROM est WHERE e >= 0.5),
       |edges AS (SELECT id_a AS s, id_b AS d FROM p UNION SELECT id_b, id_a FROM p),
       |reach(s, d) AS (SELECT s, d FROM edges
       |                UNION SELECT r.s, e2.d FROM reach r JOIN edges e2 ON r.d = e2.s),
       |comp AS (SELECT s AS id, least(s, min(d)) AS component FROM reach GROUP BY s)""".stripMargin

  val all: Map[String, String] = Map(

    "s2_incremental_scan" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
        |FROM events WHERE epoch_ms(ts) > 1705276800000 ORDER BY event_id""".stripMargin,

    "f2_cdc_filter" ->
      """WITH state AS (
        |  SELECT * FROM (SELECT user_id, event_type, value, props,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |    FROM events WHERE epoch_ms(ts) < 1704844800000) WHERE rn = 1),
        |batch AS (
        |  SELECT * FROM (SELECT user_id, event_id, ts, event_type, value, props,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |    FROM events WHERE epoch_ms(ts) >= 1704844800000 AND epoch_ms(ts) < 1705708800000) WHERE rn = 1)
        |SELECT b.user_id, b.event_id, epoch_ms(b.ts) AS ts_ms, b.event_type, b.value, b.props
        |FROM batch b LEFT JOIN state s ON b.user_id = s.user_id
        |WHERE s.user_id IS NULL OR (b.event_type IS DISTINCT FROM s.event_type)
        |   OR (b.value IS DISTINCT FROM s.value) OR (b.props IS DISTINCT FROM s.props)
        |ORDER BY b.user_id""".stripMargin,

    "f3_missing_id_drop" ->
      """SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k, count(*) AS n
        |FROM events WHERE regexp_extract(props, '"k":\s*(\d+)', 1) <> ''
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "f4_ttl_expiry" ->
      """SELECT event_type, count(*) AS n, min(ttl) AS min_ttl, max(ttl) AS max_ttl
        |FROM (SELECT event_type, epoch_ms(ts) + 28800000 AS ttl FROM events)
        |WHERE ttl >= 1705708800000 GROUP BY 1 ORDER BY 1""".stripMargin,

    "a1_checkpoint_max" ->
      """SELECT event_type, max(epoch_ms(ts)) AS checkpoint, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "k2_upsert_lww" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |      FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // MERGE twin: the full-outer + case-action form verbatim — state-only
    // rows survive, matched tombstones drop, everything else takes the
    // batch side; all three MERGE verbs ride one hash.
    "k5_merge" ->
      """WITH st AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) rn
        |        FROM events WHERE epoch_ms(ts) < 1705708800000) WHERE rn = 1),
        |bt AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value,
        |    CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) rn
        |        FROM events WHERE epoch_ms(ts) >= 1705708800000) WHERE rn = 1)
        |SELECT coalesce(b.user_id, s.user_id) AS user_id,
        |  CASE WHEN b.user_id IS NOT NULL THEN b.event_id ELSE s.event_id END AS event_id,
        |  CASE WHEN b.user_id IS NOT NULL THEN b.ts_ms ELSE s.ts_ms END AS ts_ms,
        |  CASE WHEN b.user_id IS NOT NULL THEN b.event_type ELSE s.event_type END AS event_type,
        |  CASE WHEN b.user_id IS NOT NULL THEN b.value ELSE s.value END AS value
        |FROM st s FULL OUTER JOIN bt b ON s.user_id = b.user_id
        |WHERE b.op IS NULL OR b.op <> 'delete'
        |ORDER BY user_id""".stripMargin,

    // Mirrors state.Scd2.history: half-open [from, to) validity intervals
    // via lead over the per-key (ms, id) order; the head row is current.
    "k3_scd2_history" ->
      """SELECT user_id, event_id, valid_from_ms,
        |  lead(valid_from_ms) OVER w AS valid_to_ms,
        |  (lead(valid_from_ms) OVER w IS NULL) AS is_current,
        |  event_type, value
        |FROM (SELECT user_id, event_id, epoch_ms(ts) AS valid_from_ms, event_type, value
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY valid_from_ms, event_id)
        |ORDER BY user_id, valid_from_ms, event_id""".stripMargin,

    // Mirrors Layout.withZValue on (user_id, epoch-ms): exact-integer range
    // ranks from true min/max (// floors like Spark's div on non-negative
    // operands), then the fixed 21-bit interleave fold.
    // Mirrors Layout.withHValue: identical exact-integer ranks, then the
    // Hamilton xy2d bit descent unrolled — 21 chained single-reference
    // CTEs (a LINEAR chain, so DuckDB's inliner builds a projection
    // pipeline, not the multiply-referenced blowup the pagerank twin
    // needed AS MATERIALIZED for). Every step is integer CASE
    // arithmetic; xor() is DuckDB's bitwise XOR.
    "x9_hilbert" -> {
      val bits = graft.ops.Layout.ZBits
      val m = (1L << bits) - 1
      val steps = (0 until bits).map { k =>
        val s = 1L << (bits - 1 - k)
        val s2 = s * s
        s"""h${k + 1} AS (SELECT event_id,
           |  CASE WHEN ((y & $s) > 0) THEN x
           |       ELSE CASE WHEN ((x & $s) > 0) THEN $m - y ELSE y END END AS x,
           |  CASE WHEN ((y & $s) > 0) THEN y
           |       ELSE CASE WHEN ((x & $s) > 0) THEN $m - x ELSE x END END AS y,
           |  d + CAST($s2 AS BIGINT) * xor(3 * (CASE WHEN ((x & $s) > 0) THEN 1 ELSE 0 END),
           |                (CASE WHEN ((y & $s) > 0) THEN 1 ELSE 0 END)) AS d
           |FROM h$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH hb AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
         |hbd AS (SELECT min(user_id) AS amin, max(user_id) AS amax,
         |               min(ts_ms) AS bmin, max(ts_ms) AS bmax FROM hb),
         |h0 AS (SELECT event_id,
         |    CASE WHEN amax = amin THEN 0 ELSE ((user_id - amin) * $m) // (amax - amin) END AS x,
         |    CASE WHEN bmax = bmin THEN 0 ELSE ((ts_ms - bmin) * $m) // (bmax - bmin) END AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM hb, hbd),
         |$steps
         |SELECT event_id, CAST(d AS BIGINT) AS hval FROM h$bits ORDER BY event_id""".stripMargin
    },

    // Mirrors Layout.withHValueN (Skilling's d-dimensional transpose
    // form) on (user_id, epoch-ms, event_id) at 16 bits/dim: identical
    // exact-integer ranks, then the inverse-undo sweep unrolled — one
    // CTE per (bit plane, dimension) step, each pure integer CASE/xor
    // arithmetic evaluated against the PREVIOUS step's row (matching the
    // kernel: within a step, t derives from current values and applies
    // to x0 and xi together), then the Gray pair, the t-correction, and
    // the 48-term interleave fold. A LINEAR single-reference chain, so
    // DuckDB's inliner builds a projection pipeline.
    "x9_hilbert3" -> {
      val bits = graft.ops.Layout.HBits3
      val m = (1L << bits) - 1
      val qs = (1 until bits).map(k => 1L << (bits - k)) // 2^(bits-1) .. 2
      val steps = scala.collection.mutable.ArrayBuffer.empty[String]
      var idx = 0
      def nm(i: Int) = s"s$i"
      qs.foreach { q =>
        val p = q - 1
        idx += 1
        steps += s"""${nm(idx)} AS (SELECT event_id,
           |  CASE WHEN (x0 & $q) > 0 THEN xor(x0, $p) ELSE x0 END AS x0,
           |  x1, x2 FROM ${nm(idx - 1)})""".stripMargin
        idx += 1
        steps += s"""${nm(idx)} AS (SELECT event_id,
           |  CASE WHEN (x1 & $q) > 0 THEN xor(x0, $p)
           |       ELSE xor(x0, xor(x0, x1) & $p) END AS x0,
           |  CASE WHEN (x1 & $q) > 0 THEN x1
           |       ELSE xor(x1, xor(x0, x1) & $p) END AS x1,
           |  x2 FROM ${nm(idx - 1)})""".stripMargin
        idx += 1
        steps += s"""${nm(idx)} AS (SELECT event_id,
           |  CASE WHEN (x2 & $q) > 0 THEN xor(x0, $p)
           |       ELSE xor(x0, xor(x0, x2) & $p) END AS x0,
           |  x1,
           |  CASE WHEN (x2 & $q) > 0 THEN x2
           |       ELSE xor(x2, xor(x0, x2) & $p) END AS x2
           |FROM ${nm(idx - 1)})""".stripMargin
      }
      idx += 1
      steps += s"${nm(idx)} AS (SELECT event_id, x0, xor(x1, x0) AS x1, x2 FROM ${nm(idx - 1)})"
      idx += 1
      steps += s"${nm(idx)} AS (SELECT event_id, x0, x1, xor(x2, x1) AS x2 FROM ${nm(idx - 1)})"
      val tExpr = qs.map(q => s"(CASE WHEN (x2 & $q) > 0 THEN ${q - 1} ELSE 0 END)")
        .reduce((a, b) => s"xor($a, $b)")
      idx += 1
      steps += s"""${nm(idx)} AS (SELECT event_id, xor(x0, t) AS x0,
         |  xor(x1, t) AS x1, xor(x2, t) AS x2
         |FROM (SELECT event_id, x0, x1, x2, $tExpr AS t FROM ${nm(idx - 1)}))""".stripMargin
      val fold = (0 until bits).flatMap { b =>
        (0 until 3).map(i => s"(((x$i >> $b) & 1) << ${3 * b + 2 - i})")
      }.mkString(" + ")
      s"""WITH hb AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
         |hbd AS (SELECT min(user_id) AS amin, max(user_id) AS amax,
         |               min(ts_ms) AS bmin, max(ts_ms) AS bmax,
         |               min(event_id) AS cmin, max(event_id) AS cmax FROM hb),
         |s0 AS (SELECT event_id,
         |    CASE WHEN amax = amin THEN 0 ELSE ((user_id - amin) * $m) // (amax - amin) END AS x0,
         |    CASE WHEN bmax = bmin THEN 0 ELSE ((ts_ms - bmin) * $m) // (bmax - bmin) END AS x1,
         |    CASE WHEN cmax = cmin THEN 0 ELSE ((event_id - cmin) * $m) // (cmax - cmin) END AS x2
         |  FROM hb, hbd),
         |${steps.mkString(",\n")}
         |SELECT event_id, CAST($fold AS BIGINT) AS hval FROM ${nm(idx)} ORDER BY event_id""".stripMargin
    },

    "x9_zorder" -> {
      val bits = graft.ops.Layout.ZBits
      val m = (1L << bits) - 1
      val fold = (0 until bits).map(i =>
        s"(((ra >> $i) & 1) << ${2 * i}) + (((rb >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH zb AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
         |zbd AS (SELECT min(user_id) AS amin, max(user_id) AS amax,
         |               min(ts_ms) AS bmin, max(ts_ms) AS bmax FROM zb),
         |zr AS (SELECT event_id,
         |    CASE WHEN amax = amin THEN 0 ELSE ((user_id - amin) * $m) // (amax - amin) END AS ra,
         |    CASE WHEN bmax = bmin THEN 0 ELSE ((ts_ms - bmin) * $m) // (bmax - bmin) END AS rb
         |  FROM zb, zbd)
         |SELECT event_id, CAST($fold AS BIGINT) AS zval FROM zr ORDER BY event_id""".stripMargin
    },

    // Mirrors Components.pageRank over the verified MinHash pair graph:
    // symmetric edge list (no dangling nodes), FIXED-POINT micro-rank
    // arithmetic (1e6 u = rank 1.0, every division a floor //) — no
    // doubles anywhere, so the K unrolled iterations replay bit-for-bit.
    // prp is AS MATERIALIZED: DuckDB 1.0 INLINES multiply-referenced CTEs,
    // and the K-step chain references the pair list through ~9 paths — the
    // inlined form re-evaluates the whole MinHash pipeline per path and
    // spilled to disk-full at sf0.1; materialized it runs in ~1.5 s.
    "x7_dedup_pagerank" -> {
      val iters = graft.ops.Components.PageRankIters
      val dm = math.round(graft.ops.Components.PageRankDamping * 1000)
      val iterCtes = (1 to iters).map { k =>
        s"""prc$k AS (SELECT e.d, sum(p.r // p.dg) AS m
           |  FROM pr${k - 1} p JOIN pre e ON e.s = p.s GROUP BY e.d),
           |pr$k AS (SELECT g.s, g.dg, (${1000000 - dm * 1000} // nn) + (($dm * c.m) // 1000) AS r
           |  FROM prdg g JOIN prc$k c ON c.d = g.s CROSS JOIN prn)""".stripMargin
      }.mkString(",\n")
      s"""WITH $minhashPairChain,
         |prp AS MATERIALIZED (SELECT id_a, id_b FROM est WHERE e >= 0.5),
         |pre AS MATERIALIZED (SELECT id_a AS s, id_b AS d FROM prp UNION SELECT id_b, id_a FROM prp),
         |prdg AS (SELECT s, count(*) AS dg FROM pre GROUP BY s),
         |prn AS (SELECT count(*) AS nn FROM prdg),
         |pr0 AS (SELECT s, dg, 1000000 // nn AS r FROM prdg, prn),
         |$iterCtes
         |SELECT s AS id, CAST(r AS BIGINT) AS pagerank_micros FROM pr$iters ORDER BY id""".stripMargin
    },

    // Composed v11 twin: pagerank iterations (micro-rank fixed point) +
    // recursive component closure over the SAME materialized pair list,
    // keeper = max-rank member per component (min-id tiebreak), singleton
    // docs pass through, then the shared LogregScoreChain gate at 0.5.
    "x8_curation_v11" -> {
      val iters = graft.ops.Components.PageRankIters
      val dm = math.round(graft.ops.Components.PageRankDamping * 1000)
      val prIterCtes = (1 to iters).map { k =>
        s"""prc$k AS (SELECT e.d, sum(p.r // p.dg) AS m
           |  FROM pr${k - 1} p JOIN pre e ON e.s = p.s GROUP BY e.d),
           |pr$k AS (SELECT g.s, g.dg, (${1000000 - dm * 1000} // nn) + (($dm * c.m) // 1000) AS r
           |  FROM prdg g JOIN prc$k c ON c.d = g.s CROSS JOIN prn)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE $minhashPairChain,
         |prp AS MATERIALIZED (SELECT id_a, id_b FROM est WHERE e >= 0.5),
         |pre AS MATERIALIZED (SELECT id_a AS s, id_b AS d FROM prp UNION SELECT id_b, id_a FROM prp),
         |prdg AS (SELECT s, count(*) AS dg FROM pre GROUP BY s),
         |prn AS (SELECT count(*) AS nn FROM prdg),
         |pr0 AS (SELECT s, dg, 1000000 // nn AS r FROM prdg, prn),
         |$prIterCtes,
         |reach(s, d) AS (SELECT s, d FROM pre
         |                UNION SELECT r.s, e2.d FROM reach r JOIN pre e2 ON r.d = e2.s),
         |comp AS (SELECT s AS id, least(s, min(d)) AS component FROM reach GROUP BY s),
         |vkeep AS (SELECT id FROM (
         |    SELECT c.id, row_number() OVER (PARTITION BY c.component
         |        ORDER BY p.r DESC, c.id ASC) AS rn
         |    FROM comp c JOIN pr$iters p ON p.s = c.id) WHERE rn = 1),
         |vkept AS (SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM comp)
         |          UNION ALL SELECT id FROM vkeep),
         |$LogregScoreChain
         |SELECT k.doc_id, s.score FROM vkept k JOIN lrsc s ON s.doc_id = k.doc_id
         |WHERE s.score > 0.5 ORDER BY k.doc_id""".stripMargin
    },

    // The FULL RECOMPUTE twin of the incremental merge: the Spark side
    // unions pre/post-checkpoint partials and re-aggregates their
    // (count, decimal-sum) state; hash-equality proves merge == recompute.
    "a2_incremental_rollup" ->
      """SELECT user_id, event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Mirrors DataQuality.profile over orders: one aggregate, unpivoted —
    // completeness = round(1 - nulls/rows, 6), distinct excludes NULL.
    "x10_dq_profile" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val branches = cols.map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  round(1.0 - sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)*1.0
           |        / greatest(count(*), 1), 6) AS completeness,
           |  count(DISTINCT $c) AS n_distinct FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT * FROM ($branches) ORDER BY "column"""".stripMargin
    },

    // The approx-profile gate: exact metrics verbatim plus the accuracy
    // contract — DuckDB cannot reproduce Spark's HLL++ estimate, so the
    // twin asserts the IN-PLAN 5%-of-exact boolean is true on every row
    // (the x3_ivf_recall gate pattern).
    "x10_dq_profile_approx" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val branches = cols.map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  round(1.0 - sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)*1.0
           |        / greatest(count(*), 1), 6) AS completeness,
           |  count(DISTINCT $c) AS n_distinct, true AS approx_ok FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT * FROM ($branches) ORDER BY "column"""".stripMargin
    },

    // Mirrors the x10 constraint suite: PK uniqueness, two FK anti-join
    // counts, one range rule — (constraint, n, violations, ok) rows.
    "x10_dq_constraints" ->
      """SELECT * FROM (
        |SELECT 'orders_pk_unique' AS "constraint", count(*) AS n,
        |  count(o_orderkey) - count(DISTINCT o_orderkey) AS violations,
        |  (count(o_orderkey) - count(DISTINCT o_orderkey)) = 0 AS ok FROM orders
        |UNION ALL
        |SELECT 'orders_custkey_fk', count(*),
        |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) = 0
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |UNION ALL
        |SELECT 'lineitem_orderkey_fk', count(*),
        |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |UNION ALL
        |SELECT 'events_value_nonneg', count(*),
        |  CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) = 0 FROM events
        |) ORDER BY "constraint"""".stripMargin,

    // Mirrors state.Scd2.asOf at cutoff Jan15: LWW head over versions with
    // ms <= cutoff (the Spark side pushes ts < (cutoff+1)ms into the scan).
    "k4_time_travel" ->
      """SELECT user_id, event_id, ts_ms, event_type, value
        |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value,
        |        row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) rn
        |      FROM events WHERE epoch_ms(ts) <= 1705276800000)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "t1_template_render" ->
      """SELECT c_custkey AS doc_id,
        | '{"cmdb_ci": "cust-' || c_custkey || '", "name": "' ||
        | CASE WHEN c_name IS NOT NULL AND c_name <> '' THEN c_name
        |      ELSE 'anon-' || c_custkey END ||
        | '", "segment": "' || c_mktsegment ||
        | '", "vendor": "TPCH/CRM", "nation": "' || c_nationkey || '"}' AS doc
        |FROM customer ORDER BY doc_id""".stripMargin,

    "e7_batch_slices" ->
      """SELECT event_type, (rn - 1) // 500 AS batch_id, count(*) AS n,
        |  min(event_id) AS min_id, max(event_id) AS max_id
        |FROM (SELECT event_type, event_id,
        |        row_number() OVER (PARTITION BY event_type ORDER BY event_id) rn
        |      FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)/count(*), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1999-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_top_orders" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "w_topk_orders" ->
      """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rank, o_orderkey, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice DESC, o_orderkey) rn FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rank""".stripMargin,

    // The native bounded top-k aggregate must reproduce the window
    // idiom's survivor set exactly — same twin as w_topk_orders.
    "x7_topk_agg" ->
      """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rank, o_orderkey, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice DESC, o_orderkey) rn FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rank""".stripMargin,

    "q4_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_late FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
        |  AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "cube_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,

    "set_intersect_users" ->
      """SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
        |WHERE event_type = 'click'
        |INTERSECT SELECT user_id, epoch_ms(ts) // 86400000 FROM events
        |WHERE event_type = 'error'
        |ORDER BY user_id, day""".stripMargin,

    "set_except_users" ->
      """SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
        |WHERE event_type IN ('click','view')
        |EXCEPT SELECT user_id, epoch_ms(ts) // 86400000 FROM events
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin,

    "rollup_customers" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |  count(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY 1, 2""".stripMargin,

    "j_anti_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "j_semi_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |ORDER BY s_suppkey""".stripMargin,

    "w_tumbling_hourly" ->
      """SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms, event_type,
        |  count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "w_sessionize" ->
      """SELECT user_id, CAST(SUM(newflag) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM (SELECT user_id,
        |        CASE WHEN gap IS NULL OR gap > 1800000 THEN 1 ELSE 0 END AS newflag
        |      FROM (SELECT user_id, epoch_ms(ts) - lag(epoch_ms(ts))
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |            FROM events))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "x1_exact_dedup" ->
      s"""WITH n AS (SELECT doc_id, md5($norm) AS ntd FROM documents)
         |SELECT min(doc_id) AS keeper_id, count(*) AS dup_count, ntd AS key_md5
         |FROM n GROUP BY ntd ORDER BY keeper_id""".stripMargin,

    // LSH-verified exact Jaccard: the candidate CTEs mirror x2_minhash_lsh;
    // verification counts the intersection of DISTINCT shingle hashes per
    // candidate pair (Spark: array_intersect of collect_set arrays).
    "x2_ngram_jaccard" ->
      s"""WITH w AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest(CASE WHEN len(ws) >= 3
         |           THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
         |           ELSE [array_to_string(ws, ' ')] END) AS s
         |       FROM w),
         |hx AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS x FROM sh),
         |sz AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY 1),
         |perms AS (SELECT i, ((i+1)*2654435761) % 2147483647 AS a, ((i+1)*40503 + 7) % 2147483647 AS b
         |          FROM generate_series(0, 63) t(i)),
         |sig AS (SELECT doc_id, i, min((a*x + b) % 2147483647) AS h
         |        FROM hx CROSS JOIN perms GROUP BY 1, 2),
         |sigarr AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM sig GROUP BY 1),
         |bands AS (SELECT doc_id, b, array_to_string(sig[b*4+1 : b*4+4], ',') AS bandkey
         |          FROM sigarr CROSS JOIN generate_series(0, 15) t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b ON a.b = b.b AND a.bandkey = b.bandkey
         |         WHERE a.doc_id < b.doc_id),
         |inter AS (SELECT c.id_a, c.id_b, count(*) AS c
         |          FROM cand c JOIN hx a ON a.doc_id = c.id_a
         |                      JOIN hx b ON b.doc_id = c.id_b AND b.x = a.x
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b, round(c*1.0/(x.n + y.n - c), 6) AS jaccard
         |FROM inter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
         |WHERE c*1.0/(x.n + y.n - c) >= 0.5 ORDER BY 1, 2""".stripMargin,

    // Mirrors Dedup.minhashNearDupPairs exactly: same portable base hash
    // (first 15 md5 hex chars as a 60-bit int, mod the Mersenne prime), the
    // same (a_i*x+b_i) mod p affine permutations from Dedup.minhashPerm, the
    // same 16x4 banding (band equality on the raw signature slice — Spark's
    // xxhash64 band key is equality-equivalent), and the same
    // agreeing-components/64 estimate.
    "x2_minhash_lsh" ->
      s"""WITH $minhashPairChain
         |SELECT id_a, id_b, round(e, 6) AS est_jaccard FROM est WHERE e >= 0.5 ORDER BY 1, 2""".stripMargin,

    // Mirrors Dedup.simhash64: token bits from the two 32-bit md5 halves,
    // +1/-1 votes per bit over the token MULTISET, bit set when the vote sum
    // is >= 0. Bit 63 is assembled through HUGEINT and wrapped back to the
    // signed 64-bit value Spark produces (1L << 63 = Long.MinValue).
    // 128-bit SimHash twin: same ±1-vote construction over all four md5
    // words; the two output longs are assembled with the same HUGEINT
    // sign-bit fold as the 64-bit form.
    "x2_simhash128" ->
      s"""WITH $Simhash128Chain
         |SELECT doc_id, simhash_hi, simhash_lo FROM sh128 ORDER BY doc_id""".stripMargin,

    // Wide-fingerprint near-dup pairs via the ALL-PAIRS form at the same
    // bound (7): proves the 8x16-bit banded plan loses nothing.
    "x2_simhash128_pairs" ->
      s"""WITH $Simhash128Chain
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash_hi, b.simhash_hi))
         |     + bit_count(xor(a.simhash_lo, b.simhash_lo)) AS INT) AS hamming
         |FROM sh128 a JOIN sh128 b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash_hi, b.simhash_hi))
         |    + bit_count(xor(a.simhash_lo, b.simhash_lo)) <= 7
         |ORDER BY 1, 2""".stripMargin,

    "x2_simhash" ->
      s"""WITH w AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |tok AS (SELECT doc_id, unnest(ws) AS t FROM w),
         |h AS (SELECT doc_id,
         |        ('0x' || substr(md5(t), 1, 8))::BIGINT AS lo,
         |        ('0x' || substr(md5(t), 9, 8))::BIGINT AS hi
         |      FROM tok),
         |bits AS (SELECT doc_id, i,
         |           sum(CASE WHEN ((CASE WHEN i < 32 THEN lo >> i ELSE hi >> (i - 32) END) & 1) = 1
         |               THEN 1 ELSE -1 END) AS c
         |         FROM h CROSS JOIN generate_series(0, 63) t(i) GROUP BY 1, 2),
         |assembled AS (SELECT doc_id,
         |    sum(CASE WHEN c >= 0 THEN
         |          (CASE WHEN i = 63 THEN 9223372036854775808::HUGEINT ELSE ((1::BIGINT << i))::HUGEINT END)
         |        ELSE 0::HUGEINT END) AS s
         |  FROM bits GROUP BY 1)
         |SELECT doc_id,
         |  CAST(CASE WHEN s >= 9223372036854775808::HUGEINT THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS simhash
         |FROM assembled ORDER BY doc_id""".stripMargin,

    // The PLAIN join: Skew.saltedJoin is result-identical by contract, so
    // the oracle needs no salt at all - that identity IS what the gate checks.
    // Bloom-pruned join twin: the PLAIN join — pruning is result-identical
    // by contract (false positives only, re-verified by the real join), so
    // any pruning defect breaks the hash match.
    "q12_bloom_revenue" ->
      """SELECT s_suppkey, s_name,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_acctbal > 9000.0
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // Sketch-planned join twin: the PLAIN 3-table join — artifact-driven
    // reorder/broadcast is result-invisible by construction (inner
    // equi-joins commute), so any planning defect breaks the hash; the
    // plan flips (naive all-merge control, artifact broadcast, artifact
    // rotation) ride as pinned booleans probed from the physical plans.
    "q13_planned_join" ->
      """SELECT c_mktsegment, count(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  true AS naive_all_merge, true AS artifact_broadcast,
        |  true AS artifact_reordered
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q16_filtered_broadcast" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  true AS naive_bare_merge, true AS artifact_point_broadcast,
        |  true AS artifact_unfiltered_merge
        |FROM lineitem JOIN (SELECT * FROM orders WHERE o_custkey = 7) o
        |ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q15_planned_chain" ->
      """SELECT n_name, count(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  true AS naive_all_merge, true AS artifact_fact_last,
        |  true AS artifact_bottom_dims
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the hot dim is a scratch table derived deterministically from
    // customer (c_nationkey < 3) — the twin reconstructs it inline; the
    // booleans pin that the un-ruled plan was a bare shuffle join and the
    // catalogued plan carried exactly one probe-side Bloom filter
    "q14_runtime_filter" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hot_revenue,
        |  true AS naive_bare_shuffle, true AS artifact_bloom_filtered
        |FROM orders JOIN (SELECT c_custkey FROM customer WHERE c_nationkey < 3) hot
        |ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q8_salted_revenue" ->
      """SELECT s_nationkey,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Bpe.learnMerges stage for stage: the iterative merge loop is
    // UNROLLED into N CTE stages (SQL cannot aggregate in a recursive
    // term); each stage applies the previous best pair as `passes` nested
    // plain `replace()` calls on the padded symbol string - the identical
    // leftmost non-overlapping primitive the JVM learner uses - then
    // re-counts adjacent pairs and picks the (weight desc, lhs, rhs)
    // argmax. An exhausted vocabulary empties every later stage in both
    // engines identically.
    "x6_bpe_merges" -> {
      val union = (1 to BpeN).map(k =>
        s"SELECT CAST($k AS BIGINT) AS merge_rank, a AS lhs, b AS rhs, w AS pair_freq FROM best$k")
        .mkString("\nUNION ALL ")
      s"""WITH $BpeLearnChain
         |$union
         |ORDER BY merge_rank""".stripMargin
    },

    // Mirrors Bpe.tokenCountWithMerges under the merges the SAME unrolled
    // chain just learned: every doc word is padded-segmented and pushed
    // through the 8 merge stages with the identical leftmost
    // non-overlapping replace primitive — LEFT JOIN ON TRUE so a stage
    // whose vocabulary-exhausted best is EMPTY passes segments through
    // unchanged, exactly as Spark applies only the merges that exist.
    // Wordless docs report 0 via the outer join (Spark: explode_outer).
    "x6_bpe_tokens" -> {
      val dstages = (1 to BpeN).map { k =>
        val prev = if (k == 1) "dseg0" else s"dseg${k - 1}"
        s"""dseg$k AS (SELECT doc_id,
           |  CASE WHEN x.a IS NULL THEN seg ELSE ${BpeApplySql("seg")} END AS seg
           |  FROM $prev LEFT JOIN best$k x ON TRUE)""".stripMargin
      }.mkString(",\n")
      s"""WITH $BpeLearnChain,
         |dw AS (SELECT doc_id, unnest($wordsOf) AS word FROM documents),
         |dseg0 AS (SELECT doc_id, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seg FROM dw),
         |$dstages,
         |dn AS (SELECT doc_id,
         |    CAST(sum(len(list_filter(string_split(seg, ' '), t -> len(t) > 0))) AS BIGINT) AS n
         |  FROM dseg$BpeN GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(n.n, 0) AS BIGINT) AS n_bpe_tokens
         |FROM documents d LEFT JOIN dn n USING (doc_id) ORDER BY doc_id""".stripMargin
    },

    // Mirrors Bpe.fertilityByGroup under the SAME unrolled learn chain as
    // x6_bpe_tokens: every word pushed through the merge stages (lang
    // riding along), then one per-lang count/sum agg and the round6
    // tokens-per-word ratio. Plain unnest (no outer): fertility is a
    // per-WORD ratio, wordless docs contribute nothing.
    "x6_bpe_fertility" -> {
      val fstages = (1 to BpeN).map { k =>
        val prev = if (k == 1) "fseg0" else s"fseg${k - 1}"
        s"""fseg$k AS (SELECT lang,
           |  CASE WHEN x.a IS NULL THEN seg ELSE ${BpeApplySql("seg")} END AS seg
           |  FROM $prev LEFT JOIN best$k x ON TRUE)""".stripMargin
      }.mkString(",\n")
      s"""WITH $BpeLearnChain,
         |fw AS (SELECT lang, unnest($wordsOf) AS word FROM documents),
         |fseg0 AS (SELECT lang, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seg FROM fw),
         |$fstages
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(len(list_filter(string_split(seg, ' '), t -> len(t) > 0))) AS BIGINT) AS n_bpe_tokens,
         |  round(sum(len(list_filter(string_split(seg, ' '), t -> len(t) > 0))) * 1.0
         |        / greatest(count(*), 1), 6) AS fertility
         |FROM fseg$BpeN GROUP BY lang ORDER BY lang""".stripMargin
    },

    // Mirrors Similarity.quantizeInt8: order-free max, exact float->double
    // widening, both engines round halves away from zero.
    "x3_quantize_int8" ->
      """WITH s AS (SELECT vec_id, embedding,
        |  greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS sc
        |  FROM embeddings),
        |q AS (SELECT vec_id, sc, embedding,
        |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)/sc) AS INT)) AS qv FROM s)
        |SELECT vec_id, round(sc, 9) AS scale, array_to_string(qv, ',') AS q_csv,
        |  round(list_sum(list_transform(generate_series(1, len(embedding)),
        |    i -> abs(CAST(embedding[i] AS DOUBLE) - CAST(qv[i] AS DOUBLE)*sc))) / len(embedding), 6) AS recon_mae
        |FROM q ORDER BY vec_id""".stripMargin,

    "x2_embedding_near_dup" ->
      """WITH s AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(
        |    list_sum(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)), i -> CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))))), 6) AS cosine
        |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cosine FROM s WHERE cosine >= 0.4 ORDER BY 1, 2""".stripMargin,

    // Mirrors Similarity.randomHyperplaneNearDupPairs: identical md5-seeded
    // hyperplane components (first 8 md5 hex chars of "hp_<k>_<i>" over 2^31,
    // zero-centered — dyadic rationals, bit-exact in double), projections
    // rounded to 6dp before the sign test, 8 bands x corpus-derived sign
    // bits (rhp_bits replays Similarity.rhpBitsFor), exact cosine
    // verification on candidates. CTE chain shared with x2_rhp_recall.
    "x2_rhp_near_dup" ->
      s"""WITH $RhpChain
         |SELECT id_a, id_b, cosine FROM rhp_v WHERE cosine >= 0.4 ORDER BY 1, 2""".stripMargin,

    // Mirrors Similarity.pairRecall over (sampled exact ground truth, RHP
    // found): n_true = exact pairs at cosine >= 0.4 whose ANCHOR (id_a)
    // is in the fixed-count md5-rank anchor set (AnchorRank, K = 200 —
    // r15; the r14 vec_id % 100 = 0 fraction still grew with the corpus;
    // the r13 full-corpus quadratic truth was the most expensive ×100
    // cell) — n_captured = those present in the RHP output. Both
    // stages reuse the engine-portable expressions above, so the recall
    // ROW is hash-checked, not rows-only.
    "x2_rhp_recall" ->
      s"""WITH $RhpChain,
         |rhp AS (SELECT id_a, id_b FROM rhp_v WHERE cosine >= 0.4),
         |truth AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(
         |    list_sum(list_transform(generate_series(1, 64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))) /
         |    (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE)))) *
         |     sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))))), 6) AS cosine
         |  FROM (SELECT * FROM embeddings $AnchorRank) a
         |  JOIN embeddings b ON a.vec_id < b.vec_id),
         |tp AS (SELECT id_a, id_b FROM truth WHERE cosine >= 0.4),
         |n AS (SELECT count(*) AS n_true FROM tp),
         |c AS (SELECT count(*) AS n_captured FROM tp t JOIN rhp r ON t.id_a = r.id_a AND t.id_b = r.id_b)
         |SELECT CAST(0.4 AS DOUBLE) AS threshold, n_true, n_captured,
         |  CASE WHEN n_true = 0 THEN NULL
         |       ELSE round(n_captured / n_true, 6) END AS recall
         |FROM n, c""".stripMargin,

    // Multi-probe twin in its design regime: 8 bands x corpus-derived
    // bits at occupancy target 1 (rhp_bits — more selective hashes than
    // the exact-collision plans, the Lv et al. trade: probing buys the
    // recall back while the candidate background shrinks ~occupancy-fold),
    // left side expanded to the bucket plus its `bits` 1-bit-flip
    // neighbors (xor), equality join against the exact right side,
    // exact-cosine verification. Same bands/threshold as x2_rhp_scale.
    // Mirrors Similarity.rhpMultiProbePairs.
    "x2_rhp_multiprobe" ->
      s"""WITH ${rhpBucketChainDyn(8, occ = 1)},
         |rhp_probe AS (SELECT vec_id, band, unnest(list_prepend(bkt,
         |    list_transform(generate_series(0, bits - 1), j -> xor(bkt, CAST(1 << j AS BIGINT))))) AS key
         |  FROM rhp_buck CROSS JOIN rhp_bits),
         |rhp_cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |         FROM rhp_probe a JOIN rhp_buck b ON a.band = b.band AND a.key = b.bkt AND a.vec_id < b.vec_id),
         |$RhpVerify
         |SELECT id_a, id_b, cosine FROM rhp_v WHERE cosine >= 0.45 ORDER BY 1, 2""".stripMargin,

    // Scale-form RHP twin: 8 bands x corpus-derived bits, threshold 0.45
    // (see the query scaladoc for the sizing rationale).
    "x2_rhp_scale" ->
      s"""WITH ${rhpBucketChainDyn(8)},
         |rhp_cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |         FROM rhp_buck a JOIN rhp_buck b ON a.band = b.band AND a.bkt = b.bkt AND a.vec_id < b.vec_id),
         |$RhpVerify
         |SELECT id_a, id_b, cosine FROM rhp_v WHERE cosine >= 0.45 ORDER BY 1, 2""".stripMargin,

    // The sketch flags are pinned TRUE: DuckDB recomputes the exact values,
    // and Spark's side only hash-matches if HLL++ / approx_percentile landed
    // inside their documented error bounds.
    "q9_approx_sketches" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS hll_ok, TRUE AS pctl_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "x3_knn_cosine" ->
      s"""WITH $KnnTruthChain
         |SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS BIGINT) AS rank, cos AS cosine
         |FROM ranked WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,

    // The q9 sketch-gate pattern applied to the k-means IVF recall audit:
    // n_exact = brute-force truth-set size (recomputed exactly here), and
    // recall_ok is pinned TRUE — Spark's side only hash-matches while the
    // k-means path's recall clears its 0.2 floor. The fit itself is the
    // only remaining ungated surface (the raw recall values stay in the
    // rows-only x3_ivf_recall).
    // The flag is RECOMPUTED, not pinned: since the r6 engine-portable
    // maxmin fit the twin replays the whole k-means IVF search, so
    // recall_ok = (recall >= 0.2) evaluates on both sides and the gate is
    // scale-independent (a pinned TRUE was calibrated on the sf0.01
    // fixture and broke at the sf0.1 gate — FIXTURES.md r7).
    "x3_ivf_recall_gate" ->
      s"""WITH ${kmeansCellChain()},
         |$IvfSearchChain,
         |$KnnTruthChain,
         |tr AS (SELECT qid, nid FROM ranked WHERE rn <= 5),
         |iv AS (SELECT qid, nid FROM ivfr WHERE rn <= 5),
         |ne AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_exact FROM tr GROUP BY 1),
         |nh AS (SELECT t.qid, CAST(count(*) AS BIGINT) AS n_hits FROM tr t JOIN iv v USING (qid, nid) GROUP BY 1)
         |SELECT ne.qid AS query_id, ne.n_exact,
         |  (round(CAST(coalesce(nh.n_hits, 0) AS DOUBLE) / ne.n_exact, 6) >= 0.2) AS recall_ok
         |FROM ne LEFT JOIN nh USING (qid) ORDER BY 1""".stripMargin,

    // Mirrors Similarity.lshCells + ivfTopK end to end: cells = ivfBitsFor
    // sign bits of RHP band 0 (rhpBucketChainDyn at occ=32 — corpus-derived,
    // 4 bits at the 500-vector fixtures); centroids = per-dimension exact
    // DECIMAL(27,10) sums cast to double over the cell count; probes = top-3
    // cells by 6-dp-rounded cosine (ties to the smaller cell); final top-k
    // restricted to probed cells, ranked on the 6-dp cosine with neighbor-id
    // ties — every stage reproduced bit-exactly.
    "x3_ivf_lsh_topk" ->
      s"""WITH ${rhpBucketChainDyn(1, occ = 32)},
         |cells AS (SELECT vec_id, CAST(bkt AS INT) AS cell FROM rhp_buck),
         |ed AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
         |$IvfSearchChain
         |SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS BIGINT) AS rank, cos AS cosine
         |FROM ivfr WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,

    // The k-means IVF, now HASH-CHECKED end to end: the fit twin unrolls
    // maxmin seeding + 3 Lloyd iterations into CTE stages (kmeansCellChain)
    // and the search reuses the same IvfSearchChain as the LSH variant.
    // Rows-only through round 5 ("k-means fit not engine-portable") — made
    // portable in r6 by rounding every fit cosine to 6 dp before comparison
    // and pushing Lloyd means through the exact-DECIMAL addend discipline.
    "x3_ivf_topk" ->
      s"""WITH ${kmeansCellChain()},
         |$IvfSearchChain
         |SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS BIGINT) AS rank, cos AS cosine
         |FROM ivfr WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,

    // Recall audit over the now-portable k-means path: truth top-5 from the
    // shared KnnTruthChain, approximate top-5 from the k-means IVF chain,
    // per-query hit counts and 6-dp recall — every column hash-checked.
    "x3_ivf_recall" ->
      s"""WITH ${kmeansCellChain()},
         |$IvfSearchChain,
         |$KnnTruthChain,
         |tr AS (SELECT qid, nid FROM ranked WHERE rn <= 5),
         |iv AS (SELECT qid, nid FROM ivfr WHERE rn <= 5),
         |ne AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_exact FROM tr GROUP BY 1),
         |nh AS (SELECT t.qid, CAST(count(*) AS BIGINT) AS n_hits FROM tr t JOIN iv v USING (qid, nid) GROUP BY 1)
         |SELECT ne.qid AS query_id, ne.n_exact,
         |  coalesce(nh.n_hits, 0) AS n_hits,
         |  round(CAST(coalesce(nh.n_hits, 0) AS DOUBLE) / ne.n_exact, 6) AS recall
         |FROM ne LEFT JOIN nh USING (qid) ORDER BY 1""".stripMargin,

    // Mirrors Similarity.semanticDedup end to end: cells = 4 sign bits of
    // RHP band 0 (the x3_ivf_lsh_topk quantizer), centroids = exact
    // DECIMAL(27,10) means, keep-priority = (6-dp centroid cosine ASC, id),
    // drop rule = any same-cell ≥-threshold neighbor of lower priority.
    // NOTE the double-hop CAST(CAST(f AS DOUBLE) AS DECIMAL): DuckDB's
    // direct FLOAT→DECIMAL goes through the float's SHORTEST decimal repr
    // (0.0178204628f → 0.0178204624), while Spark rounds the exact binary
    // value (→ 0.0178204626); hopping through DOUBLE makes both engines
    // round the same binary value. Same fix applied in x3_ivf_lsh_topk.
    "x2_semdedup" -> semDedupSql(bitsPerCell = 4, threshold = 0.4),

    // The SCALE-form knob (256 cells): same chain, only the quantizer width
    // differs — bitsPerCell is SemDeDup's cluster-count k, the knob that
    // keeps per-cell occupancy (and the quadratic within-cell pair term)
    // bounded as the corpus grows. See x2SemdedupScale's scaladoc.
    "x2_semdedup_scale" -> semDedupSql(bitsPerCell = 8, threshold = 0.4),

    // Mirrors Sampling.mixtureSample: per-lang acceptance fraction
    // least(1.0, (w * floor(0.6 * N)) / n) in the identical IEEE shape,
    // md5-unit selection per doc.
    "x7_mixture_sample" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
         |t AS (SELECT sum(n) AS tot FROM c),
         |q AS (SELECT lang, least(1.0,
         |    (CASE lang WHEN 'de' THEN 0.2 WHEN 'en' THEN 0.2 WHEN 'es' THEN 0.2
         |               WHEN 'fr' THEN 0.2 WHEN 'zh' THEN 0.2 ELSE 0.0 END)
         |    * floor(0.6 * CAST(tot AS DOUBLE)) / n) AS f FROM c, t)
         |SELECT d.lang, d.doc_id, round(q.f, 9) AS accept_frac
         |FROM documents d JOIN q ON q.lang = d.lang
         |WHERE $hashUnit < q.f
         |ORDER BY d.doc_id""".stripMargin,

    "x5_quality" ->
      s"""WITH b AS (SELECT doc_id, $norm AS nt FROM documents),
         |w AS (SELECT doc_id, nt, list_filter(string_split(nt, ' '), x -> len(x) > 0) AS ws FROM b),
         |m AS (SELECT doc_id, nt, len(ws) AS nw,
         |        coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS sumlen,
         |        len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','the','a','and','of','to','in','is','el','la','de','y','que','los','un','le','et','les','des','une','de0','shi0','le0','bu0','wo0','zai0','you0'], x))) AS nstop
         |      FROM w)
         |SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
         |  CAST(len(regexp_extract_all(nt, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         |  round(sumlen*1.0/greatest(nw, 1), 6) AS mean_word_len,
         |  round(nstop*1.0/greatest(nw, 1), 6) AS stopword_ratio,
         |  round(len(regexp_replace(nt, '[^a-z]', '', 'g'))*1.0/greatest(len(nt), 1), 6) AS alpha_ratio,
         |  round((least(nw/50.0, 1.0)
         |       + (CASE WHEN sumlen*1.0/greatest(nw, 1) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
         |       + least((nstop*1.0/greatest(nw, 1))*5, 1.0))/3.0, 6) AS quality_score
         |FROM m ORDER BY doc_id""".stripMargin,

    "x5_lang_id" ->
      s"""WITH w AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |s AS (SELECT doc_id,
         |  len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein'], x))) AS s_de,
         |  len(list_filter(ws, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS s_en,
         |  len(list_filter(ws, x -> list_contains(['el','la','de','y','que','los','un'], x))) AS s_es,
         |  len(list_filter(ws, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS s_fr,
         |  len(list_filter(ws, x -> list_contains(['de0','shi0','le0','bu0','wo0','zai0','you0'], x))) AS s_zh
         |  FROM w)
         |SELECT doc_id, CASE WHEN s_de + s_en + s_es + s_fr + s_zh = 0 THEN 'und'
         |  WHEN s_zh > greatest(s_de, s_en, s_es, s_fr) THEN 'zh'
         |  WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
         |  WHEN s_es > greatest(s_de, s_en) THEN 'es'
         |  WHEN s_en > s_de THEN 'en' ELSE 'de' END AS pred_lang
         |FROM s ORDER BY doc_id""".stripMargin,

    "x5_fingerprint" ->
      s"""WITH n AS (SELECT doc_id, $norm AS nt FROM documents)
         |SELECT doc_id, md5(nt) AS doc_md5,
         |  list_min(list_transform(
         |    CASE WHEN len(nt) >= 8
         |      THEN list_transform(generate_series(1, len(nt)-7, 2), i -> substr(nt, i, 8))
         |      ELSE [nt] END, g -> md5(g))) AS min_gram_md5
         |FROM n ORDER BY doc_id""".stripMargin,

    // Mirrors Multimodal.encodePpm + decodePpm: rebuild the P6 payload
    // byte-for-byte (header + pixel bytes cycled from encode(text),
    // truncated to w*h*3), then recompute the channel means and checksum
    // from the RASTER bytes — what the Spark kernel extracts by genuinely
    // parsing the header it wrote. Byte values recovered from hex() pairs.
    "x4_decode_ppm" ->
      """WITH d AS (SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS w, CAST(3 + doc_id % 4 AS INT) AS h,
        |    coalesce(nullif(text, ''), 'x') AS base FROM documents),
        |p AS (SELECT doc_id, w, h, w*h*3 AS npix,
        |    substr(hex(encode(repeat(base,
        |      CAST((w*h*3 + octet_length(encode(base)) - 1) // octet_length(encode(base)) AS INT)))),
        |      1, w*h*3*2) AS hx
        |  FROM d),
        |s AS (SELECT doc_id, w, h,
        |    list_transform(generate_series(0, npix-3, 3), i -> ('0x' || substr(hx, 2*i+1, 2))::BIGINT) AS r,
        |    list_transform(generate_series(1, npix-2, 3), i -> ('0x' || substr(hx, 2*i+1, 2))::BIGINT) AS g,
        |    list_transform(generate_series(2, npix-1, 3), i -> ('0x' || substr(hx, 2*i+1, 2))::BIGINT) AS b
        |  FROM p)
        |SELECT doc_id, w AS width, h AS height, 255 AS maxval,
        |  round(list_sum(r)*1.0/(w*h), 6) AS mean_r,
        |  round(list_sum(g)*1.0/(w*h), 6) AS mean_g,
        |  round(list_sum(b)*1.0/(w*h), 6) AS mean_b,
        |  CAST(list_sum(r) + list_sum(g) + list_sum(b) AS BIGINT) AS px_checksum
        |FROM s ORDER BY doc_id""".stripMargin,

    // Mirrors Multimodal.wavEnergyHash over the encodeWavPatch fixture
    // (see AWavChain): the 64-bit energy-gradient hash is pure integer
    // math, so the twin reproduces it bit-for-bit.
    "x4_awav_hash" ->
      s"""WITH $AWavChain
         |SELECT doc_id, ahash FROM ah ORDER BY doc_id""".stripMargin,

    // Audio near-dup pairs via the ALL-PAIRS form: the Spark side runs the
    // banded pigeonhole LSH plan, equal to all-pairs at hamming <= 8 by
    // construction — the hash gate proves the banded plan loses nothing.
    "x4_audio_near_dup" ->
      s"""WITH $AWavChain
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
         |FROM ah a JOIN ah b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3 ORDER BY 1, 2""".stripMargin,

    // Mirrors Multimodal.ppmDHash over the encodePpmPatch fixture (see
    // DHashChain): the 64-bit perceptual hash is pure integer math, so the
    // twin reproduces it bit-for-bit.
    "x4_dhash" ->
      s"""WITH $DHashChain
         |SELECT doc_id, dhash FROM dh ORDER BY doc_id""".stripMargin,

    // Image near-dup pairs via the ALL-PAIRS form: the Spark side runs the
    // banded pigeonhole LSH plan, which is exactly equal to all-pairs at
    // hamming <= maxHamming (recall 1 by construction) — the hash gate
    // proves the banded plan loses nothing.
    "x4_image_near_dup" ->
      s"""WITH $DHashChain
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
         |FROM dh a JOIN dh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3 ORDER BY 1, 2""".stripMargin,

    // Mirrors Multimodal.ppmResizeStats over the same rebuilt 13x9 raster
    // as x4_dhash (DHashChain's ihx): nearest-neighbor floor map
    // (x2*13//8, y2*9//8), exact channel sums; /64 means are exact at 6 dp.
    "x4_resize" ->
      s"""WITH $DHashChain,
         |rs AS (SELECT doc_id, y2, x2,
         |    ('0x' || substr(hx, 2*(((y2*9//8)*13 + (x2*13//8))*3) + 1, 2))::BIGINT AS r,
         |    ('0x' || substr(hx, 2*(((y2*9//8)*13 + (x2*13//8))*3 + 1) + 1, 2))::BIGINT AS g,
         |    ('0x' || substr(hx, 2*(((y2*9//8)*13 + (x2*13//8))*3 + 2) + 1, 2))::BIGINT AS b
         |  FROM ihx CROSS JOIN generate_series(0, 7) ty(y2) CROSS JOIN generate_series(0, 7) tx(x2))
         |SELECT doc_id, 8 AS width, 8 AS height,
         |  round(sum(r)*1.0/64, 6) AS mean_r, round(sum(g)*1.0/64, 6) AS mean_g,
         |  round(sum(b)*1.0/64, 6) AS mean_b,
         |  CAST(sum(r) + sum(g) + sum(b) AS BIGINT) AS px_checksum
         |FROM rs GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors Multimodal.encodeGvid + gvidFrameStats: rebuild the GV1 body
    // (nf 6x5 frames cycled from the text, frame f = byte range
    // [f*90, (f+1)*90)), stride every 2nd frame, exact channel sums per
    // sampled frame; k/30 means cannot tie at 6 dp.
    "x4_video_frames" ->
      """WITH vd AS (SELECT doc_id, CAST(3 + doc_id % 3 AS BIGINT) AS nf,
        |    coalesce(nullif(text, ''), 'x') AS base FROM documents),
        |vp AS (SELECT doc_id, nf,
        |    substr(hex(encode(repeat(base, CAST((nf*90 + octet_length(encode(base)) - 1) // octet_length(encode(base)) AS INT)))), 1, CAST(nf*180 AS INT)) AS hx
        |  FROM vd),
        |vf AS (SELECT doc_id, hx, unnest(generate_series(0, nf-1, 2)) AS f FROM vp),
        |vpx AS (SELECT doc_id, f,
        |    ('0x' || substr(hx, CAST(2*(f*90 + i) + 1 AS INT), 2))::BIGINT AS r,
        |    ('0x' || substr(hx, CAST(2*(f*90 + i + 1) + 1 AS INT), 2))::BIGINT AS g,
        |    ('0x' || substr(hx, CAST(2*(f*90 + i + 2) + 1 AS INT), 2))::BIGINT AS b
        |  FROM vf CROSS JOIN generate_series(0, 87, 3) t(i))
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |  round(sum(r)*1.0/30, 6) AS mean_r, round(sum(g)*1.0/30, 6) AS mean_g,
        |  round(sum(b)*1.0/30, 6) AS mean_b,
        |  CAST(sum(r) + sum(g) + sum(b) AS BIGINT) AS px_checksum
        |FROM vpx GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin,

    // The naive-form twin of x4_image_near_dup: the Spark side writes the
    // theta-join and relies on the HammingJoinRewrite optimizer rule for
    // the banded plan — same all-pairs oracle, so the hash gate proves the
    // REWRITE is an exact equivalence on real fingerprints.
    "x4_image_near_dup_sql" ->
      s"""WITH $DHashChain
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
         |FROM dh a JOIN dh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3 ORDER BY 1, 2""".stripMargin,

    // Mirrors Multimodal.gvidTemporalHash over the encodeGvidPatch fixture
    // (see VidChain): the 64-bit brightness-envelope hash is pure integer
    // math, so the twin reproduces it bit-for-bit.
    "x4_vhash" ->
      s"""WITH $VidChain
         |SELECT doc_id, vhash FROM vh ORDER BY doc_id""".stripMargin,

    // Video near-dup pairs via the ALL-PAIRS form: the Spark side runs the
    // banded pigeonhole LSH plan, equal to all-pairs at hamming <= 3 by
    // construction — the hash gate proves the banded plan loses nothing.
    "x4_video_near_dup" ->
      s"""WITH $VidChain
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.vhash, b.vhash)) AS INT) AS hamming
         |FROM vh a JOIN vh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.vhash, b.vhash)) <= 3 ORDER BY 1, 2""".stripMargin,

    // v7: cross-modal keeper gate — keeper of BOTH the dhash equality
    // class and the ahash equality class (keep-most-tokens, min-id ties),
    // then the strict per-lang token quota. hamming-0 components are
    // equality classes, so the twin's GROUP BY hash mirrors Spark's
    // pairs -> union-find -> argmax run on each modality.
    "x8_curation_v7" ->
      s"""WITH $DHashChain,
         |$AWavChain,
         |v7tok AS (SELECT doc_id, CAST(len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS ntk
         |        FROM documents),
         |v7v AS (SELECT dh.doc_id,
         |        row_number() OVER (PARTITION BY dh.dhash ORDER BY t.ntk DESC, dh.doc_id) AS rn
         |      FROM dh JOIN v7tok t USING (doc_id)),
         |v7a AS (SELECT ah.doc_id,
         |        row_number() OVER (PARTITION BY ah.ahash ORDER BY t.ntk DESC, ah.doc_id) AS rn
         |      FROM ah JOIN v7tok t USING (doc_id)),
         |v7k AS (SELECT v.doc_id FROM v7v v JOIN v7a a USING (doc_id)
         |      WHERE v.rn = 1 AND a.rn = 1),
         |v7q AS (SELECT d.lang, d.doc_id, t.ntk AS n_tokens, $hashUnit AS u
         |      FROM documents d JOIN v7k USING (doc_id) JOIN v7tok t USING (doc_id)),
         |v7c AS (SELECT lang, doc_id, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY u, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |      FROM v7q)
         |SELECT lang, doc_id, n_tokens, cum_tokens FROM v7c
         |WHERE cum_tokens <= 600 ORDER BY lang, cum_tokens""".stripMargin,

    // v8: v7's cross-modal keeper gate extended with the VIDEO equality
    // class — keeper of image AND audio AND video hash classes
    // (keep-most-tokens, min-id ties), then the strict per-lang token
    // quota; same GROUP-BY-hash mirror of Spark's pairs -> union-find ->
    // argmax, now over three fingerprints.
    "x8_curation_v8" ->
      s"""WITH $V8Chain
         |SELECT lang, doc_id, n_tokens, cum_tokens FROM v8c
         |WHERE cum_tokens <= 600 ORDER BY lang, cum_tokens""".stripMargin,

    // v9: the end-to-end training-set story — the v8 survivors (three-
    // modality keeper gate + per-lang quota) handed straight to the
    // shuffle-shard export assignment (seed "r8", 4 shards); the twin
    // replays the whole chain through the md5 permutation.
    "x8_curation_v9" ->
      s"""WITH $V8Chain,
         |v9s AS (SELECT doc_id, n_tokens FROM v8c WHERE cum_tokens <= 600),
         |v9h AS (SELECT doc_id, n_tokens, md5('r8:' || CAST(doc_id AS VARCHAR)) AS h FROM v9s),
         |v9a AS (SELECT doc_id, n_tokens, h,
         |    CAST(('0x' || substr(h, 1, 8))::BIGINT % 4 AS INT) AS shard FROM v9h)
         |SELECT doc_id, n_tokens, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
         |FROM v9a ORDER BY doc_id""".stripMargin,

    // Mirrors Multimodal.encodeWav + decodeWav: samples are 16-bit LE
    // signed ints over the cycled text bytes (2 bytes each, recovered from
    // hex pairs); the Spark kernel reads sample rate and count from the
    // PARSED RIFF chunks, the oracle from the known construction — equal
    // stats prove the chunk walk and endianness handling.
    "x4_decode_wav" ->
      """WITH d AS (SELECT doc_id, CAST(50 + doc_id % 32 AS BIGINT) AS ns,
        |    coalesce(nullif(text, ''), 'x') AS base FROM documents),
        |p AS (SELECT doc_id, ns,
        |    substr(hex(encode(repeat(base,
        |      CAST((ns*2 + octet_length(encode(base)) - 1) // octet_length(encode(base)) AS INT)))),
        |      1, ns*4) AS hx
        |  FROM d),
        |r AS (SELECT doc_id, ns, list_transform(generate_series(0, ns-1),
        |    i -> ('0x' || substr(hx, 4*i+1, 2))::BIGINT + 256*('0x' || substr(hx, 4*i+3, 2))::BIGINT) AS u
        |  FROM p),
        |s AS (SELECT doc_id, ns,
        |    list_transform(u, v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS smp
        |  FROM r)
        |SELECT doc_id, 8000 AS sample_rate, ns AS n_samples,
        |  round(list_sum(smp)*1.0/ns, 6) AS mean_amp,
        |  CAST(list_max(list_transform(smp, v -> abs(v))) AS INT) AS peak,
        |  CAST(list_sum(smp) AS BIGINT) AS pcm_checksum
        |FROM s ORDER BY doc_id""".stripMargin,

    // Mirrors Multimodal.wavFrameEnergy over the same rebuilt PCM chain as
    // x4_decode_wav: 16-sample frames (tail short), RMS = sqrt(sum(v²)/n)
    // with the integer sum exact in both engines, peak = max |v|.
    "x4_wav_frames" ->
      """WITH d AS (SELECT doc_id, CAST(50 + doc_id % 32 AS BIGINT) AS ns,
        |    coalesce(nullif(text, ''), 'x') AS base FROM documents),
        |p AS (SELECT doc_id, ns,
        |    substr(hex(encode(repeat(base,
        |      CAST((ns*2 + octet_length(encode(base)) - 1) // octet_length(encode(base)) AS INT)))),
        |      1, ns*4) AS hx
        |  FROM d),
        |r AS (SELECT doc_id, ns, list_transform(generate_series(0, ns-1),
        |    i -> ('0x' || substr(hx, 4*i+1, 2))::BIGINT + 256*('0x' || substr(hx, 4*i+3, 2))::BIGINT) AS u
        |  FROM p),
        |s AS (SELECT doc_id, ns,
        |    list_transform(u, v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS smp
        |  FROM r),
        |f AS (SELECT doc_id, smp, unnest(generate_series(0, CAST((ns + 15) // 16 - 1 AS BIGINT))) AS fi FROM s),
        |fr AS (SELECT doc_id, fi, smp[CAST(fi*16+1 AS INT) : CAST(fi*16+16 AS INT)] AS w FROM f)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx, CAST(len(w) AS BIGINT) AS n_in_frame,
        |  round(sqrt(CAST(list_sum(list_transform(w, v -> v*v)) AS DOUBLE) / len(w)), 6) AS rms,
        |  CAST(list_max(list_transform(w, v -> abs(v))) AS INT) AS peak
        |FROM fr ORDER BY doc_id, frame_idx""".stripMargin,

    // Mirrors Multimodal.byteFeatures exactly: feature j = mean of
    // UTF-8 payload bytes at positions i ≡ j (mod 8), scaled by 1/256 —
    // bytes recovered from hex(encode(text)) pairs, summed in index order
    // like the kernel's sequential loop, rounded after the mean like the
    // registered query.
    "x4_byte_features" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n FROM documents),
        |f AS (SELECT doc_id,
        |  list_transform(generate_series(0, n-1, 8), i -> ('0x' || substr(h, 2*i+1, 2))::BIGINT / 256.0) AS s0,
        |  list_transform(generate_series(7, n-1, 8), i -> ('0x' || substr(h, 2*i+1, 2))::BIGINT / 256.0) AS s7
        |FROM b)
        |SELECT doc_id AS id,
        |  CASE WHEN len(s0) = 0 THEN 0.0 ELSE round(list_sum(s0)/len(s0), 6) END AS f0,
        |  CASE WHEN len(s7) = 0 THEN 0.0 ELSE round(list_sum(s7)/len(s7), 6) END AS f7
        |FROM f ORDER BY id""".stripMargin,

    "x4_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(base64(encode(text))) AS content_md5,
        |  base64(unhex(substr(hex(encode(text)), 1, 24))) AS b64_head
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Same answer as x4_multimodal_meta but the Spark side goes through the
    // lazy-pointer store (blob write -> pointer shuffle -> partition-local
    // range reads): equality with text-derived values proves the pointer
    // read path is byte-faithful.
    "x4_lazy_pointer" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(base64(encode(text))) AS content_md5,
        |  base64(unhex(substr(hex(encode(text)), 1, 24))) AS b64_head
        |FROM documents ORDER BY doc_id""".stripMargin,

    // x6_clean_corpus composes the x5_lang_id vote, the x5_quality score and
    // the x1_exact_dedup keep-min, expression-for-expression, then filters:
    // pred_lang <> 'und' AND quality_score >= 0.5 AND n_words >= 5.
    "x6_clean_corpus" ->
      s"""WITH w AS (SELECT doc_id, $norm AS nt, $wordsOf AS ws FROM documents),
         |m AS (SELECT doc_id, nt, len(ws) AS nw,
         |        coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS sumlen,
         |        len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','the','a','and','of','to','in','is','el','la','de','y','que','los','un','le','et','les','des','une','de0','shi0','le0','bu0','wo0','zai0','you0'], x))) AS nstop,
         |        len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein'], x))) AS s_de,
         |        len(list_filter(ws, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS s_en,
         |        len(list_filter(ws, x -> list_contains(['el','la','de','y','que','los','un'], x))) AS s_es,
         |        len(list_filter(ws, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS s_fr,
         |        len(list_filter(ws, x -> list_contains(['de0','shi0','le0','bu0','wo0','zai0','you0'], x))) AS s_zh
         |      FROM w),
         |s AS (SELECT doc_id, nt, nw,
         |        CASE WHEN s_de + s_en + s_es + s_fr + s_zh = 0 THEN 'und'
         |             WHEN s_zh > greatest(s_de, s_en, s_es, s_fr) THEN 'zh'
         |             WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
         |             WHEN s_es > greatest(s_de, s_en) THEN 'es'
         |             WHEN s_en > s_de THEN 'en' ELSE 'de' END AS pred_lang,
         |        round((least(nw/50.0, 1.0)
         |             + (CASE WHEN sumlen*1.0/greatest(nw, 1) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
         |             + least((nstop*1.0/greatest(nw, 1))*5, 1.0))/3.0, 6) AS quality_score
         |      FROM m)
         |SELECT min(doc_id) AS keeper_id, count(*) AS dup_count,
         |  min(pred_lang) AS pred_lang, min(quality_score) AS quality_score,
         |  md5(nt) AS key_md5
         |FROM s WHERE pred_lang <> 'und' AND quality_score >= 0.5 AND nw >= 5
         |GROUP BY md5(nt) ORDER BY keeper_id""".stripMargin,

    "q7_promo_by_brand" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items,
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END) AS BIGINT) AS n_promo
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "pivot_user_events" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // quantile_cont == Spark's exact `percentile`: linear interpolation at
    // rank (n-1)*p; both sides round to 6dp to absorb last-ulp noise.
    "q6_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Plain theta-join twin of Intervals.windowJoin's binned equi-join:
    // exclusive start, inclusive end of the 5-minute window.
    "j_interval_errors" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS pts
        |           FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT user_id, event_id AS error_id, epoch_ms(ts) AS ets
        |      FROM events WHERE event_type = 'error')
        |SELECT p.user_id, purchase_id, error_id, ets - pts AS delta_ms
        |FROM p JOIN e ON p.user_id = e.user_id
        |              AND e.ets > p.pts AND e.ets <= p.pts + 300000
        |ORDER BY purchase_id, error_id""".stripMargin,

    // Equivalent formulation of AsOf.asofJoin (union + running last) as a
    // theta-join + argmax: LEFT JOIN keeps no-predecessor purchases (one
    // all-null row, rn = 1), ties on click_ts_ms resolve to max click_id.
    // Mirrors wSlidingHourly: 1-hour windows hopping every 30 minutes,
    // epoch-aligned — each event unnests into exactly its two covering
    // window starts; counts + exact-decimal sums under the hash gate.
    "w_sliding_hourly" ->
      """WITH e AS (SELECT epoch_ms(ts) AS t, event_type, value FROM events),
        |x AS (SELECT event_type, value,
        |        unnest([(t // 1800000) * 1800000 - 1800000, (t // 1800000) * 1800000]) AS win_ms
        |      FROM e)
        |SELECT win_ms, event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Mirrors jAsofTolerance: the j_asof_attribution theta-join + argmax
    // with the candidate set bounded to clicks within the inclusive
    // 2-hour window before the purchase.
    "j_asof_tolerance" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS click_ts_ms
        |      FROM events WHERE event_type = 'click'),
        |j AS (SELECT p.user_id, p.event_id, p.ts_ms, c.click_id, c.click_ts_ms,
        |        row_number() OVER (PARTITION BY p.event_id
        |                           ORDER BY c.click_ts_ms DESC, c.click_id DESC) rn
        |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.click_ts_ms <= p.ts_ms
        |                        AND c.click_ts_ms >= p.ts_ms - 7200000)
        |SELECT user_id, event_id, ts_ms, click_id, click_ts_ms
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    // Mirrors q10Funnel: the j_asof_tolerance attribution (1h window) under
    // a scalar conversion aggregate. countDistinct over the conditional
    // user column ignores NULLs in both engines.
    "q10_funnel" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS click_ts_ms
        |      FROM events WHERE event_type = 'click'),
        |j AS (SELECT p.user_id, p.event_id, c.click_id,
        |        row_number() OVER (PARTITION BY p.event_id
        |                           ORDER BY c.click_ts_ms DESC, c.click_id DESC) rn
        |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.click_ts_ms <= p.ts_ms
        |                        AND c.click_ts_ms >= p.ts_ms - 3600000),
        |a AS (SELECT user_id, event_id, click_id FROM j WHERE rn = 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_purchases,
        |          CAST(count(click_id) AS BIGINT) AS n_converted,
        |          CAST(count(DISTINCT user_id) AS BIGINT) AS n_purchase_users,
        |          CAST(count(DISTINCT CASE WHEN click_id IS NOT NULL THEN user_id END) AS BIGINT)
        |            AS n_converted_users
        |        FROM a),
        |ck AS (SELECT CAST(count(*) AS BIGINT) AS n_clicks FROM c)
        |SELECT n_clicks, n_purchases, n_converted, n_purchase_users, n_converted_users,
        |  round(n_converted * 1.0 / greatest(n_purchases, 1), 6) AS conversion_rate
        |FROM agg, ck""".stripMargin,

    // Mirrors q11Retention: cohort = per-user min active day (integer
    // epoch-day), matrix = (cohort, offset) distinct-user counts.
    "q11_retention" ->
      """WITH d AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |c AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort FROM d)
        |SELECT cohort AS cohort_day, day - cohort AS day_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "j_asof_attribution" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS click_ts_ms
        |      FROM events WHERE event_type = 'click'),
        |j AS (SELECT p.user_id, p.event_id, p.ts_ms, c.click_id, c.click_ts_ms,
        |        row_number() OVER (PARTITION BY p.event_id
        |                           ORDER BY c.click_ts_ms DESC, c.click_id DESC) rn
        |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.click_ts_ms <= p.ts_ms)
        |SELECT user_id, event_id, ts_ms, click_id, click_ts_ms
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "x6_vocab_topk" ->
      s"""WITH t AS (SELECT doc_id, unnest($wordsOf) AS token FROM documents),
         |pd AS (SELECT token, doc_id, count(*) AS c FROM t GROUP BY 1, 2)
         |SELECT token, CAST(sum(c) AS BIGINT) AS n_occurrences, count(*) AS doc_freq
         |FROM pd GROUP BY token
         |ORDER BY n_occurrences DESC, token LIMIT 100""".stripMargin,

    // Mirrors TextAnalysis.zipfFit: 6-dp lns at the model boundary (ln
    // agrees to 1 ulp only), 6-dp pair products through exact
    // DECIMAL(18,6) sums, and the closed-form OLS combination in doubles
    // with the identical parenthesization.
    "x6_zipf_fit" ->
      s"""WITH t AS (SELECT unnest($wordsOf) AS token FROM documents),
         |c AS (SELECT token, count(*) AS f FROM t GROUP BY token),
         |rk AS (SELECT f, row_number() OVER (ORDER BY f DESC, token) AS r FROM c),
         |p AS (SELECT f, round(ln(CAST(r AS DOUBLE)), 6) AS x, round(ln(CAST(f AS DOUBLE)), 6) AS y FROM rk),
         |s AS (SELECT count(*) AS n, sum(f) AS ntok,
         |  CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         |  CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         |  CAST(sum(CAST(round(x*x, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
         |  CAST(sum(CAST(round(y*y, 6) AS DECIMAL(18,6))) AS DOUBLE) AS syy,
         |  CAST(sum(CAST(round(x*y, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sxy
         | FROM p)
         |SELECT n AS n_types, CAST(ntok AS BIGINT) AS n_tokens,
         |  CASE WHEN n*sxx - sx*sx = 0 THEN NULL
         |       ELSE round(-((n*sxy - sx*sy) / (n*sxx - sx*sx)), 6) END AS alpha,
         |  CASE WHEN n*sxx - sx*sx = 0 THEN NULL
         |       ELSE round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx))*sx) / n, 6) END AS intercept,
         |  CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
         |       ELSE round((n*sxy - sx*sy)*(n*sxy - sx*sy) / ((n*sxx - sx*sx)*(n*syy - sy*sy)), 6) END AS r2
         |FROM s""".stripMargin,

    // Mirrors x8CurationV5: NB gate via the shared NbScoreChain, then the
    // cluster-balance selection restricted BEFORE the rank window (the
    // window runs over survivors only — cell values are closed-form per
    // vector, so computing cells on the full table and filtering is
    // equivalent, but ranks are not). Scores ride along from `keep`.
    "x8_curation_v5" ->
      s"""WITH $NbScoreChain,
         |${rhpBucketChain(1, 6)},
         |v5k AS (SELECT doc_id AS vec_id, n_tokens, llr FROM nbs WHERE llr > 0),
         |v5c AS (SELECT c.vec_id, CAST(c.bkt AS INT) AS cell FROM rhp_buck c
         |        JOIN v5k k ON k.vec_id = c.vec_id),
         |v5r AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
         |    ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0, vec_id) AS rk
         |  FROM v5c)
         |SELECT r.vec_id, r.cell, CAST(r.rk AS BIGINT) AS cell_rank, k.n_tokens, k.llr
         |FROM v5r r JOIN v5k k ON k.vec_id = r.vec_id
         |WHERE r.rk <= 8 ORDER BY r.cell, cell_rank""".stripMargin,

    // Mirrors Sampling.clusterBalancedSample: cells = 6 sign bits of RHP
    // band 0 (the x3_ivf_lsh_topk quantizer family), per-cell md5-priority
    // rank with id tiebreak, quota 16.
    "x7_cluster_sample" ->
      s"""WITH ${rhpBucketChain(1, 6)},
         |csc AS (SELECT vec_id, CAST(bkt AS INT) AS cell FROM rhp_buck),
         |csr AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
         |    ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0, vec_id) AS rk
         |  FROM csc)
         |SELECT vec_id, cell, CAST(rk AS BIGINT) AS cell_rank FROM csr
         |WHERE rk <= 16 ORDER BY cell, cell_rank""".stripMargin,

    // Mirrors Retrieval.hybridRrf: the x6_bm25_search chain at pool depth
    // 20, brute-force cosine pools for the three probe vectors (6-dp
    // scores, id tiebreaks, self-pair excluded), then rank-only RRF —
    // CAST(1 AS DOUBLE)/(60+rank) per retriever (a bare 1.0 literal would
    // stay exact DECIMAL in DuckDB where Spark divides doubles), summed in
    // fixed (text, vector) order and rounded 6dp.
    "x6_hybrid_rrf" ->
      s"""WITH w AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |dw AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM w),
         |t AS (SELECT doc_id, dl, unnest(ws) AS token FROM dw),
         |tf AS (SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2, 3),
         |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY 1),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS ndoc, CAST(sum(dl) AS BIGINT) AS sumdl FROM dw),
         |q(query_id, qtext, pvid) AS (VALUES
         |  ('q_join', 'spark join filter', 0),
         |  ('q_scan', 'table scan fast', 100),
         |  ('q_window', 'window order batch', 200)),
         |qt AS (SELECT DISTINCT query_id, token FROM (
         |  SELECT query_id, unnest(list_filter(string_split(regexp_replace(trim(lower(qtext)), '\\s+', ' ', 'g'), ' '), x -> len(x) > 0)) AS token FROM q)),
         |idf AS (SELECT query_id, token, round(ln(1.0 + (ndoc - dfc + 0.5) / (dfc + 0.5)), 6) AS idf
         |      FROM qt JOIN dfq USING (token), st),
         |pt AS (SELECT idf.query_id, tf.doc_id,
         |        round(idf.idf * (tf.tf * CAST(2.2 AS DOUBLE)) /
         |          (tf.tf + 1.2 * (0.25 + 0.75 * dl / (sumdl * 1.0 / ndoc))), 6) AS contrib
         |      FROM tf JOIN idf USING (token), st),
         |sc AS (SELECT query_id, doc_id,
         |        round(CAST(sum(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE), 6) AS score
         |      FROM pt GROUP BY 1, 2),
         |tr AS (SELECT query_id, doc_id AS id, CAST(rn AS BIGINT) AS rt FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) rn FROM sc)
         |  WHERE rn <= 20),
         |qv AS (SELECT q.query_id, q.pvid, e.embedding AS qe FROM q JOIN embeddings e ON e.vec_id = q.pvid),
         |vs AS (SELECT qv.query_id, c.vec_id AS id, round(
         |    list_sum(list_transform(generate_series(1, len(qv.qe)), i -> CAST(qv.qe[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE))) /
         |    (sqrt(list_sum(list_transform(generate_series(1, len(qv.qe)), i -> CAST(qv.qe[i] AS DOUBLE)*CAST(qv.qe[i] AS DOUBLE)))) *
         |     sqrt(list_sum(list_transform(generate_series(1, len(c.embedding)), i -> CAST(c.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE))))), 6) AS cos
         |  FROM qv CROSS JOIN embeddings c WHERE c.vec_id <> qv.pvid),
         |vr AS (SELECT query_id, id, CAST(rn AS BIGINT) AS rv FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) rn FROM vs)
         |  WHERE rn <= 20),
         |fu AS (SELECT query_id, id,
         |    round(coalesce(CAST(1 AS DOUBLE) / (60 + rt), 0) +
         |          coalesce(CAST(1 AS DOUBLE) / (60 + rv), 0), 6) AS rrf_score,
         |    rt, rv
         |  FROM tr FULL OUTER JOIN vr USING (query_id, id))
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, id AS doc_id, rrf_score,
         |  rt AS bm25_rank, rv AS cosine_rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, id) rn FROM fu)
         |WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,

    // Mirrors Classify.nbFitOnDomainTrust + nbScore via the shared
    // NbScoreChain (domain-trust weak labels, 6-dp logps at the model
    // boundary, exact-DECIMAL log-odds; zero-token docs keep a NULL-token
    // row — the explode_outer twin).
    "x5_nb_quality" ->
      s"""WITH $NbScoreChain
         |SELECT doc_id, n_tokens, llr, (llr > 0) AS pred FROM nbs ORDER BY doc_id""".stripMargin,

    // Mirrors Classify.logregFitOnDomainTrust + logregScore via the shared
    // LogregScoreChain (see its scaladoc for the determinism discipline).
    "x5_logreg_quality" ->
      s"""WITH $LogregScoreChain
         |SELECT doc_id, score, (score > 0.5) AS pred FROM lrsc ORDER BY doc_id""".stripMargin,

    // The quadratic all-pairs twin of the prefix-filtered exact Jaccard
    // join: same trigram shingle sets (the decontaminate construction),
    // integer-rational threshold — hash equality proves the prefix lemma
    // loses no pair and the verify admits no extra.
    "x2_allpairs_jaccard" -> {
      s"""WITH apw AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |apsh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
         |    THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
         |    ELSE [array_to_string(ws, ' ')] END) AS toks FROM apw),
         |app AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
         |    CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS uni
         |  FROM apsh a JOIN apsh b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, inter, uni FROM app
         |WHERE inter * 2 >= uni ORDER BY id_a, id_b""".stripMargin
    },

    // Weighted all-pairs twin: the quadratic form with the IDENTICAL
    // integer micro-idf weights (round(1e6·ln((D+1)/(df+1))) — one round
    // at the model boundary absorbs the 1-ulp ln divergence, exact
    // integers thereafter). sum(BIGINT) is HUGEINT in DuckDB — CAST.
    "x2_weighted_jaccard" -> {
      s"""WITH apw AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |apsh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
         |    THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
         |    ELSE [array_to_string(ws, ' ')] END) AS toks FROM apw),
         |apd AS (SELECT count(*) AS d FROM apsh WHERE len(toks) > 0),
         |apt AS (SELECT doc_id, unnest(toks) AS t FROM apsh),
         |apdf AS (SELECT t, count(*) AS df FROM apt GROUP BY t),
         |apwt AS (SELECT t, CAST(round(ln((d + 1.0) / (df + 1.0)) * 1000000) AS BIGINT) AS w
         |  FROM apdf, apd),
         |aptw AS (SELECT doc_id, t, w FROM apt JOIN apwt USING (t)),
         |apdw AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS wn FROM aptw GROUP BY doc_id),
         |appair AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(sum(a.w) AS BIGINT) AS inter_w
         |  FROM aptw a JOIN aptw b ON a.t = b.t AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |apj AS (SELECT id_a, id_b, inter_w, wa.wn + wb.wn - inter_w AS uni_w
         |  FROM appair JOIN apdw wa ON wa.doc_id = id_a
         |              JOIN apdw wb ON wb.doc_id = id_b)
         |SELECT id_a, id_b, inter_w, CAST(uni_w AS BIGINT) AS uni_w FROM apj
         |WHERE uni_w > 0 AND inter_w * 2 >= uni_w * 1 ORDER BY id_a, id_b""".stripMargin
    },

    // Heavy-hitters twin: plain exact count + HAVING — the MG sketch only
    // bounds memory, the registered OUTPUT is exact by the recount.
    "x6_heavy_hitters" ->
      """WITH hhw AS (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |hhf AS (SELECT w, count(*) AS n_occurrences FROM hhw WHERE len(w) > 0 GROUP BY w),
        |hht AS (SELECT sum(n_occurrences) AS total FROM hhf)
        |SELECT w AS key, n_occurrences FROM hhf, hht
        |WHERE n_occurrences * 50 > total ORDER BY key""".stripMargin,

    // Entity-resolution twin: the same fuzzy pair graph closed with the
    // recursive-reachability pattern (x7_dedup_clusters), canonical = min
    // reachable key, singletons canonical by themselves.
    "x8_entity_resolution" ->
      """WITH RECURSIVE
        |erp AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        |  FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1),
        |eredges AS (SELECT id_a AS s, id_b AS d FROM erp
        |            UNION SELECT id_b, id_a FROM erp),
        |erreach(s, d) AS (SELECT s, d FROM eredges
        |  UNION SELECT r.s, e2.d FROM erreach r JOIN eredges e2 ON r.d = e2.s),
        |ercomp AS (SELECT s AS id, least(s, min(d)) AS component
        |           FROM erreach GROUP BY s)
        |SELECT c.c_custkey,
        |  coalesce(p.component, c.c_custkey) AS canonical_key,
        |  c.c_custkey = coalesce(p.component, c.c_custkey) AS is_canonical
        |FROM customer c LEFT JOIN ercomp p ON c.c_custkey = p.id
        |ORDER BY c.c_custkey""".stripMargin,

    // Mirrors Sequences.buildSequences: (ts, event_id) total order, cap
    // BEFORE collection, space-joined token sequence per user.
    "x7_build_sequences" ->
      """WITH sq AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_ms(ts), event_id) AS rn
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  string_agg(event_type, ' ' ORDER BY rn) AS seq
        |FROM sq WHERE rn <= 32 GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Mirrors Anomaly.madOutlierReport: 6-dp-rounded interpolated medians
    // (quantile_cont = Spark's exact percentile), MAD from the rounded
    // median, flag boundary = literal double × rounded mad.
    "x10_anomaly_mad" ->
      """WITH amed AS (SELECT event_type,
        |    round(quantile_cont(value, 0.5), 6) AS med
        |  FROM events GROUP BY event_type),
        |amad AS (SELECT e.event_type, any_value(m.med) AS med,
        |    round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
        |  FROM events e JOIN amed m USING (event_type) GROUP BY e.event_type)
        |SELECT e.event_type, count(*) AS n, any_value(s.med) AS med,
        |  any_value(s.mad) AS mad,
        |  CAST(sum(CASE WHEN abs(e.value - s.med) >
        |    CAST(5.1891 AS DOUBLE) * s.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN amad s USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // Incremental-manifest gate: one-manifest-row-per-listed-file as a
    // derived invariant (a pinned "12" would break on any config that
    // yields an empty write task — Spark emits no file for one), total
    // rows verbatim, union≡rebuild pinned.
    "x9_manifest_incremental" ->
      """SELECT true AS one_row_per_file,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  true AS incremental_eq_rebuild
        |FROM events""".stripMargin,

    // Compaction gate: content preservation IS the contract — the
    // compacted table's aggregates replayed over raw events; the FFD
    // plan invariants ride as pinned booleans.
    "x9_compact" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  true AS cover_ok, true AS bins_within_target, true AS files_reduced
        |FROM events""".stripMargin,

    // Point-lookup gate: the looked-up row replayed over raw events
    // (the index is invisible to a correct lookup); pruning pinned.
    "x9_point_lookup" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value,
        |  true AS files_pruned
        |FROM events
        |WHERE event_id = (SELECT max(event_id) FROM events)""".stripMargin,

    // Metadata-count gate: the middle-half box count replayed over raw
    // events (metadata-vs-scan split is invisible to a correct answer);
    // recount equality and file pruning ride as pinned booleans.
    "x9_meta_count" ->
      """WITH base AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |b AS (SELECT min(user_id) AS umin, max(user_id) AS umax,
        |             min(ts_ms) AS tmin, max(ts_ms) AS tmax FROM base)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  true AS meta_plus_scan_eq_full, true AS files_pruned
        |FROM base, b
        |WHERE user_id BETWEEN umin + (umax - umin) // 4
        |                  AND umin + 3 * (umax - umin) // 4
        |  AND ts_ms BETWEEN tmin + (tmax - tmin) // 4
        |                AND tmin + 3 * (tmax - tmin) // 4""".stripMargin,

    // Winsorize gate: exact-cut clamp replayed verbatim (round-cast-
    // decimal sum discipline); the sketch cutpoints ride as rank-window
    // booleans.
    "x5_winsorize" ->
      """WITH c AS (SELECT quantile_cont(value, 0.01) AS c1,
        |                  quantile_cont(value, 0.99) AS c99 FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN value < c1 THEN 1 ELSE 0 END) AS BIGINT) AS n_floored,
        |  CAST(sum(CASE WHEN value > c99 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
        |  round(any_value(c1), 6) AS c1_exact,
        |  round(any_value(c99), 6) AS c99_exact,
        |  CAST(sum(CAST(round(greatest(least(value, c99), c1), 6)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS sum_winsorized,
        |  true AS sketch_c1_ok, true AS sketch_c99_ok
        |FROM events, c""".stripMargin,

    // Quantile-drift gate: era-A deciles through era-B's exact CDF,
    // max gap verbatim (decile values and count ratios are identical
    // IEEE arithmetic in both engines); the sketch-only statistic
    // rides as the pinned tolerance boolean.
    "x5_drift_quantile" -> {
      val ps = (1 to 9).map(_ / 10.0)
      val fs = ps.indices.map(i =>
        s"CAST(sum(CASE WHEN value <= qs[${i + 1}] THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS f$i")
        .mkString(",\n        |  ")
      val gaps = ps.indices.map(i => s"abs(${ps(i)} - f$i)").mkString(", ")
      s"""WITH a AS (SELECT value FROM events WHERE epoch_ms(ts) < 1705276800000),
         |b AS (SELECT value FROM events WHERE epoch_ms(ts) >= 1705276800000),
         |q AS (SELECT quantile_cont(value, [${ps.mkString(", ")}]) AS qs FROM a),
         |f AS (SELECT count(*) AS n_b,
         |  $fs
         |  FROM b, q)
         |SELECT CAST(n_b AS BIGINT) AS n_b,
         |  round(greatest($gaps), 6) AS drift_exact,
         |  true AS drift_sketch_ok
         |FROM f""".stripMargin
    },

    // Join-key-overlap gate: exact distinct/intersection counts
    // verbatim; the HLL inclusion-exclusion estimate rides as the
    // union-relative 5% boolean (the X10hlo contract).
    // the merge-exactness invariants (CMS bit-equality, HLL register
    // equality, planner inner-product parity) are computed Spark-side
    // against the one-shot harvest and pinned; the row count replays
    // Planner audit: the actual join counts replay as plain SQL; the
    // estimate-contract booleans (never-undercount, bounded overcount)
    // are pinned true — a CMS defect on a real execution breaks them.
    "x6_planner_audit" ->
      """SELECT 'l_orderkey|o_orderkey' AS join_keys,
        |  CAST(count(*) AS BIGINT) AS actual_rows,
        |  true AS never_undercount, true AS overcount_bounded
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |UNION ALL
        |SELECT 'o_custkey|c_custkey',
        |  CAST(count(*) AS BIGINT),
        |  true, true
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY join_keys""".stripMargin,

    "x6_catalog_incremental" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  true AS rows_eq, true AS bytes_eq, true AS cms_bitexact,
        |  true AS distinct_eq, true AS join_card_eq
        |FROM events""".stripMargin,

    "x6_hll_join_keys" ->
      """SELECT * FROM (
        |  SELECT 'events_customer' AS pair,
        |    (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS nd_a,
        |    (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer) AS nd_b,
        |    (SELECT CAST(count(*) AS BIGINT) FROM
        |      (SELECT DISTINCT user_id FROM events) e
        |      JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |        ON e.user_id = c.c_custkey) AS nd_intersect,
        |    true AS overlap_ok
        |  UNION ALL
        |  SELECT 'orders_customer',
        |    (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders),
        |    (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer),
        |    (SELECT CAST(count(*) AS BIGINT) FROM
        |      (SELECT DISTINCT o_custkey FROM orders) o
        |      JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |        ON o.o_custkey = c.c_custkey),
        |    true)
        |ORDER BY pair""".stripMargin,

    // Join-cardinality gate: exact cardinalities verbatim (BIGINT-cast,
    // the HUGEINT trap); the CMS inner-product estimate rides as its
    // contract booleans (never undercounts, within eps*Na*Nb).
    "x6_cms_join_card" ->
      """SELECT * FROM (
        |  SELECT 'events_self_f2' AS pair,
        |    (SELECT CAST(count(user_id) AS BIGINT) FROM events) AS n_a,
        |    (SELECT CAST(count(user_id) AS BIGINT) FROM events) AS n_b,
        |    (SELECT CAST(sum(n * n) AS BIGINT) FROM
        |      (SELECT count(*) AS n FROM events GROUP BY user_id)) AS exact_card,
        |    true AS est_ge_exact, true AS est_le_bound
        |  UNION ALL
        |  SELECT 'orders_lineitem',
        |    (SELECT CAST(count(o_orderkey) AS BIGINT) FROM orders),
        |    (SELECT CAST(count(l_orderkey) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |       JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |    true, true)
        |ORDER BY pair""".stripMargin,

    // Data-skipping gate: the probe-box aggregates replayed over raw
    // events (a correct skip makes the file layout invisible); the
    // pruned≡full and files-skipped witnesses ride as pinned booleans.
    // Box bounds = exact integer arithmetic from min/max (// is floor
    // div on non-negative operands, matching Spark Long division).
    "x9_skipping" ->
      """WITH base AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value FROM events),
        |b AS (SELECT min(user_id) AS umin, max(user_id) AS umax FROM base),
        |f AS (SELECT base.* FROM base, b
        |  WHERE user_id BETWEEN umin + (umax - umin) // 4
        |                    AND umin + (umax - umin) // 2
        |    AND ts_ms BETWEEN 1705276800000 AND 1705708799999)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(event_id), 0) AS BIGINT) AS sum_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value,
        |  true AS pruned_equals_full, true AS files_skipped
        |FROM f""".stripMargin,

    // Mixed-chain reorder gate: the q15 revenue chain extended with the
    // (uncatalogued) region table; reordering the catalogued prefix is
    // invisible to results, so the twin is the plain five-table join.
    "q19_planned_mixed_chain" ->
      """SELECT r_name, n_name,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue,
        |  true AS naive_all_merge, true AS artifact_prefix_reordered,
        |  true AS uncatalogued_kept_on_top
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    // Semi/anti stack reorder gate: the three commuting filters replayed
    // as EXISTS / NOT EXISTS over the same key-subset derivations (null
    // keys cannot occur: c_custkey is a PK slice).
    "q20_planned_semi" ->
      """WITH hot AS (SELECT c_custkey AS hk FROM customer WHERE c_nationkey < 3),
        |wide AS (SELECT c_custkey AS wk FROM customer WHERE c_custkey % 20 <> 0),
        |antik AS (SELECT c_custkey AS ak FROM customer WHERE c_custkey % 7 = 0),
        |f AS (SELECT o_orderpriority, o_totalprice FROM orders
        |  WHERE EXISTS (SELECT 1 FROM wide WHERE wk = o_custkey)
        |    AND NOT EXISTS (SELECT 1 FROM antik WHERE ak = o_custkey)
        |    AND EXISTS (SELECT 1 FROM hot WHERE hk = o_custkey))
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  true AS naive_written_order, true AS artifact_selective_first
        |FROM f GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Planned-skew gate: fact/dim derivation replayed from raw events
    // (dim = distinct fact keys, so the join is lossless); the salted
    // plan is result-identical BY CONTRACT, so the twin is the plain
    // join — any salting defect (dropped bucket, replica duplication,
    // wrong key composition) breaks the hash and the pinned
    // salted_equals_plain boolean.
    "q18_planned_skew" ->
      """WITH fact AS (
        |  SELECT CASE WHEN event_id % 3 = 0 THEN 7
        |              ELSE user_id + 1000 END AS key,
        |         value AS val
        |  FROM events),
        |dim AS (SELECT key AS m_key, key % 5 AS grp
        |        FROM (SELECT DISTINCT key FROM fact)),
        |j AS (SELECT d.grp, f.val FROM fact f JOIN dim d ON f.key = d.m_key)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(val, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_val,
        |  true AS naive_bare_merge, true AS artifact_salted,
        |  true AS salted_equals_plain
        |FROM j GROUP BY grp ORDER BY grp""".stripMargin,

    // Decimal-skipping gate: the mid-domain price box replayed over raw
    // lineitem. Bounds derive in exact unscaled cents (DECIMAL(12,2)*100
    // is exact, CAST to BIGINT exact); the double->decimal price cast
    // hops through DOUBLE per the engine-parity discipline, and the
    // decimal sum is exact before the one double cast at the boundary.
    "x9_skipping_dec" ->
      """WITH base AS (
        |  SELECT l_orderkey,
        |    CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(12,2)) AS price
        |  FROM lineitem),
        |cb AS (SELECT CAST(min(price) * 100 AS BIGINT) AS cmin,
        |              CAST(max(price) * 100 AS BIGINT) AS cmax FROM base),
        |f AS (SELECT base.* FROM base, cb
        |  WHERE CAST(price * 100 AS BIGINT)
        |    BETWEEN cmin + (cmax - cmin) // 4 AND cmin + (cmax - cmin) // 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(l_orderkey), 0) AS BIGINT) AS sum_keys,
        |  CAST(coalesce(sum(price), 0) AS DOUBLE) AS sum_price,
        |  true AS pruned_equals_full, true AS files_skipped
        |FROM f""".stripMargin,

    // Planned-scan gate: the same probe box as x9_skipping replayed over
    // raw events — the ScanPruneRewrite rule's file pruning must be
    // invisible to results; the plan-shape facts (naive control = full
    // FileIndex, activated run = pruned location, strictly fewer files)
    // ride as pinned booleans probed from the executed plans.
    // Pruned-broadcast composition gate: the box self-join replays over
    // raw events; the plan facts (naive control sort-merge at the pinned
    // scale-relative threshold, the manifest-pruned side flipping to
    // Catalyst's NATIVE broadcast purely via the wrapper's honest
    // sizeInBytes) ride as pinned booleans.
    "q22_pruned_broadcast" ->
      """WITH base AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value FROM events),
        |b AS (SELECT min(user_id) AS umin, max(user_id) AS umax FROM base),
        |box AS (SELECT user_id AS b_user, event_id AS b_id FROM base, b
        |  WHERE user_id BETWEEN umin + (umax - umin) // 4
        |                    AND umin + (umax - umin) // 2
        |    AND ts_ms BETWEEN 1705276800000 AND 1705708799999),
        |j AS (SELECT base.value, box.b_id FROM base JOIN box
        |  ON base.user_id = box.b_user)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(coalesce(sum(b_id), 0) AS BIGINT) AS sum_box_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value,
        |  true AS naive_sort_merge, true AS pruned_native_broadcast
        |FROM j""".stripMargin,

    // Bloom point-lookup gate: the key derivation (smallest event_id at
    // or above the exact integer midpoint of the id domain) replays over
    // raw events; the plan-shape facts (manifest provably blind on the
    // scattered column, Bloom index pruning the same plain read) are
    // pinned booleans probed from executed plans.
    "q21_planned_point" ->
      """WITH base AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value FROM events),
        |b AS (SELECT min(event_id) AS emin, max(event_id) AS emax FROM base),
        |kk AS (SELECT min(event_id) AS k FROM base, b
        |  WHERE event_id >= emin + (emax - emin) // 2),
        |f AS (SELECT base.* FROM base, kk WHERE event_id = k)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(event_id), 0) AS BIGINT) AS sum_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value,
        |  true AS pruned_equals_full, true AS manifest_blind,
        |  true AS bloom_pruned
        |FROM f""".stripMargin,

    // Dynamic file pruning gate: the bottom-eighth user box replayed
    // over raw events (each fact row matches exactly one distinct-user
    // dim row, so the join aggregates ARE the box aggregates); the plan
    // facts (naive control full FileIndex, activated run's listing
    // dynamically pruned from the dim's collected keys, strictly fewer
    // files opened) ride as pinned booleans probed from executed plans.
    "q23_dynamic_prune" ->
      """WITH base AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value FROM events),
        |b AS (SELECT min(user_id) AS umin, max(user_id) AS umax FROM base),
        |f AS (SELECT base.* FROM base, b
        |  WHERE user_id <= umin + (umax - umin) // 8)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(event_id), 0) AS BIGINT) AS sum_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value,
        |  true AS pruned_equals_full, true AS naive_full_scan,
        |  true AS dynamic_files_pruned
        |FROM f""".stripMargin,

    // Star-reorder gate: the three dims replay as derivations over the
    // fact's own distinct keys (hot = users x4, med = even users, sel =
    // users % 16 = 0), so the star join is exactly replayable; the plan
    // facts (naive control keeps the worst-first written order, activated
    // run attaches most-selective-first) ride as pinned booleans probed
    // from forced physical plans.
    "q24_planned_star" ->
      """WITH u AS (SELECT DISTINCT user_id AS k FROM events),
        |hot AS (SELECT k AS h_key, CAST(r AS BIGINT) AS h_w
        |        FROM u CROSS JOIN (VALUES (1),(2),(3),(4)) t(r)),
        |med AS (SELECT k AS m_key FROM u WHERE k % 2 = 0),
        |sel AS (SELECT k AS s_key, (k // 16) % 4 AS s_grp FROM u WHERE k % 16 = 0),
        |j AS (SELECT s.s_grp, f.value, h.h_w FROM events f
        |  JOIN hot h ON f.user_id = h.h_key
        |  JOIN med m ON f.user_id = m.m_key
        |  JOIN sel s ON f.user_id = s.s_key)
        |SELECT s_grp, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(h_w) AS BIGINT) AS sum_w,
        |  CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    AS sum_value,
        |  true AS naive_written_order, true AS artifact_selective_first
        |FROM j GROUP BY s_grp ORDER BY s_grp""".stripMargin,

    // Composite-key pricing gate: the revenue replays as the plain
    // 2-column-key join chain (planning must be invisible to results);
    // the structural facts — naive all-sort-merge, singles catalog
    // provably NOT flipping the top join (the pre-r14 planner's miss),
    // tuple catalog broadcasting the intermediate, and the >=10x
    // single-column overpricing measured from the CMS artifacts — ride
    // as pinned booleans probed from forced physical plans.
    "q25_planned_composite" ->
      """WITH fact AS (SELECT o_custkey % 40 AS k1, o_orderkey % 40 AS k2,
        |    o_orderkey, o_totalprice FROM orders),
        |dim0 AS (SELECT DISTINCT o_custkey % 40 AS k1, o_orderkey % 40 AS k2
        |    FROM orders WHERE o_orderkey % 173 = 0),
        |dim AS (SELECT k1, k2, (k1 * 40 + k2) % 5 AS grp FROM dim0)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue,
        |  true AS naive_all_merge, true AS single_col_no_flip,
        |  true AS tuple_broadcast, true AS single_overprices_10x
        |FROM lineitem l
        |JOIN fact f ON l.l_orderkey = f.o_orderkey
        |JOIN dim d ON f.k1 = d.k1 AND f.k2 = d.k2
        |GROUP BY grp ORDER BY grp""".stripMargin,

    // Snowflake-reorder gate: the twin replays the full 4-table join
    // (inner joins commute — reordering must be invisible to results);
    // the plan facts (written order keeps no fact+sel-only join,
    // activated bottom join touches exactly fact + sel) ride as pinned
    // booleans probed from forced physical plans.
    "q28_planned_snowflake" ->
      """WITH u AS (SELECT DISTINCT user_id AS k FROM events),
        |dim AS (SELECT k AS d_key, (k * 2 + r) % 8 AS d_sub
        |        FROM u CROSS JOIN (VALUES (0),(1)) t(r)),
        |sub AS (SELECT s, CAST(s * 4 + w AS BIGINT) AS s_weight
        |        FROM (SELECT unnest(generate_series(0, 7)) AS s)
        |        CROSS JOIN (VALUES (0),(1),(2),(3)) t2(w)),
        |sel AS (SELECT k AS sel_key, (k // 16) % 4 AS sel_grp FROM u WHERE k % 16 = 0)
        |SELECT sel_grp, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(s_weight) AS BIGINT) AS sum_w,
        |  CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  true AS naive_written_order, true AS artifact_selective_bottom
        |FROM events f
        |JOIN dim d ON f.user_id = d.d_key
        |JOIN sub s2 ON d.d_sub = s2.s
        |JOIN sel ON f.user_id = sel.sel_key
        |GROUP BY sel_grp ORDER BY sel_grp""".stripMargin,

    // Bushy-reorder gate (q28 one level deeper and right-nested): the
    // twin replays the full 5-table join — inner joins commute, so the
    // recursive-subtree reorder must be invisible to results; the plan
    // facts (written order keeps no fact+sel-only join, activated
    // bottom join touches exactly fact + sel) ride as pinned booleans
    // probed from forced physical plans.
    "q29_planned_bushy" ->
      """WITH u AS (SELECT DISTINCT user_id AS k FROM events),
        |dim AS (SELECT k AS d_key, (k * 2 + r) % 8 AS d_sub
        |        FROM u CROSS JOIN (VALUES (0),(1)) t(r)),
        |sub AS (SELECT s AS s_sub, s % 4 AS s_cat
        |        FROM (SELECT unnest(generate_series(0, 7)) AS s)),
        |subsub AS (SELECT c AS c_cat, CAST(c * 2 + w AS BIGINT) AS c_weight
        |        FROM (SELECT unnest(generate_series(0, 3)) AS c)
        |        CROSS JOIN (VALUES (0),(1)) t2(w)),
        |sel AS (SELECT k AS sel_key, (k // 16) % 4 AS sel_grp FROM u WHERE k % 16 = 0)
        |SELECT sel_grp, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(c_weight) AS BIGINT) AS sum_w,
        |  CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  true AS naive_written_order, true AS artifact_selective_bottom
        |FROM events f
        |JOIN dim d ON f.user_id = d.d_key
        |JOIN sub s2 ON d.d_sub = s2.s_sub
        |JOIN subsub c2 ON s2.s_cat = c2.c_cat
        |JOIN sel ON f.user_id = sel.sel_key
        |GROUP BY sel_grp ORDER BY sel_grp""".stripMargin,

    // Row-group-grain planner gate: the Spark side's first predicate
    // branch is a layout-derived inter-group box that provably matches
    // NO row (strictly between consecutive multiples of 1000 — see the
    // query scaladoc), so the twin replays only the second branch: the
    // class-B (odd event_id) rows. The pinned booleans price the
    // LISTING: naive full, file grain provably no-drop, row-group grain
    // strictly fewer files opened, pruned == full.
    "q27_planned_rg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(event_id), 0) AS BIGINT) AS sum_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))),
        |       CAST(0 AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  true AS naive_full_listing, true AS file_grain_no_drop,
        |  true AS rg_fewer_files, true AS pruned_equals_full,
        |  true AS multi_rg_layout
        |FROM events WHERE event_id % 2 = 1""".stripMargin,

    // Left-outer artifact-broadcast gate: the twin replays the LEFT
    // join against the reconstructed hot dim (c_nationkey < 3) with the
    // null-extension riding the hash via coalesce(..., -1); the plan
    // facts (naive sort-merge, activated non-preserved-side broadcast)
    // are pinned booleans probed from forced physical plans.
    // Aggregate-leaf pricing gate: the twin replays the per-user rollup
    // joined back to the fact — broadcast hints are semantics-preserving,
    // so the values are the plain rollup-join's; the plan facts (control
    // run sort-merge, activated run broadcasting the AGGREGATE side —
    // priced from the stored HLL distinct of the grouping key, the
    // statistic size-only estimation cannot see) ride as pinned booleans
    // probed from forced physical plans.
    "q30_planned_agg" ->
      """WITH per AS (SELECT user_id AS agg_user,
        |    SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS user_total,
        |    CAST(count(*) AS BIGINT) AS user_events
        |  FROM events GROUP BY user_id)
        |SELECT e.user_id % 8 AS grp, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(user_events) AS BIGINT) AS sum_events,
        |  CAST(sum(user_total) AS DOUBLE) AS sum_total,
        |  true AS naive_merge, true AS artifact_agg_broadcast
        |FROM events e JOIN per p ON e.user_id = p.agg_user
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Manifest-range pricing gate: the twin replays the lowest-eighth
    // window join (integer cut arithmetic verbatim — `//` is DuckDB's
    // integer division, matching Spark's Long `/`); the plan facts
    // (naive merge, catalog-only STILL merge — the differential control
    // proving the manifest is the enabling artifact — manifest+catalog
    // broadcast) ride as pinned booleans probed from forced plans.
    "q31_planned_range" ->
      """WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
        |f AS (SELECT user_id, value FROM events, b
        |      WHERE event_id <= lo + (hi - lo) // 8)
        |SELECT f.user_id % 8 AS ugrp, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(f.value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  true AS naive_merge, true AS catalog_only_merge,
        |  true AS manifest_range_broadcast
        |FROM f JOIN events e ON f.user_id = e.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q26_planned_outer" ->
      """WITH hot AS (SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 3)
        |SELECT coalesce(h.c_nationkey, -1) AS nation_grp,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  true AS naive_outer_merge, true AS artifact_outer_broadcast
        |FROM orders o LEFT JOIN hot h ON o.o_custkey = h.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Audit-demotion gate: the good-first chain's revenue replays as the
    // plain three-table join (demotion must be invisible to results);
    // the loop facts (3 recorded contract violations, poisoned artifact
    // flipping the plan fact-first, demoted activation keeping the good
    // written order, fingerprint-keyed recovery of the re-harvested
    // customer sketch) ride as pinned booleans probed from forced plans
    // and the activation registry.
    "x6_audit_demotion" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue,
        |  true AS audit_violations, true AS poisoned_flipped,
        |  true AS demoted_kept_order, true AS customer_recovered
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q17_planned_scan" ->
      """WITH base AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value FROM events),
        |b AS (SELECT min(user_id) AS umin, max(user_id) AS umax FROM base),
        |f AS (SELECT base.* FROM base, b
        |  WHERE user_id BETWEEN umin + (umax - umin) // 4
        |                    AND umin + (umax - umin) // 2
        |    AND ts_ms BETWEEN 1705276800000 AND 1705708799999)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(event_id), 0) AS BIGINT) AS sum_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value,
        |  true AS pruned_equals_full, true AS naive_full_scan,
        |  true AS artifact_files_pruned
        |FROM f""".stripMargin,

    // Schema-evolution gate: the box replays over the even-event rows
    // (the appended renamed-column batch holds null user_id on the
    // unified read, excluded by the row filter on every path); the
    // degrade facts (renamed column kept candidate, long-under-decimal
    // manifest unknown, stale manifest keeping appended files) ride as
    // pinned booleans measured from footers and executed plans.
    "x9_schema_evolution" ->
      """WITH base AS (SELECT event_id, user_id, value FROM events
        |  WHERE event_id % 2 = 0),
        |b AS (SELECT min(user_id) AS umin, max(user_id) AS umax FROM base),
        |f AS (SELECT base.* FROM base, b
        |  WHERE user_id BETWEEN umin + (umax - umin) // 4
        |                    AND umin + (umax - umin) // 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(event_id), 0) AS BIGINT) AS sum_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value,
        |  true AS renamed_kept_candidate, true AS pruned_equals_full,
        |  true AS widened_degraded_unknown,
        |  true AS stale_manifest_keeps_appended
        |FROM f""".stripMargin,

    // Row-group-skipping gate: the band-gap box replayed over raw events
    // (u = (event_id % 2) * 4 * max(user_id) + user_id; box = upper low
    // band + the empty gap). The layout facts (multi-row-group files,
    // strict candidate-row reduction vs file grain, pruned == full,
    // metadata box count consistent) ride as pinned booleans measured
    // from real footers.
    "x9_skipping_rg" ->
      """WITH b AS (SELECT max(user_id) AS um FROM events),
        |base AS (SELECT event_id,
        |  (event_id % 2) * 4 * um + user_id AS u, value FROM events, b),
        |f AS (SELECT base.* FROM base, b
        |  WHERE u BETWEEN um // 2 AND 3 * um)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(event_id), 0) AS BIGINT) AS sum_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value,
        |  true AS multi_rg_layout, true AS rg_candidate_rows_fewer,
        |  true AS pruned_equals_full, true AS meta_count_matches
        |FROM f""".stripMargin,

    // String-skipping gate: the 5-day ISO-date window replayed over raw
    // events (string stats/truncation invisible to a correct skip);
    // DuckDB's strftime over the naive UTC timestamp matches Spark's
    // date_format under the pinned UTC session zone.
    "x9_skipping_str" ->
      """WITH base AS (
        |  SELECT event_id, strftime(ts, '%Y-%m-%d') AS day, value FROM events),
        |f AS (SELECT * FROM base WHERE day BETWEEN '2024-01-15' AND '2024-01-19')
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(event_id), 0) AS BIGINT) AS sum_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value,
        |  true AS pruned_equals_full, true AS files_skipped
        |FROM f""".stripMargin,

    // payload is non-null exactly when event_type = 'click' (props is
    // never null in the generated table; the Spark side's when() maps
    // non-clicks to NULL) — the twin states that predicate directly
    "x9_skipping_null" ->
      """WITH f AS (SELECT event_id, value FROM events
        |  WHERE event_type = 'click' AND props IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(event_id), 0) AS BIGINT) AS sum_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value,
        |  true AS pruned_equals_full, true AS files_skipped
        |FROM f""".stripMargin,

    // the derived-vs-harvested manifest comparison is between two
    // metadata artifacts (footer stats) DuckDB cannot see; it is pinned
    // Spark-side and the preserved row count replays
    "x9_manifest_compact" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  true AS derived_eq, true AS files_reduced
        |FROM events""".stripMargin,

    "x9_bloom_compact" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  true AS index_bitexact, true AS lookup_prunes
        |FROM events""".stripMargin,

    "x9_compact_ordered" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  true AS ranges_disjoint, true AS box_prunes,
        |  true AS pruned_equals_full, true AS files_reduced
        |FROM events""".stripMargin,

    "x9_skipping_in" ->
      """WITH base AS (
        |  SELECT event_id, strftime(ts, '%Y-%m-%d') AS day, value FROM events),
        |f AS (SELECT * FROM base
        |  WHERE day IN ('2024-01-05', '2024-01-17', '2024-01-26'))
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(event_id), 0) AS BIGINT) AS sum_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value,
        |  true AS pruned_equals_full, true AS files_skipped
        |FROM f""".stripMargin,

    // the Spark side floors event time to MILLIS (timestamp_millis of
    // the epoch-ms accessor) before boxing — the twin filters on
    // epoch_ms(ts) against the same ms bounds, exactly equivalent
    "x9_skipping_ts" ->
      """WITH f AS (SELECT event_id, value FROM events
        |  WHERE epoch_ms(ts) BETWEEN 1705276800000 AND 1705708799999)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(event_id), 0) AS BIGINT) AS sum_ids,
        |  CAST(coalesce(sum(CAST(round(value, 6) AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value,
        |  true AS pruned_equals_full, true AS files_skipped
        |FROM f""".stripMargin,

    // Percentile-rank gate: exact group counts + interpolated
    // percentiles verbatim (quantile_cont ≡ Spark percentile); the GK
    // rank estimates ride as tie-aware in-plan booleans (the sketch
    // cannot be replayed, its guarantee can).
    "x5_percentile_rank" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  round(quantile_cont(value, 0.1), 6) AS p10_exact,
        |  round(quantile_cont(value, 0.5), 6) AS p50_exact,
        |  round(quantile_cont(value, 0.9), 6) AS p90_exact,
        |  true AS rank10_ok, true AS rank50_ok, true AS rank90_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Quantile-store gate: exact interpolated percentiles verbatim
    // (quantile_cont ≡ Spark percentile, the x10_anomaly_mad pairing);
    // the GK union estimates ride as pinned rank-window booleans.
    "x10_quantile_store" ->
      """SELECT count(DISTINCT event_type) AS n_groups, count(*) AS n_rows,
        |  round(quantile_cont(value, 0.5), 6) AS p50_exact,
        |  round(quantile_cont(value, 0.9), 6) AS p90_exact,
        |  round(quantile_cont(value, 0.99), 6) AS p99_exact,
        |  true AS q50_rank_ok, true AS q90_rank_ok, true AS q99_rank_ok
        |FROM events""".stripMargin,

    // Cohort-overlap gate: exact per-type/intersection counts verbatim;
    // the sketch IE estimate rides as the pinned union-relative boolean.
    "x10_hll_overlap" ->
      """WITH hou AS (SELECT DISTINCT event_type, user_id FROM events),
        |hpt AS (SELECT event_type, count(*) AS n_users FROM hou GROUP BY 1),
        |hpi AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_intersect
        |  FROM hou a JOIN hou b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b,
        |  pa.n_users AS n_a, pb.n_users AS n_b, n_intersect,
        |  true AS overlap_ok
        |FROM hpi JOIN hpt pa ON pa.event_type = type_a
        |  JOIN hpt pb ON pb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,

    // The incremental-HLL gate: exact day/row/distinct metrics verbatim;
    // DuckDB cannot reproduce DataSketches registers, so the twin asserts
    // the IN-PLAN booleans — the 5% accuracy contract and the
    // merge-consistency property (the profileApprox gate pattern).
    "x10_hll_incremental" ->
      """SELECT count(DISTINCT epoch_ms(ts) // 86400000) AS n_days,
        |  count(*) AS n_rows, count(DISTINCT user_id) AS n_distinct_users,
        |  true AS approx_ok, true AS merge_consistent
        |FROM events""".stripMargin,

    // v12 governance chain: NFC -> dedup-on-canonical -> quality gate ->
    // k-anonymity drop; every stage's arithmetic shared verbatim with its
    // standalone twin (planted decomposed prefixes as in
    // x5_unicode_normalize; quality formula as in x5_quality over the
    // canonicalized text; class filter as in x5_k_anonymity with rows at
    // risk dropped).
    "x8_curation_v12" ->
      """WITH v12d AS (SELECT doc_id, lang, source,
        |  nfc_normalize((['Cafe\u0301', '\u212B', '\u1100\u1161\u11A8',
        |    'e\u0302tre', 'A\u030A', '\u2126'])[(doc_id % 6) + 1]
        |    || ' ' || text) AS rawnt
        |FROM documents),
        |v12k AS (SELECT *, row_number() OVER (PARTITION BY rawnt ORDER BY doc_id) AS rn
        |  FROM v12d),
        |v12u AS (SELECT doc_id, lang, source,
        |  regexp_replace(trim(lower(rawnt)), '\s+', ' ', 'g') AS nt
        |FROM v12k WHERE rn = 1),
        |v12w AS (SELECT doc_id, lang, source, nt,
        |  list_filter(string_split(nt, ' '), x -> len(x) > 0) AS ws FROM v12u),
        |v12m AS (SELECT doc_id, lang, source, nt, len(ws) AS nw,
        |  coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS sumlen,
        |  len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','the','a','and','of','to','in','is','el','la','de','y','que','los','un','le','et','les','des','une','de0','shi0','le0','bu0','wo0','zai0','you0'], x))) AS nstop
        |FROM v12w),
        |v12q AS (SELECT doc_id, lang, source,
        |  CAST(floor(length(nt) / 500.0) AS BIGINT) AS len_bucket,
        |  round((least(nw/50.0, 1.0)
        |       + (CASE WHEN sumlen*1.0/greatest(nw, 1) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
        |       + least((nstop*1.0/greatest(nw, 1))*5, 1.0))/3.0, 6) AS quality_score
        |FROM v12m),
        |v12g AS (SELECT * FROM v12q WHERE quality_score >= 0.5),
        |v12c AS (SELECT *, count(*) OVER (PARTITION BY lang, source, len_bucket)
        |  AS class_size FROM v12g)
        |SELECT doc_id, lang, source, quality_score, class_size
        |FROM v12c WHERE class_size >= 5 ORDER BY doc_id""".stripMargin,

    // k-anonymity twins: the same window/grouping arithmetic verbatim
    // (bucket via double division — exact at the only reachable
    // boundaries, k*1000.00 being IEEE-exact; BIGINT casts per the
    // HUGEINT dtype lesson).
    "x5_k_anonymity" ->
      """WITH kan AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
        |  c_mktsegment AS segment,
        |  CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT) AS bal_bucket
        |FROM customer),
        |kc AS (SELECT *, count(*) OVER (PARTITION BY nationkey, segment, bal_bucket)
        |  AS class_size FROM kan)
        |SELECT c_custkey,
        |  CASE WHEN class_size < 10 THEN NULL ELSE nationkey END AS nationkey,
        |  CASE WHEN class_size < 10 THEN NULL ELSE segment END AS segment,
        |  CASE WHEN class_size < 10 THEN NULL ELSE bal_bucket END AS bal_bucket,
        |  class_size, class_size < 10 AS suppressed
        |FROM kc ORDER BY c_custkey""".stripMargin,

    "x5_k_anonymity_audit" ->
      """WITH kaa AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  c_mktsegment AS segment,
        |  CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT) AS bal_bucket
        |FROM customer),
        |ks AS (SELECT count(*) AS sz FROM kaa GROUP BY nationkey, segment, bal_bucket)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_rows, count(*) AS n_classes,
        |  CAST(sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_classes,
        |  CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        |  CAST(min(sz) AS BIGINT) AS min_class_size
        |FROM ks""".stripMargin,

    // NFC twin: same planted decomposed sequences (\u escapes resolve at
    // Scala compile time into raw UTF-8 inside the SQL text), normalized
    // by DuckDB's utf8proc NFC — both engines implement UAX #15, so the
    // normalized strings hash bit-for-bit.
    "x5_unicode_normalize" ->
      """WITH und AS (SELECT doc_id,
        |  (['Cafe\u0301', '\u212B', '\u1100\u1161\u11A8', 'e\u0302tre',
        |    'A\u030A', '\u2126'])[(doc_id % 6) + 1] || ' ' || text AS dirty
        |FROM documents)
        |SELECT doc_id, nfc_normalize(dirty) AS norm_text,
        |  nfc_normalize(dirty) != dirty AS changed,
        |  length(nfc_normalize(dirty)) AS n_chars_norm
        |FROM und ORDER BY doc_id""".stripMargin,

    // The CMS heavy-hitter gate: exact top-50 word counts verbatim;
    // DuckDB cannot reproduce Spark's Count-Min registers, so the twin
    // asserts the IN-PLAN booleans — one-sided error, the eps*N
    // over-estimate bound, and union-vs-one-shot merge consistency.
    "x6_cms_heavy_hitters" ->
      """WITH cmw AS (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |cmf AS (SELECT w, count(*) AS n_occurrences FROM cmw WHERE len(w) > 0 GROUP BY w)
        |SELECT w AS word, n_occurrences, true AS est_lower_ok,
        |  true AS est_upper_ok, true AS merge_consistent
        |FROM cmf ORDER BY n_occurrences DESC, w LIMIT 50""".stripMargin,

    // The approx-anomaly gate: the exact report verbatim plus the rank
    // accuracy contract — DuckDB cannot reproduce Spark's GK percentile
    // sketch, so the twin asserts the IN-PLAN 45–55%-rank-window booleans
    // are true on every row (the x10_dq_profile_approx gate pattern).
    "x10_anomaly_mad_approx" ->
      """WITH amed AS (SELECT event_type,
        |    round(quantile_cont(value, 0.5), 6) AS med
        |  FROM events GROUP BY event_type),
        |amad AS (SELECT e.event_type, any_value(m.med) AS med,
        |    round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
        |  FROM events e JOIN amed m USING (event_type) GROUP BY e.event_type)
        |SELECT e.event_type, count(*) AS n, any_value(s.med) AS med,
        |  any_value(s.mad) AS mad,
        |  CAST(sum(CASE WHEN abs(e.value - s.med) >
        |    CAST(5.1891 AS DOUBLE) * s.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  true AS med_rank_ok, true AS mad_rank_ok
        |FROM events e JOIN amad s USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // Mirrors Diff.snapshotDiff + the report agg: the mutated twin is
    // derived by the same deterministic rules, the join is FULL OUTER on
    // the key, and per-column null-safe compares (IS NOT DISTINCT FROM =
    // Spark's <=>) decide changed vs unchanged.
    "x10_table_diff" ->
      """WITH dbase AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |              FROM orders),
        |dmut AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 89 = 1 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM dbase WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT -(o_orderkey + 1), o_custkey, o_orderstatus, o_totalprice
        |  FROM dbase WHERE o_orderkey % 101 = 0),
        |dd AS (
        |  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
        |    CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |         WHEN b.o_orderkey IS NULL THEN 'removed'
        |         WHEN (a.o_custkey IS NOT DISTINCT FROM b.o_custkey)
        |          AND (a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus)
        |          AND (a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice)
        |           THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM dbase a FULL OUTER JOIN dmut b ON a.o_orderkey = b.o_orderkey)
        |SELECT status, count(*) AS n, min(k) AS min_key, max(k) AS max_key
        |FROM dd GROUP BY status ORDER BY status""".stripMargin,

    // The quadratic all-pairs twin of the SymSpell deletion-banded edit-
    // distance join: hash equality proves banding recall is exactly 1.
    "x2_fuzzy_names" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // JW-rerank twin: the same quadratic pair derivation scored with
    // DuckDB's own jaro_winkler_similarity — the native graft expression
    // is pinned to that reference implementation value-for-value
    // (StringSimilaritySpec), so the 6-dp rounds agree.
    "x2_jw_rerank" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  levenshtein(a.c_name, b.c_name) AS dist,
        |  round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // The NAIVE theta-join form planned through FuzzyJoinRewrite — same
    // all-pairs twin; hash equality gates the optimizer rule on real data.
    "x2_fuzzy_names_sql" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  levenshtein(a.c_name, b.c_name) AS dist,
        |  true AS rewrite_banded, true AS merge_pinned
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // X11 persist→reload→score: the twin is the FRESH-FIT chain verbatim —
    // hash equality is exactly the claim that the ModelStore parquet
    // round-trip of the weight vector changes no scored bit.
    "x11_model_reload" ->
      s"""WITH $LogregScoreChain
         |SELECT doc_id, score, (score > 0.5) AS pred FROM lrsc ORDER BY doc_id""".stripMargin,

    // Mirrors Classify.confusionEval over both classifiers' predictions
    // against the shared domain-trust labels: NbScoreChain + LogregTail
    // composed once (the trust chain appears exactly once), four
    // conditional sums per model, metrics in exact integer micro-units
    // (floor //) — the fixed-point ratio discipline.
    "x5_classifier_eval" ->
      s"""WITH $NbScoreChain,
         |$LogregTail,
         |lbl AS (SELECT d.doc_id, (dmr.r > 4) AS label
         |        FROM documents d JOIN dmr ON dmr.source = d.source),
         |evu AS (SELECT 'nb' AS model, l.label, (s.llr > 0) AS pred
         |        FROM lbl l JOIN nbs s USING (doc_id)
         |        UNION ALL
         |        SELECT 'logreg' AS model, l.label, (s.score > 0.5) AS pred
         |        FROM lbl l JOIN lrsc s USING (doc_id)),
         |evc AS (SELECT model, count(*) AS n,
         |    CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM evu GROUP BY model)
         |SELECT model, n, tp, fp, fn, tn,
         |  CAST(CASE WHEN n = 0 THEN -1 ELSE (1000000 * (tp + tn)) // n END AS BIGINT) AS accuracy_micros,
         |  CAST(CASE WHEN tp + fp = 0 THEN -1 ELSE (1000000 * tp) // (tp + fp) END AS BIGINT) AS precision_micros,
         |  CAST(CASE WHEN tp + fn = 0 THEN -1 ELSE (1000000 * tp) // (tp + fn) END AS BIGINT) AS recall_micros,
         |  CAST(CASE WHEN 2*tp + fp + fn = 0 THEN -1 ELSE (2000000 * tp) // (2*tp + fp + fn) END AS BIGINT) AS f1_micros
         |FROM evc ORDER BY model""".stripMargin,

    // Mirrors Drift.psiReport on the quality-score halves: IEEE
    // double-product binning (floor(score*10) capped at 9), add-one
    // smoothed shares divided in DOUBLE (never bare-decimal literals),
    // 6-dp-rounded PSI terms summed in exact DECIMAL.
    "x5_feature_drift" ->
      s"""WITH $QualityScoreChain,
         |fdb AS (SELECT CAST(greatest(least(floor(score*10), 9), 0) AS INT) AS bin, doc_id % 2 AS h
         |        FROM qs WHERE score IS NOT NULL),
         |fdr AS (SELECT bin, count(*) AS ref_count FROM fdb WHERE h = 0 GROUP BY bin),
         |fdc AS (SELECT bin, count(*) AS cur_count FROM fdb WHERE h = 1 GROUP BY bin),
         |fds AS (SELECT unnest(generate_series(0, 9)) AS bin),
         |fdj AS (SELECT fds.bin, coalesce(fdr.ref_count, 0) AS ref_count,
         |               coalesce(fdc.cur_count, 0) AS cur_count
         |        FROM fds LEFT JOIN fdr USING (bin) LEFT JOIN fdc USING (bin)),
         |fdt AS (SELECT sum(ref_count) AS rt, sum(cur_count) AS ct FROM fdj),
         |fdm AS (SELECT bin, ref_count, cur_count,
         |    round((CAST(ref_count+1 AS DOUBLE)/CAST(rt+10 AS DOUBLE)
         |         - CAST(cur_count+1 AS DOUBLE)/CAST(ct+10 AS DOUBLE))
         |      * ln((CAST(ref_count+1 AS DOUBLE)/CAST(rt+10 AS DOUBLE))
         |          / (CAST(cur_count+1 AS DOUBLE)/CAST(ct+10 AS DOUBLE))), 6) AS psi_term
         |  FROM fdj, fdt)
         |SELECT bin, CAST(ref_count AS BIGINT) AS ref_count,
         |  CAST(cur_count AS BIGINT) AS cur_count, psi_term,
         |  round(CAST(sum(CAST(psi_term AS DECIMAL(18,6))) OVER () AS DOUBLE), 6) AS psi
         |FROM fdm ORDER BY bin""".stripMargin,

    // Split cuts are interpolated from Sampling.cumulativeCuts — the exact
    // IEEE doubles the Spark comparison uses (0.9 + 0.05 != literal 0.95).
    "x7_split" -> {
      val cuts = graft.ops.Sampling.cumulativeCuts(graft.ops.Sampling.DefaultSplits)
      val names = graft.ops.Sampling.DefaultSplits.map(_._1)
      val cases = names.init.zip(cuts.init)
        .map { case (n, c) => s"WHEN u < $c THEN '$n'" }.mkString(" ")
      s"""WITH u AS (SELECT doc_id, $hashUnit AS u FROM documents)
         |SELECT doc_id, CASE $cases ELSE '${names.last}' END AS split
         |FROM u ORDER BY doc_id""".stripMargin
    },

    // Mirrors Sampling.shuffleShards (seed "r8", 16 shards): shard = first
    // 32 md5 bits mod 16, pos = within-shard rank of the full lowercase-hex
    // digest (id tiebreak) — the twin replays the permutation
    // position-for-position.
    "x7_shuffle_shards" ->
      """WITH sh AS (SELECT doc_id, md5('r8:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |sa AS (SELECT doc_id, h,
        |    CAST(('0x' || substr(h, 1, 8))::BIGINT % 16 AS INT) AS shard FROM sh)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM sa ORDER BY doc_id""".stripMargin,

    "x7_stratified_sample" ->
      s"""WITH u AS (SELECT doc_id, lang, source, $hashUnit AS u FROM documents),
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang, source ORDER BY u, doc_id) AS rk,
         |             count(*) OVER (PARTITION BY lang, source) AS n
         |      FROM u)
         |SELECT doc_id, lang, source FROM r WHERE rk <= ceil(n * 0.25) ORDER BY doc_id""".stripMargin,

    // Mirrors Sampling.ppsSample at expected size 60: the inclusion test
    // is the exact integer comparison hash32·W < w·n·2^32 (HUGEINT here,
    // DECIMAL(38,0) in Spark — both exact 128-bit paths), so the weighted
    // draw replays bit-for-bit with no floating point on either side.
    // the seeded md5-rank permutation replayed verbatim: hash desc then
    // id asc — identical tie order to the TopKAgg heap's (score desc,
    // id asc) survivor convention
    "x7_fixed_k_sample" ->
      """SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id
        |FROM (SELECT event_type, event_id,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY ('0x' || substr(md5('r11|' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT DESC,
        |      event_id ASC) AS rank
        |  FROM events)
        |WHERE rank <= 40 ORDER BY event_type, rank""".stripMargin,

    "x7_pps_sample" ->
      s"""WITH ptw AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS w
         |  FROM documents),
         |ptt AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM ptw)
         |SELECT doc_id, w AS n_tokens FROM ptw, ptt
         |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)::HUGEINT * tot::HUGEINT
         |    < w::HUGEINT * 60 * 4294967296
         |ORDER BY doc_id""".stripMargin,

    "x7_token_quota" ->
      s"""WITH b AS (SELECT source, doc_id,
         |             CAST(len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         |             $hashUnit AS u
         |           FROM documents),
         |c AS (SELECT source, doc_id, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |      FROM b)
         |SELECT source, doc_id, n_tokens, cum_tokens FROM c
         |WHERE cum_tokens <= 800 ORDER BY source, cum_tokens""".stripMargin,

    // Contamination.contaminationReport twin: distinct trigram md5-60
    // hashes per doc; benchmark = doc_id % 20 = 0, train = the rest.
    "x7_decontaminate" ->
      s"""WITH w AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest(CASE WHEN len(ws) >= 3
         |           THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
         |           ELSE [array_to_string(ws, ' ')] END) AS s
         |       FROM w),
         |g AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS g FROM sh),
         |bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 20 = 0)
         |SELECT t.doc_id, count(*) AS n_overlap_grams
         |FROM g t JOIN bg USING (g) WHERE t.doc_id % 20 <> 0
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Components.dedupClusters twin: same minhash pair chain, closed with
    // a recursive transitive-reachability CTE; component = min reachable
    // id (self included via the symmetric edge list).
    "x7_dedup_clusters" ->
      s"""WITH RECURSIVE ${componentsChain("documents")}
         |SELECT id, component, id = component AS is_keeper FROM comp ORDER BY id""".stripMargin,

    // Mirrors Components.keepBestClusters over the same minhash pairs:
    // identical recursive closure, then the argmax-tokens window (ties ->
    // min id) — the POLICY sits under the gate, not just the clustering.
    "x7_dedup_keep_best" ->
      s"""WITH RECURSIVE ${componentsChain("documents")},
         |tokc AS (SELECT doc_id, CAST(len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS ntk
         |        FROM documents),
         |krk AS (SELECT c.id, c.component, t.ntk AS score,
         |        row_number() OVER (PARTITION BY c.component ORDER BY t.ntk DESC, c.id) AS rn
         |      FROM comp c JOIN tokc t ON t.doc_id = c.id)
         |SELECT id, component, score, (rn = 1) AS is_keeper FROM krk ORDER BY id""".stripMargin,

    // Mirrors TextAnalysis.pmiCollocations: map-side adjacent bigrams, one
    // unigram + one bigram count agg, B = the UNFILTERED bigram total, PMI
    // assembled from five 6-dp lns in exact DECIMAL(18,6) (x5_lm_score
    // discipline), top-50 by (pmi DESC, w1, w2) at min pair count 5.
    "x6_pmi" ->
      s"""WITH w AS (SELECT $wordsOf AS ws FROM documents),
         |tok AS (SELECT unnest(ws) AS w FROM w),
         |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
         |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
         |bgl AS (SELECT unnest(list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1])) AS g
         |       FROM w WHERE len(ws) >= 2),
         |big AS (SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2,
         |        CAST(count(*) AS BIGINT) AS cab FROM bgl GROUP BY 1, 2),
         |bt AS (SELECT CAST(sum(cab) AS BIGINT) AS bn FROM big),
         |p AS (SELECT f.w1, f.w2, f.cab AS n_pair, CAST(
         |      CAST(round(ln(CAST(f.cab AS DOUBLE)), 6) AS DECIMAL(18,6))
         |    + CAST(round(ln(CAST(nt.n AS DOUBLE)), 6) AS DECIMAL(18,6))
         |    + CAST(round(ln(CAST(nt.n AS DOUBLE)), 6) AS DECIMAL(18,6))
         |    - CAST(round(ln(CAST(bt.bn AS DOUBLE)), 6) AS DECIMAL(18,6))
         |    - CAST(round(ln(CAST(u1.c AS DOUBLE)), 6) AS DECIMAL(18,6))
         |    - CAST(round(ln(CAST(u2.c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS DOUBLE) AS pmi
         |   FROM big f JOIN uni u1 ON f.w1 = u1.w JOIN uni u2 ON f.w2 = u2.w
         |   CROSS JOIN nt CROSS JOIN bt
         |   WHERE f.cab >= 5)
         |SELECT w1, w2, n_pair, pmi FROM p ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,

    // Mirrors x8CurationV6. Visual exact-dedup (dHash, maxHamming 0): the
    // Spark side runs pairs -> union-find -> argmax, but hamming-0
    // components are exactly dhash EQUALITY CLASSES (equality is
    // transitive), so the twin groups by dhash — the gate proves the real
    // machinery collapses to equality classes. Then the x5_gopher_rules
    // keep conjunction and the strict 800-token-per-source quota, both
    // copied verbatim from their per-stage twins.
    "x8_curation_v6" ->
      s"""WITH $DHashChain,
         |vtok AS (SELECT doc_id, CAST(len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS ntk
         |        FROM documents),
         |vgrp AS (SELECT dh.doc_id, dh.dhash, t.ntk,
         |        count(*) OVER (PARTITION BY dh.dhash) AS gn,
         |        row_number() OVER (PARTITION BY dh.dhash ORDER BY t.ntk DESC, dh.doc_id) AS rn
         |      FROM dh JOIN vtok t USING (doc_id)),
         |keepv AS (SELECT doc_id, ntk FROM vgrp WHERE gn = 1 OR rn = 1),
         |b AS (SELECT d.doc_id, $norm AS nt FROM documents d JOIN keepv USING (doc_id)),
         |$GopherChain,
         |gk AS (SELECT m.doc_id FROM m LEFT JOIN rep ON rep.doc_id = m.doc_id
         |      WHERE $GopherKeep),
         |qq AS (SELECT d.source, d.doc_id, k.ntk AS n_tokens, $hashUnit AS u
         |      FROM documents d JOIN gk USING (doc_id) JOIN keepv k USING (doc_id)),
         |qc AS (SELECT source, doc_id, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |      FROM qq)
         |SELECT source, doc_id, n_tokens, cum_tokens FROM qc
         |WHERE cum_tokens <= 800 ORDER BY source, cum_tokens""".stripMargin,

    // Patterns interpolated from TextAnalysis.PiiPatterns so the two
    // engines can never drift; 'g' mirrors Spark's replace-all default.
    "x5_pii_scrub" -> {
      val Seq((email, er), (ip, ir), (phone, pr)) = graft.ops.TextAnalysis.PiiPatterns
      // counts mirror piiCount: each pattern counted on the text with the
      // EARLIER patterns already scrubbed (no double-count of IPs as phones)
      s"""WITH s1 AS (SELECT doc_id, text,
         |              regexp_replace(text, '$email', '$er', 'g') AS t1 FROM documents),
         |s2 AS (SELECT *, regexp_replace(t1, '$ip', '$ir', 'g') AS t2 FROM s1)
         |SELECT doc_id,
         |  regexp_replace(t2, '$phone', '$pr', 'g') AS clean_text,
         |  len(regexp_extract_all(text, '$email')) + len(regexp_extract_all(t1, '$ip'))
         |    + len(regexp_extract_all(t2, '$phone')) AS n_pii
         |FROM s2 ORDER BY doc_id""".stripMargin
    },

    // Mirrors TextAnalysis.collapseRepeats: keep word i iff first-of-run
    // (DuckDB's indexed list_filter, 1-based; Spark's filter lambda,
    // 0-based — both compare against the predecessor).
    "x5_collapse_repeats" ->
      s"""WITH w AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |k AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         |        list_filter(ws, (x, i) -> i = 1 OR x <> ws[i-1]) AS kept
         |      FROM w)
         |SELECT doc_id, n_words, CAST(len(kept) AS BIGINT) AS n_kept,
         |  md5(array_to_string(kept, ' ')) AS clean_md5
         |FROM k ORDER BY doc_id""".stripMargin,

    // Mirrors TextAnalysis.tfidfKeywords: sklearn-smoothed idf
    // ln((1+N)/(1+df)) + 1 rounded 6dp, score = tf * idf rounded 6dp,
    // top-3 per doc with token tiebreak.
    "x6_tfidf_keywords" ->
      s"""WITH w AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |t AS (SELECT doc_id, unnest(ws) AS token FROM w),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
         |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY 1),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS ndoc FROM documents),
         |idf AS (SELECT token, round(ln((1 + ndoc) * 1.0 / (1 + dfc)) + 1, 6) AS idf FROM dfq, nd),
         |s AS (SELECT tf.doc_id, tf.token, tf.tf, round(tf.tf * idf.idf, 6) AS score
         |      FROM tf JOIN idf USING (token))
         |SELECT doc_id, CAST(rn AS BIGINT) AS rank, token, tf, score
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) rn FROM s)
         |WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin,

    // Mirrors TextAnalysis.bm25Search (k1=1.2, b=0.75): idf =
    // ln(1+(N-df+0.5)/(df+0.5)) rounded 6dp, per-term contributions
    // rounded 6dp and summed through exact DECIMAL, constants written as
    // the same folded literals (k1+1=2.2, 1-b=0.25).
    "x6_bm25_search" ->
      s"""WITH w AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |dw AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM w),
         |t AS (SELECT doc_id, dl, unnest(ws) AS token FROM dw),
         |tf AS (SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2, 3),
         |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY 1),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS ndoc, CAST(sum(dl) AS BIGINT) AS sumdl FROM dw),
         |q(query_id, qtext) AS (VALUES
         |  ('q_join', 'spark join filter'),
         |  ('q_scan', 'table scan fast'),
         |  ('q_window', 'window order batch')),
         |qt AS (SELECT DISTINCT query_id, token FROM (
         |  SELECT query_id, unnest(list_filter(string_split(regexp_replace(trim(lower(qtext)), '\\s+', ' ', 'g'), ' '), x -> len(x) > 0)) AS token FROM q)),
         |idf AS (SELECT query_id, token, round(ln(1.0 + (ndoc - dfc + 0.5) / (dfc + 0.5)), 6) AS idf
         |      FROM qt JOIN dfq USING (token), st),
         |pt AS (SELECT idf.query_id, tf.doc_id,
         |        round(idf.idf * (tf.tf * CAST(2.2 AS DOUBLE)) /
         |          (tf.tf + 1.2 * (0.25 + 0.75 * dl / (sumdl * 1.0 / ndoc))), 6) AS contrib
         |      FROM tf JOIN idf USING (token), st),
         |sc AS (SELECT query_id, doc_id,
         |        round(CAST(sum(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE), 6) AS score,
         |        CAST(count(*) AS BIGINT) AS n_terms
         |      FROM pt GROUP BY 1, 2)
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, score, n_terms
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) rn FROM sc)
         |WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,

    // v13 training-export chain: quality gate (QualityScoreChain
    // verbatim) -> min-id dedup on the canonical text -> pack window
    // arithmetic copied from the x7_pack_sequences twin, collapsed to
    // per-source totals (n_sequences = ceil(total/512) = the last
    // doc's last_seq + 1).
    "x8_curation_v13" ->
      s"""WITH $QualityScoreChain,
         |gk AS (SELECT doc_id, source FROM qs WHERE score >= 0.5),
         |db AS (SELECT d.doc_id, d.source, $norm AS nt
         |       FROM documents d JOIN gk USING (doc_id)),
         |dd AS (SELECT doc_id, source, nt,
         |        row_number() OVER (PARTITION BY nt ORDER BY doc_id) AS rn FROM db),
         |kept AS (SELECT doc_id, source, nt FROM dd WHERE rn = 1),
         |pb AS (SELECT source, doc_id,
         |        CAST(len(regexp_extract_all(nt, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         |        $hashUnit AS u
         |      FROM kept),
         |pc AS (SELECT source, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM pb WHERE n_tokens > 0),
         |raw AS (SELECT source, CAST(count(*) AS BIGINT) AS n_raw FROM documents GROUP BY 1),
         |qn AS (SELECT source, CAST(count(*) AS BIGINT) AS n_quality FROM gk GROUP BY 1),
         |dn AS (SELECT source, CAST(count(*) AS BIGINT) AS n_dedup FROM kept GROUP BY 1),
         |pk AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs_packed,
         |        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |        CAST((max(cum) + 511) // 512 AS BIGINT) AS n_sequences
         |      FROM pc GROUP BY 1)
         |SELECT r.source, r.n_raw,
         |  coalesce(q.n_quality, 0) AS n_quality,
         |  coalesce(d.n_dedup, 0) AS n_dedup,
         |  coalesce(p.n_docs_packed, 0) AS n_docs_packed,
         |  coalesce(p.n_tokens, 0) AS n_tokens,
         |  coalesce(p.n_sequences, 0) AS n_sequences
         |FROM raw r LEFT JOIN qn q USING (source) LEFT JOIN dn d USING (source)
         |  LEFT JOIN pk p USING (source)
         |ORDER BY source""".stripMargin,

    // Hard negatives = the bm25 search twin plus the not-all-terms
    // filter (positives-by-definition excluded); arithmetic shared
    // verbatim with x6_bm25_search.
    "x6_hard_negatives" ->
      s"""WITH w AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |dw AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM w),
         |t AS (SELECT doc_id, dl, unnest(ws) AS token FROM dw),
         |tf AS (SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2, 3),
         |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY 1),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS ndoc, CAST(sum(dl) AS BIGINT) AS sumdl FROM dw),
         |q(query_id, qtext) AS (VALUES
         |  ('q_join', 'spark join filter'),
         |  ('q_scan', 'table scan fast'),
         |  ('q_window', 'window order batch')),
         |qt AS (SELECT DISTINCT query_id, token FROM (
         |  SELECT query_id, unnest(list_filter(string_split(regexp_replace(trim(lower(qtext)), '\\s+', ' ', 'g'), ' '), x -> len(x) > 0)) AS token FROM q)),
         |idf AS (SELECT query_id, token, round(ln(1.0 + (ndoc - dfc + 0.5) / (dfc + 0.5)), 6) AS idf
         |      FROM qt JOIN dfq USING (token), st),
         |qn AS (SELECT query_id, CAST(count(DISTINCT token) AS BIGINT) AS nq FROM idf GROUP BY 1),
         |pt AS (SELECT idf.query_id, tf.doc_id,
         |        round(idf.idf * (tf.tf * CAST(2.2 AS DOUBLE)) /
         |          (tf.tf + 1.2 * (0.25 + 0.75 * dl / (sumdl * 1.0 / ndoc))), 6) AS contrib
         |      FROM tf JOIN idf USING (token), st),
         |sc AS (SELECT query_id, doc_id,
         |        round(CAST(sum(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE), 6) AS score,
         |        CAST(count(*) AS BIGINT) AS n_terms
         |      FROM pt GROUP BY 1, 2)
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, score, n_terms,
         |  nq AS n_query_terms
         |FROM (SELECT sc.*, qn.nq, row_number() OVER (PARTITION BY sc.query_id ORDER BY score DESC, doc_id) rn
         |      FROM sc JOIN qn USING (query_id) WHERE n_terms < nq)
         |WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,

    // Mirrors TextAnalysis.charTrigramLmFit + lmScore: 20% md5 sample,
    // add-one char-trigram logps rounded 6dp at the model boundary (ln
    // agrees across engines to 1 ulp), per-doc mean through an exact
    // DECIMAL(18,6) sum so aggregation order cannot move a score. Chain
    // shared with x8_curation_v2 ([[LmChain]]).
    "x5_lm_score" ->
      s"""WITH b AS (SELECT doc_id, $norm AS nt FROM documents),
         |$LmChain,
         |lma AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(CAST(lp AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS su,
         |    CAST(sum(oov) AS BIGINT) AS oo
         |  FROM j GROUP BY 1)
         |SELECT doc_id, n AS n_grams,
         |  CAST(CASE WHEN su >= 0 THEN (2*su + n) // (2*n)
         |       ELSE -((2*(-su) + n) // (2*n)) END AS DOUBLE) / 1000000.0 AS lm_score,
         |  CAST((2*oo*1000000 + n) // (2*n) AS DOUBLE) / 1000000.0 AS oov_frac
         |FROM lma ORDER BY doc_id""".stripMargin,

    // Mirrors TextAnalysis.gopherRules (minWords=30, alpha>=0.8,
    // top_word<=0.15): per-rule verdicts over the SAME 6-dp-rounded metrics
    // as x5_quality / x5_repetition, LEFT-joined repetition flags coalesced
    // false for wordless docs. Chain + keep predicate shared with
    // x8_curation_v2 ([[GopherChain]]/[[GopherKeep]]).
    "x5_gopher_rules" ->
      s"""WITH b AS (SELECT doc_id, $norm AS nt FROM documents),
         |$GopherChain
         |SELECT m.doc_id, CAST(nw AS BIGINT) AS n_words,
         |  (nw BETWEEN 30 AND 100000) AS rule_n_words,
         |  (round(sumlen*1.0/greatest(nw, 1), 6) BETWEEN 3.0 AND 10.0) AS rule_mean_word_len,
         |  (round(len(regexp_replace(nt, '[^a-z]', '', 'g'))*1.0/greatest(len(nt), 1), 6) >= 0.8) AS rule_alpha_ratio,
         |  (nstop >= 1) AS rule_stopwords,
         |  coalesce(rule_top_word, FALSE) AS rule_top_word,
         |  coalesce(rule_dup_2gram, FALSE) AS rule_dup_2gram,
         |  ($GopherKeep) AS keep
         |FROM m LEFT JOIN rep ON rep.doc_id = m.doc_id
         |ORDER BY m.doc_id""".stripMargin,

    "x5_repetition" ->
      s"""WITH w AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |t AS (SELECT doc_id, unnest(ws) AS tk FROM w),
         |wc AS (SELECT doc_id, tk, count(*) AS c FROM t GROUP BY 1, 2),
         |wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nw, max(c) AS top FROM wc GROUP BY 1),
         |g AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
         |        THEN list_distinct(list_transform(generate_series(1, len(ws)-1), i -> array_to_string(ws[i:i+1], ' ')))
         |        ELSE [array_to_string(ws, ' ')] END) AS gm
         |      FROM w),
         |ga AS (SELECT doc_id, count(*) AS n2d FROM g GROUP BY 1)
         |SELECT wa.doc_id, nw AS n_words,
         |  round(top*1.0/nw, 6) AS top_word_frac,
         |  CASE WHEN nw <= 1 THEN 0.0 ELSE round(1.0 - n2d*1.0/(nw-1), 6) END AS dup_2gram_frac
         |FROM wa JOIN ga ON wa.doc_id = ga.doc_id ORDER BY wa.doc_id""".stripMargin,

    "x7_pack_sequences" ->
      s"""WITH b AS (SELECT source, doc_id,
         |             CAST(len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         |             $hashUnit AS u
         |           FROM documents),
         |c AS (SELECT source, doc_id, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM b WHERE n_tokens > 0)
         |SELECT source, doc_id, n_tokens, cum - n_tokens AS start_offset,
         |  (cum - n_tokens) // 512 AS first_seq, (cum - 1) // 512 AS last_seq
         |FROM c ORDER BY source, start_offset""".stripMargin,

    "x7_pack_occupancy" ->
      s"""WITH b AS (SELECT source, doc_id,
         |             CAST(len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         |             $hashUnit AS u
         |           FROM documents),
         |c AS (SELECT source, doc_id, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM b WHERE n_tokens > 0),
         |placed AS (SELECT source, n_tokens, cum - n_tokens AS off,
         |             (cum - n_tokens) // 512 AS fs, (cum - 1) // 512 AS ls FROM c),
         |spanned AS (SELECT source, n_tokens, off, unnest(generate_series(fs, ls)) AS seq_id
         |            FROM placed)
         |SELECT source, seq_id, count(*) AS n_docs,
         |  CAST(sum(least(off + n_tokens, (seq_id + 1) * 512) - greatest(off, seq_id * 512)) AS BIGINT) AS n_tokens
         |FROM spanned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Apply step: corpus minus non-keeper cluster members (same recursive
    // closure as x7_dedup_clusters).
    "x7_dedup_apply" ->
      s"""WITH RECURSIVE ${componentsChain("documents")}
         |SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
         |ORDER BY doc_id""".stripMargin,

    // The composed curation pipeline, stage for stage the Spark plan:
    // Mirrors x8CurationV2: gopher keep (x5_gopher_rules semantics) ->
    // LM floor -5.43 (x5_lm_score semantics, model fit on the RAW corpus's
    // 20% sample) -> uniform-lang mixture at 80% of the FILTERED corpus ->
    // train split -> pack per source. Each sub-chain is copied verbatim
    // from its per-stage twin so the composition cannot drift from the
    // stages it composes.
    "x8_curation_v2" -> {
      val c0 = graft.ops.Sampling.cumulativeCuts(graft.ops.Sampling.DefaultSplits).head
      s"""WITH b AS (SELECT doc_id, $norm AS nt FROM documents),
         |$GopherChain,
         |gk AS (SELECT m.doc_id FROM m LEFT JOIN rep ON rep.doc_id = m.doc_id
         |      WHERE $GopherKeep),
         |$LmChain,
         |lsa AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         |      sum(CAST(CAST(lp AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS su
         |    FROM j GROUP BY 1),
         |ls AS (SELECT doc_id FROM lsa
         |      WHERE (CASE WHEN su >= 0 THEN (2*su + n) // (2*n)
         |             ELSE -((2*(-su) + n) // (2*n)) END) >= -5430000),
         |fd AS (SELECT d.* FROM documents d JOIN gk USING (doc_id) JOIN ls USING (doc_id)),
         |mc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM fd GROUP BY lang),
         |mt AS (SELECT sum(n) AS tot FROM mc),
         |mq AS (SELECT lang, least(1.0,
         |    (CASE lang WHEN 'de' THEN 0.2 WHEN 'en' THEN 0.2 WHEN 'es' THEN 0.2
         |               WHEN 'fr' THEN 0.2 WHEN 'zh' THEN 0.2 ELSE 0.0 END)
         |    * floor(0.8 * CAST(tot AS DOUBLE)) / n) AS f FROM mc, mt),
         |mx AS (SELECT fd.doc_id, fd.source, fd.text FROM fd JOIN mq ON mq.lang = fd.lang
         |      WHERE $hashUnit < mq.f),
         |pb AS (SELECT source, doc_id,
         |        CAST(len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         |        $hashUnit AS u
         |      FROM mx WHERE $hashUnit < $c0),
         |pc AS (SELECT source, doc_id, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM pb WHERE n_tokens > 0)
         |SELECT source, doc_id, n_tokens, cum - n_tokens AS start_offset,
         |  (cum - n_tokens) // 512 AS first_seq, (cum - 1) // 512 AS last_seq
         |FROM pc ORDER BY source, start_offset""".stripMargin
    },

    // clean (x6 semantics) -> decontaminate (x7d, benchmark = doc_id%20=0
    // of the RAW corpus) -> near-dup dedup over the survivors (minhash +
    // recursive components) -> split (keep 'train') -> pack per source.
    "x8_curation_pipeline" -> {
      val c0 = graft.ops.Sampling.cumulativeCuts(graft.ops.Sampling.DefaultSplits).head
      s"""WITH RECURSIVE
         |cw AS (SELECT doc_id, $norm AS nt, $wordsOf AS ws FROM documents),
         |cm AS (SELECT doc_id, nt, ws, len(ws) AS nw,
         |        coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS sumlen,
         |        len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','the','a','and','of','to','in','is','el','la','de','y','que','los','un','le','et','les','des','une','de0','shi0','le0','bu0','wo0','zai0','you0'], x))) AS nstop,
         |        len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein'], x))) AS s_de,
         |        len(list_filter(ws, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS s_en,
         |        len(list_filter(ws, x -> list_contains(['el','la','de','y','que','los','un'], x))) AS s_es,
         |        len(list_filter(ws, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS s_fr,
         |        len(list_filter(ws, x -> list_contains(['de0','shi0','le0','bu0','wo0','zai0','you0'], x))) AS s_zh
         |      FROM cw),
         |cs AS (SELECT doc_id, nt, nw,
         |        CASE WHEN s_de + s_en + s_es + s_fr + s_zh = 0 THEN 'und'
         |             WHEN s_zh > greatest(s_de, s_en, s_es, s_fr) THEN 'zh'
         |             WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
         |             WHEN s_es > greatest(s_de, s_en) THEN 'es'
         |             WHEN s_en > s_de THEN 'en' ELSE 'de' END AS pred_lang,
         |        round((least(nw/50.0, 1.0)
         |             + (CASE WHEN sumlen*1.0/greatest(nw, 1) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
         |             + least((nstop*1.0/greatest(nw, 1))*5, 1.0))/3.0, 6) AS quality_score
         |      FROM cm),
         |cleanids AS (SELECT min(doc_id) AS doc_id FROM cs
         |             WHERE pred_lang <> 'und' AND quality_score >= 0.5 AND nw >= 5
         |             GROUP BY md5(nt), pred_lang, quality_score),
         |gsh AS (SELECT DISTINCT doc_id,
         |          unnest(CASE WHEN len(ws) >= 3
         |            THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
         |            ELSE [array_to_string(ws, ' ')] END) AS s
         |        FROM cw),
         |gg AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS g FROM gsh),
         |bgr AS (SELECT DISTINCT g FROM gg WHERE doc_id % 20 = 0),
         |train1 AS (SELECT d.* FROM documents d
         |           JOIN cleanids USING (doc_id)
         |           WHERE doc_id % 20 <> 0
         |             AND doc_id NOT IN (SELECT t.doc_id FROM gg t JOIN bgr USING (g)
         |                                GROUP BY t.doc_id HAVING count(*) >= 10)),
         |${componentsChain("train1")},
         |pb AS (SELECT source, doc_id,
         |         CAST(len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         |         $hashUnit AS u
         |       FROM train1
         |       WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
         |         AND $hashUnit < $c0),
         |pc AS (SELECT source, doc_id, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |       FROM pb WHERE n_tokens > 0)
         |SELECT source, doc_id, n_tokens, cum - n_tokens AS start_offset,
         |  (cum - n_tokens) // 512 AS first_seq, (cum - 1) // 512 AS last_seq
         |FROM pc ORDER BY source, start_offset""".stripMargin
    },

    // Mirrors Dedup.substringSpans (k=10): every position's 10-token
    // window hashed with the portable 60-bit md5 hash mod the Mersenne
    // prime; windows whose hash occurs >1 time corpus-wide are duplicated;
    // per-doc island merge of overlapping-or-adjacent [p, p+9] intervals.
    "x1_substring_spans" ->
      s"""WITH ${SubstringSpanChain()}
         |SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
         |  CAST(max(e) AS BIGINT) AS span_end,
         |  CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens
         |FROM ssb GROUP BY doc_id, isl ORDER BY doc_id, span_start""".stripMargin,

    // Mirrors Dedup.substringScrub: tokens covered by any duplicated span
    // dropped (aggressive variant, all copies removed); certificate =
    // md5 of the survivors re-joined with single spaces. The span chain is
    // shared verbatim with x1_substring_spans so apply cannot drift from
    // find.
    "x1_substring_scrub" ->
      s"""WITH ${SubstringSpanChain()},
         |spn AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM ssb GROUP BY doc_id, isl),
         |tok AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS p FROM ssw),
         |tk AS (SELECT doc_id, p, ws[p] AS t FROM tok),
         |cov AS (SELECT DISTINCT tk.doc_id, tk.p FROM tk
         |        JOIN spn ON spn.doc_id = tk.doc_id AND tk.p BETWEEN spn.ss AND spn.se),
         |ag AS (SELECT tk.doc_id,
         |         CAST(count(*) AS BIGINT) AS n_tokens,
         |         CAST(count(cov.p) AS BIGINT) AS n_removed,
         |         md5(coalesce(string_agg(CASE WHEN cov.p IS NULL THEN tk.t END, ' ' ORDER BY tk.p), '')) AS clean_md5
         |       FROM tk LEFT JOIN cov ON cov.doc_id = tk.doc_id AND cov.p = tk.p
         |       GROUP BY 1)
         |SELECT d.doc_id, coalesce(ag.n_tokens, 0) AS n_tokens,
         |  coalesce(ag.n_removed, 0) AS n_removed,
         |  coalesce(ag.clean_md5, md5('')) AS clean_md5
         |FROM documents d LEFT JOIN ag USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // Mirrors Dsir.fitLogRatios + Dsir.score (buckets=4096, target =
    // doc_id % 20 = 0, source = rest): unigram+bigram occurrences hashed
    // into buckets, add-one-smoothed log-likelihood ratios per bucket
    // (each ln rounded 6 dp, difference re-rounded), per-doc mean through
    // exact DECIMAL(18,6) addends.
    "x7_dsir_score" ->
      s"""WITH ${DsirScoreChain()}
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  round(CAST(sum(CAST(log_ratio AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS dsir_score
         |FROM dsj GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // The DSIR selection step: top-100 by (score DESC, doc_id) over the
    // same scoring chain.
    "x7_dsir_topk" ->
      s"""WITH ${DsirScoreChain()},
         |dsc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |    round(CAST(sum(CAST(log_ratio AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS dsir_score
         |  FROM dsj GROUP BY 1)
         |SELECT CAST(row_number() OVER (ORDER BY dsir_score DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, n_grams, dsir_score
         |FROM dsc ORDER BY dsir_score DESC, doc_id LIMIT 100""".stripMargin,

    // Mirrors Similarity.pcaProject (dim=64, iters=5): exact-DECIMAL(27,10)
    // corpus mean, power iteration unrolled into 5 CTE stages — per-row
    // coefficient s = round6 of the index-order centered dot, per-dimension
    // accumulators through DECIMAL(18,6) addends, component re-normalized
    // and re-rounded at 6 dp each stage — then the final projection. The
    // same unroll technique as the k-means fit twin (kmeansCellChain).
    "x3_pca_project" ->
      s"""WITH $PcaChain
         |SELECT e.vec_id, round(list_sum(list_transform(generate_series(1, 64),
         |    i -> (e.ev[i] - ml.mv[i]) * v5.vv[i])), 6) AS pc1
         |FROM ed e CROSS JOIN ml CROSS JOIN v5 ORDER BY e.vec_id""".stripMargin,

    // Mirrors x8CurationV3: substring scrub (x1_substring_scrub semantics,
    // 15-surviving-token floor) -> DSIR fit + score over the SCRUBBED
    // corpus (x7_dsir semantics, target = doc_id % 20 = 0 of the scrubbed
    // relation) -> top-300 -> train split -> pack per source. Sub-chains
    // shared verbatim with their per-stage twins.
    "x8_curation_v3" -> {
      val c0 = graft.ops.Sampling.cumulativeCuts(graft.ops.Sampling.DefaultSplits).head
      s"""WITH ${SubstringSpanChain()},
         |spn AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM ssb GROUP BY doc_id, isl),
         |tok AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS p FROM ssw),
         |tk AS (SELECT doc_id, p, ws[p] AS t FROM tok),
         |cov AS (SELECT DISTINCT tk.doc_id, tk.p FROM tk
         |        JOIN spn ON spn.doc_id = tk.doc_id AND tk.p BETWEEN spn.ss AND spn.se),
         |ag AS (SELECT tk.doc_id, count(*) AS ntok, count(cov.p) AS nrem,
         |         coalesce(string_agg(CASE WHEN cov.p IS NULL THEN tk.t END, ' ' ORDER BY tk.p), '') AS ct
         |       FROM tk LEFT JOIN cov ON cov.doc_id = tk.doc_id AND cov.p = tk.p
         |       GROUP BY 1),
         |sc3 AS (SELECT ag.doc_id, d.source, ag.ct AS text
         |        FROM ag JOIN documents d USING (doc_id)
         |        WHERE ag.ntok - ag.nrem >= 15),
         |${DsirScoreChain("sc3")},
         |dsc AS (SELECT doc_id,
         |    round(CAST(sum(CAST(log_ratio AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS sc
         |  FROM dsj GROUP BY 1),
         |sel AS (SELECT doc_id FROM dsc ORDER BY sc DESC, doc_id LIMIT 300),
         |pb AS (SELECT s.source, s.doc_id,
         |        CAST(len(regexp_extract_all($norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         |        $hashUnit AS u
         |      FROM sc3 s JOIN sel USING (doc_id) WHERE $hashUnit < $c0),
         |pc AS (SELECT source, doc_id, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM pb WHERE n_tokens > 0)
         |SELECT source, doc_id, n_tokens, cum - n_tokens AS start_offset,
         |  (cum - n_tokens) // 512 AS first_seq, (cum - 1) // 512 AS last_seq
         |FROM pc ORDER BY source, start_offset""".stripMargin
    },

    "x3_pq_topk" ->
      s"""WITH $PqChain
         |SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS BIGINT) AS rank,
         |  cos AS approx_cosine
         |FROM pq_r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,

    // Recall audit over the PQ path: truth top-5 from the shared
    // KnnTruthChain, approximate top-5 from the PQ chain — both sides
    // portable, every column hash-checked.
    "x3_pq_recall" ->
      s"""WITH $PqChain,
         |$KnnTruthChain,
         |tr AS (SELECT qid, nid FROM ranked WHERE rn <= 5),
         |pv AS (SELECT qid, nid FROM pq_r WHERE rn <= 5),
         |ne AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_exact FROM tr GROUP BY 1),
         |nh AS (SELECT t.qid, CAST(count(*) AS BIGINT) AS n_hits FROM tr t JOIN pv v USING (qid, nid) GROUP BY 1)
         |SELECT ne.qid AS query_id, ne.n_exact,
         |  coalesce(nh.n_hits, 0) AS n_hits,
         |  round(CAST(coalesce(nh.n_hits, 0) AS DOUBLE) / ne.n_exact, 6) AS recall
         |FROM ne LEFT JOIN nh USING (qid) ORDER BY 1""".stripMargin,

    // Composed v4 twin: every stage chain is the per-stage twin verbatim —
    // trust fit over the FULL corpus (DomainTrustChain), minhashChain over
    // the trusted subset, the x2_incremental_admit verdict predicates, the
    // x5_chunk_overlap slice math at 32/16, and the x7_curriculum spine at
    // B=6 over chunk token counts (chunk_id = doc_id*1024 + chunk_idx
    // tie-breaks exactly like the Spark composite id).
    "x8_curation_v4" ->
      s"""WITH $DomainTrustChain,
         |v4tr AS (SELECT source FROM dmr WHERE r > 4),
         |v4d AS (SELECT d.doc_id, d.text FROM documents d JOIN v4tr USING (source)),
         |${minhashChain("v4d")},
         |v4ic AS (SELECT DISTINCT a.doc_id AS id_i
         |  FROM mhbands a JOIN mhbands b ON a.b = b.b AND a.bandkey = b.bandkey
         |  JOIN mhsigarr x ON x.doc_id = a.doc_id JOIN mhsigarr y ON y.doc_id = b.doc_id
         |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
         |    AND len(list_filter(range(1, 65), i -> x.sig[i] = y.sig[i])) / 64.0 >= 0.5),
         |v4ii AS (SELECT DISTINCT b.doc_id AS id_i
         |  FROM mhbands a JOIN mhbands b ON a.b = b.b AND a.bandkey = b.bandkey
         |  JOIN mhsigarr x ON x.doc_id = a.doc_id JOIN mhsigarr y ON y.doc_id = b.doc_id
         |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 1 AND a.doc_id < b.doc_id
         |    AND len(list_filter(range(1, 65), i -> x.sig[i] = y.sig[i])) / 64.0 >= 0.5),
         |v4adm AS (SELECT d.doc_id, d.text FROM v4d d
         |  LEFT JOIN v4ic ON v4ic.id_i = d.doc_id
         |  LEFT JOIN v4ii ON v4ii.id_i = d.doc_id
         |  WHERE d.doc_id % 2 = 1 AND v4ic.id_i IS NULL AND v4ii.id_i IS NULL),
         |v4w AS (SELECT doc_id, $wordsOf AS ws FROM v4adm),
         |v4c AS (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 1, 16)) AS s
         |        FROM v4w WHERE len(ws) > 0),
         |v4ch AS (SELECT doc_id * 4294967296 + (s // 16) AS chunk_id,
         |         round(CAST(len(ws[s+1:s+32]) AS DOUBLE), 6) AS score FROM v4c),
         |v4sp AS (SELECT score, count(*) AS cnt FROM v4ch GROUP BY score),
         |v4sw AS (SELECT score, cnt,
         |    coalesce(sum(cnt) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlt,
         |    sum(cnt) OVER () AS tot FROM v4sp),
         |v4sb AS (SELECT score, least((cumlt * 6) // tot, 5) AS bucket, cnt FROM v4sw),
         |v4sc AS (SELECT score, bucket,
         |    coalesce(sum(cnt) OVER (PARTITION BY bucket ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumltb
         |  FROM v4sb),
         |v4r AS (SELECT c.chunk_id, c.score, b.bucket,
         |    b.cumltb + row_number() OVER (PARTITION BY c.score ORDER BY c.chunk_id) AS within_rank
         |  FROM v4ch c JOIN v4sc b USING (score))
         |SELECT chunk_id, score, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(within_rank AS BIGINT) AS within_rank,
         |  CAST((within_rank - 1) * 6 + bucket AS BIGINT) AS curriculum_key
         |FROM v4r ORDER BY curriculum_key""".stripMargin,

    // Mirrors Dedup.incrementalNearDupAdmit over the odd/even doc_id
    // split: signatures/bands from the SHARED minhashChain (a doc's
    // signature is a per-doc function — side membership cannot change it),
    // corpus_dup = band-collision + >=0.5 estimate vs any even-id doc,
    // batch_dup = same vs any LOWER odd id (keep-min), admitted = neither.
    "x2_incremental_admit" ->
      s"""WITH $minhashPairChain,
         |inc_cor AS (SELECT DISTINCT a.doc_id AS id_i
         |  FROM mhbands a JOIN mhbands b ON a.b = b.b AND a.bandkey = b.bandkey
         |  JOIN mhsigarr x ON x.doc_id = a.doc_id JOIN mhsigarr y ON y.doc_id = b.doc_id
         |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
         |    AND len(list_filter(range(1, 65), i -> x.sig[i] = y.sig[i])) / 64.0 >= 0.5),
         |inc_inc AS (SELECT DISTINCT b.doc_id AS id_i
         |  FROM mhbands a JOIN mhbands b ON a.b = b.b AND a.bandkey = b.bandkey
         |  JOIN mhsigarr x ON x.doc_id = a.doc_id JOIN mhsigarr y ON y.doc_id = b.doc_id
         |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 1 AND a.doc_id < b.doc_id
         |    AND len(list_filter(range(1, 65), i -> x.sig[i] = y.sig[i])) / 64.0 >= 0.5)
         |SELECT d.doc_id,
         |  (ic.id_i IS NOT NULL) AS corpus_dup,
         |  (ii.id_i IS NOT NULL) AS batch_dup,
         |  (ic.id_i IS NULL AND ii.id_i IS NULL) AS admitted
         |FROM documents d
         |LEFT JOIN inc_cor ic ON ic.id_i = d.doc_id
         |LEFT JOIN inc_inc ii ON ii.id_i = d.doc_id
         |WHERE d.doc_id % 2 = 1 ORDER BY d.doc_id""".stripMargin,

    "x3_ivfpq_topk" ->
      s"""WITH $IvfPqChain
         |SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS BIGINT) AS rank,
         |  cos AS approx_cosine
         |FROM pq_r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,

    // The ANN deployment-loop gate: the Spark side persists the fitted
    // codebooks through ModelStore and serves from the RELOADED tensor;
    // the twin is the fresh-fit IVF-PQ chain verbatim, so hash equality
    // proves the artifact round-trip is bit-exact at the query level.
    "x11_ann_reload" ->
      s"""WITH $IvfPqChain
         |SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS BIGINT) AS rank,
         |  cos AS approx_cosine
         |FROM pq_r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,

    // Recall audit over the IVF-PQ path: truth from the shared
    // KnnTruthChain, approximate from the IVF-PQ chain — both sides
    // portable, every column hash-checked.
    "x3_ivfpq_recall" ->
      s"""WITH $IvfPqChain,
         |$KnnTruthChain,
         |tr AS (SELECT qid, nid FROM ranked WHERE rn <= 5),
         |pv AS (SELECT qid, nid FROM pq_r WHERE rn <= 5),
         |ne AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_exact FROM tr GROUP BY 1),
         |nh AS (SELECT t.qid, CAST(count(*) AS BIGINT) AS n_hits FROM tr t JOIN pv v USING (qid, nid) GROUP BY 1)
         |SELECT ne.qid AS query_id, ne.n_exact,
         |  coalesce(nh.n_hits, 0) AS n_hits,
         |  round(CAST(coalesce(nh.n_hits, 0) AS DOUBLE) / ne.n_exact, 6) AS recall
         |FROM ne LEFT JOIN nh USING (qid) ORDER BY 1""".stripMargin,

    "x5_domain_stats" ->
      s"""WITH $DomainTrustChain
         |SELECT source, n_docs, mean_quality, r > 4 AS trusted
         |FROM dmr ORDER BY source""".stripMargin,

    "x5_domain_filter" ->
      s"""WITH $DomainTrustChain,
         |tr AS (SELECT source FROM dmr WHERE r > 4)
         |SELECT d.doc_id, d.source, d.lang
         |FROM documents d JOIN tr USING (source) ORDER BY d.doc_id""".stripMargin,

    // Mirrors Chunking.chunkOverlap at 32/16: starts every 16 tokens,
    // 1-based-inclusive list slice clamps at the tail exactly like Spark's
    // slice(arr, start, length).
    "x5_chunk_overlap" ->
      s"""WITH w AS (SELECT doc_id, $wordsOf AS ws FROM documents),
         |c AS (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 1, 16)) AS s
         |      FROM w WHERE len(ws) > 0)
         |SELECT doc_id, CAST(s // 16 AS BIGINT) AS chunk_idx, CAST(s AS BIGINT) AS start_tok,
         |  CAST(len(ws[s+1:s+32]) AS BIGINT) AS n_tokens_chunk,
         |  array_to_string(ws[s+1:s+32], ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // Mirrors Sampling.curriculumOrder over the blended quality score at
    // B=6: quantile buckets from the distinct-score spine via exact
    // integer floor-division, within-bucket rank = spine cumulative +
    // same-score row_number, key = (rank-1)*6 + bucket.
    "x7_curriculum" ->
      s"""WITH $QualityScoreChain,
         |sp AS (SELECT score, count(*) AS cnt FROM qs GROUP BY score),
         |spw AS (SELECT score, cnt,
         |    coalesce(sum(cnt) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlt,
         |    sum(cnt) OVER () AS tot FROM sp),
         |spb AS (SELECT score, cnt, least((cumlt * 6) // tot, 5) AS bucket FROM spw),
         |spc AS (SELECT score, bucket,
         |    coalesce(sum(cnt) OVER (PARTITION BY bucket ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumltb
         |  FROM spb),
         |r AS (SELECT q.doc_id, q.score, c.bucket,
         |    c.cumltb + row_number() OVER (PARTITION BY q.score ORDER BY q.doc_id) AS within_rank
         |  FROM qs q JOIN spc c USING (score))
         |SELECT doc_id, score, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(within_rank AS BIGINT) AS within_rank,
         |  CAST((within_rank - 1) * 6 + bucket AS BIGINT) AS curriculum_key
         |FROM r ORDER BY curriculum_key""".stripMargin,

    // Mirrors Similarity.semanticContaminationReport at 16 bands x 8 bits,
    // threshold 0.3: benchmark = the FIXED slice vec_id < 80 (constant at
    // any sf, like a real eval suite), corpus = the rest; band buckets from
    // the shared rhp chain, candidates on (band, bucket) equality across
    // the two sides, exact-cosine verification, per-corpus-vector hit
    // count + max cosine.
    "x2_semantic_decon" ->
      s"""WITH ${rhpBucketChain(16, 8)},
         |rhp_cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM rhp_buck a JOIN rhp_buck b ON a.band = b.band AND a.bkt = b.bkt
         |  WHERE a.vec_id >= 80 AND b.vec_id < 80),
         |$RhpVerify
         |SELECT id_a AS vec_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
         |  max(cosine) AS max_cosine
         |FROM rhp_v WHERE cosine >= 0.3 GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors Sampling.temperatureMixtureSample at T=2, targetFraction
    // 0.5: per-lang share q = round6(sqrt(n)) normalized by an exact
    // DECIMAL(38,6) sum (sqrt is correctly rounded BY IEEE SPEC in both
    // engines — the reason only integer-root temperatures register), then
    // the mixtureSample admission f = min(1, q*floor(0.5*N)/n) and the
    // md5-unit draw, every step IEEE-identical.
    "x7_temperature_mix" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
         |t AS (SELECT CAST(sum(CAST(round(sqrt(CAST(n AS DOUBLE)), 6) AS DECIMAL(38,6))) AS DOUBLE) AS den,
         |             sum(n) AS tot FROM c),
         |q AS (SELECT lang, round(round(sqrt(CAST(n AS DOUBLE)), 6) / den, 6) AS qq,
         |        least(1.0, round(round(sqrt(CAST(n AS DOUBLE)), 6) / den, 6)
         |              * floor(0.5 * CAST(tot AS DOUBLE)) / n) AS f
         |      FROM c, t)
         |SELECT d.lang, d.doc_id, q.qq AS sample_prob, round(q.f, 9) AS accept_frac
         |FROM documents d JOIN q ON q.lang = d.lang
         |WHERE $hashUnit < q.f
         |ORDER BY d.doc_id""".stripMargin,

    // Mirrors TextAnalysis.thresholdSweep over the x5_quality score chain:
    // per-threshold conditional counts/sums of the SAME round6 blended
    // score and token count, fractions = IEEE double division of exact
    // BIGINTs rounded 6 dp.
    "x5_threshold_sweep" ->
      s"""WITH b AS (SELECT doc_id, $norm AS nt FROM documents),
         |w AS (SELECT doc_id, nt, list_filter(string_split(nt, ' '), x -> len(x) > 0) AS ws FROM b),
         |m AS (SELECT doc_id, nt, len(ws) AS nw,
         |        coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS sumlen,
         |        len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','the','a','and','of','to','in','is','el','la','de','y','que','los','un','le','et','les','des','une','de0','shi0','le0','bu0','wo0','zai0','you0'], x))) AS nstop
         |      FROM w),
         |s AS (SELECT doc_id,
         |        round((least(nw/50.0, 1.0)
         |             + (CASE WHEN sumlen*1.0/greatest(nw, 1) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
         |             + least((nstop*1.0/greatest(nw, 1))*5, 1.0))/3.0, 6) AS q,
         |        CAST(len(regexp_extract_all(nt, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS ntk
         |      FROM m),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(ntk) AS BIGINT) AS ntt FROM s),
         |thr AS (SELECT unnest([0.0, 0.2, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS th)
         |SELECT th AS threshold,
         |  CAST(count(*) FILTER (WHERE q >= th) AS BIGINT) AS docs_kept,
         |  CAST(coalesce(sum(ntk) FILTER (WHERE q >= th), 0) AS BIGINT) AS tokens_kept,
         |  round(count(*) FILTER (WHERE q >= th) * 1.0 / any_value(nd), 6) AS doc_frac,
         |  round(coalesce(sum(ntk) FILTER (WHERE q >= th), 0) * 1.0 / any_value(ntt), 6) AS token_frac
         |FROM s, tot, thr GROUP BY th ORDER BY threshold""".stripMargin,

    // Mirrors Dedup.dupGramFraction over the x1_substring_spans gram chain
    // (same k=10 windows, same 60-bit hash, same >1 duplicate definition):
    // per-doc window count vs corpus-duplicated window count; docs shorter
    // than k tokens report 0 via the left joins.
    "x1_dup_gram_fraction" ->
      s"""WITH ${SubstringSpanChain()},
         |dgj AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS ng, CAST(count(d.x) AS BIGINT) AS ndup
         |        FROM ssg g LEFT JOIN ssd d ON d.x = g.x GROUP BY g.doc_id)
         |SELECT doc.doc_id, coalesce(ng, 0) AS n_grams, coalesce(ndup, 0) AS n_dup_grams,
         |  round(coalesce(ndup, 0) * 1.0 / greatest(coalesce(ng, 0), 1), 6) AS dup_fraction
         |FROM documents doc LEFT JOIN dgj ON dgj.doc_id = doc.doc_id
         |ORDER BY doc.doc_id""".stripMargin,

    // Mirrors x8CurationV10 stage for stage: the x5_threshold_sweep chain
    // picks the highest threshold keeping >= 60% of tokens, the gate
    // filters on the SAME round6 score, the x7_temperature_mix chain
    // re-derives shares from the SURVIVOR counts, and the x7_shuffle_shards
    // md5 permutation (seed v10, 4 shards) places the admitted set.
    "x8_curation_v10" ->
      s"""WITH b AS (SELECT doc_id, lang, $norm AS nt FROM documents),
         |w AS (SELECT doc_id, lang, nt, list_filter(string_split(nt, ' '), x -> len(x) > 0) AS ws FROM b),
         |m AS (SELECT doc_id, lang, nt, len(ws) AS nw,
         |        coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS sumlen,
         |        len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','the','a','and','of','to','in','is','el','la','de','y','que','los','un','le','et','les','des','une','de0','shi0','le0','bu0','wo0','zai0','you0'], x))) AS nstop
         |      FROM w),
         |s AS (SELECT doc_id, lang,
         |        round((least(nw/50.0, 1.0)
         |             + (CASE WHEN sumlen*1.0/greatest(nw, 1) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
         |             + least((nstop*1.0/greatest(nw, 1))*5, 1.0))/3.0, 6) AS q,
         |        CAST(len(regexp_extract_all(nt, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS ntk
         |      FROM m),
         |stot AS (SELECT CAST(sum(ntk) AS BIGINT) AS ntt FROM s),
         |thr AS (SELECT unnest([0.0, 0.2, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS th),
         |sweep AS (SELECT th,
         |    round(coalesce(sum(ntk) FILTER (WHERE q >= th), 0) * 1.0 / any_value(ntt), 6) AS tokf
         |  FROM s, stot, thr GROUP BY th),
         |chosen AS (SELECT max(th) AS thr FROM sweep WHERE tokf >= 0.6),
         |gated AS (SELECT s.doc_id, s.lang FROM s, chosen WHERE s.q >= chosen.thr),
         |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM gated GROUP BY lang),
         |ct AS (SELECT CAST(sum(CAST(round(sqrt(CAST(n AS DOUBLE)), 6) AS DECIMAL(38,6))) AS DOUBLE) AS den,
         |              sum(n) AS tot FROM c),
         |qt AS (SELECT lang,
         |        least(1.0, round(round(sqrt(CAST(n AS DOUBLE)), 6) / den, 6)
         |              * floor(0.5 * CAST(tot AS DOUBLE)) / n) AS f
         |      FROM c, ct),
         |adm AS (SELECT g.doc_id, g.lang FROM gated g JOIN qt ON qt.lang = g.lang
         |        WHERE $hashUnit < qt.f),
         |sh AS (SELECT doc_id, lang, md5('v10:' || CAST(doc_id AS VARCHAR)) AS h FROM adm),
         |sa AS (SELECT doc_id, lang, h,
         |    CAST(('0x' || substr(h, 1, 8))::BIGINT % 4 AS INT) AS shard FROM sh)
         |SELECT doc_id, lang, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos,
         |  chosen.thr AS threshold_used
         |FROM sa, chosen ORDER BY doc_id""".stripMargin,

    // Mirrors Dedup.corpusOverlapEstimate over the even/odd doc split:
    // per-corpus distinct shingle hashes (same 3-gram + md5-60 chain as
    // minhash), 64 corpus-level min-hash components per side, agreement
    // count, plus the exact hash-set Jaccard from one grouped flag agg.
    "x2_corpus_overlap" ->
      s"""WITH wA AS (SELECT $wordsOf AS ws FROM documents WHERE doc_id % 2 = 0),
         |sA AS (SELECT DISTINCT unnest(CASE WHEN len(ws) >= 3
         |    THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
         |    ELSE [array_to_string(ws, ' ')] END) AS s FROM wA),
         |xA AS (SELECT DISTINCT ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS x FROM sA),
         |wB AS (SELECT $wordsOf AS ws FROM documents WHERE doc_id % 2 <> 0),
         |sB AS (SELECT DISTINCT unnest(CASE WHEN len(ws) >= 3
         |    THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
         |    ELSE [array_to_string(ws, ' ')] END) AS s FROM wB),
         |xB AS (SELECT DISTINCT ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS x FROM sB),
         |perms AS (SELECT i, ((i+1)*2654435761) % 2147483647 AS a, ((i+1)*40503 + 7) % 2147483647 AS b
         |          FROM generate_series(0, 63) t(i)),
         |gA AS (SELECT i, min((a*x + b) % 2147483647) AS h FROM xA CROSS JOIN perms GROUP BY i),
         |gB AS (SELECT i, min((a*x + b) % 2147483647) AS h FROM xB CROSS JOIN perms GROUP BY i),
         |agree AS (SELECT CAST(count(*) FILTER (WHERE ga.h = gb.h) AS BIGINT) AS na
         |          FROM gA ga JOIN gB gb USING (i)),
         |ex AS (SELECT CAST(count(*) FILTER (WHERE ia AND ib) AS BIGINT) AS c,
         |              CAST(count(*) FILTER (WHERE ia) AS BIGINT) AS nsa,
         |              CAST(count(*) FILTER (WHERE ib) AS BIGINT) AS nsb
         |       FROM (SELECT x, bool_or(src = 'a') AS ia, bool_or(src = 'b') AS ib
         |             FROM (SELECT x, 'a' AS src FROM xA UNION ALL SELECT x, 'b' AS src FROM xB)
         |             GROUP BY x))
         |SELECT 64 AS n_perm, round(na * 1.0 / 64.0, 6) AS est_jaccard,
         |  round(c * 1.0 / greatest(nsa + nsb - c, 1), 6) AS exact_jaccard,
         |  nsa AS n_shingles_a, nsb AS n_shingles_b, c AS n_common
         |FROM agree, ex""".stripMargin,

    // Mirrors Components.clusterSizeStats over the same recursive MinHash
    // component closure as x7_dedup_clusters: per-component member count,
    // then the size histogram with n_docs = size * clusters.
    "x7_dedup_stats" ->
      s"""WITH RECURSIVE ${componentsChain("documents")},
         |cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY component)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
         |FROM cs GROUP BY cluster_size ORDER BY cluster_size""".stripMargin
  )
}
