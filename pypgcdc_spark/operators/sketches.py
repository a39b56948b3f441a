"""Sketch-based operators: compact, mergeable summaries instead of data
movement — the 100 TB substitutes for "ship the keys" and "keep the
whole term dictionary".

Both operators share the repo's cross-engine determinism trick (md5-
derived hashing identical in Spark and DuckDB), so the *sketch itself* —
bloom candidate sets, count-min cell values, the false-positive count —
is reproduced bit-for-bit by the oracle and rides inside the hashed gate
output.  Approximation error is measured, not hand-waved.

Reference parity: the reference (pypgcdc, a CDC client) has no query
layer; sketches are part of the analytics surface this engine adds
(SURVEY §0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query

# --- shared md5 → integer helpers (Spark side) --------------------------

_CM_D = 4  # count-min rows
_CM_W = 512  # count-min buckets per row


def _md5(col, salt: str):
    """One md5 per value; independent hash functions come from disjoint
    8-hex-char windows of the digest (probe cost per row is ONE hash at
    any k — the thing that matters when the probe runs per fact row at
    100 TB)."""
    return F.md5(F.concat(F.lit(salt), col.cast("string")))


def _slice(h, i: int, mod: int):
    """i-th disjoint 32-bit window of an md5 hex digest, mod ``mod`` —
    identical to the DuckDB expression in ``_slice_sql``."""
    return (
        F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % mod
    )


def _slice_sql(expr: str, salt: str, i: int, mod: int) -> str:
    return (
        f"(('0x' || substr(md5('{salt}' || {expr}), {1 + 8 * i}, 8))::BIGINT % {mod})"
    )


_BLOOM_DIM_FILTER = "c_mktsegment = 'BUILDING' AND c_acctbal > 5000"
_BLOOM_K = 3  # hash probes per key
_BLOOM_BITS_PER_KEY = 10  # m sizing target (~1.2% FP at k=3)
_BLOOM_MIN_M = 4096

# m = smallest power of two ≥ bits_per_key·|dim| (floored at MIN_M): the
# sizing rule the ×10 stress run demonstrated the need for — a fixed m
# saturates when the dim side grows (SCALE_STRESS_r04: FP 8.8k → 1.34M).
# Engine-independent: 2^j is never a multiple of 10, so log2 can't land
# on an integer boundary where libm rounding could disagree.
_BLOOM_M_SQL = (
    f"CAST(POWER(2, CEIL(LOG2(GREATEST({_BLOOM_BITS_PER_KEY} * COUNT(*), "
    f"{_BLOOM_MIN_M})))) AS BIGINT)"
)


@query(
    "join_bloom_prefilter",
    oracle=f"""
    -- Bloom-prefiltered dim⋈fact join: the fact side is prefiltered by an
    -- adaptively-sized ({_BLOOM_BITS_PER_KEY} bits/key, power of two) md5 bloom of the
    -- filtered dim's keys, then exact-verified.  Because the bloom (size
    -- included) is md5-defined, the candidate and false-positive counts
    -- are engine-independent and hash-gated.
    WITH dim AS (SELECT c_custkey FROM customer WHERE {_BLOOM_DIM_FILTER}),
         mm AS (SELECT {_BLOOM_M_SQL} AS m FROM dim),
         pos AS (SELECT (('0x' || substr(md5('bf:' || c_custkey), 1, 8))::BIGINT % m) AS p0, (('0x' || substr(md5('bf:' || c_custkey), 9, 8))::BIGINT % m) AS p1, (('0x' || substr(md5('bf:' || c_custkey), 17, 8))::BIGINT % m) AS p2
                 FROM dim, mm),
         bits AS (SELECT DISTINCT p FROM (
                    SELECT p0 AS p FROM pos UNION ALL
                    SELECT p1 FROM pos UNION ALL
                    SELECT p2 FROM pos)),
         cand AS (SELECT o_custkey, o_totalprice FROM orders, mm
                  WHERE (('0x' || substr(md5('bf:' || o_custkey), 1, 8))::BIGINT % m) IN (SELECT p FROM bits) AND (('0x' || substr(md5('bf:' || o_custkey), 9, 8))::BIGINT % m) IN (SELECT p FROM bits) AND (('0x' || substr(md5('bf:' || o_custkey), 17, 8))::BIGINT % m) IN (SELECT p FROM bits)),
         verified AS (SELECT c.c_custkey, o_totalprice
                      FROM cand o JOIN dim c ON o.o_custkey = c.c_custkey)
    SELECT (SELECT m FROM mm) AS bloom_bits,
           (SELECT COUNT(*) FROM dim)  AS n_dim_keys,
           (SELECT COUNT(*) FROM bits) AS n_bits_set,
           (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM verified) AS n_true_matches,
           (SELECT COUNT(*) FROM cand) - (SELECT COUNT(*) FROM verified)
               AS n_false_positives,
           (SELECT ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)::DOUBLE
            FROM verified) AS matched_total
    """,
)
def join_bloom_prefilter(spark, sf_dir):
    """Semi-join reduction via a bloom filter sized to its key set
    (~10 bits/key, next power of two): build the bloom of
    the (selectively filtered) customer keys, prefilter orders with it
    map-side, exact-verify only the survivors.

    Scale shape: the fact table never shuffles — the bloom rides a 1-row
    broadcast (KB-scale even at millions of dim keys), membership is one
    md5 + 3 window probes per fact row inside codegen, and the exact
    join touches only candidates.  Sizing is adaptive because the ×10
    stress run showed a fixed bitset saturating (FP 8.8k → 1.34M,
    SCALE_STRESS_r04.json); with m ∝ |dim| the FP *rate* stays flat as
    the dim grows.  The sketch is explicit and md5-defined, so its
    false-positive cost is measured in the gate output, not estimated:
    n_candidates − n_true_matches."""
    customer, orders = load(spark, sf_dir, "customer", "orders")
    dim = customer.filter(F.expr(_BLOOM_DIM_FILTER)).select("c_custkey")
    mm = dim.agg(F.expr(_BLOOM_M_SQL.replace("COUNT(*)", "count(1)")).alias("m"))

    dim_h = dim.withColumn("h", _md5(F.col("c_custkey"), "bf:"))
    pos = dim_h.join(F.broadcast(mm)).select(
        F.explode(
            F.array(*[_slice(F.col("h"), i, F.col("m")) for i in range(_BLOOM_K)])
        ).alias("p")
    )
    # one row: (sorted set positions, m) — n_bits_set reporting only
    bits = pos.agg(F.array_sort(F.collect_set("p")).alias("bits")).join(
        F.broadcast(mm)
    )

    # The probed sketch is a PACKED bitset (m/64 longs, m/8 bytes — 8 KB
    # at m=65536): set positions fold to per-word bit_or, then densify to
    # an array once in the 1-row aggregate.  Membership per fact row is
    # element_at + shift + mask — O(1), where the previous
    # array_contains over the ~|dim|·k position array was O(bits set)
    # per probe (three linear scans per fact row).
    words = pos.groupBy(F.expr("shiftright(p, 6)").alias("w")).agg(
        F.expr("bit_or(shiftleft(1L, CAST((p & 63) AS INT)))").alias("bw")
    )
    sketch = (
        words.agg(
            F.map_from_arrays(F.collect_list("w"), F.collect_list("bw")).alias("wm")
        )
        .join(F.broadcast(mm))
        .select(
            "m",
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"), (F.col("m") / 64).cast("long") - 1
                ),
                lambda j: F.coalesce(
                    F.element_at(F.col("wm"), j), F.lit(0).cast("long")
                ),
            ).alias("wa"),
        )
    )
    member = " AND ".join(
        f"(shiftright(element_at(wa, CAST(shiftright(p{i}, 6) AS INT) + 1), "
        f"CAST(p{i} & 63 AS INT)) & 1) = 1"
        for i in range(_BLOOM_K)
    )
    cand = (
        orders.select(
            "o_custkey", "o_totalprice", _md5(F.col("o_custkey"), "bf:").alias("h")
        )
        .join(F.broadcast(sketch))  # 1-row scalar broadcast, not a data cartesian
        .withColumns({f"p{i}": _slice(F.col("h"), i, F.col("m")) for i in range(_BLOOM_K)})
        .filter(F.expr(member))
        .select("o_custkey", "o_totalprice")
    )
    # ONE pass over the candidate set: left-join the (broadcast) dim and
    # count candidates / verified matches / matched revenue together —
    # the fact-side pipeline runs exactly once.
    cand_stats = cand.join(
        F.broadcast(dim), cand.o_custkey == dim.c_custkey, "left"
    ).agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.count("c_custkey").alias("n_true_matches"),
        F.round(
            F.sum(
                F.when(
                    F.col("c_custkey").isNotNull(),
                    F.col("o_totalprice").cast("decimal(18,4)"),
                )
            ),
            2,
        )
        .cast("double")
        .alias("matched_total"),
    )

    stats = [
        mm.select(F.col("m").alias("bloom_bits")),
        dim.agg(F.count(F.lit(1)).alias("n_dim_keys")),
        bits.select(F.size("bits").cast("long").alias("n_bits_set")),
        cand_stats,
    ]
    out = stats[0]
    for s in stats[1:]:
        out = out.join(F.broadcast(s))  # scalar 1-row combines
    return out.select(
        "bloom_bits",
        "n_dim_keys",
        "n_bits_set",
        "n_candidates",
        "n_true_matches",
        (F.col("n_candidates") - F.col("n_true_matches")).alias("n_false_positives"),
        "matched_total",
    )


_cm_rows_sql = ", ".join(str(i) for i in range(_CM_D))


@query(
    "sketch_count_min",
    oracle=f"""
    -- Count-min sketch ({_CM_D}×{_CM_W}) over document terms; estimates for
    -- the top-8 exact heavy hitters ride next to their true counts, so
    -- the sketch's overcount is part of the hashed result.
    WITH tokens AS (
      SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
    ),
    rows_ AS (SELECT unnest([{_cm_rows_sql}]) AS i),
    cells AS (
      SELECT i, (('0x' || substr(md5('cm:' || term), 1 + 8 * i, 8))::BIGINT % {_CM_W}) AS bucket,
             COUNT(*) AS cell_n
      FROM tokens, rows_ GROUP BY 1, 2
    ),
    exact AS (SELECT term, COUNT(*) AS exact_n FROM tokens GROUP BY term),
    top8 AS (
      SELECT term, exact_n FROM exact
      ORDER BY exact_n DESC, term ASC LIMIT 8
    ),
    est AS (
      SELECT t.term, t.exact_n, MIN(c.cell_n) AS cms_est
      FROM top8 t
      JOIN rows_ r ON TRUE
      JOIN cells c
        ON c.i = r.i
       AND c.bucket = (('0x' || substr(md5('cm:' || t.term), 1 + 8 * r.i, 8))::BIGINT % {_CM_W})
      GROUP BY t.term, t.exact_n
    )
    SELECT term, exact_n, cms_est, cms_est - exact_n AS overcount FROM est
    """,
)
def sketch_count_min(spark, sf_dir):
    """Count-min sketch: a fixed 4×512 grid of counters summarizes the
    full term-frequency distribution; point estimates are the min over
    4 hashed cells and can only overcount.

    Scale shape: the sketch is O(1) in corpus size — cells build with one
    map-side-combining groupBy (at 100 TB, per-executor partial grids
    merged by cell addition), and a frequency estimate never touches the
    corpus again.  The top-8 exact counts here exist only to expose the
    overcount inside the gate hash; a production pipeline keeps just the
    2 KB grid where the exact dictionary would be billions of rows."""
    (docs,) = load(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("term")
    )

    # ONE corpus tokenize pass: the exact term-frequency table (vocab-
    # sized) materializes eagerly and EVERYTHING derives from it — the
    # sketch cells are sum(exact_n) over terms hashing to a cell
    # (identical integers to counting token instances directly), and
    # the md5+4-window explode now runs per VOCAB row, not per token.
    # The old shape re-ran the tokenize subtree twice (cells + exact;
    # r12 plan sweep) and hashed every token instance.
    exact = (
        tokens.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .localCheckpoint(eager=True)
    )
    hashed = (
        exact.withColumn("h", _md5(F.col("term"), "cm:"))  # ONE md5 per term
        .select(
            "exact_n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            _slice(F.col("h"), i, _CM_W).alias("bucket"),
                        )
                        for i in range(_CM_D)
                    ]
                )
            ).alias("rb"),
        )
        .select("exact_n", "rb.i", "rb.bucket")
    )
    cells = hashed.groupBy("i", "bucket").agg(F.sum("exact_n").alias("cell_n"))

    top8 = exact.orderBy(F.col("exact_n").desc(), F.col("term").asc()).limit(8)

    probes = top8.select(
        "term",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _slice(_md5(F.col("term"), "cm:"), i, _CM_W).alias("bucket"),
                    )
                    for i in range(_CM_D)
                ]
            )
        ).alias("rb"),
    ).select("term", "exact_n", "rb.i", "rb.bucket")

    est = (
        probes.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("term", "exact_n")
        .agg(F.min("cell_n").alias("cms_est"))
    )
    return est.select(
        "term",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
    )


_KMV_K = 64


@query(
    "sketch_kmv_distinct",
    oracle=f"""
    -- KMV (k-minimum-values, k={_KMV_K}) distinct-count sketch per
    -- language: est = (k-1) * 2^32 / h_(k) over 32-bit md5 hashes.
    -- Estimate, exact count, and signed relative error all hash-gated.
    WITH t AS (SELECT DISTINCT lang, term FROM (
                 SELECT lang, unnest(string_split(lower(text), ' ')) AS term
                 FROM documents)),
    h AS (SELECT DISTINCT lang,
                 ('0x' || substr(md5(term), 1, 8))::BIGINT AS hv FROM t),
    r AS (SELECT lang, hv,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS n_h
          FROM h),
    kth AS (SELECT lang, MAX(CASE WHEN rn = {_KMV_K} THEN hv END) AS rk,
                   ANY_VALUE(n_h) AS n_h
            FROM r GROUP BY lang),
    ex AS (SELECT lang, COUNT(*) AS n_exact FROM t GROUP BY lang),
    est AS (SELECT e.lang, e.n_exact,
                   ROUND(CASE WHEN k.rk IS NULL THEN CAST(k.n_h AS DOUBLE)
                              ELSE {_KMV_K - 1}.0 * 4294967296.0 / k.rk
                         END, 2) AS kmv_est
            FROM ex e JOIN kth k ON e.lang = k.lang)
    SELECT lang, n_exact, kmv_est,
           ROUND((kmv_est - n_exact) / n_exact * 100, 2) AS rel_err_pct
    FROM est
    """,
)
def sketch_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch: per language, keep only the 64 smallest
    32-bit hashes of the vocabulary; the k-th minimum's position in hash
    space estimates cardinality as (k-1)·2³²/h₍k₎.

    Scale shape: the sketch state is 64 hashes per group regardless of
    corpus size (the cardinality dual of count-min's fixed grid — CMS
    answers "how often", KMV answers "how many distinct"), merges by
    keeping the union's k smallest, and the estimate never rescans.
    Spark's own approx_count_distinct (HLL) is the production default
    (approx_distinct_and_quantiles); KMV is the variant whose estimate
    an independent engine reproduces EXACTLY, so the sketch math itself
    sits inside the correctness gate, error and all."""
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    # The distinct (lang, term) vocabulary — the one full tokenize +
    # distinct pass — materializes eagerly; the hash ranking AND the
    # exact count both derive from it (the old shape re-ran the
    # tokenize+distinct subtree per consumer; r12 plan sweep).
    terms = (
        docs.select("lang", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hashes = terms.select(
        "lang",
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long").alias("hv"),
    ).distinct()
    w = Window.partitionBy("lang").orderBy("hv")
    ranked = hashes.select(
        "lang",
        "hv",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n_h"),
    )
    kth = ranked.groupBy("lang").agg(
        F.max(F.when(F.col("rn") == _KMV_K, F.col("hv"))).alias("rk"),
        F.any_value("n_h").alias("n_h"),
    )
    exact = terms.groupBy("lang").agg(F.count(F.lit(1)).alias("n_exact"))
    est = exact.join(kth, "lang").withColumn(
        "kmv_est",
        F.round(
            F.when(F.col("rk").isNull(), F.col("n_h").cast("double")).otherwise(
                F.lit(float(_KMV_K - 1)) * F.lit(4294967296.0) / F.col("rk")
            ),
            2,
        ),
    )
    return est.select(
        "lang",
        "n_exact",
        "kmv_est",
        F.round((F.col("kmv_est") - F.col("n_exact")) / F.col("n_exact") * 100, 2).alias(
            "rel_err_pct"
        ),
    )


@query(
    "sketch_kmv_intersection",
    oracle=f"""
    -- KMV set-operation estimates (Beyer et al., SIGMOD 2007): the
    -- vocabulary overlap of every language with English, estimated from
    -- the two k={_KMV_K} sketches alone — combine to the union's k
    -- smallest hashes, count how many live in BOTH input sketches
    -- (rho = m/k estimates Jaccard), scale by the union estimate for
    -- the intersection size.  Exact values ride next to the estimates,
    -- so the sketch algebra itself is inside the hashed gate.
    WITH t AS (SELECT DISTINCT lang, term FROM (
                 SELECT lang, unnest(string_split(lower(text), ' ')) AS term
                 FROM documents)),
    h AS (SELECT DISTINCT lang,
                 ('0x' || substr(md5(term), 1, 8))::BIGINT AS hv FROM t),
    sk AS (SELECT lang, hv FROM (
             SELECT lang, hv, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv) rn
             FROM h) WHERE rn <= {_KMV_K}),
    en AS (SELECT hv FROM sk WHERE lang = 'en'),
    other AS (SELECT DISTINCT lang FROM documents WHERE lang <> 'en'),
    uni AS (
      SELECT lang, hv, in_en, in_b,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv) AS rn
      FROM (
        SELECT o.lang, x.hv,
               MAX(CASE WHEN x.side = 'en' THEN 1 ELSE 0 END) AS in_en,
               MAX(CASE WHEN x.side = 'b' THEN 1 ELSE 0 END) AS in_b
        FROM other o JOIN (
          SELECT 'en' AS side, NULL AS lang, hv FROM en
          UNION ALL
          SELECT 'b', lang, hv FROM sk WHERE lang <> 'en') x
          ON x.side = 'en' OR x.lang = o.lang
        GROUP BY o.lang, x.hv)),
    comb AS (
      SELECT lang,
             COUNT(*) AS ku,
             CAST(SUM(CASE WHEN in_en = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS m,
             MAX(hv) AS hk
      FROM uni WHERE rn <= {_KMV_K} GROUP BY lang),
    ex AS (
      SELECT b.lang,
             CAST(SUM(CASE WHEN e.term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_inter,
             CAST(COUNT(*) AS BIGINT) AS n_b
      FROM (SELECT lang, term FROM t WHERE lang <> 'en') b
      LEFT JOIN (SELECT term FROM t WHERE lang = 'en') e USING (term)
      GROUP BY b.lang),
    en_n AS (SELECT COUNT(*) AS n_en FROM t WHERE lang = 'en')
    SELECT c.lang,
           e.n_inter AS exact_intersection,
           ROUND(e.n_inter::DOUBLE / (e.n_b + en_n.n_en - e.n_inter), 4)
               AS exact_jaccard,
           ROUND(c.m::DOUBLE / c.ku, 4) AS kmv_jaccard,
           ROUND(c.m::DOUBLE / c.ku
                 * ({_KMV_K - 1}.0 * 4294967296.0 / c.hk), 2)
               AS kmv_intersection_est
    FROM comb c JOIN ex e ON c.lang = e.lang CROSS JOIN en_n
    """,
)
def sketch_kmv_intersection(spark, sf_dir):
    """KMV sketch set algebra (Beyer et al. 2007): Jaccard and
    intersection-size estimates between each language's vocabulary and
    English, computed ONLY from the two fixed-size sketches — combine to
    the union's k smallest hashes, the both-sketch fraction estimates
    Jaccard, scaled by the union cardinality estimate for intersection
    size.  Exact values sit beside the estimates in the gate hash.

    Why it matters at 100 TB: cross-corpus overlap questions ("how much
    of corpus B is already in A?") otherwise cost a full anti-join of
    two vocabularies; sketches answer in O(k) per pair after one linear
    sketch-build each, and sketches MERGE — per-partition k-minima union
    to the global sketch, so the build is one map + tiny combine."""
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    # One tokenize+distinct pass, materialized eagerly: the sketch build,
    # the English vocabulary, and the exact-overlap join all read the
    # checkpointed (lang, term) table instead of re-running the explode
    # subtree three times (r12 plan sweep).
    terms = (
        docs.select("lang", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hashes = terms.select(
        "lang",
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long").alias("hv"),
    ).distinct()
    w = Window.partitionBy("lang").orderBy("hv")
    sk = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .select("lang", "hv")
        .localCheckpoint(eager=True)  # feeds both sides of the pair union
    )
    en = sk.filter(F.col("lang") == "en").select("hv")
    others = docs.filter(F.col("lang") != "en").select("lang").distinct()
    # Tag each (lang, hv) with sketch membership on both sides.
    en_exp = others.crossJoin(F.broadcast(en)).select(
        "lang", "hv", F.lit(1).alias("in_en"), F.lit(0).alias("in_b")
    )
    b_exp = sk.filter(F.col("lang") != "en").select(
        "lang", "hv", F.lit(0).alias("in_en"), F.lit(1).alias("in_b")
    )
    uni = (
        en_exp.unionAll(b_exp)
        .groupBy("lang", "hv")
        .agg(F.max("in_en").alias("in_en"), F.max("in_b").alias("in_b"))
        .withColumn("rn", F.row_number().over(Window.partitionBy("lang").orderBy("hv")))
        .filter(F.col("rn") <= _KMV_K)
    )
    comb = uni.groupBy("lang").agg(
        F.count(F.lit(1)).alias("ku"),
        F.sum(((F.col("in_en") == 1) & (F.col("in_b") == 1)).cast("long"))
        .cast("long")
        .alias("m"),
        F.max("hv").alias("hk"),
    )
    en_terms = terms.filter(F.col("lang") == "en").select("term")
    ex = (
        terms.filter(F.col("lang") != "en")
        .join(en_terms.withColumn("_hit", F.lit(1)), "term", "left")
        .groupBy("lang")
        .agg(
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_inter"),
            F.count(F.lit(1)).cast("long").alias("n_b"),
        )
    )
    n_en = en_terms.agg(F.count(F.lit(1)).alias("n_en"))
    return (
        comb.join(ex, "lang")
        .crossJoin(F.broadcast(n_en))
        .select(
            "lang",
            F.col("n_inter").alias("exact_intersection"),
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_b") + F.col("n_en") - F.col("n_inter")),
                4,
            ).alias("exact_jaccard"),
            F.round(F.col("m").cast("double") / F.col("ku"), 4).alias("kmv_jaccard"),
            F.round(
                F.col("m").cast("double")
                / F.col("ku")
                * (F.lit(float(_KMV_K - 1)) * F.lit(4294967296.0) / F.col("hk")),
                2,
            ).alias("kmv_intersection_est"),
        )
    )
