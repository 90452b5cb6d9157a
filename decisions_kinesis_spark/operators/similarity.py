"""Similarity search over embedding columns (north-star, SURVEY.md §7 M6).

- Brute-force cosine top-k: the correctness baseline.  Broadcast the
  (small) query set against the corpus; all arithmetic in JVM
  higher-order functions (zip_with/aggregate) — no Python in the loop.
- LSH-bucketed ANN: the scale path.  Deterministic hyperplanes derived
  from the cross-engine md5 hash so the DuckDB oracle verifies values.
  At 100 TB the bucket id becomes the shuffle/partition key; each query
  touches one bucket instead of the corpus.
- Norm stats: per-label embedding statistics.

All cosine math is done in double precision (inputs are float32 read
identically by both engines) and rounded for hash-stable comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from decisions_kinesis_spark.functions.parallel import (
    checkpoint_parallel,
    ensure_parallelism,
)
from decisions_kinesis_spark.sources.tables import load_table, table_count

_N_QUERIES = 10  # vec_id < 10 are the query vectors
_TOP_K = 5
_N_PLANES = 8  # LSH hyperplane count → 256 buckets

#: dot(a, b) over double arrays via JVM higher-order functions.
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
    " cast(0.0 as double), (acc, x) -> acc + x)"
)
_NORM = "sqrt(" + _DOT.format(a="{v}", b="{v}") + ")"

#: Pair cosine from PRE-COMPUTED norms.  Every join in this module
#: precomputes each side's L2 norm scan-side (N + k sqrt-dots) instead
#: of recomputing both inside the pair expression (N·k of each) — the
#: value is bit-identical (same sqrt, same multiply, same round) but
#: the per-pair cost drops from 3 dot products + 2 sqrts to 1 dot
#: product + 1 divide.
_PAIR_COS = "round(({dot}) / ({na} * {nb}), 6)"


def _as_double(col: str) -> F.Column:
    return F.col(col).cast("array<double>")


def _emb_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v double[]) corpus frame with the parallelism guard —
    the one spelling every similarity query starts from.  Heavy
    per-row work (interpreted HOF dot folds) follows the scan in this
    family, so a single-split small fixture must spread (no-op at
    scale)."""
    return ensure_parallelism(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", _as_double("embedding").alias("v")
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the first 10 vectors as queries.

    Scale: broadcast-join the query set (k rows) against the corpus —
    one scan of the corpus, no shuffle of the big side.  Top-k is
    TWO-STAGE: local top-k within each (query, input partition) first,
    so the final per-query sort sees k×partitions survivors instead of
    the whole corpus (a single window over (query) would funnel N rows
    through one reducer per query).  The (cos, vec_id) total order
    makes the two-stage result identical to the global top-k.
    """
    emb = _emb_v(spark, sf_dir).withColumn("nv", F.expr(_NORM.format(v="v")))
    return _cosine_truth_frame(emb)


def _cosine_truth_frame(emb: DataFrame) -> DataFrame:
    """Brute-force top-k over a (vec_id, v, nv) frame — the method
    tail, shared by the standalone query and the recall calibration
    (which feeds a checkpointed shared corpus frame)."""
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("qnv"),
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.expr(
                _PAIR_COS.format(
                    dot=_DOT.format(a="v", b="qv"), na="nv", nb="qnv"
                )
            ),
        )
        .withColumn("pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("query_id", "pid").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    survivors = (
        scored.withColumn("lrk", F.row_number().over(w_local))
        .filter(F.col("lrk") <= _TOP_K)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics (vectorized JVM aggregate)."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "label", _as_double("embedding").alias("v")
    )
    norm = F.expr(_NORM.format(v="v"))
    return (
        emb.withColumn("nrm", norm)
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )


_N_DIMS = 64  # embedding dimensionality of the fixtures


def _plane_signs(b: int) -> list[float]:
    """Deterministic hyperplane: sign(d) = +1 if bigint(md5('b,d')) is
    odd else −1.  Computed ONCE here (plane weights are constants) and
    inlined as literals in both engines — no per-row hashing."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"{b},{d}".encode()).hexdigest()[:15], 16) % 2 else -1.0
        for d in range(1, _N_DIMS + 1)
    ]


def _bucket_expr(n_planes: int = _N_PLANES) -> F.Column:
    """LSH bucket key: sign bits of n constant hyperplane dots."""
    planes = []
    for b in range(n_planes):
        signs = "array(" + ", ".join(
            f"{s:.1f}D" for s in _plane_signs(b)
        ) + ")"
        proj = (
            f"aggregate(zip_with(v, {signs}, (x, s) -> x * s),"
            f" cast(0.0 as double), (acc, x) -> acc + x)"
        )
        planes.append(f"(case when ({proj}) > 0 then {1 << b} else 0 end)")
    return F.expr(" + ".join(planes)).cast("bigint")


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: per query, best same-bucket neighbor by cosine.

    Scale: bucket id is computed scan-side (codegen'd); the candidate
    join is an equi-join on bucket — each query meets ~N/256 rows
    instead of N.  Output keeps n_candidates so recall is observable.
    """
    emb = _emb_v(spark, sf_dir).withColumn("nv", F.expr(_NORM.format(v="v")))
    return _lsh_best_frame(emb.withColumn("bucket", _bucket_expr()))


def _lsh_best_frame(bucketed: DataFrame) -> DataFrame:
    """Single-probe best-neighbor tail over a (vec_id, v, nv, bucket)
    frame — shared by the standalone query and the recall calibration."""
    q = bucketed.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("qnv"),
        F.col("bucket").alias("qbucket"),
    )
    cand = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    ).withColumn(
        "cos",
        F.expr(
            _PAIR_COS.format(dot=_DOT.format(a="v", b="qv"), na="nv", nb="qnv")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    best = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "query_id",
            F.col("vec_id").alias("best_neighbor"),
            F.col("cos").alias("best_cos"),
        )
    )
    n_cand = cand.groupBy("query_id").agg(F.count("*").alias("n_candidates"))
    return (
        q.select("query_id", F.col("qbucket").alias("bucket"))
        .join(n_cand, "query_id", "left")
        .join(best, "query_id", "left")
        .na.fill({"n_candidates": 0})
    )


def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: each query probes its own bucket PLUS every
    single-bit-flip neighbor bucket (the closest Hamming-1 cells) — the
    standard recall knob that trades nprobe× more candidates for far
    fewer misses near hyperplane boundaries, without growing the index.

    Scale: identical topology to ann_lsh_bucketed (scan-side bucket
    key, equi-join on bucket); only the broadcast query side fans out
    ×(n_planes+1).  n_candidates makes the recall/cost trade
    observable next to the single-probe variant.
    """
    emb = _emb_v(spark, sf_dir).withColumn("nv", F.expr(_NORM.format(v="v")))
    return _lsh_multiprobe_frame(emb.withColumn("bucket", _bucket_expr()))


def _lsh_multiprobe_frame(bucketed: DataFrame) -> DataFrame:
    """Hamming-1 multi-probe tail over a (vec_id, v, nv, bucket) frame."""
    probes = F.array(
        F.col("qbucket"),
        *[
            F.expr(f"cast(qbucket ^ {1 << b} as bigint)")
            for b in range(_N_PLANES)
        ],
    )
    q = (
        bucketed.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("qnv"),
            F.col("bucket").alias("qbucket"),
        )
        .withColumn("probe", F.explode(probes))
    )
    cand = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("probe")) & (F.col("vec_id") != F.col("query_id")),
    ).withColumn(
        "cos",
        F.expr(
            _PAIR_COS.format(dot=_DOT.format(a="v", b="qv"), na="nv", nb="qnv")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    best = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "query_id",
            F.col("vec_id").alias("best_neighbor"),
            F.col("cos").alias("best_cos"),
        )
    )
    n_cand = cand.groupBy("query_id").agg(F.count("*").alias("n_candidates"))
    return (
        q.select("query_id", F.col("qbucket").alias("bucket"))
        .distinct()
        .join(n_cand, "query_id", "left")
        .join(best, "query_id", "left")
        .na.fill({"n_candidates": 0})
    )


_MUTUAL_K = 3  # directed-neighbor rank bound for mutuality
_CQ = 10_000  # ×10⁴ quantization for the centered integer LSH

#: per-vector integer quantization — the CORPUS-INDEPENDENT half of the
#: centered index state (additive under streaming arrival; see the
#: maintenance proof in tests/test_streaming_ann_centered.py)
_QV_EXPR = f"transform(v, x -> cast(floor(x * {_CQ} + 0.5) as bigint))"


def _plane_bits_expr(cv_col: str, nbits: int) -> str:
    """SQL expression for the ``nbits`` sign-plane bucket id over a
    centered-integer component column — shared by the batch index and
    the streaming maintenance proof so both derive buckets through the
    IDENTICAL code path (bucket = f(cv) is stateless given the mean)."""
    parts = []
    for b in range(nbits):
        signs = "array(" + ", ".join(
            f"{int(s)}L" for s in _plane_signs(b)
        ) + ")"
        proj = (
            f"aggregate(zip_with({cv_col}, {signs}, (x, s) -> x * s),"
            f" 0L, (acc, x) -> acc + x)"
        )
        parts.append(f"(case when ({proj}) > 0 then {1 << b} else 0 end)")
    return " + ".join(parts)


def _centered_int_buckets(emb: DataFrame, nbits: int) -> DataFrame:
    """MEAN-CENTERED integer hyperplane LSH bucket per vector.

    Sign-hyperplane LSH degenerates on non-centered data: a dominant
    mean direction puts most vectors on the same side of most planes
    (the 20× scale smoke measured ONE bucket holding 77% of a shifted
    corpus — ~10⁹ candidate pairs).  Centering removes the mean
    direction, which carries no cosine discrimination, so sign bits
    split near-evenly again.

    Everything is exact integer arithmetic so both engines compute the
    IDENTICAL bucket id (the float version's ``dot > 0`` is a
    cross-engine tie risk near zero): components quantize to
    ``floor(x·10⁴ + 0.5)`` bigints, the per-dimension mean is the
    truncating integer mean, and each ±1-plane projection is a bigint
    sum of centered components (|c| ≤ 2·10⁴·√N̄ stays far inside
    bigint).  The mean frame is one 64-row reduction broadcast back —
    two scan passes, no shuffle of the corpus itself.

    Input: frame with (vec_id, v: array<double>); output adds
    ``qv`` (quantized ints) and ``bucket``.
    """
    q = emb.withColumn("qv", F.expr(_QV_EXPR))
    mean = (
        q.select(F.posexplode("qv").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list("
                " named_struct('pos', pos, 'm', s div n))), y -> y.m)"
            ).alias("mq")
        )
    )
    centered = q.crossJoin(F.broadcast(mean)).withColumn(
        "cv", F.expr("zip_with(qv, mq, (x, m) -> x - m)")
    )
    return centered.withColumn(
        "bucket", F.expr(_plane_bits_expr("cv", nbits)).cast("bigint")
    ).drop("qv", "mq", "cv")


def ann_mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN pair graph within LSH buckets: undirected pairs
    (a, b) where b is among a's top-``_MUTUAL_K`` same-bucket cosine
    neighbors AND a is among b's — the reciprocal-neighbor criterion
    that near-dup clustering and diversity-sampling pipelines use to
    cut asymmetric hub edges (a hub vector is "near" everything, but
    little is mutually near the hub).

    Cosine is symmetric (identical zip_with fold in both directions),
    so each surviving pair carries one ``cos`` plus both directed ranks
    — asymmetry between ``rank_ab`` and ``rank_ba`` is the hubness
    signal itself and is kept observable in the output.

    Scale: the directed candidate frame is an equi-join on the
    MEAN-CENTERED integer LSH bucket key (``_centered_int_buckets`` —
    centering keeps sign bits balanced on corpora with a dominant mean
    direction, where raw sign-LSH collapses into one giant bucket; the
    20× smoke caught exactly that) with the plane count DERIVED FROM
    CORPUS SIZE (ceil(log2(N/64)) clamped to [2,16], the
    ``dedup_embedding_cosine`` discipline), so the expected bucket
    population — and the per-bucket quadratic pair term — stays
    ~constant as N grows instead of going quadratic at a fixed bucket
    count; the per-vector top-k is a bounded window inside each
    bucket's candidate list; the mutuality join is an equi-join on the
    (a, b) key pair of two rank-≤k frames, each at most k·N rows.
    """
    emb = (
        ensure_parallelism(load_table(spark, "embeddings", sf_dir))
        .select("vec_id", _as_double("embedding").alias("v"))
        .withColumn("nv", F.expr(_NORM.format(v="v")))
    )
    nbits = _adaptive_nbits(table_count(spark, "embeddings", sf_dir))
    bucketed = _centered_int_buckets(emb, nbits)
    left = bucketed.select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("nv").alias("anv"),
        "bucket",
    )
    right = bucketed.select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("nv").alias("bnv"),
        F.col("bucket").alias("bbucket"),
    )
    directed = left.join(
        right,
        (F.col("bucket") == F.col("bbucket"))
        & (F.col("a_id") != F.col("b_id")),
    ).withColumn(
        "cos",
        F.expr(
            _PAIR_COS.format(dot=_DOT.format(a="av", b="bv"), na="anv", nb="bnv")
        ),
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cos"), F.asc("b_id"))
    ranked = (
        directed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MUTUAL_K)
        .select("a_id", "b_id", "cos", "rk")
        # both sides of the mutuality self-join read this frame, and a
        # lazy subtree replays per consumer — materialize the
        # k·N-bounded top-k once (guide §2.4) so the bucket join +
        # cosine scoring + window run once, not twice
        .localCheckpoint(eager=True)
    )
    e1, e2 = ranked.alias("e1"), ranked.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.a_id") == F.col("e2.b_id"))
            & (F.col("e1.b_id") == F.col("e2.a_id")),
        )
        .filter(F.col("e1.a_id") < F.col("e1.b_id"))
        .select(
            F.col("e1.a_id").alias("a_id"),
            F.col("e1.b_id").alias("b_id"),
            F.col("e1.cos").alias("cos"),
            F.col("e1.rk").alias("rank_ab"),
            F.col("e2.rk").alias("rank_ba"),
        )
    )


_CENTERED_TOPK_K = 5  # neighbors returned per query vector


def ann_lsh_centered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k ANN over the MEAN-CENTERED integer LSH index — the
    production posture of the sign-hyperplane family, promoted from
    the documented upgrade path to a first-class query (the raw-float
    ``ann_lsh_bucketed``/``ann_lsh_multiprobe`` definitions stay as
    the family's calibration baseline; ``ann_bucket_balance_audit``
    measures the cost gap between the two index builds on any corpus).

    Why this is the scale posture: raw sign-LSH collapses a corpus
    with a dominant mean direction into one giant bucket (measured
    77% of a shifted corpus → ~10⁹ candidate pairs at the 20× smoke),
    and its float ``dot > 0`` bits are a cross-engine tie risk near
    zero.  Centering removes the mean direction, and the exact
    integer projections make both engines compute IDENTICAL buckets.

    Scale: bucket key is exact-integer scan-side arithmetic; the
    candidate join is an equi-join on bucket with the plane count
    DERIVED FROM CORPUS SIZE (clamp(ceil(log2(N/64)), 2, 16)), so
    expected bucket population stays ~constant as N grows; the
    per-query top-k is a bounded window over each query's candidate
    list (broadcast query side, ≤ |queries|·bucket rows expanded).
    """
    # deliberately NO parallelism guard (measured A/B at sf0.1: OFF
    # 0.75 s vs ON 0.98 s best-of-4 — the centered pipeline reduces to
    # a 64-row mean immediately; the exchange is pure overhead)
    emb = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", _as_double("embedding").alias("v"))
        .withColumn("nv", F.expr(_NORM.format(v="v")))
    )
    return _centered_topk(spark, sf_dir, emb)


def _centered_topk(
    spark: SparkSession, sf_dir: str, emb: DataFrame
) -> DataFrame:
    """Centered-integer-LSH top-k tail over a (vec_id, v, nv) frame —
    shared by the standalone query and the recall calibration."""
    nbits = _adaptive_nbits(table_count(spark, "embeddings", sf_dir))
    bucketed = _centered_int_buckets(emb, nbits)
    q = bucketed.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("qnv"),
        F.col("bucket").alias("qbucket"),
    )
    cand = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    ).withColumn(
        "cos",
        F.expr(
            _PAIR_COS.format(dot=_DOT.format(a="v", b="qv"), na="nv", nb="qnv")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= _CENTERED_TOPK_K)
        .select(
            "query_id",
            "nn_rank",
            F.col("vec_id").alias("neighbor_id"),
            "cos",
        )
    )


def ann_bucket_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-balance DIAGNOSTIC: for the raw float sign-LSH and
    the mean-centered integer LSH (both at the adaptive plane count),
    the population statistics that decide whether bucketed pair
    generation is linear or quadratic — bucket count, max/total
    population, the implied directed candidate-pair count Σc², and the
    skew versus a perfectly uniform assignment in ppm
    (Σc² · buckets · 10⁶ div N²; 10⁶ = uniform).

    This is the observability counterpart of ``ann_recall_at_k``: that
    one calibrates index RECALL, this one calibrates index COST — the
    20× scale smoke caught raw sign-LSH collapsing a mean-shifted
    corpus into one bucket (pair blowup ~436×), and this query makes
    the same signal a queryable number on any corpus.

    Scale: two scan-side bucket projections, two |buckets|-key
    map-side-combining counts, constant-row output.  Output-range
    bound: ``directed_pairs`` = Σc² is emitted as bigint, exact while
    every bucket holds ≤ ~3·10⁹ vectors (c² ≤ 9.2·10¹⁸); a corpus
    pathological enough to exceed that in ONE bucket is precisely
    what this audit exists to flag, so the narrowing is a TRY_CAST on
    both engines — past the bound directed_pairs reports NULL (under
    ANSI a plain cast would RAISE and kill the whole audit) while the
    skew_ppm column (computed in the DECIMAL(38,0) interior) still
    reports the collapse exactly.  Widen directed_pairs to a
    digit-string transport if the raw count past that bound is ever
    needed.
    """
    # deliberately NO parallelism guard (measured A/B at sf0.1: OFF
    # 0.73 s vs ON 0.97 s best-of-4 — same aggregate-early shape as
    # ann_lsh_centered_topk)
    emb = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", _as_double("embedding").alias("v"))
    )
    nbits = _adaptive_nbits(table_count(spark, "embeddings", sf_dir))
    schemes = (
        ("raw_float", emb.withColumn("bucket", _bucket_expr(nbits))),
        ("centered_int", _centered_int_buckets(emb, nbits)),
    )
    out = None
    for name, bucketed in schemes:
        counts = bucketed.groupBy("bucket").agg(F.count("*").alias("c"))
        row = counts.agg(
            F.lit(name).alias("scheme"),
            F.lit(1 << nbits).cast("bigint").alias("n_buckets"),
            F.count("*").alias("buckets_used"),
            F.sum("c").alias("n_vectors"),
            F.max("c").alias("max_bucket"),
            # the Σc² SUM runs in decimal(38,0) — one ~3·10⁹-row
            # bucket would wrap an int64 c² term, and skew_ppm
            # derives from this sum; only the OUTPUT column narrows
            # to bigint (bound documented above)
            F.sum(F.expr("cast(c as decimal(38,0)) * c")).alias("dp_wide"),
        ).withColumn(
            # decimal(38,0): pairs·buckets·10⁶ reaches ~10³⁴ at N=10⁶
            "skew_ppm",
            F.expr(
                "cast(dp_wide * n_buckets"
                " * 1000000 div (cast(n_vectors as decimal(38,0))"
                " * n_vectors) as bigint)"
            ),
        ).withColumn(
            # try_cast: past ~3e9 vectors in one bucket the exact Σc²
            # exceeds int64 — NULL, not an ANSI CAST_OVERFLOW error,
            # so the audit still delivers skew_ppm (contract above)
            "directed_pairs", F.expr("try_cast(dp_wide as bigint)")
        ).drop("dp_wide")
        out = row if out is None else out.unionByName(row)
    return out


def _argmin_assign(scored: DataFrame) -> DataFrame:
    """Nearest-centroid assignment from a (vec_id, v, nv, cent_id, ccos)
    frame: max ccos, ties to the smallest cent_id — via ``max_by`` over
    the key struct (ccos, −cent_id), which aggregates with MAP-SIDE
    partial combine (a window over vec_id would shuffle the whole N·k
    expanded frame).  ``first(v)``/``first(nv)`` are deterministic here
    because both are constant within a vec_id group; carrying nv saves
    downstream probe joins a corpus-wide norm recompute, and the
    winner's ccos (= max ccos, since the struct max orders on ccos
    first) rides along for consumers like SemDeDup."""
    return scored.groupBy("vec_id").agg(
        F.max_by(
            "cent_id", F.struct(F.col("ccos"), (-F.col("cent_id")).alias("nc"))
        ).alias("cent_id"),
        F.first("v").alias("v"),
        F.first("nv").alias("nv"),
        F.max("ccos").alias("ccos"),
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest
    centroid, then answer each query from its own centroid's cell only
    (nprobe=1).

    Centroids are a deterministic seeded sample — vectors whose vec_id
    is divisible by floor(sqrt(N)) — giving ~sqrt(N) cells of ~sqrt(N)
    vectors each, the classic IVF balance (assignment cost N·k stays
    N^1.5, probe cost per query drops from N to sqrt(N)).  Determinism
    (instead of iterative k-means) is what lets the DuckDB oracle
    replicate cell assignment bit-for-bit; a k-means refinement would
    only move centroids, not change the plan shape.

    Scale: centroids broadcast (~sqrt(N) rows); assignment is one
    scan-side broadcast join + per-vector argmin via max_by groupBy —
    the N·k expanded frame reduces MAP-SIDE (partial aggregation)
    before its shuffle, unlike a window which would move all N·k rows;
    the probe join is an equi-join on cent_id.
    """
    emb = _emb_v(spark, sf_dir)
    # the probe tail reads the assignment TWICE (query slice + cell
    # members) and Spark replays a lazy subtree per consumer, so the
    # N·√N assignment pass ran twice — materialize it once (measured on
    # the PQ sibling: 3.47 → 2.97 best-of-3, rows identical).  At scale
    # the materialized assignment IS the IVF index artifact.
    assigned = _assign_cents(
        emb, _seed_centroids(spark, sf_dir, emb)
    ).localCheckpoint(eager=True)
    return _ivf_probe_topk(assigned)


def _ivf_probe_topk(assigned: DataFrame) -> DataFrame:
    """Shared nprobe=1 probe + per-query top-k over an assigned
    (vec_id, v, nv, cent_id, …) frame — the tail every IVF variant
    reuses: broadcast the query rows, equi-join on the cell id, rank
    within query."""
    q = assigned.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("qnv"),
        F.col("cent_id").alias("qcent"),
    )
    cand = assigned.join(
        F.broadcast(q),
        (F.col("cent_id") == F.col("qcent")) & (F.col("vec_id") != F.col("query_id")),
    ).withColumn(
        "cos",
        F.expr(
            _PAIR_COS.format(dot=_DOT.format(a="v", b="qv"), na="nv", nb="qnv")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


_IVF_C_CAP = 64  # fixed centroid budget of the capped variant


def ann_ivf_capped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a FIXED centroid budget (C = 64) instead of the √N
    rule — the production posture for the assignment stage at corpus
    scale.  √N centroids balance cell size against centroid count but
    make assignment O(N·√N) dot products, which the 100× smoke
    measured as the closest-to-linear family on the board (40.6× wall
    at 100× data); a FIXED C makes assignment O(N·C) — strictly linear
    in the corpus — at the cost of cells of N/C vectors, which is the
    knob a real deployment buys back with the PQ/ADC re-rank
    (``ann_ivf_pq``) rather than with more centroids.  This query IS
    that documented lever as code: same seeded-deterministic centroid
    choice (vec_id divisible by N div C — oracle-replicable), same
    assignment/probe topology, only the modulus differs.

    Scale: centroids broadcast (64 rows at any N); assignment reduces
    map-side; the probe equi-join moves each query's single cell.
    """
    emb = _emb_v(spark, sf_dir)
    return _capped_topk(spark, sf_dir, emb)


def _capped_topk(
    spark: SparkSession, sf_dir: str, emb: DataFrame
) -> DataFrame:
    """Fixed-budget (C=64) assignment + probe over a (vec_id, v)
    frame — shared by the standalone query and the recall calibration."""
    cents = _seed_centroids(
        spark, sf_dir, emb,
        mod=table_count(spark, "embeddings", sf_dir) // _IVF_C_CAP,
    )
    # materialized once for the probe tail's two reads (ann_ivf_topk
    # comment; same multi-consumer shape)
    return _ivf_probe_topk(
        _assign_cents(emb, cents).localCheckpoint(eager=True)
    )


def ann_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2: each query probes its TWO nearest centroid
    cells — the standard IVF recall knob (misses cluster near cell
    boundaries; the second-nearest cell catches most of them for 2×
    candidate cost).  Same topology as ann_ivf_topk; only the probe
    set per query grows.
    """
    emb = _emb_v(spark, sf_dir)
    # two tail reads (query re-score + cell members) — materialize the
    # assignment once (ann_ivf_topk comment)
    assigned = _assign_cents(
        emb, _seed_centroids(spark, sf_dir, emb)
    ).localCheckpoint(eager=True)
    return _nprobe2_topk(spark, sf_dir, assigned)


def _nprobe2_topk(
    spark: SparkSession, sf_dir: str, assigned: DataFrame
) -> DataFrame:
    """nprobe=2 tail over an assigned (vec_id, v, nv, cent_id) frame.

    The probe set (each query's two nearest centroids) is re-scored
    over the QUERY rows only (n_queries × ~√N pairs — trivial) instead
    of ranking the full N×k scored frame, so the corpus-wide expansion
    exists once, inside the shared assignment; the re-score uses the
    identical cosine spelling, so the probe choice is bit-identical.
    """
    cents = _seed_centroids(
        spark, sf_dir, assigned.select("vec_id", "v")
    ).withColumn("ncv", F.expr(_NORM.format(v="cv")))
    scored_q = (
        assigned.filter(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "v", "nv")
        .join(F.broadcast(cents))
        .withColumn(
            "ccos",
            F.expr(
                _PAIR_COS.format(
                    dot=_DOT.format(a="v", b="cv"), na="nv", nb="ncv"
                )
            ),
        )
    )
    # probe set: the query's two nearest centroids — the rank-2 window
    # runs over the QUERY rows only (k × n_queries rows, trivial)
    wa = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
    probes = (
        scored_q.withColumn("ark", F.row_number().over(wa))
        .filter(F.col("ark") <= 2)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("qnv"),
        F.col("cent_id").alias("probe_cent"),
    )
    cand = assigned.join(
        F.broadcast(probes),
        (F.col("cent_id") == F.col("probe_cent"))
        & (F.col("vec_id") != F.col("query_id")),
    ).withColumn(
        "cos",
        F.expr(
            _PAIR_COS.format(dot=_DOT.format(a="v", b="qv"), na="nv", nb="qnv")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


def _assign_cents(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Broadcast the centroid frame against the corpus and argmin via
    the map-side-combining ``_argmin_assign`` — the shared assignment
    step of the IVF family (the corpus never shuffles to be assigned).
    Norms are precomputed on each side BEFORE the join (N + k sqrts
    instead of N·k recomputations inside the pair expression)."""
    return _argmin_assign(
        vecs.withColumn("nv", F.expr(_NORM.format(v="v")))
        .join(F.broadcast(cents.withColumn("ncv", F.expr(_NORM.format(v="cv")))))
        .withColumn(
            "ccos",
            F.expr(
                _PAIR_COS.format(
                    dot=_DOT.format(a="v", b="cv"), na="nv", nb="ncv"
                )
            ),
        )
    )


def _seed_centroids(
    spark: SparkSession, sf_dir: str, emb: DataFrame, mod: int | None = None
) -> DataFrame:
    """Deterministic seeded centroid sample: vec_id % mod == 0.  The
    default modulus is isqrt(N) (the √N balance rule); the capped
    variant passes N div C.  ONE definition of the selection contract
    — the thing every IVF oracle replicates bit-for-bit."""
    import math

    if mod is None:
        mod = math.isqrt(table_count(spark, "embeddings", sf_dir))
    mod = max(1, mod)
    return emb.filter(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )


def _ivf_refined_centroids(
    spark: SparkSession, sf_dir: str, assigned0: DataFrame | None = None
) -> DataFrame:
    """One integer-quantized Lloyd step over the seeded assignment →
    (cent_id, cv).  Exposed as a helper so tests can compare the
    quantized mean against the true float mean directly.  ``assigned0``
    lets a composition (ann_recall_at_k) feed the shared materialized
    seeded assignment instead of rebuilding it."""
    if assigned0 is None:
        emb = _emb_v(spark, sf_dir)
        assigned0 = _assign_cents(emb, _seed_centroids(spark, sf_dir, emb))
    # element-wise mean per cell over integer-quantized member values —
    # exact bigint sums keep partial aggregation ON (see ann_ivf_refined
    # docstring); the collect_list below gathers d=64 (pos, m) structs
    # per CENTROID, bounded by dimensionality, not cell size.
    mem = assigned0.select(
        "cent_id", F.posexplode("v").alias("pos", "val")
    ).withColumn("sv", F.expr("cast(floor(val * 1e9 + 0.5) as bigint)"))
    sums = mem.groupBy("cent_id", "pos").agg(
        F.sum("sv").alias("s"), F.count("*").alias("n")
    )
    return (
        sums.withColumn("m", F.expr("floor(cast(s as double) / n + 0.5) / 1e9"))
        .groupBy("cent_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
            ).alias("cv")
        )
    )


def ann_ivf_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with ONE deterministic Lloyd (k-means) refinement step:
    seeded init (vec_id % isqrt(N) == 0) → assign all vectors to the
    nearest seed centroid → recompute each cell's centroid as the
    element-wise MEAN of its members → re-assign → probe (nprobe=1).
    Shows centroid *training*, not just assignment, while staying
    oracle-replicable: member values are quantized to integers
    scan-side (floor(val·1e9 + 0.5) as bigint), so the per-cell
    per-dimension reduction is an exact BIGINT sum — order-FREE and
    map-side combining, unlike the ordered float fold this replaced,
    which had to disable partial aggregation and collect_list every
    cell member.  The mean is then ONE double division of two exact
    integers (a single IEEE op, bit-identical across engines),
    quantized back to 9 decimals with the half-up floor.

    Scale: both assignment passes are broadcast joins (centroid set is
    ~sqrt(N) rows) + scan-side argmin — the corpus never shuffles for
    assignment; the mean step shuffles only the PARTIAL per-(cent, pos)
    sums (≤ cells·d rows per map task), not N·d member rows.  |sum|
    stays below 2^53 for cells up to ~9M members (|val| ≲ 1 ⇒ ≤ 1e9
    per member), far above the ~sqrt(N) cell sizes this seeding
    produces; the 0.5e-9 per-element quantization is noise relative to
    cosine assignment at 6 decimals.
    """
    emb = _emb_v(spark, sf_dir)
    return _refined_topk(spark, sf_dir, emb, None)


def _refined_topk(
    spark: SparkSession,
    sf_dir: str,
    emb: DataFrame,
    assigned0: DataFrame | None,
) -> DataFrame:
    """Refined-centroid assignment + nprobe=1 probe over a (vec_id, v)
    frame; ``assigned0`` optionally feeds the shared seeded assignment
    into the Lloyd step (recall composition)."""
    refined = _ivf_refined_centroids(spark, sf_dir, assigned0)
    # the refined re-assignment feeds the probe tail's two reads —
    # materialize once (ann_ivf_topk comment)
    assigned = _assign_cents(emb, refined).localCheckpoint(eager=True)
    return _ivf_probe_topk(assigned)


_SEMDEDUP_PRUNE_PCT = 20  # flag the 20% most centroid-redundant per cell


def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic pruning in the spirit of SemDeDup (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication") — APPROXIMATED with per-cell prototypicality
    ranking, not the paper's exact algorithm: cluster the corpus (the
    deterministic seeded IVF cell assignment shared with
    ``ann_ivf_topk``), rank each cell's members by cosine-to-centroid,
    and flag the top ``_SEMDEDUP_PRUNE_PCT``% most centroid-similar
    members.  The paper instead finds PAIRWISE near-duplicate groups
    within each cluster and keeps the lowest-centroid-similarity member
    per group; this operator keeps the same keep-the-diverse-tail
    intuition (points packed tightest around the center carry the least
    marginal information) at one bounded window instead of a per-cell
    quadratic pass — the prototypicality-pruning baseline, with
    ``dedup_embedding_cosine``/``dedup_embedding_components`` as the
    true pairwise path when exact SemDeDup grouping is required.

    Deterministic end-to-end: seeded cells (vec_id % isqrt(N)), cosine
    at 6 decimals, ties broken by vec_id, integer percent arithmetic
    (``n_cell·pct div 100``) — so the DuckDB oracle verifies values.

    Scale: assignment is the broadcast-join + map-side argmin of the
    IVF family (the corpus never shuffles to be assigned); the ranking
    is ONE window over cent_id — a single bounded shuffle whose
    partitions are ~sqrt(N)-member cells, not the corpus.
    """
    emb = ensure_parallelism(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    # shared IVF assignment; _argmin_assign carries the winner's ccos
    assigned = _assign_cents(emb, _seed_centroids(spark, sf_dir, emb))
    w = Window.partitionBy("cent_id").orderBy(F.desc("ccos"), F.asc("vec_id"))
    wc = Window.partitionBy("cent_id")
    return (
        assigned.withColumn("cell_rank", F.row_number().over(w).cast("bigint"))
        .withColumn("n_cell", F.count("*").over(wc))
        .withColumn(
            "pruned",
            F.col("cell_rank")
            <= F.expr(f"n_cell * {_SEMDEDUP_PRUNE_PCT} div 100"),
        )
        .select("vec_id", "cent_id", "ccos", "cell_rank", "n_cell", "pruned")
    )


_PQ_M = 8  # product-quantization subspaces (64 dims → 8 × 8-dim)
_PQ_D = _N_DIMS // _PQ_M
_PQ_K = 16  # codewords per subspace (~ N // 16 modulus sampling)


def pq_reconstruction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (PQ): split each vector into M=8 subspaces
    of 8 dims; per subspace, a ~16-codeword codebook (deterministic
    seeded sample: vec_id % (N div 16) == 0); each subvector is coded
    as its nearest codeword.  Reports per-label reconstruction error of
    the PQ code — the compression-quality metric that decides whether
    an ANN index can run on 8-byte codes instead of 256-byte floats
    (a 32× memory cut at 100 TB scale).

    Determinism: subspace distances are quantized to integers
    (floor(d2·1e6 + 0.5) as bigint) so the per-vector total and the
    per-label aggregate are EXACT integer sums — no float-accumulation
    order dependence anywhere; both engines produce identical values.

    Scale: the codebook (M·K = 128 rows) broadcasts; the distance join
    is scan-side; the min-per-(vec, subspace) is a groupBy with
    map-side partial aggregation (no window shuffle of the expanded
    frame).
    """
    emb = ensure_parallelism(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    mod = max(1, table_count(spark, "embeddings", sf_dir) // _PQ_K)
    # ``sv·sv`` and ``cv·cv`` are per-ROW quantities: compute each once
    # on its own side of the broadcast join instead of re-folding them
    # inside the pair expression (K× and N× redundantly) — the
    # ``_PAIR_COS`` precomputed-norm lesson applied to squared-L2.
    # d2 = svv − 2·(sv·cv) + cvv evaluates the same doubles in the
    # same order, so every d2i is bit-identical.
    subs = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.expr(_pq_sub_expr("v"))).alias("m", "sv"),
    ).withColumn("svv", F.expr(_DOT.format(a="sv", b="sv")))
    cw = subs.filter((F.col("vec_id") % mod) == 0).select(
        F.col("m").alias("cm"),
        F.col("vec_id").alias("code_id"),
        F.col("sv").alias("cv"),
        F.col("svv").alias("cvv"),
    )
    d2 = (
        F.col("svv")
        - 2 * F.expr(_DOT.format(a="sv", b="cv"))
        + F.col("cvv")
    )
    scored = subs.join(F.broadcast(cw), F.col("m") == F.col("cm")).withColumn(
        "d2i", F.floor(d2 * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    )
    best = scored.groupBy("vec_id", "label", "m").agg(F.min("d2i").alias("bd2"))
    pervec = best.groupBy("vec_id", "label").agg(F.sum("bd2").alias("td2"))
    return pervec.groupBy("label").agg(
        F.count("*").alias("n"),
        F.expr(
            f"floor(sum(td2) / count(*) / 1e6 / {_N_DIMS} * 1e9 + 0.5) / 1e9"
        ).alias("avg_mse"),
        F.expr(f"floor(max(td2) / 1e6 / {_N_DIMS} * 1e9 + 0.5) / 1e9").alias(
            "max_mse"
        ),
    )


_PQ_TOP_R = 20  # ADC shortlist per query before the exact re-rank


def _pq_sub_expr(col: str) -> str:
    """M fixed-width subvector slices of a d-dim double array."""
    return (
        f"transform(sequence(0, {_PQ_M - 1}),"
        f" m -> slice({col}, m * {_PQ_D} + 1, {_PQ_D}))"
    )


def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with asymmetric distance computation (ADC) and exact
    re-rank — the billion-scale ANN recipe of Jégou et al. 2011
    ("Product Quantization for Nearest Neighbor Search", the FAISS
    IVFPQ index): route each query to its IVF cell (seeded centroids,
    nprobe=1, the ``ann_ivf_topk`` assignment), score every cell member
    by the SUM over M=8 subspaces of the squared distance between the
    query's subvector and the member's assigned PQ codeword — looked up
    from a per-query M×K distance table, so the member's float vector
    is never touched during the scan — keep the ``_PQ_TOP_R`` best by
    approximate distance, then re-rank exactly by true cosine and emit
    the family-standard (query_id, neighbor_id, cos, rank) top-k.

    Vectors are L2-NORMALIZED before PQ encoding (one scan-side divide
    per element), so the ADC squared-L2 distance is ``2 − 2·cos`` up to
    quantization error — monotone with the family's cosine metric; on
    raw vectors the shortlist would rank by magnitude-skewed L2 and
    systematically drop true cosine top-k members (measured on the
    fixtures before the fix).

    Determinism: subspace distances are integer-quantized scan-side
    (floor(d2·1e6 + 0.5) bigint — the ``pq_reconstruction_stats``
    pattern), so codeword assignment (min-by over (d2i, code_id)), the
    ADC sums, and the shortlist cut are exact integer arithmetic in
    both engines; the normalization itself is one IEEE sqrt + divide
    replayed identically by the oracle; only the final R·n_queries
    re-rank cosines are floats (round 6, the family contract).

    Scale: this is the ANN shape that still works when the vectors
    themselves are the 100 TB problem.  The probe phase joins candidate
    ids against the CODE table — M byte-sized code ids (8 B/vector)
    instead of the 256 B float vector, a 32× cut in index size and
    probe-join traffic; the codebook (M·K = 128 rows) and the per-query
    ADC table (n_queries·M·K rows) broadcast; code assignment reuses
    the corpus scan (explode → broadcast codebook → map-side-combining
    argmin groupBy, no corpus shuffle); only the R winners per query
    fetch full vectors for the exact re-rank (a broadcast join).  With
    a large query batch the candidate-id broadcast becomes a shuffled
    equi-join on vec_id against the (bucketable) code table — the plan
    degrades to one co-located join, never to a vector-wide shuffle.
    """
    emb = _emb_v(spark, sf_dir)
    # three tail reads (query slice, candidate cells, re-rank fetch) —
    # materialize the assignment once (measured: 3.47 → 2.97 best-of-3,
    # rows identical)
    assigned = _assign_cents(
        emb, _seed_centroids(spark, sf_dir, emb)
    ).localCheckpoint(eager=True)
    return _pq_topk(spark, sf_dir, emb, assigned)


def _pq_topk(
    spark: SparkSession, sf_dir: str, emb: DataFrame, assigned: DataFrame
) -> DataFrame:
    """IVF-PQ/ADC tail over a (vec_id, v) frame and its seeded
    assignment — shared by the standalone query and the recall
    calibration (which feeds the checkpointed shared assignment)."""
    mod = max(1, table_count(spark, "embeddings", sf_dir) // _PQ_K)
    norm = emb.withColumn("nv0", F.expr(_NORM.format(v="v"))).withColumn(
        "vn", F.expr("transform(v, x -> x / nv0)")
    )
    # per-side squared norms computed once (pq_reconstruction_stats
    # comment): d2 = svv − 2·(sv·cv) + cvv is bit-identical, 1 pair
    # fold instead of 3.
    subs = norm.select(
        "vec_id", F.posexplode(F.expr(_pq_sub_expr("vn"))).alias("m", "sv")
    ).withColumn("svv", F.expr(_DOT.format(a="sv", b="sv")))
    cw = subs.filter((F.col("vec_id") % mod) == 0).select(
        F.col("m").alias("cm"),
        F.col("vec_id").alias("code_id"),
        F.col("sv").alias("cv"),
        F.col("svv").alias("cvv"),
    )
    d2i = F.floor(
        (
            F.col("svv")
            - 2 * F.expr(_DOT.format(a="sv", b="cv"))
            + F.col("cvv")
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("bigint")
    codes = (
        subs.join(F.broadcast(cw), F.col("m") == F.col("cm"))
        .withColumn("d2i", d2i)
        .groupBy("vec_id", "m")
        .agg(F.min_by("code_id", F.struct("d2i", "code_id")).alias("code_id"))
    )
    q = assigned.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("qnv"),
        F.col("cent_id").alias("qcent"),
    )
    qsubs = q.withColumn("qvn", F.expr("transform(qv, x -> x / qnv)")).select(
        "query_id", F.posexplode(F.expr(_pq_sub_expr("qvn"))).alias("m", "sv")
    ).withColumn("svv", F.expr(_DOT.format(a="sv", b="sv")))
    adc = (
        qsubs.join(F.broadcast(cw), F.col("m") == F.col("cm"))
        .select("query_id", "m", F.col("code_id"), d2i.alias("qd2i"))
    )
    cand_ids = assigned.join(
        F.broadcast(q.select("query_id", "qcent")),
        (F.col("cent_id") == F.col("qcent")) & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", "vec_id")
    approx = (
        codes.join(F.broadcast(cand_ids), "vec_id")
        .join(F.broadcast(adc), ["query_id", "m", "code_id"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd2i").alias("adist"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    shortlist = (
        approx.withColumn("ark", F.row_number().over(wr))
        .filter(F.col("ark") <= _PQ_TOP_R)
        .select("query_id", "vec_id")
    )
    rer = (
        assigned.select("vec_id", "v", "nv")
        .join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(q.select("query_id", "qv", "qnv")), "query_id")
        .withColumn(
            "cos",
            F.expr(
                _PAIR_COS.format(dot=_DOT.format(a="v", b="qv"), na="nv", nb="qnv")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


_DEDUP_TARGET_BUCKET = 64  # target avg bucket population for dedup blocking
_MAX_PLANES = 16


def _adaptive_nbits(n_rows: int) -> int:
    """Plane count derived from corpus size: log2(N / target bucket),
    clamped to [2, 16].  Keeps the per-bucket pair count ~constant as
    the corpus grows (the fixed-bucket version was quadratic in N).
    The DuckDB oracle computes the identical formula in SQL."""
    import math

    return min(
        _MAX_PLANES,
        max(2, math.ceil(math.log2(max(n_rows, 1) / _DEDUP_TARGET_BUCKET))),
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked.

    Pairs are generated only within an LSH bucket (the blocking step),
    then exact cosine filters at the threshold.  The plane count is
    DERIVED FROM CORPUS SIZE (ceil(log2(N/64)), clamped to [2,16]) so
    the expected bucket population — and with it the per-bucket
    quadratic pair term — stays constant as N grows.  Same-bucket
    requirement makes this approximate (like all LSH dedup); the
    brute-force ``ann_cosine_topk`` is the exact baseline.
    """
    emb = ensure_parallelism(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    # cached corpus count sizes the blocking; planes are inlined as
    # literals so the bucket id is still a pure scan-side projection
    nbits = _adaptive_nbits(table_count(spark, "embeddings", sf_dir))
    bucketed = emb.withColumn("nv", F.expr(_NORM.format(v="v"))).withColumn(
        "bucket", _bucket_expr(nbits)
    )
    a = bucketed.alias("a")
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nvb"),
        F.col("bucket").alias("bucket_b"),
    ).alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("bucket_b"))
        & (F.col("a.vec_id") < F.col("vec_b")),
    ).withColumn(
        "cos",
        F.expr(
            _PAIR_COS.format(
                dot=_DOT.format(a="a.v", b="vb"), na="a.nv", nb="nvb"
            )
        ),
    )
    return pairs.filter(F.col("cos") >= 0.35).select(
        F.col("a.vec_id").alias("vec_a"), "vec_b", "cos"
    )


def dedup_embedding_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-duplicate CLUSTERS: connected components over the
    embedding-cosine near-dup pair graph — the "one representative per
    semantic cluster" step, composing the adaptive-LSH pair detection
    with the shared CC operator (same algorithm as the MinHash cluster
    query; recursive-CTE oracle)."""
    from decisions_kinesis_spark.operators.dedup import connected_components

    pairs = dedup_embedding_cosine(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return connected_components(spark, pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster"
    )


def embedding_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization (per-vector min/max scale, 255 levels)
    with reconstruction-error statistics per label — the 4× memory
    reduction step an ANN index applies before sharding; the error
    stats are the calibration readout.

    Pure scan-side math: quantize, dequantize and accumulate squared
    error per element in one codegen'd expression chain — no shuffle
    except the final per-label aggregate.  Rounding uses the
    engine-stable floor(x+0.5) (not round()) for cross-engine parity.
    """
    emb = load_table(spark, "embeddings", sf_dir).select(
        "label", _as_double("embedding").alias("v")
    )
    err = (
        "aggregate(transform(v, x -> pow(x - lo - floor((x - lo) / s + 0.5) * s,"
        " 2)), cast(0.0 as double), (acc, x) -> acc + x)"
        f" / {_N_DIMS}"
    )
    return (
        emb.withColumn("lo", F.expr("array_min(v)"))
        .withColumn("s", F.expr("greatest((array_max(v) - lo) / 255.0, 1e-12)"))
        .withColumn("mse", F.expr(err))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("mse"), 9).alias("avg_mse"),
            F.round(F.max("mse"), 9).alias("max_mse"),
        )
    )


_RECALL_SCALE = 1_000_000


def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality CALIBRATION: recall@k of every approximate index
    against the exact brute-force ground truth (``ann_cosine_topk``) —
    the number that actually picks plane count / nprobe at 100 TB,
    where re-running brute force to check an index is impossible and
    this report (computed on a sampled slice) is the tuning loop.

    Per method: ``n_truth`` (ground-truth pairs = queries × k),
    ``n_pred`` (pairs the method returned — k per query for the IVF
    top-k variants, ≤1 per query for the best-neighbor LSH variants),
    ``n_hits`` (predicted pairs that are true top-k pairs),
    ``recall_scaled`` (hits·1e6 div truth) and ``precision_scaled``
    (hits·1e6 div predicted — the meaningful figure for the
    best-neighbor methods, whose recall is capped at 1/k by
    construction).  All counts are exact integers; the ratios are
    integer divisions — deterministic in both engines.

    Scale: each method frame reduces to per-method scalar counts via
    equi-joins on (query_id, neighbor_id) + global aggregates; the
    expensive inputs (ground truth + 8 method pipelines) come through
    the session ``stage_cache`` (localCheckpoint'd on first use), so
    repeated constructions — and the funnel-style composition with the
    standalone queries in one report session — pay each pipeline once
    (cache misses run those jobs at construction time).  The oracle
    composes the nine method/truth oracles as CTEs: one source of
    truth per index definition.

    Empirical note (sf0.1, uniform-random embeddings): the capped-64
    variant measures LOWER recall than √N nprobe1 (18% vs 26%) even
    though its cells are 3× larger — on an ANN-hostile isotropic
    corpus directional cells are weak predictors of top-k membership
    and the 10-query sample is small; the row exists so a REAL corpus
    measures its own trade instead of inheriting this one.  Same
    caveat for ``lsh_centered`` (12% recall@5 here): on an isotropic
    fixture centering buys nothing BY CONSTRUCTION (the mean is ~0
    already) — its value shows on mean-shifted corpora, where the raw
    rows collapse: ``ann_recall_mean_shifted`` measures that slice
    (centered 2.6-5× the budget-matched raw recall at shift 0.5), and
    ``ann_bucket_balance_audit`` measures the matching cost gap.
    """
    from decisions_kinesis_spark.operators import stage_cache

    def _spec(name: str, builder):
        return (
            f"annrecall:{name}",
            sf_dir,
            lambda: builder().localCheckpoint(eager=True),
        )

    def _cached(name: str, builder) -> DataFrame:
        return stage_cache.get_or_build(spark, *_spec(name, builder))

    # Shared expensive heads, materialized ONCE for the whole report
    # (guide §2.4 — remove repeated work outright): every method
    # pipeline starts from the same (vec_id, v, nv) corpus frame, the
    # two raw-LSH methods share one bucketed frame, and four IVF
    # variants share the seeded √N assignment (the N·√N dot-product
    # pass).  Each frame helper is the SAME code the standalone query
    # runs, so every method's rows are bit-identical to its standalone
    # oracle — only the number of times the shared heads execute
    # changes (9 emb scans → 1, 4 seeded assignments → 1).
    embn = _cached(
        "embn",
        lambda: _emb_v(spark, sf_dir).withColumn(
            "nv", F.expr(_NORM.format(v="v"))
        ),
    )
    emb = embn.select("vec_id", "v")
    # The three second-level heads depend only on the materialized embn
    # frame and not on each other — build them CONCURRENTLY (guide §2.6:
    # overlap independent jobs so the N·√N assignment pass back-fills
    # the truth pass's tail instead of waiting for it).
    assigned, bucketed, truth = stage_cache.build_many(
        spark,
        [
            _spec(
                "assigned",
                lambda: _assign_cents(emb, _seed_centroids(spark, sf_dir, emb)),
            ),
            _spec("bucketed", lambda: embn.withColumn("bucket", _bucket_expr())),
            _spec(
                "truth",
                lambda: _cosine_truth_frame(embn).select(
                    "query_id", "neighbor_id"
                ),
            ),
        ],
    )
    top_k = lambda fr: lambda: fr().select(  # noqa: E731
        "query_id", "neighbor_id"
    )
    best = lambda fr: lambda: fr().filter(  # noqa: E731
        F.col("best_neighbor").isNotNull()
    ).select("query_id", F.col("best_neighbor").alias("neighbor_id"))
    methods = (
        ("lsh_bucket", best(lambda: _lsh_best_frame(bucketed))),
        ("lsh_multiprobe", best(lambda: _lsh_multiprobe_frame(bucketed))),
        ("ivf_nprobe1", top_k(lambda: _ivf_probe_topk(assigned))),
        ("ivf_nprobe2", top_k(lambda: _nprobe2_topk(spark, sf_dir, assigned))),
        ("ivf_refined", top_k(lambda: _refined_topk(spark, sf_dir, emb, assigned))),
        ("ivf_pq", top_k(lambda: _pq_topk(spark, sf_dir, emb, assigned))),
        ("ivf_capped", top_k(lambda: _capped_topk(spark, sf_dir, emb))),
        ("lsh_centered", top_k(lambda: _centered_topk(spark, sf_dir, embn))),
    )
    n_truth = truth.groupBy().agg(F.count("*").alias("n_truth"))
    # The eight method tails are independent given the shared heads —
    # materialize them through the same concurrent build (guide §2.6);
    # report assembly below reads the memoized frames in method order,
    # so rows and values are identical to the sequential build.
    stage_cache.build_many(
        spark, [_spec(mname, builder) for mname, builder in methods]
    )
    out = None
    for mname, builder in methods:
        preds = _cached(mname, builder)
        n_pred = preds.groupBy().agg(F.count("*").alias("n_pred"))
        n_hits = (
            preds.join(truth, ["query_id", "neighbor_id"])
            .groupBy()
            .agg(F.count("*").alias("n_hits"))
        )
        row = (
            n_truth.join(F.broadcast(n_pred))
            .join(F.broadcast(n_hits))
            .select(
                F.lit(mname).alias("method"),
                "n_truth",
                "n_pred",
                "n_hits",
                # empty corpus: no truth — NULL, not a divide-by-zero
                # (same contract as ann_recall_mean_shifted)
                F.expr(
                    f"case when n_truth = 0 then null"
                    f" else n_hits * {_RECALL_SCALE} div n_truth end"
                ).alias("recall_scaled"),
                F.expr(
                    f"if(n_pred = 0, 0, n_hits * {_RECALL_SCALE} div n_pred)"
                ).alias("precision_scaled"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


_SHIFT_CAL = 0.5  # per-dim constant shift for the mean-shifted recall slice


def ann_recall_mean_shifted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the raw-float vs the mean-centered LSH index on a
    MEAN-SHIFTED view of the corpus (every component +0.5, ~4σ of the
    fixture's component spread) — the calibration slice where the
    production posture earns its promotion (VERDICT r10 #3: the
    isotropic ``ann_recall_at_k`` row can't show it, because centering
    a ~zero-mean corpus is a no-op by construction).

    The comparison is at EQUAL SCORING BUDGET, the constraint that
    defines an index at 100 TB: under a dominant mean direction the
    raw sign-LSH buckets collapse (measured here: 2 of 8 buckets used
    at sf0.01, 8 of 32 at sf0.1 — vs all buckets used by the centered
    index), so its "recall" from an unbounded candidate list is just
    creeping brute force (top-5 of half the corpus) at 4-10× the
    scoring cost.  Each query therefore scores only its first B raw
    candidates in deterministic vec_id order, where B is THAT query's
    centered-index candidate count — recall per equal work.  Measured
    (shift 0.5): raw 5/50 vs centered 13/50 hits at sf0.01; raw 1/50
    vs centered 5/50 at sf0.1 — the centered index wins 2.6-5× where
    the raw rows collapse, closing the loop that
    ``ann_bucket_balance_audit`` opens on the COST side.

    Output: one row per method — truth/prediction/hit counts,
    ``recall_scaled`` (hits·10⁶ div truth), ``buckets_used`` (the
    collapse observable) and ``cand_unbudgeted`` (candidate pairs the
    index generates before budgeting — the work an unbounded scorer
    would pay).  All exact integers; ranking ties break on the
    6dp-rounded cosine then vec_id, deterministic in both engines.

    Scale: same topology as ``ann_lsh_centered_topk`` twice — bucket
    keys are scan-side arithmetic at the adaptive plane count, the
    candidate frames are equi-joins on bucket against a broadcast
    10-query side, and every ranking window partitions by query_id
    (bounded by the 10-query calibration sample).
    """
    shifted = F.expr(
        f"transform(cast(embedding as array<double>), x -> x + {_SHIFT_CAL}D)"
    )
    # the shifted/normalized corpus feeds 4+ consumers (truth both
    # sides, both indexes) and a lazy subtree replays per consumer —
    # materialize once (guide §2.4)
    emb = (
        ensure_parallelism(load_table(spark, "embeddings", sf_dir))
        .select("vec_id", shifted.alias("v"))
        .withColumn("nv", F.expr(_NORM.format(v="v")))
        .localCheckpoint(eager=True)
    )
    nbits = _adaptive_nbits(table_count(spark, "embeddings", sf_dir))

    def _queries_of(bucketed: DataFrame) -> DataFrame:
        return bucketed.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("qnv"),
            F.col("bucket").alias("qbucket"),
        )

    def _cands(bucketed: DataFrame) -> DataFrame:
        return bucketed.join(
            F.broadcast(_queries_of(bucketed)),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )

    cos = F.expr(
        _PAIR_COS.format(dot=_DOT.format(a="v", b="qv"), na="nv", nb="qnv")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )

    def _topk(cand: DataFrame) -> DataFrame:
        return (
            cand.withColumn("cos", cos)
            .withColumn("rk", F.row_number().over(w_rank))
            .filter(F.col("rk") <= _TOP_K)
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
        )

    # ground truth: brute-force top-k under the SHIFTED cosine (the
    # shift changes the metric, so truth must be recomputed — the
    # unshifted ann_cosine_topk truth would grade the wrong question)
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("qnv"),
    )
    # truth (N×queries brute force, read 3×: n_truth + both methods'
    # hit joins) and the two index frames (read 3× each: both _cands
    # sides + buckets_used) are independent given emb — materialize
    # them with overlapped jobs (guide §2.4/§2.6)
    truth, cen, raw = checkpoint_parallel(
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cos)
        .withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id")),
        _centered_int_buckets(emb, nbits),
        emb.withColumn("bucket", _bucket_expr(nbits)),
    )
    # the candidate frames are read 2-3× (budget, top-k, unbudgeted
    # count) — materialize both, overlapped
    cen_cand, raw_cand = checkpoint_parallel(_cands(cen), _cands(raw))
    # per-query scoring budget = the centered index's candidate count
    budget = cen_cand.groupBy("query_id").agg(F.count("*").alias("b"))
    raw_budgeted = (
        raw_cand.withColumn(
            "scan_rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("vec_id"))
            ),
        )
        .join(F.broadcast(budget), "query_id")
        .filter(F.col("scan_rk") <= F.col("b"))
    )

    n_truth = truth.groupBy().agg(F.count("*").alias("n_truth"))
    out = None
    for mname, preds, cand, bucketed in (
        ("raw_float_budgeted", _topk(raw_budgeted), raw_cand, raw),
        ("centered_int", _topk(cen_cand), cen_cand, cen),
    ):
        n_pred = preds.groupBy().agg(F.count("*").alias("n_pred"))
        n_hits = (
            preds.join(truth, ["query_id", "neighbor_id"])
            .groupBy()
            .agg(F.count("*").alias("n_hits"))
        )
        n_cand = cand.groupBy().agg(F.count("*").alias("cand_unbudgeted"))
        n_used = bucketed.select("bucket").distinct().groupBy().agg(
            F.count("*").alias("buckets_used")
        )
        row = (
            n_truth.join(F.broadcast(n_pred))
            .join(F.broadcast(n_hits))
            .join(F.broadcast(n_cand))
            .join(F.broadcast(n_used))
            .select(
                F.lit(mname).alias("method"),
                "n_truth",
                "n_pred",
                "n_hits",
                # empty corpus: no truth to grade against — NULL, not a
                # divide-by-zero (counts above stay observable)
                F.expr(
                    f"case when n_truth = 0 then null"
                    f" else n_hits * {_RECALL_SCALE} div n_truth end"
                ).alias("recall_scaled"),
                "buckets_used",
                "cand_unbudgeted",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_centered_topk": ann_lsh_centered_topk,
    "embedding_norm_stats": embedding_norm_stats,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ann_lsh_multiprobe": ann_lsh_multiprobe,
    "ann_mutual_knn_pairs": ann_mutual_knn_pairs,
    "ann_bucket_balance_audit": ann_bucket_balance_audit,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_capped_topk": ann_ivf_capped_topk,
    "ann_ivf_nprobe2": ann_ivf_nprobe2,
    "ann_ivf_refined": ann_ivf_refined,
    "ann_ivf_pq": ann_ivf_pq,
    "semdedup_prune": semdedup_prune,
    "pq_reconstruction_stats": pq_reconstruction_stats,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_embedding_components": dedup_embedding_components,
    "embedding_quantize_stats": embedding_quantize_stats,
    "ann_recall_at_k": ann_recall_at_k,
    "ann_recall_mean_shifted": ann_recall_mean_shifted,
}

_DUCK_COS = (
    "round(list_dot_product(a.v, q.qv) /"
    " (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6)"
)

def _duck_bucket(n_planes: int = _N_PLANES) -> str:
    parts = []
    for b in range(n_planes):
        signs = "[" + ", ".join(f"{s:.1f}" for s in _plane_signs(b)) + "]"
        parts.append(
            f"(CASE WHEN list_dot_product(v, {signs}::DOUBLE[]) > 0"
            f" THEN {1 << b} ELSE 0 END)"
        )
    return " + ".join(parts)


_DUCK_BUCKET = _duck_bucket()


def _duck_centered_bucket(n_planes: int = _MAX_PLANES) -> str:
    """DuckDB replay of ``_centered_int_buckets``' plane bits over a
    ``cv`` (centered quantized bigint list) column — exact integer
    projections, identical bucket ids by construction."""
    parts = []
    for b in range(n_planes):
        signs = "[" + ", ".join(str(int(s)) for s in _plane_signs(b)) + "]"
        parts.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {_N_DIMS + 1}),"
            f" i -> cv[i] * ({signs}::BIGINT[])[i])) > 0"
            f" THEN {1 << b} ELSE 0 END)"
        )
    return " + ".join(parts)


#: shared oracle CTE chain: quantize → truncated integer per-dim mean →
#: centered components → 16-plane integer bucket (mod 2^nbits applied
#: at the use site)
_DUCK_CENTERED_CTES = f"""eq AS (
            SELECT vec_id, v,
                   list_transform(v,
                       x -> floor(x * {_CQ} + 0.5)::BIGINT) AS q
            FROM e
        ),
        mu AS (
            SELECT list(m ORDER BY pos) AS mq
            FROM (SELECT ps.pos,
                         sum(q[ps.pos])::BIGINT // count(*) AS m
                  FROM eq,
                       (SELECT unnest(range(1, {_N_DIMS + 1})) AS pos) ps
                  GROUP BY ps.pos)
        ),
        cb AS (
            SELECT vec_id, v,
                   list_transform(range(1, {_N_DIMS + 1}),
                       i -> q[i] - mq[i]) AS cv
            FROM eq, mu
        )"""

#: Shared CTE chain for the embedding near-dup pair graph (adaptive
#: plane count = clamp(ceil(log2(N/64)), 2, 16), same formula as the
#: engine) → `pairsel(vec_a, vec_b, cos)` at the 0.35 threshold.
_DUCK_EMB_PAIR_CTES = f"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (
            SELECT least({_MAX_PLANES}, greatest(2,
                   ceil(log2(count(*) / {_DEDUP_TARGET_BUCKET}.0))::INT)) AS nbits
            FROM embeddings
        ),
        bucketed AS (
            SELECT vec_id, v,
                   (({_duck_bucket(_MAX_PLANES)})
                    % (1::BIGINT << (SELECT nbits FROM p)))::BIGINT AS bucket
            FROM e
        ),
        pairsel AS (
            SELECT vec_a, vec_b, cos FROM (
                SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                       round(list_dot_product(a.v, b.v) /
                             (sqrt(list_dot_product(a.v, a.v))
                              * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
                FROM bucketed a JOIN bucketed b
                  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            ) WHERE cos >= 0.35
        )"""

ORACLES = {
    "ann_cosine_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
        scored AS (
            SELECT q.query_id, a.vec_id AS neighbor_id, {_DUCK_COS} AS cos
            FROM e a JOIN q ON a.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {_TOP_K}
    """,
    "embedding_norm_stats": """
        WITH e AS (
            SELECT label,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                       AS nrm
            FROM embeddings
        )
        SELECT label, count(*) AS n,
               round(avg(nrm), 6) AS avg_norm,
               round(min(nrm), 6) AS min_norm,
               round(max(nrm), 6) AS max_norm
        FROM e GROUP BY label
    """,
    "dedup_embedding_cosine": f"""
        WITH {_DUCK_EMB_PAIR_CTES}
        SELECT vec_a, vec_b, cos FROM pairsel
    """,
    "dedup_embedding_components": f"""
        WITH RECURSIVE {_DUCK_EMB_PAIR_CTES},
        edges AS (
            SELECT vec_a AS a, vec_b AS b FROM pairsel
            UNION ALL
            SELECT vec_b AS a, vec_a AS b FROM pairsel
        ),
        reach(node, label) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
        )
        SELECT node AS vec_id, min(label) AS cluster
        FROM reach GROUP BY node
    """,
    "ann_lsh_multiprobe": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        bucketed AS (SELECT vec_id, v, ({_DUCK_BUCKET})::BIGINT AS bucket FROM e),
        q0 AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
               FROM bucketed WHERE vec_id < {_N_QUERIES}),
        q AS (
            SELECT query_id, qv, qbucket, p.probe
            FROM q0, LATERAL (
                SELECT unnest([qbucket] || [
                    {", ".join(f"xor(qbucket, {1 << b}::BIGINT)" for b in range(_N_PLANES))}
                ]) AS probe
            ) p
        ),
        cand AS (
            SELECT q.query_id, a.vec_id, {_DUCK_COS} AS cos
            FROM bucketed a JOIN q
              ON a.bucket = q.probe AND a.vec_id <> q.query_id
        ),
        best AS (
            SELECT query_id, vec_id AS best_neighbor, cos AS best_cos
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                               ORDER BY cos DESC, vec_id ASC) AS rk
                  FROM cand)
            WHERE rk = 1
        ),
        n_cand AS (SELECT query_id, count(*) AS n_candidates FROM cand GROUP BY query_id)
        SELECT q0.query_id, q0.qbucket AS bucket,
               coalesce(n_cand.n_candidates, 0) AS n_candidates,
               best.best_neighbor, best.best_cos
        FROM q0
        LEFT JOIN n_cand ON n_cand.query_id = q0.query_id
        LEFT JOIN best ON best.query_id = q0.query_id
    """,
    "embedding_quantize_stats": f"""
        WITH e AS (
            SELECT label, embedding::DOUBLE[] AS v FROM embeddings
        ),
        q AS (
            SELECT label,
                   list_min(v) AS lo,
                   greatest((list_max(v) - list_min(v)) / 255.0, 1e-12) AS s,
                   v
            FROM e
        ),
        m AS (
            SELECT label,
                   list_sum(list_transform(v, x ->
                       pow(x - lo - floor((x - lo) / s + 0.5) * s, 2)))
                       / {_N_DIMS} AS mse
            FROM q
        )
        SELECT label, count(*) AS n,
               round(avg(mse), 9) AS avg_mse,
               round(max(mse), 9) AS max_mse
        FROM m GROUP BY label
    """,
    "pq_reconstruction_stats": f"""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (SELECT greatest(count(*) // {_PQ_K}, 1) AS md FROM embeddings),
        subs AS (
            SELECT vec_id, label, m.m AS m,
                   v[m.m * {_PQ_D} + 1 : m.m * {_PQ_D} + {_PQ_D}] AS sv
            FROM e, (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m) m
        ),
        cw AS (
            SELECT m AS cm, vec_id AS code_id, sv AS cv
            FROM subs WHERE vec_id % (SELECT md FROM p) = 0
        ),
        scored AS (
            SELECT s.vec_id, s.label, s.m,
                   floor((list_dot_product(s.sv, s.sv)
                          - 2 * list_dot_product(s.sv, c.cv)
                          + list_dot_product(c.cv, c.cv)) * 1e6 + 0.5)::BIGINT
                       AS d2i
            FROM subs s JOIN cw c ON s.m = c.cm
        ),
        best AS (
            SELECT vec_id, label, m, min(d2i) AS bd2
            FROM scored GROUP BY vec_id, label, m
        ),
        pervec AS (
            SELECT vec_id, label, sum(bd2)::BIGINT AS td2
            FROM best GROUP BY vec_id, label
        )
        SELECT label, count(*) AS n,
               floor(sum(td2)::BIGINT / count(*) / 1e6 / {_N_DIMS} * 1e9 + 0.5)
                   / 1e9 AS avg_mse,
               floor(max(td2) / 1e6 / {_N_DIMS} * 1e9 + 0.5) / 1e9 AS max_mse
        FROM pervec GROUP BY label
    """,
    "ann_ivf_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        -- seeded centroid sample: vec_id divisible by isqrt(N).  The
        -- float sqrt is Newton-corrected to the EXACT integer sqrt so
        -- the modulus matches Python's math.isqrt even when the
        -- double-precision sqrt rounds across the floor boundary.
        p AS (SELECT greatest(CASE WHEN (s + 1) * (s + 1) <= n THEN s + 1
                                   WHEN s * s > n THEN s - 1
                                   ELSE s END, 1) AS md
              FROM (SELECT count(*) AS n,
                           floor(sqrt(count(*)))::BIGINT AS s
                    FROM embeddings)),
        cents AS (
            SELECT vec_id AS cent_id, v AS cv FROM e
            WHERE vec_id % (SELECT md FROM p) = 0
        ),
        scored AS (
            SELECT e.vec_id, e.v, c.cent_id,
                   round(list_dot_product(e.v, c.cv) /
                         (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
            FROM e, cents c
        ),
        assigned AS (
            SELECT vec_id, v, cent_id
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, cent_id ASC) AS ark
                  FROM scored)
            WHERE ark = 1
        ),
        q AS (
            SELECT vec_id AS query_id, v AS qv, cent_id AS qcent
            FROM assigned WHERE vec_id < {_N_QUERIES}
        ),
        cand AS (
            SELECT q.query_id, a.vec_id, {_DUCK_COS} AS cos
            FROM assigned a JOIN q
              ON a.cent_id = q.qcent AND a.vec_id <> q.query_id
        )
        SELECT query_id, vec_id AS neighbor_id, cos, rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, vec_id ASC) AS rank
              FROM cand)
        WHERE rank <= {_TOP_K}
    """,
    # capped variant: identical topology, FIXED 64-centroid budget —
    # the modulus is N div 64 (exact integer, no sqrt correction
    # needed), everything else is the ann_ivf_topk oracle verbatim
    "ann_ivf_capped_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (SELECT greatest(count(*) // {_IVF_C_CAP}, 1) AS md
              FROM embeddings),
        cents AS (
            SELECT vec_id AS cent_id, v AS cv FROM e
            WHERE vec_id % (SELECT md FROM p) = 0
        ),
        scored AS (
            SELECT e.vec_id, e.v, c.cent_id,
                   round(list_dot_product(e.v, c.cv) /
                         (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
            FROM e, cents c
        ),
        assigned AS (
            SELECT vec_id, v, cent_id
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, cent_id ASC) AS ark
                  FROM scored)
            WHERE ark = 1
        ),
        q AS (
            SELECT vec_id AS query_id, v AS qv, cent_id AS qcent
            FROM assigned WHERE vec_id < {_N_QUERIES}
        ),
        cand AS (
            SELECT q.query_id, a.vec_id, {_DUCK_COS} AS cos
            FROM assigned a JOIN q
              ON a.cent_id = q.qcent AND a.vec_id <> q.query_id
        )
        SELECT query_id, vec_id AS neighbor_id, cos, rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, vec_id ASC) AS rank
              FROM cand)
        WHERE rank <= {_TOP_K}
    """,
    "ann_ivf_refined": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        -- exact isqrt(N) modulus (Newton-corrected; see ann_ivf_topk)
        p AS (SELECT greatest(CASE WHEN (s + 1) * (s + 1) <= n THEN s + 1
                                   WHEN s * s > n THEN s - 1
                                   ELSE s END, 1) AS md
              FROM (SELECT count(*) AS n,
                           floor(sqrt(count(*)))::BIGINT AS s
                    FROM embeddings)),
        cents0 AS (
            SELECT vec_id AS cent_id, v AS cv FROM e
            WHERE vec_id % (SELECT md FROM p) = 0
        ),
        scored0 AS (
            SELECT e.vec_id, e.v, c.cent_id,
                   round(list_dot_product(e.v, c.cv) /
                         (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
            FROM e, cents0 c
        ),
        assigned0 AS (
            SELECT vec_id, v, cent_id
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, cent_id ASC) AS ark
                  FROM scored0)
            WHERE ark = 1
        ),
        -- one Lloyd step: per-cell element-wise mean over
        -- integer-quantized member values (floor(val*1e9 + 0.5) as
        -- BIGINT) — the sum is exact integer arithmetic, so it is
        -- order-free and bit-identical to Spark's map-side-combining
        -- bigint sum; the mean is one double division of two exact
        -- integers, quantized with the engine-stable half-up floor.
        mem AS (
            SELECT cent_id, p.pos AS pos,
                   floor(v[p.pos] * 1e9 + 0.5)::BIGINT AS sv
            FROM assigned0, (SELECT unnest(generate_series(1, {_N_DIMS})) AS pos) p
        ),
        sums AS (
            SELECT cent_id, pos, sum(sv)::BIGINT AS s, count(*) AS n
            FROM mem GROUP BY cent_id, pos
        ),
        refined AS (
            SELECT cent_id,
                   list(floor(s::DOUBLE / n + 0.5) / 1e9 ORDER BY pos) AS cv
            FROM sums GROUP BY cent_id
        ),
        scored AS (
            SELECT e.vec_id, e.v, r.cent_id,
                   round(list_dot_product(e.v, r.cv) /
                         (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(r.cv, r.cv))), 6) AS ccos
            FROM e, refined r
        ),
        assigned AS (
            SELECT vec_id, v, cent_id
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, cent_id ASC) AS ark
                  FROM scored)
            WHERE ark = 1
        ),
        q AS (
            SELECT vec_id AS query_id, v AS qv, cent_id AS qcent
            FROM assigned WHERE vec_id < {_N_QUERIES}
        ),
        cand AS (
            SELECT q.query_id, a.vec_id, {_DUCK_COS} AS cos
            FROM assigned a JOIN q
              ON a.cent_id = q.qcent AND a.vec_id <> q.query_id
        )
        SELECT query_id, vec_id AS neighbor_id, cos, rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, vec_id ASC) AS rank
              FROM cand)
        WHERE rank <= {_TOP_K}
    """,
    "semdedup_prune": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        -- exact isqrt(N) modulus (Newton-corrected; see ann_ivf_topk)
        p AS (SELECT greatest(CASE WHEN (s + 1) * (s + 1) <= n THEN s + 1
                                   WHEN s * s > n THEN s - 1
                                   ELSE s END, 1) AS md
              FROM (SELECT count(*) AS n,
                           floor(sqrt(count(*)))::BIGINT AS s
                    FROM embeddings)),
        cents AS (
            SELECT vec_id AS cent_id, v AS cv FROM e
            WHERE vec_id % (SELECT md FROM p) = 0
        ),
        scored AS (
            SELECT e.vec_id, c.cent_id,
                   round(list_dot_product(e.v, c.cv) /
                         (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
            FROM e, cents c
        ),
        assigned AS (
            SELECT vec_id, cent_id, ccos
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY ccos DESC, cent_id ASC) AS ark
                  FROM scored)
            WHERE ark = 1
        ),
        ranked AS (
            SELECT vec_id, cent_id, ccos,
                   row_number() OVER (PARTITION BY cent_id
                       ORDER BY ccos DESC, vec_id ASC) AS cell_rank,
                   count(*) OVER (PARTITION BY cent_id) AS n_cell
            FROM assigned
        )
        SELECT vec_id, cent_id, ccos, cell_rank, n_cell,
               cell_rank <= (n_cell * {_SEMDEDUP_PRUNE_PCT}) // 100 AS pruned
        FROM ranked
    """,
    "ann_ivf_nprobe2": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        -- exact isqrt(N) modulus (Newton-corrected; see ann_ivf_topk)
        p AS (SELECT greatest(CASE WHEN (s + 1) * (s + 1) <= n THEN s + 1
                                   WHEN s * s > n THEN s - 1
                                   ELSE s END, 1) AS md
              FROM (SELECT count(*) AS n,
                           floor(sqrt(count(*)))::BIGINT AS s
                    FROM embeddings)),
        cents AS (
            SELECT vec_id AS cent_id, v AS cv FROM e
            WHERE vec_id % (SELECT md FROM p) = 0
        ),
        ranked AS (
            SELECT e.vec_id, e.v, c.cent_id,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY round(list_dot_product(e.v, c.cv) /
                                    (sqrt(list_dot_product(e.v, e.v))
                                     * sqrt(list_dot_product(c.cv, c.cv))), 6)
                                DESC, c.cent_id ASC) AS ark
            FROM e, cents c
        ),
        assigned AS (
            SELECT vec_id, v, cent_id FROM ranked WHERE ark = 1
        ),
        probes AS (
            SELECT vec_id AS query_id, v AS qv, cent_id AS probe_cent
            FROM ranked WHERE vec_id < {_N_QUERIES} AND ark <= 2
        ),
        cand AS (
            SELECT q.query_id, a.vec_id,
                   round(list_dot_product(a.v, q.qv) /
                         (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
            FROM assigned a JOIN probes q
              ON a.cent_id = q.probe_cent AND a.vec_id <> q.query_id
        )
        SELECT query_id, vec_id AS neighbor_id, cos, rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, vec_id ASC) AS rank
              FROM cand)
        WHERE rank <= {_TOP_K}
    """,
    "ann_lsh_bucketed": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        bucketed AS (SELECT vec_id, v, ({_DUCK_BUCKET})::BIGINT AS bucket FROM e),
        q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
              FROM bucketed WHERE vec_id < {_N_QUERIES}),
        cand AS (
            SELECT q.query_id, a.vec_id, {_DUCK_COS} AS cos
            FROM bucketed a JOIN q
              ON a.bucket = q.qbucket AND a.vec_id <> q.query_id
        ),
        best AS (
            SELECT query_id, vec_id AS best_neighbor, cos AS best_cos
            FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                               ORDER BY cos DESC, vec_id ASC) AS rk
                  FROM cand)
            WHERE rk = 1
        ),
        n_cand AS (SELECT query_id, count(*) AS n_candidates FROM cand GROUP BY query_id)
        SELECT q.query_id, q.qbucket AS bucket,
               coalesce(n_cand.n_candidates, 0) AS n_candidates,
               best.best_neighbor, best.best_cos
        FROM q
        LEFT JOIN n_cand ON n_cand.query_id = q.query_id
        LEFT JOIN best ON best.query_id = q.query_id
    """,
    "ann_mutual_knn_pairs": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (
            SELECT least({_MAX_PLANES}, greatest(2,
                   ceil(log2(count(*) / {_DEDUP_TARGET_BUCKET}.0))::INT)) AS nbits
            FROM embeddings
        ),
        {_DUCK_CENTERED_CTES},
        bucketed AS (
            SELECT vec_id, v,
                   (({_duck_centered_bucket()})
                    % (1::BIGINT << (SELECT nbits FROM p)))::BIGINT AS bucket
            FROM cb
        ),
        d AS (
            SELECT a.vec_id AS a_id, q.vec_id AS b_id,
                   round(list_dot_product(a.v, q.v) /
                         (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(q.v, q.v))), 6) AS cos
            FROM bucketed a JOIN bucketed q
              ON a.bucket = q.bucket AND a.vec_id <> q.vec_id
        ),
        knn AS (
            SELECT a_id, b_id, cos, rk
            FROM (SELECT *, row_number() OVER (PARTITION BY a_id
                          ORDER BY cos DESC, b_id ASC) AS rk
                  FROM d)
            WHERE rk <= {_MUTUAL_K}
        )
        SELECT e1.a_id, e1.b_id, e1.cos,
               e1.rk AS rank_ab, e2.rk AS rank_ba
        FROM knn e1 JOIN knn e2
          ON e1.a_id = e2.b_id AND e1.b_id = e2.a_id
        WHERE e1.a_id < e1.b_id
    """,
    "ann_lsh_centered_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (
            SELECT least({_MAX_PLANES}, greatest(2,
                   ceil(log2(count(*) / {_DEDUP_TARGET_BUCKET}.0))::INT)) AS nbits
            FROM embeddings
        ),
        {_DUCK_CENTERED_CTES},
        bucketed AS (
            SELECT vec_id, v,
                   (({_duck_centered_bucket()})
                    % (1::BIGINT << (SELECT nbits FROM p)))::BIGINT AS bucket
            FROM cb
        ),
        d AS (
            SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
                   round(list_dot_product(a.v, q.v) /
                         (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(q.v, q.v))), 6) AS cos
            FROM bucketed a JOIN bucketed q
              ON a.bucket = q.bucket AND a.vec_id <> q.vec_id
            WHERE q.vec_id < {_N_QUERIES}
        )
        SELECT query_id, nn_rank, neighbor_id, cos
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id ASC) AS nn_rank
              FROM d)
        WHERE nn_rank <= {_CENTERED_TOPK_K}
    """,
    "ann_bucket_balance_audit": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (
            SELECT least({_MAX_PLANES}, greatest(2,
                   ceil(log2(count(*) / {_DEDUP_TARGET_BUCKET}.0))::INT)) AS nbits
            FROM embeddings
        ),
        {_DUCK_CENTERED_CTES},
        tagged AS (
            SELECT 'raw_float' AS scheme,
                   (({_duck_bucket(_MAX_PLANES)})
                    % (1::BIGINT << (SELECT nbits FROM p)))::BIGINT AS bucket
            FROM e
            UNION ALL
            SELECT 'centered_int',
                   (({_duck_centered_bucket()})
                    % (1::BIGINT << (SELECT nbits FROM p)))::BIGINT
            FROM cb
        ),
        counts AS (
            SELECT scheme, bucket, count(*)::BIGINT AS c
            FROM tagged GROUP BY 1, 2
        )
        SELECT scheme,
               (1::BIGINT << (SELECT nbits FROM p))::BIGINT AS n_buckets,
               count(*)::BIGINT AS buckets_used,
               sum(c)::BIGINT AS n_vectors,
               max(c)::BIGINT AS max_bucket,
               TRY_CAST(sum(c::HUGEINT * c) AS BIGINT) AS directed_pairs,
               (sum(c::HUGEINT * c)
                * (1::BIGINT << (SELECT nbits FROM p)) * 1000000
                // (sum(c)::HUGEINT * sum(c)))::BIGINT AS skew_ppm
        FROM counts GROUP BY scheme
    """,
}

# IVF-PQ ADC + exact re-rank: replays the engine arithmetic exactly —
# the ann_ivf_topk assignment CTEs, the pq_reconstruction_stats
# subspace/codebook CTEs, integer-quantized per-subspace distances for
# code assignment AND the per-query ADC table, integer ADC sums for the
# shortlist cut, float cosine only on the R re-ranked winners.
ORACLES["ann_ivf_pq"] = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    -- exact isqrt(N) modulus (Newton-corrected; see ann_ivf_topk)
    p AS (SELECT greatest(CASE WHEN (s + 1) * (s + 1) <= n THEN s + 1
                               WHEN s * s > n THEN s - 1
                               ELSE s END, 1) AS md
          FROM (SELECT count(*) AS n,
                       floor(sqrt(count(*)))::BIGINT AS s
                FROM embeddings)),
    cents AS (
        SELECT vec_id AS cent_id, v AS cv FROM e
        WHERE vec_id % (SELECT md FROM p) = 0
    ),
    scoredc AS (
        SELECT e.vec_id, e.v, c.cent_id,
               round(list_dot_product(e.v, c.cv) /
                     (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) AS ccos
        FROM e, cents c
    ),
    assigned AS (
        SELECT vec_id, v, cent_id
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY ccos DESC, cent_id ASC) AS ark
              FROM scoredc)
        WHERE ark = 1
    ),
    pp AS (SELECT greatest(count(*) // {_PQ_K}, 1) AS md FROM embeddings),
    en AS (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                   AS vn
        FROM e
    ),
    subs AS (
        SELECT vec_id, m.m AS m,
               vn[m.m * {_PQ_D} + 1 : m.m * {_PQ_D} + {_PQ_D}] AS sv
        FROM en, (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m) m
    ),
    cw AS (
        SELECT m AS cm, vec_id AS code_id, sv AS cv
        FROM subs WHERE vec_id % (SELECT md FROM pp) = 0
    ),
    codescored AS (
        SELECT s.vec_id, s.m, c.code_id,
               floor((list_dot_product(s.sv, s.sv)
                      - 2 * list_dot_product(s.sv, c.cv)
                      + list_dot_product(c.cv, c.cv)) * 1e6 + 0.5)::BIGINT
                   AS d2i
        FROM subs s JOIN cw c ON s.m = c.cm
    ),
    codes AS (
        SELECT vec_id, m, code_id
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                      ORDER BY d2i ASC, code_id ASC) AS rk
              FROM codescored)
        WHERE rk = 1
    ),
    q AS (
        SELECT vec_id AS query_id, v AS qv, cent_id AS qcent
        FROM assigned WHERE vec_id < {_N_QUERIES}
    ),
    qn AS (
        SELECT query_id, qcent,
               list_transform(qv, x -> x / sqrt(list_dot_product(qv, qv)))
                   AS qvn
        FROM q
    ),
    qsubs AS (
        SELECT query_id, m.m AS m,
               qvn[m.m * {_PQ_D} + 1 : m.m * {_PQ_D} + {_PQ_D}] AS sv
        FROM qn, (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m) m
    ),
    adc AS (
        SELECT s.query_id, c.cm AS m, c.code_id,
               floor((list_dot_product(s.sv, s.sv)
                      - 2 * list_dot_product(s.sv, c.cv)
                      + list_dot_product(c.cv, c.cv)) * 1e6 + 0.5)::BIGINT
                   AS qd2i
        FROM qsubs s JOIN cw c ON s.m = c.cm
    ),
    cand AS (
        SELECT q.query_id, a.vec_id
        FROM assigned a JOIN q
          ON a.cent_id = q.qcent AND a.vec_id <> q.query_id
    ),
    approx AS (
        SELECT cd.query_id, cd.vec_id, sum(ad.qd2i)::BIGINT AS adist
        FROM cand cd
        JOIN codes co ON co.vec_id = cd.vec_id
        JOIN adc ad ON ad.query_id = cd.query_id
               AND ad.m = co.m AND ad.code_id = co.code_id
        GROUP BY cd.query_id, cd.vec_id
    ),
    shortlist AS (
        SELECT query_id, vec_id
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY adist ASC, vec_id ASC) AS ark
              FROM approx)
        WHERE ark <= {_PQ_TOP_R}
    ),
    rer AS (
        SELECT s.query_id, a.vec_id, {_DUCK_COS} AS cos
        FROM shortlist s
        JOIN e a ON a.vec_id = s.vec_id
        JOIN q ON q.query_id = s.query_id
    )
    SELECT query_id, vec_id AS neighbor_id, cos, rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id ASC) AS rank
          FROM rer)
    WHERE rank <= {_TOP_K}
"""

# The recall-calibration oracle COMPOSES the method oracles as CTEs
# (the corpus_funnel_report pattern): every index is verified against
# the exact same SQL definition its standalone query uses.
_RECALL_METHODS = (
    ("lsh_bucket", "ann_lsh_bucketed", "best"),
    ("lsh_multiprobe", "ann_lsh_multiprobe", "best"),
    ("ivf_nprobe1", "ann_ivf_topk", "topk"),
    ("ivf_nprobe2", "ann_ivf_nprobe2", "topk"),
    ("ivf_refined", "ann_ivf_refined", "topk"),
    ("ivf_pq", "ann_ivf_pq", "topk"),
    # the fixed-64-centroid production posture: bigger cells trade
    # per-query probe cost for recall — this row quantifies the trade
    ("ivf_capped", "ann_ivf_capped_topk", "topk"),
    # the centered-integer sign-LSH production posture (r10): its
    # recall beside the raw-float LSH rows quantifies what centering
    # buys on a given corpus (on a MEAN-SHIFTED one, everything —
    # raw sign-LSH collapses into one bucket)
    ("lsh_centered", "ann_lsh_centered_topk", "topk"),
)

def _recall_oracle() -> str:
    ctes = [f"m_truth AS ({ORACLES['ann_cosine_topk']})",
            "truth AS (SELECT query_id, neighbor_id FROM m_truth)"]
    rows = []
    for mname, oracle_key, shape in _RECALL_METHODS:
        ctes.append(f"m_{mname} AS ({ORACLES[oracle_key]})")
        if shape == "best":
            ctes.append(
                f"p_{mname} AS (SELECT query_id,"
                f" best_neighbor AS neighbor_id FROM m_{mname}"
                f" WHERE best_neighbor IS NOT NULL)"
            )
        else:
            ctes.append(
                f"p_{mname} AS (SELECT query_id, neighbor_id FROM m_{mname})"
            )
        rows.append(f"""
            SELECT '{mname}' AS method,
                   (SELECT count(*) FROM truth)::BIGINT AS n_truth,
                   (SELECT count(*) FROM p_{mname})::BIGINT AS n_pred,
                   (SELECT count(*) FROM p_{mname} p JOIN truth t
                      ON p.query_id = t.query_id
                     AND p.neighbor_id = t.neighbor_id)::BIGINT AS n_hits
        """)
    stats = " UNION ALL ".join(rows)
    return f"""
        WITH {", ".join(ctes)},
        stats AS ({stats})
        SELECT method, n_truth, n_pred, n_hits,
               CASE WHEN n_truth = 0 THEN NULL
                    ELSE (n_hits * {_RECALL_SCALE}) // n_truth
               END AS recall_scaled,
               CASE WHEN n_pred = 0 THEN 0
                    ELSE (n_hits * {_RECALL_SCALE}) // n_pred
               END AS precision_scaled
        FROM stats
    """

ORACLES["ann_recall_at_k"] = _recall_oracle()


def _recall_shifted_oracle() -> str:
    """DuckDB replay of ``ann_recall_mean_shifted``: shift the corpus,
    rebuild both indexes (the shared centered CTE chain reads the
    shifted ``e``, so centering happens AFTER the shift, exactly as
    the engine does), budget-match the raw candidate scan, and grade
    both top-5 sets against the shifted-cosine brute-force truth."""
    cos = (
        "round(list_dot_product(a.v, q.qv) /"
        " (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(q.qv, q.qv))), 6)"
    )
    return f"""
        WITH e AS (
            SELECT vec_id,
                   list_transform(embedding::DOUBLE[],
                                  x -> x + {_SHIFT_CAL}) AS v
            FROM embeddings
        ),
        p AS (
            SELECT least({_MAX_PLANES}, greatest(2,
                   ceil(log2(count(*) / {_DEDUP_TARGET_BUCKET}.0))::INT)) AS nbits
            FROM embeddings
        ),
        {_DUCK_CENTERED_CTES},
        braw AS (
            SELECT vec_id, v,
                   (({_duck_bucket(_MAX_PLANES)})
                    % (1::BIGINT << (SELECT nbits FROM p)))::BIGINT AS bucket
            FROM e
        ),
        bcen AS (
            SELECT vec_id, v,
                   (({_duck_centered_bucket()})
                    % (1::BIGINT << (SELECT nbits FROM p)))::BIGINT AS bucket
            FROM cb
        ),
        qset AS (SELECT vec_id AS query_id, v AS qv FROM e
                 WHERE vec_id < {_N_QUERIES}),
        truth AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, a.vec_id AS neighbor_id,
                       row_number() OVER (PARTITION BY q.query_id
                           ORDER BY {cos} DESC, a.vec_id ASC) AS rk
                FROM e a JOIN qset q ON a.vec_id <> q.query_id)
            WHERE rk <= {_TOP_K}
        ),
        cencand AS (
            SELECT q.vec_id AS query_id, a.vec_id, a.v, q.v AS qv
            FROM bcen a JOIN bcen q
              ON a.bucket = q.bucket AND a.vec_id <> q.vec_id
            WHERE q.vec_id < {_N_QUERIES}
        ),
        budget AS (SELECT query_id, count(*) AS b FROM cencand
                   GROUP BY query_id),
        rawcand AS (
            SELECT q.vec_id AS query_id, a.vec_id, a.v, q.v AS qv,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY a.vec_id ASC) AS scan_rk
            FROM braw a JOIN braw q
              ON a.bucket = q.bucket AND a.vec_id <> q.vec_id
            WHERE q.vec_id < {_N_QUERIES}
        ),
        rawb AS (
            SELECT r.query_id, r.vec_id, r.v, r.qv
            FROM rawcand r JOIN budget USING (query_id)
            WHERE r.scan_rk <= budget.b
        ),
        praw AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, a.vec_id AS neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY round(list_dot_product(a.v, a.qv) /
                               (sqrt(list_dot_product(a.v, a.v))
                                * sqrt(list_dot_product(a.qv, a.qv))), 6)
                               DESC, a.vec_id ASC) AS rk
                FROM rawb a)
            WHERE rk <= {_TOP_K}
        ),
        pcen AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, a.vec_id AS neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY round(list_dot_product(a.v, a.qv) /
                               (sqrt(list_dot_product(a.v, a.v))
                                * sqrt(list_dot_product(a.qv, a.qv))), 6)
                               DESC, a.vec_id ASC) AS rk
                FROM cencand a)
            WHERE rk <= {_TOP_K}
        ),
        stats AS (
            SELECT 'raw_float_budgeted' AS method,
                   (SELECT count(*) FROM truth)::BIGINT AS n_truth,
                   (SELECT count(*) FROM praw)::BIGINT AS n_pred,
                   (SELECT count(*) FROM praw p JOIN truth t
                      ON p.query_id = t.query_id
                     AND p.neighbor_id = t.neighbor_id)::BIGINT AS n_hits,
                   (SELECT count(DISTINCT bucket)
                      FROM braw)::BIGINT AS buckets_used,
                   (SELECT count(*) FROM rawcand)::BIGINT AS cand_unbudgeted
            UNION ALL
            SELECT 'centered_int',
                   (SELECT count(*) FROM truth)::BIGINT,
                   (SELECT count(*) FROM pcen)::BIGINT,
                   (SELECT count(*) FROM pcen p JOIN truth t
                      ON p.query_id = t.query_id
                     AND p.neighbor_id = t.neighbor_id)::BIGINT,
                   (SELECT count(DISTINCT bucket) FROM bcen)::BIGINT,
                   (SELECT count(*) FROM cencand)::BIGINT
        )
        SELECT method, n_truth, n_pred, n_hits,
               CASE WHEN n_truth = 0 THEN NULL
                    ELSE (n_hits * {_RECALL_SCALE}) // n_truth
               END AS recall_scaled,
               buckets_used, cand_unbudgeted
        FROM stats
    """


ORACLES["ann_recall_mean_shifted"] = _recall_shifted_oracle()
