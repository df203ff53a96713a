"""Wave-7 semantic properties: the retrieve -> rerank serving chain and
round-7 lifecycle compositions.

The oracle gate (tools/check.py) proves Spark==DuckDB; these tests prove
the MATH — invariants both engines could get identically wrong.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from variant_load_pipeline_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return Q.registry()[name].spark_fn(spark, sf)


# ---------------------------------------------------------------------------
# Retrieve -> rerank: the rerank permutes exactly the retrieved candidates
# ---------------------------------------------------------------------------
def test_rerank_is_a_permutation_of_the_candidates(spark):
    sf = "/root/testdata/sf0.01"
    rows = _run(spark, "rerank_quality_topk", sf).collect()
    assert len(rows) == 20
    # both rank columns are exact permutations of 1..20
    assert sorted(r.retrieval_rank for r in rows) == list(range(1, 21))
    assert sorted(r.rerank_rank for r in rows) == list(range(1, 21))
    # rerank order follows (score desc, cosine desc, id asc)
    by_rr = sorted(rows, key=lambda r: r.rerank_rank)
    keys = [(-r.score_micro, -r.cos_sim, r.doc_id) for r in by_rr]
    assert keys == sorted(keys)
    # candidates really came from the ANN stage: retrieval order follows
    # (cosine desc, id asc) and the query doc itself is excluded
    by_ret = sorted(rows, key=lambda r: r.retrieval_rank)
    rkeys = [(-r.cos_sim, r.doc_id) for r in by_ret]
    assert rkeys == sorted(rkeys)
    assert all(r.doc_id != 1 for r in rows)


def test_rerank_scores_match_full_corpus_classifier(spark):
    """The reranker's per-candidate scores must equal what the classifier
    (trained on the same doc_id<200 subset) assigns those docs when
    scoring the WHOLE corpus — stage 2 touching only k rows is an
    optimization, not a different model."""
    sf = "/root/testdata/sf0.01"
    from variant_load_pipeline_spark.operators.quality import (
        hashed_features,
        lr_score,
        lr_train,
    )
    from variant_load_pipeline_spark.queries import load

    d = load(spark, sf, "documents")
    w = lr_train(d.filter(F.col("doc_id") < 200), iters=3, lr=0.1)
    full = {
        r.doc_id: r.score_micro
        for r in lr_score(hashed_features(d, label=F.lit(0)), w).collect()
    }
    got = _run(spark, "rerank_quality_topk", sf).collect()
    assert len(got) == 20
    for r in got:
        assert full[r.doc_id] == r.score_micro, r.doc_id


# ---------------------------------------------------------------------------
# IVF nprobe sweep: recall and pool size must be monotone in nprobe
# ---------------------------------------------------------------------------
def test_nprobe_sweep_monotone(spark):
    rows = {r.nprobe: r for r in _run(spark, "ivf_nprobe_recall_sweep").collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    for n in (2, 3, 4):
        assert rows[n].n_candidates > rows[n - 1].n_candidates
        assert rows[n].hits >= rows[n - 1].hits
    for r in rows.values():
        assert 0 <= r.hits <= 10
        assert r.recall_at10_micro == (r.hits * 1_000_000) // 10


# ---------------------------------------------------------------------------
# Contrastive triplets: labels and margins honor the mining contract
# ---------------------------------------------------------------------------
def test_contrastive_triplets_label_contract(spark):
    from variant_load_pipeline_spark.queries import load

    labels = {
        r.vec_id: r.label
        for r in load(spark, SF, "embeddings").select("vec_id", "label").collect()
    }
    rows = _run(spark, "contrastive_triplets").collect()
    assert rows
    for r in rows:
        a = labels[r.anchor_id]
        assert labels[r.pos_id] == a, "positive must share the anchor label"
        assert labels[r.neg_id] != a, "negative must differ in label"
        assert r.pos_id != r.anchor_id
        got = r.margin_micro
        import math
        assert got == math.floor((r.pos_cos - r.neg_cos) * 1e6 + 0.5)


# ---------------------------------------------------------------------------
# Curriculum: admission counts follow the sqrt competence pacing exactly
# ---------------------------------------------------------------------------
def test_curriculum_schedule_pacing(spark):
    import math

    from pyspark.sql import functions as F
    from variant_load_pipeline_spark.functions.text import unigram_surprisal
    from variant_load_pipeline_spark.queries import load

    rows = {r.epoch: r for r in _run(spark, "curriculum_schedule").collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    d = load(spark, SF, "documents")
    n = unigram_surprisal(d).count()  # docs with >=1 token
    cum = 0
    prev_max = None
    for e in (1, 2, 3, 4):
        want = math.floor(n * math.sqrt(e / 4) + 0.5)
        assert rows[e].n_available == want, (e, rows[e].n_available, want)
        cum += rows[e].n_new
        assert rows[e].n_available == cum
        if prev_max is not None and rows[e].n_new > 0:
            assert rows[e].max_difficulty_micro >= prev_max
        prev_max = rows[e].max_difficulty_micro
    assert rows[4].n_available == n


# ---------------------------------------------------------------------------
# CCNet buckets: NTILE balance and monotone per-token difficulty
# ---------------------------------------------------------------------------
def test_ccnet_buckets_balanced_and_ordered(spark):
    rows = _run(spark, "ccnet_perplexity_buckets").collect()
    assert rows
    by_lang: dict[str, dict[int, object]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, bs in by_lang.items():
        counts = [bs[b].n_docs for b in sorted(bs)]
        assert max(counts) - min(counts) <= 1, (lang, counts)  # NTILE balance
        means = [
            bs[b].mean_token_surprisal_micro for b in sorted(bs)
        ]
        assert means == sorted(means), (lang, means)  # head easiest
        names = [bs[b].bucket_name for b in sorted(bs)]
        assert names == ["head", "middle", "tail"][: len(names)]


# ---------------------------------------------------------------------------
# LSH band sweep: candidate sets are nested, so the curve is monotone
# ---------------------------------------------------------------------------
def test_lsh_band_sweep_monotone(spark):
    sf = "/root/testdata/sf0.01"
    rows = {r.bands: r for r in _run(spark, "lsh_band_sweep", sf).collect()}
    assert sorted(rows) == [2, 4, 8, 16]
    for r in rows.values():
        assert r.rows_per_band == 16 // r.bands
        assert r.true_pos <= r.truth_total
        assert r.true_pos <= r.n_candidates
    # a 2r-row band collision implies both r-row collisions -> nested sets
    for hi, lo in ((16, 8), (8, 4), (4, 2)):
        assert rows[hi].n_candidates >= rows[lo].n_candidates
        assert rows[hi].true_pos >= rows[lo].true_pos
    assert rows[16].truth_total > 0  # fixture really contains near-dups


# ---------------------------------------------------------------------------
# DoReMi: weights normalize, and excess is non-negative by construction
# ---------------------------------------------------------------------------
def test_doremi_weights_normalized(spark):
    rows = _run(spark, "doremi_domain_weights").collect()
    assert rows
    tot = sum(r.weight_micro for r in rows)
    # floor rounding drifts each term < 1 micro
    assert abs(tot - 1_000_000) <= len(rows)
    for r in rows:
        assert r.excess_micro >= 0
        # a specialist LM can't be beaten by the shared reference model
        # by construction of add-1 MLE on the domain's own counts, so
        # ref >= own in aggregate is the expected (not guaranteed) shape;
        # assert only the clip contract
        assert r.weight_micro >= 0
        assert r.n_tokens > 0


# ---------------------------------------------------------------------------
# NDCG: bounded by 1.0 and consistent with its own hit set
# ---------------------------------------------------------------------------
def test_ann_ndcg_bounds(spark):
    sf = "/root/testdata/sf0.01"
    (r,) = _run(spark, "ann_ndcg_eval", sf).collect()
    assert 0 <= r.ndcg_micro <= 1_000_000
    assert r.dcg_micro <= r.idcg_micro
    # recall-consistency: nprobe=2 in the sweep found hits iff DCG > 0
    sweep = {
        x.nprobe: x for x in _run(spark, "ivf_nprobe_recall_sweep", sf).collect()
    }
    assert (sweep[2].hits > 0) == (r.dcg_micro > 0)


# ---------------------------------------------------------------------------
# IVF ingest-append: idempotent under replay, and delta rows are served
# ---------------------------------------------------------------------------
def test_ivf_append_idempotent_and_serves_delta(spark):
    sf = "/root/testdata/sf0.01"
    a = sorted(tuple(r) for r in _run(spark, "ivf_ingest_append", sf).collect())
    b = sorted(tuple(r) for r in _run(spark, "ivf_ingest_append", sf).collect())
    assert a == b, "replaying the append duplicated or lost vectors"
    # the appended quarter (vec_id % 4 == 3) must be visible to the probe
    assert any(r[0] % 4 == 3 for r in a), (
        "no delta vector in the top-10 — the probe is not reading the delta"
    )


def test_quality_calibration_buckets_consistent(spark):
    sf = "/root/testdata/sf0.01"
    rows = _run(spark, "quality_calibration_ece", sf).collect()
    assert rows
    total = sum(r.n_docs for r in rows)
    from variant_load_pipeline_spark.queries import load
    assert total == load(spark, sf, "documents").count()
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert 0 <= r.pos_rate_micro <= 1_000_000
        # mean score must actually fall in (or at the edge of) its decile
        lo, hi = r.bucket * 100_000, (r.bucket + 1) * 100_000
        if r.bucket == 9:
            hi = 1_000_001
        assert lo <= r.mean_score_micro < hi or r.n_docs == 0
        assert r.abs_gap_micro == abs(r.mean_score_micro - r.pos_rate_micro)


# ---------------------------------------------------------------------------
# Rolling median: spot-check against a driver-side recompute
# ---------------------------------------------------------------------------
def test_rolling_median_matches_recompute(spark):
    from variant_load_pipeline_spark.queries import load_events

    ev = sorted(
        load_events(spark, SF)
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    got = {
        r.event_id: r.med5
        for r in _run(spark, "events_rolling_median").collect()
    }
    by_user: dict[int, list] = {}
    checked = 0
    for r in ev:
        hist = by_user.setdefault(r.user_id, [])
        hist.append(r.value)
        frame = sorted(hist[-5:])
        n = len(frame)
        med = frame[n // 2] if n % 2 == 1 else (
            (frame[n // 2 - 1] + frame[n // 2]) / 2.0
        )
        assert abs(got[r.event_id] - med) < 1e-6, r.event_id
        checked += 1
    assert checked == len(got) > 0


def test_orc_roundtrip_totals_match_parquet(spark):
    from pyspark.sql import functions as F
    from variant_load_pipeline_spark.queries import load

    rows = _run(spark, "orc_roundtrip_scan").collect()
    d = load(spark, SF, "documents").filter(F.col("lang") == "en")
    want = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c")
    ).collect()
    wm = {r.source: (r.n, r.c) for r in want}
    assert {r.source: (r.n_docs, r.total_chars) for r in rows} == wm


# ---------------------------------------------------------------------------
# Span removal: keeper docs untouched, removals consistent with detect
# ---------------------------------------------------------------------------
def test_dup_span_removal_contract(spark):
    sf = "/root/testdata/sf0.01"
    rem = {r.doc_id: r for r in _run(spark, "dup_span_removal", sf).collect()}
    det = {r.doc_id: r for r in _run(spark, "dup_span_detect", sf).collect()}
    assert set(rem) == set(det)
    import hashlib
    some_removed = 0
    for did, r in rem.items():
        assert 0 <= r.n_removed <= r.n_words
        if r.n_removed == 0 and r.n_words > 0:
            # untouched docs keep their exact normalized text
            pass
        if r.n_removed > 0:
            some_removed += 1
            # a doc can only lose words if detect saw duplicated spans
            # (same 5-gram universe, n_dup_spans uses distinct grams)
            assert det[did].n_dup_spans > 0, did
        if r.n_words == 0:
            assert r.cleaned_md5 == hashlib.md5(b"").hexdigest()
    assert some_removed > 0, "fixture contains near-dups; none was cleaned"


def test_quality_apply_persisted_equals_inline_score(spark):
    """The persisted-weights apply must score bit-identically to the
    inline train+score chain — the artifact round-trip loses nothing."""
    sf = "/root/testdata/sf0.01"
    a = sorted(
        tuple(r)
        for r in _run(spark, "quality_lr_apply_persisted", sf).collect()
    )
    b = sorted(tuple(r) for r in _run(spark, "quality_lr_score", sf).collect())
    assert a == b


# ---------------------------------------------------------------------------
# Count-Min: never underestimates, and exact on collision-free terms
# ---------------------------------------------------------------------------
def test_countmin_never_underestimates(spark):
    rows = _run(spark, "countmin_heavy_hitters").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.over_n >= 0, (r.term, "CMS underestimated")
        assert r.est_n == r.exact_n + r.over_n
        assert r.est_n >= r.exact_n >= 1


def test_ivf_skew_report_reconciles(spark):
    from variant_load_pipeline_spark.queries import load

    rows = _run(spark, "ivf_list_skew_report").collect()
    e = load(spark, SF, "embeddings")
    n_total = e.count()
    assert sum(r.n_vectors for r in rows) == n_total
    n_lists = len(rows)
    ideal = n_total / n_lists
    for r in rows:
        assert (r.oversized == "T") == (r.n_vectors > 1.5 * ideal), r.list_id
        # load factors average to ~1e6 across lists (floor drift < 1 each)
    avg = sum(r.load_factor_micro for r in rows) / n_lists
    assert abs(avg - 1_000_000) < n_lists
