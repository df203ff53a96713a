"""Wave-11 contracts: RHO selection shape, filtered-ANN predicate
enforcement + index reuse, KMV estimator sanity bands, MaxSim score
bounds, and unpivot row fan-out.  Value-level correctness is the DuckDB
oracle's job (tools/check.py); these pin the semantics the hash can't
express — predicates hold on every row, estimates land near truth,
steady-state reruns reuse the persisted index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from variant_load_pipeline_spark import queries as Q

SF = "/root/testdata/sf0.01"


def test_rho_selection_is_per_source_topb(spark):
    out = Q.registry()["rho_loss_selection"].spark_fn(spark, SF).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert by_src, "no sources selected"
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1)), src
        assert len(rows) <= 20
        # selection order IS the excess order (desc, doc_id tiebreak)
        ex = [r["excess_micro"] for r in rows]
        assert ex == sorted(ex, reverse=True) or all(
            ex[i] > ex[i + 1]
            or (ex[i] == ex[i + 1] and rows[i]["doc_id"] < rows[i + 1]["doc_id"])
            for i in range(len(ex) - 1)
        ), src


def test_ann_filtered_topk_predicate_holds_and_index_reused(spark):
    fn = Q.registry()["ann_filtered_topk"].spark_fn
    first = fn(spark, SF).collect()
    assert first, "no results"
    for r in first:
        assert r["nid"] % 3 == 0, "metadata predicate violated"
        assert r["nid"] != r["qid"]
        assert 1 <= r["rk"] <= 5
    # second run must serve from the persisted index (write-if-missing)
    # and return the identical result set
    second = fn(spark, SF).collect()
    assert sorted(map(tuple, first), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, second), key=lambda t: (t[0], t[3])
    )


def test_kmv_estimates_track_truth(spark):
    rows = Q.registry()["kmv_sketch_intersection"].spark_fn(
        spark, SF
    ).collect()
    assert len(rows) == 190  # C(20, 2) source pairs
    # exact union per pair, recomputed independently for the error band
    from variant_load_pipeline_spark.functions.text import (
        shingle_hash,
        shingles,
    )

    g = (
        Q.load(spark, SF, "documents")
        .select("source", F.explode(shingles(F.col("text"), 3)).alias("g"))
        .distinct()
        .select("source", shingle_hash(F.col("g")).alias("h"))
        .distinct()
    )
    per_src = {
        r["source"]: r["n"]
        for r in g.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r["m"] <= r["k_eff"] <= 128
        assert r["est_inter"] >= 0 and r["est_union"] > 0
        # union truth >= max single side; estimator within ±50% of the
        # inclusion-exclusion bound band at k=128 (~9% stderr)
        lo = max(per_src[r["source_a"]], per_src[r["source_b"]])
        hi = per_src[r["source_a"]] + per_src[r["source_b"]]
        assert 0.5 * lo <= r["est_union"] <= 1.5 * hi, r
        # intersection estimate brackets truth loosely (m/k resolution)
        if r["exact_inter"] >= 200:
            assert 0.3 * r["exact_inter"] <= r["est_inter"] <= 3.0 * r[
                "exact_inter"
            ], r


def test_maxsim_scores_bounded_by_query_tokens(spark):
    rows = Q.registry()["maxsim_late_interaction"].spark_fn(
        spark, SF
    ).collect()
    assert rows
    for r in rows:
        # 10 query tokens, each max-cosine <= 1.0 -> score <= 10e6
        assert r["score_micro"] <= 10_000_000
        assert r["ddoc"] != r["qdoc"]
        assert 1 <= r["rk"] <= 10
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["qdoc"], []).append(r)
    for qd, rs in per_q.items():
        rs.sort(key=lambda r: r["rk"])
        sc = [r["score_micro"] for r in rs]
        assert sc == sorted(sc, reverse=True), qd


@pytest.mark.slow
def test_maxsim_rerank_candidates_come_from_probed_lists(spark):
    """The two-stage row's results are a subset of the probed lists'
    documents, scores agree with the exact row on shared (qdoc, ddoc)
    pairs, and the second run reuses the persisted rep index."""
    fn = Q.registry()["maxsim_rerank_ivf"].spark_fn
    two_stage = fn(spark, SF).collect()
    assert two_stage
    exact = {
        (r["qdoc"], r["ddoc"]): r["score_micro"]
        for r in Q.registry()["maxsim_late_interaction"]
        .spark_fn(spark, SF)
        .collect()
    }
    for r in two_stage:
        assert r["ddoc"] != r["qdoc"]
        # MaxSim of a (q, d) pair is stage-independent: where both rows
        # scored the pair, the micro scores must be identical
        key = (r["qdoc"], r["ddoc"])
        if key in exact:
            assert exact[key] == r["score_micro"], key
    again = fn(spark, SF).collect()
    assert sorted(map(tuple, two_stage)) == sorted(map(tuple, again))


@pytest.mark.slow
def test_bm25_index_append_matches_rebuild(spark, tmp_path):
    """The lexical-index lifecycle: build on a seed, append a batch
    WITHOUT a rebuild, and the probe (seed + delta postings, summed
    additive stats) ranks exactly like an index rebuilt from scratch
    over the union; redelivering the append cannot double anything."""
    from variant_load_pipeline_spark.operators import lexical as lx
    from variant_load_pipeline_spark.queries import _BM25_TERMS

    docs = Q.load(spark, SF, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 4 != 3)
    batch = docs.filter(F.col("doc_id") % 4 == 3)

    inc = str(tmp_path / "bm25_inc")
    lx.write_bm25_index(seed, inc)
    lx.append_bm25_batch(batch, inc, batch_id=7)
    got = [
        tuple(r)
        for r in lx.bm25_probe_topk(spark, inc, _BM25_TERMS, k=20)
        .orderBy("rk")
        .collect()
    ]

    full = str(tmp_path / "bm25_full")
    lx.write_bm25_index(docs, full)
    want = [
        tuple(r)
        for r in lx.bm25_probe_topk(spark, full, _BM25_TERMS, k=20)
        .orderBy("rk")
        .collect()
    ]
    assert got == want and len(got) == 20

    # redelivery: replaying the SAME batch overwrites its own partitions
    # (postings, doclen, additive stats) — scores must not move
    lx.append_bm25_batch(batch, inc, batch_id=7)
    again = [
        tuple(r)
        for r in lx.bm25_probe_topk(spark, inc, _BM25_TERMS, k=20)
        .orderBy("rk")
        .collect()
    ]
    assert again == want

    # the probe's postings scan partition-prunes to the terms' buckets
    plan = (
        lx.bm25_probe_topk(spark, inc, _BM25_TERMS, k=20)
        ._jdf.queryExecution()
        .toString()
    )
    assert "term_bucket" in plan and "PartitionFilters" in plan


def test_unpivot_fanout_and_values(spark):
    d = Q.load(spark, SF, "documents")
    n_docs = d.count()
    out = Q.registry()["unpivot_quality_metrics"].spark_fn(spark, SF)
    assert out.count() == 4 * n_docs
    # n_chars rows must round-trip the source column exactly
    back = (
        out.filter(F.col("metric") == "n_chars")
        .join(d.select("doc_id", "n_chars"), "doc_id")
        .filter(F.col("value") != F.col("n_chars"))
        .count()
    )
    assert back == 0


def test_kmv_gram_pair_counts_hot_gram_guard(spark, monkeypatch):
    """The exact-overlap audit must produce identical pair counts whether
    a gram takes the collect_set fast path or the hot-gram self-join
    (r14 guard): force a tiny cap so one gram goes hot, and compare
    against a brute-force recompute."""
    import itertools

    from variant_load_pipeline_spark import queries_wave11 as w11

    rows = []
    # gram "hot" shared by 9 sources (> cap 4), "warm" by 3, "solo" by 1;
    # duplicates exercise the dedup
    for s in range(9):
        rows.append((f"s{s}", "hot"))
        rows.append((f"s{s}", "hot"))
    for s in (1, 4, 7):
        rows.append((f"s{s}", "warm"))
    rows.append(("s2", "solo"))
    raw = spark.createDataFrame(rows, "source string, gram string")

    def brute(rws):
        by_gram: dict[str, set] = {}
        for s, g in rws:
            by_gram.setdefault(g, set()).add(s)
        out: dict[tuple, int] = {}
        for ss in by_gram.values():
            for a, b in itertools.combinations(sorted(ss), 2):
                out[(a, b)] = out.get((a, b), 0) + 1
        return out

    expect = brute(rows)
    for cap in (4, 1000):  # hot branch engaged / all-cold
        monkeypatch.setattr(w11, "_KMV_HOT_GRAM_CAP", cap)
        got = {
            (r["source_a"], r["source_b"]): r["exact_inter"]
            for r in w11._gram_pair_counts(raw).collect()
        }
        assert got == expect, f"cap={cap}"
