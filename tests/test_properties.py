"""Property-based tests (SURVEY.md §5): invariants of the pure kernels that
back the CDS-splicing pipeline.  No SparkSession needed — these run on the
driver-side python used inside the applyInPandas kernel.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from variant_load_pipeline_spark.functions import translate as TR
from variant_load_pipeline_spark.plans.postprocess import _revcomp, annotate_pair

dna = st.text(alphabet="ACGT", min_size=0, max_size=200)
dna_n = st.text(alphabet="ACGTN", min_size=0, max_size=200)


@given(dna_n)
def test_revcomp_roundtrip(s):
    assert _revcomp(_revcomp(s)) == s
    assert len(_revcomp(s)) == len(s)


@given(dna)
def test_revcomp_pairs_bases(s):
    rc = _revcomp(s)
    for orig, comp in zip(s, reversed(rc)):
        assert {orig, comp} in ({"A", "T"}, {"C", "G"}) or orig == comp == "N"


def test_codon_table_total():
    """Every ACGT codon resolves through the 2-base or 3-base table —
    the generated SQL oracle and the Spark expression share these dicts."""
    bases = "ACGT"
    for a in bases:
        for b in bases:
            for c in bases:
                codon = a + b + c
                assert codon[:2] in TR._TWO_BASE or codon in TR._THREE_BASE


@st.composite
def transcript_case(draw):
    """Random transcript: sorted non-overlapping exons, optional UTRs, a
    variant positioned anywhere in the span, a chromosome sequence."""
    n_exons = draw(st.integers(1, 4))
    gaps = draw(st.lists(st.integers(5, 30), min_size=n_exons, max_size=n_exons))
    lens = draw(st.lists(st.integers(6, 30), min_size=n_exons, max_size=n_exons))
    exons = []
    pos = 10
    for g, ln in zip(gaps, lens):
        start = pos + g
        exons.append((start, start + ln - 1))
        pos = start + ln - 1
    span_end = pos + 20
    strand = draw(st.sampled_from(["+", "-"]))
    features = [("EXONS", s, e, strand) for s, e in exons]
    var_pos = draw(st.integers(1, span_end))
    ref = draw(st.sampled_from("ACGT"))
    var = draw(st.sampled_from("ACGT"))
    seq = draw(
        st.text(alphabet="ACGT", min_size=span_end + 5, max_size=span_end + 5)
    )
    return features, exons, var_pos, ref, var, seq


@given(transcript_case())
@settings(max_examples=200, deadline=None)
def test_annotate_pair_location_algebra(case):
    features, exons, var_pos, ref, var, seq = case
    out = annotate_pair(
        var_pos, var_pos, ref, var, features, len(exons), "N", seq
    )
    loc = out["location_name"] or ""
    in_exon = any(s <= var_pos <= e for s, e in exons)
    # EXON appears at most once; INTRON appended exactly when outside exons
    assert loc.count("EXON") <= 1 or "INTRON" in loc
    if in_exon:
        assert "EXON" in loc
    else:
        assert "INTRON" in loc
    assert out["near_splice_site"] in ("T", "F")


@given(transcript_case())
@settings(max_examples=200, deadline=None)
def test_annotate_pair_same_allele_never_nonsynonymous(case):
    """A variant whose var_nuc equals the genome base leaves varDna ==
    refDna, so translation is equal: syn_status can be 'synonymous' or
    unassigned, never 'nonsynonymous'.  (The kernel substitutes var_nuc into
    the genome copy without checking ref_nuc against the FASTA — faithful to
    VariantPostProcessing.java:472-492 — so the invariant holds only when
    var matches the actual sequence base.)"""
    features, exons, var_pos, ref, var, seq = case
    genome_base = seq[var_pos - 1]
    out = annotate_pair(
        var_pos, var_pos, genome_base, genome_base, features, len(exons), "N", seq
    )
    assert out["syn_status"] != "nonsynonymous"


@given(transcript_case())
@settings(max_examples=200, deadline=None)
def test_annotate_pair_non_coding_rows_have_no_aa(case):
    features, exons, var_pos, ref, var, seq = case
    out = annotate_pair(
        var_pos, var_pos, ref, var, features, len(exons), "Y", seq
    )
    assert "NON-CODING" in (out["location_name"] or "")
    assert out["ref_aa"] is None and out["var_aa"] is None


# ---------------------------------------------------------------------------
# Spark-backed equivalence properties (randomized, fixed seed via hypothesis)
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def _spark():
    from variant_load_pipeline_spark.session import get_spark

    return get_spark()


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["1", "2"]),
            st.integers(0, 500_000),
            st.integers(0, 200_000),
        ),
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.tuples(st.sampled_from(["1", "2"]), st.integers(0, 600_000)),
        min_size=1,
        max_size=40,
    ),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_binned_interval_join_equals_broadcast(_spark, intervals, points):
    """The binned equi-join strategy returns EXACTLY the pairs the plain
    broadcast range join returns, for random interval/point sets spanning
    multiple bins (bin size 100k, intervals up to 200k long)."""
    from variant_load_pipeline_spark.operators.interval_join import (
        point_in_interval_join,
    )

    ivl = _spark.createDataFrame(
        [(c, s, s + ln) for c, s, ln in intervals],
        "ichrom string, gstart long, gstop long",
    ).withColumn("ivl_id", F.monotonically_increasing_id())
    pts = _spark.createDataFrame(points, "chrom string, pos long")

    def pairs(strategy):
        out = point_in_interval_join(
            pts,
            ivl,
            point_chrom="chrom",
            point_pos="pos",
            ivl_chrom="ichrom",
            ivl_start="gstart",
            ivl_end="gstop",
            strategy=strategy,
        )
        return sorted(
            (r["chrom"], r["pos"], r["gstart"], r["gstop"])
            for r in out.collect()
        )

    assert pairs("binned") == pairs("broadcast")


@given(
    st.lists(
        st.tuples(st.sampled_from(["1", "2", "X"]), st.integers(0, 1000)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_bucketed_row_number_equals_global(_spark, rows):
    """bucketed_row_number ranks == global row_number over (bucket, keys)."""
    from pyspark.sql.window import Window as W2

    from variant_load_pipeline_spark.operators.windows import (
        bucketed_row_number,
    )

    df = _spark.createDataFrame(rows, "chrom string, pos long")
    got = sorted(
        (r["chrom"], r["pos"], r["__rank"])
        for r in bucketed_row_number(
            df, order_keys=["pos"], bucket="chrom"
        ).collect()
    )
    w = W2.orderBy("chrom", "pos")
    exp = sorted(
        (r["chrom"], r["pos"], r["rk"])
        for r in df.withColumn(
            "rk", F.row_number().over(w).cast("long")
        ).collect()
    )
    assert got == exp


@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 5)),
        min_size=0,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 5)),
        min_size=0,
        max_size=25,
    ),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_consume_first_match_equals_greedy_reference(_spark, lrows, rrows):
    """J16 pairing == a python greedy consume-first-match loop: walk the
    ordered left rows per key, pop the first unconsumed ordered right row."""
    from variant_load_pipeline_spark.operators.windows import (
        consume_first_match_join,
    )

    l = _spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(lrows)], "k string, lv int, lid int"
    )
    r = _spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rrows)], "k string, rv int, rid int"
    )
    got = sorted(
        (row["k"], row["lid"], row["rid"])
        for row in consume_first_match_join(
            l, r, keys=["k"], left_order=["lv", "lid"], right_order=["rv", "rid"]
        ).collect()
    )

    # greedy reference: per key, ordered left pops ordered right
    from collections import defaultdict

    pools = defaultdict(list)
    for i, (k, v) in enumerate(rrows):
        pools[k].append((v, i))
    for k in pools:
        pools[k].sort()
    exp = []
    lefts = sorted(
        ((k, v, i) for i, (k, v) in enumerate(lrows)),
        key=lambda t: (t[0], t[1], t[2]),
    )
    consumed = defaultdict(int)
    for k, v, i in lefts:
        idx = consumed[k]
        if idx < len(pools[k]):
            exp.append((k, i, pools[k][idx][1]))
            consumed[k] += 1
    assert got == sorted(exp)


@pytest.mark.slow
def test_new_query_results_are_partitioning_invariant(spark):
    """Determinism contract: results must not depend on the shuffle
    partition count (catches accidental first()/limit-without-order/
    float-order dependence in the newest operator wave)."""
    from variant_load_pipeline_spark.queries import registry

    names = [
        "events_asof_join",
        "events_funnel",
        "quality_percentile_filter",
        "heavy_hitter_terms",
        "bigram_backoff_surprisal",
        "pagerank_cosupply",
        "mmr_diverse_topk",
        "zorder_layout_stats",
    ]
    reg = registry()
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("5", orig):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                df = reg[n].spark_fn(spark, "/root/testdata/sf0.001")
                rows = frozenset(
                    tuple(r) for r in df.collect()
                )
                results.setdefault(n, []).append(rows)
        for n, (a, b) in results.items():
            assert a == b, f"{n} is partitioning-dependent"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_surprisal_and_containment_bounds(spark):
    from variant_load_pipeline_spark.queries import registry

    reg = registry()
    bs = reg["bigram_backoff_surprisal"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert bs
    for r in bs:
        # surprisal of a probability <= 1 is non-negative; mean consistent
        assert r["surprisal_micro"] >= 0
        if r["n_pairs"] > 0:
            # Spark rounds HALF_UP, Python's round() is banker's — allow
            # the half-ulp divergence at exact .5 boundaries
            assert abs(
                r["mean_surprisal"]
                - round(r["surprisal_micro"] / r["n_pairs"] / 1e6, 6)
            ) <= 1e-6
        else:
            assert r["mean_surprisal"] == 0.0
    cp = reg["containment_pairs"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    for r in cp:
        assert 0.9 <= r["containment"] <= 1.0
        assert r["id_a"] < r["id_b"]


# ---------------------------------------------------------------------------
# Wave-6 algorithm properties
# ---------------------------------------------------------------------------
def _python_waterfill(caps, budget):
    """Reference UniMax waterfill: ascending caps; saturate while the cap
    fits the equal-split of the remaining budget, then split evenly."""
    order = sorted(range(len(caps)), key=lambda i: caps[i])
    alloc = [0.0] * len(caps)
    spent = 0.0
    for pos, i in enumerate(order):
        remaining = len(caps) - pos
        level = (budget - spent) / remaining
        if caps[i] <= level:
            alloc[i] = caps[i]
            spent += caps[i]
        else:
            for j in order[pos:]:
                alloc[j] = level
            break
    return alloc


@given(
    st.lists(st.integers(1, 50), min_size=2, max_size=12),
    st.integers(10, 400),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_unimax_closed_form_equals_waterfill(_spark, sizes, budget):
    """The rank/prefix-sum closed form in unimax_allocation must equal the
    sequential waterfill for random group sizes and budgets (caps = 2x
    size, matching the query), up to micro rounding."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    caps = [2 * s for s in sizes]
    rows = [(f"g{i}", c) for i, c in enumerate(caps)]
    grp = _spark.createDataFrame(rows, "g string, cap long")
    zero = F.when(F.col("cap") >= 0, F.lit(0))
    wr = W.partitionBy(zero).orderBy(F.col("cap").asc(), F.col("g").asc())
    ranked = grp.select(
        "g", "cap",
        F.row_number().over(wr).alias("rn"),
        F.sum("cap").over(wr.rowsBetween(W.unboundedPreceding, 0))
        .alias("pcap"),
        F.count(F.lit(1)).over(W.partitionBy(zero)).alias("n"),
    )
    sat = (
        ranked.filter(
            F.col("cap") * (F.col("n") - F.col("rn") + 1)
            + (F.col("pcap") - F.col("cap"))
            <= budget
        )
        .agg(
            F.coalesce(
                F.max(F.struct("rn", "pcap")),
                F.struct(F.lit(0).alias("rn"), F.lit(0).alias("pcap")),
            ).alias("mx")
        )
        .select(
            F.col("mx.rn").alias("s"),
            F.col("mx.pcap").cast("long").alias("ps"),
        )
    )
    got = {
        r.g: r.am
        for r in ranked.crossJoin(F.broadcast(sat))
        .select(
            "g",
            F.when(F.col("rn") <= F.col("s"), F.col("cap") * 1_000_000)
            .otherwise(
                F.floor(
                    (F.lit(budget) - F.col("ps")).cast("double")
                    * 1e6
                    / (F.col("n") - F.col("s")).cast("double")
                    + 0.5
                )
            )
            .cast("long")
            .alias("am"),
        )
        .collect()
    }
    ref = _python_waterfill(caps, budget)
    for i, a in enumerate(ref):
        assert abs(got[f"g{i}"] - a * 1_000_000) <= 1, (caps, budget, i)


@given(st.lists(st.sampled_from("ab cd ef gh ij kl mn op".split()),
                min_size=1, max_size=40),
       st.integers(0, 39))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_cdc_resynchronizes_after_insertion(_spark, ws, at):
    """Content-defined chunking's defining property: inserting one word
    changes only the chunks overlapping the insertion point — the chunk
    multiset difference between original and edited text is bounded,
    never a full reshuffle (fixed-size blocks would shift everything)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from variant_load_pipeline_spark import queries as Q

    at = min(at, len(ws))
    edited = ws[:at] + ["zz"] + ws[at:]
    df = _spark.createDataFrame(
        [(1, " ".join(ws)), (2, " ".join(edited))],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_cdc_docs")
    # reuse the registered query's chunker on this 2-doc frame via its
    # Spark implementation applied to a temp table
    from variant_load_pipeline_spark.functions import text as T

    w = df.select("doc_id", T.words(F.col("text")).alias("ws")).filter(
        F.size("ws") > 0
    )
    bounded = w.withColumn(
        "bnd",
        F.filter(
            F.sequence(F.lit(1), F.size("ws")),
            lambda i: (
                T.shingle_hash(F.element_at("ws", i)) % 8 == 0
            ) | (i == F.size("ws")),
        ),
    )
    chunks = bounded.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("bnd")),
                lambda j: F.array_join(
                    F.slice(
                        F.col("ws"),
                        F.when(j == 1, F.lit(1)).otherwise(
                            F.element_at("bnd", (j - 1).cast("int")) + 1
                        ),
                        F.element_at("bnd", j.cast("int"))
                        - F.when(j == 1, F.lit(1)).otherwise(
                            F.element_at("bnd", (j - 1).cast("int")) + 1
                        )
                        + 1,
                    ),
                    " ",
                ),
            )
        ).alias("chunk"),
    ).collect()
    orig = Counter(r.chunk for r in chunks if r.doc_id == 1)
    edit = Counter(r.chunk for r in chunks if r.doc_id == 2)
    changed = sum((orig - edit).values()) + sum((edit - orig).values())
    # the insertion can split/merge at most the chunk containing the
    # edit plus its successor on each side: bounded, not proportional
    assert changed <= 4, (ws, at, orig, edit)


# ---------------------------------------------------------------------------
# PR-sweep count-store reduction: the bucket <-> threshold equivalence
# ---------------------------------------------------------------------------
scores = st.lists(
    st.tuples(
        # adversarial score_micro values: exact threshold multiples,
        # the 0 / 1e6 extremes, and arbitrary interior points
        st.one_of(
            st.sampled_from([0, 100_000, 500_000, 900_000, 1_000_000]),
            st.integers(min_value=0, max_value=1_000_000),
        ),
        st.integers(min_value=0, max_value=1),
    ),
    min_size=0,
    max_size=60,
)


@given(scores)
def test_pr_sweep_bucket_reduction_is_lossless(pairs):
    """quality_counts_sink reduces (score_micro, label) rows to 20
    (decile bucket, label) cells; the reduction must reconstruct
    tp/fp/fn EXACTLY at every threshold t*1e5 — i.e. bucket >= t iff
    score >= t*1e5 for all scores in [0, 1e6], including scores landing
    exactly ON a threshold and the two extremes (the invariant the
    stream==batch test checks on real data, here pinned adversarially)."""
    # the sink's reduction
    cells: dict[tuple[int, int], int] = {}
    for s, y in pairs:
        b = min(s // 100_000, 9)
        cells[(b, y)] = cells.get((b, y), 0) + 1
    for t in range(1, 10):
        thr = t * 100_000
        tp = sum(c for (b, y), c in cells.items() if b >= t and y == 1)
        fp = sum(c for (b, y), c in cells.items() if b >= t and y == 0)
        fn = sum(c for (b, y), c in cells.items() if b < t and y == 1)
        assert tp == sum(1 for s, y in pairs if s >= thr and y == 1)
        assert fp == sum(1 for s, y in pairs if s >= thr and y == 0)
        assert fn == sum(1 for s, y in pairs if s < thr and y == 1)
