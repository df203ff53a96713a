"""Large-scale deduplication operators: exact, MinHash+LSH, SimHash,
n-gram Jaccard — the training-data-pipeline dedup family, plus the
reference's 6-key variant dedup (J4) which lives in operators/upsert.py.

Design for 100 TB: every stage is a groupBy/join on a bounded key (hash,
band, bucket) — no cross joins, no driver-side state.  Hash functions are
engine-portable (md5-derived) so DuckDB oracles can replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    normalize_text,
    shingle_hash,
    shingle_hash64,
    shingles,
    word_ngrams,
)

# MinHash universal-hash parameters: h_i(x) = (a_i*(x mod P) + b_i) mod P.
# P is the 31-bit Mersenne prime and a/b < 2^31 so every intermediate stays
# below 2^62 — no 64-bit overflow under Spark ANSI mode, and the identical
# BIGINT arithmetic is replayable in DuckDB oracles.
MINHASH_PRIME = (1 << 31) - 1


def _perm_params(n_hashes: int) -> list[tuple[int, int]]:
    params = []
    a, b = 0x9E3779B1, 0x85EBCA77
    for _ in range(n_hashes):
        a = (a * 0xC2B2AE3D + 0x27D4EB2F) % MINHASH_PRIME
        b = (b * 0x165667B1 + 0x9E3779B9) % MINHASH_PRIME
        params.append((a | 1, b))
    return params


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups on the normalized-text fingerprint; canonical
    survivor = min id (deterministic)."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_" + id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature as ``sig_0..sig_{n-1}`` columns.

    All JVM-side: shingles -> portable 32-bit hash -> per-permutation
    array_min.  Documents with no shingles get NULL signatures.
    """
    params = _perm_params(n_hashes)
    sh = df.select(
        F.col(id_col), shingles(F.col(text_col), shingle_k).alias("sh")
    ).withColumn("hashes", F.transform(F.col("sh"), shingle_hash))

    def perm(a: int, b: int):
        return lambda h: ((h % MINHASH_PRIME) * a + b) % MINHASH_PRIME

    cols = [
        F.array_min(F.transform(F.col("hashes"), perm(a, b))).alias(f"sig_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return sh.select(F.col(id_col), *cols)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: equal band-signature
    in any band -> candidate.  Returns distinct (id_a, id_b) with id_a < id_b.

    The scale path: candidates come from a self-join on (band_idx,
    band_hash) — a hash-partitioned equi join, never a cross join.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)
    band_cols = []
    for b in range(bands):
        parts = [
            F.col(f"sig_{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("_", *parts)).alias("band_hash"),
            )
        )
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")
    a = banded.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    b_ = banded.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_hash"
    )
    return (
        a.join(b_, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard similarity.

    Jaccard via array ops on the two shingle sets (joined in, not recomputed
    pairwise): |A∩B| / |A∪B|, rounded to 6 dp for engine parity.
    """
    sh = df.select(
        F.col(id_col), shingles(F.col(text_col), shingle_k).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        joined.select(
            "id_a", "id_b", F.round(jac, 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash over word features: bit b of the hash contributes +1/-1
    per word; sign of the sum gives the output bit.  JVM-side only.

    ``bits <= 32`` uses the 32-bit word hash; wider (up to 64) uses
    ``shingle_hash64`` so every bit position carries real entropy — a
    32-bit word hash under bits=64 would leave positions 32-63 constant
    and silently break multi-index banding (see shingle_hash64).  Bit 63
    of a 64-bit simhash is the long's sign bit: reconstruction is a
    bitwise OR (never an overflowing add), and the value can be negative.
    """
    if not 1 <= bits <= 64:
        raise ValueError("bits must be in [1, 64]")
    word_hash = shingle_hash if bits <= 32 else shingle_hash64
    w = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
        ).alias("word"),
    ).withColumn("h", word_hash(F.col("word")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = w.groupBy(id_col).agg(*bit_sums)
    out: Column = F.lit(0).cast("long")
    for b in range(bits):
        bitval = (1 << b) if b < 63 else -(1 << 63)
        out = out.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.lit(bitval).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select(F.col(id_col), out.alias("simhash"))


def hamming_distance(a: Column, b: Column, bits: int = 32) -> Column:
    """Popcount of XOR via bit_count (Spark >= 3.3)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_bands: int = 4,
    bits: int = 32,
    hot_slice_threshold: int = 1000,
) -> DataFrame:
    """SimHash near-dup pairs by multi-index hashing: split each hash into
    ``n_bands`` bit-slices, equi-join on any identical slice, then verify
    hamming distance on the DISTINCT candidate pairs.

    Recall is EXACT for the bound (pigeonhole: hashes within
    ``max_hamming <= n_bands - 1`` bits MUST agree on one slice), except
    inside slices capped by the hot guard below.  Complements MinHash:
    simhash is cheaper per doc (no shingle set) and catches
    short-document near-dups whose shingle sets are too small for stable
    MinHash signatures.

    Scale contract — read before raising the corpus size: a slice has
    ``2^(bits/n_bands)`` possible values (256 at the 32/4 default), so
    candidate volume grows ~N^2/2^width once N is large against the
    slice space; 32/4 is sized for per-shard corpora up to ~10^5 docs.
    Beyond that, pass ``bits=64`` (simhash switches to the 64-bit word
    hash ``shingle_hash64``; with n_bands=4 that gives 16-bit slices ->
    65 536 buckets) — and the ``hot_slice_threshold`` guard bounds the
    damage meanwhile: slices with more members than the threshold switch
    from all-pairs to star pairing around the min-id member (linear,
    same trade as ``near_dup_pairs``' hot-band guard, recall beyond the
    star lost for heterogeneous hot slices).

    The hash table is persisted (one simhash aggregation, not one per
    join branch); ContextCleaner reclaims it when the result is GC'd.
    """
    from pyspark.storagelevel import StorageLevel

    if max_hamming >= n_bands:
        raise ValueError(
            "exactness needs max_hamming < n_bands (pigeonhole)"
        )
    if bits % n_bands != 0:
        # a remainder would leave the top bits % n_bands bits outside
        # every slice: pairs differing only there would be silently
        # missed despite the exact-recall contract
        raise ValueError("bits must be divisible by n_bands")
    width = bits // n_bands
    mask = (1 << width) - 1
    sh = simhash(df, text_col, id_col, bits).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    banded = sh.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("slice"),
                )
                for b in range(n_bands)
            ])
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.slice")
    stats = banded.groupBy("band", "slice").agg(
        F.count(F.lit(1)).alias("__n"), F.min(id_col).alias("__rep")
    )
    banded_s = banded.join(stats, ["band", "slice"]).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cold = banded_s.filter(F.col("__n") <= hot_slice_threshold)
    cold_pairs = (
        cold.select(F.col(id_col).alias("id_a"), "band", "slice")
        .join(
            cold.select(F.col(id_col).alias("id_b"), "band", "slice"),
            ["band", "slice"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    hot_pairs = banded_s.filter(
        (F.col("__n") > hot_slice_threshold)
        & (F.col(id_col) != F.col("__rep"))
    ).select(F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b"))
    # dedup candidates BEFORE the verify join: a pair can collide in up
    # to n_bands slices, and hamming need only be computed once
    cand = cold_pairs.union(hot_pairs).distinct()
    a = sh.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b_ = sh.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        cand.join(a, "id_a")
        .join(b_, "id_b")
        .select(
            "id_a",
            "id_b",
            hamming_distance(F.col("sh_a"), F.col("sh_b")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Dedup clustering: (id_a, id_b) similarity pairs -> (id, component)
    where component = min id reachable through the pair graph — the step
    that turns near-dup PAIRS into dedup GROUPS (keep one doc per
    component, drop the rest).

    Algorithm: iterative min-label propagation.  Each round every node
    takes the min of its own label and its neighbors' labels (one shuffle
    join + groupBy per round); converges in O(max component diameter)
    rounds.  Near-dup components are overwhelmingly stars/cliques around
    a few documents, so 2-3 rounds settle real corpora; ``max_iters``
    bounds adversarial chains.  Each round is localCheckpoint-ed so the
    lineage (and therefore the plan) stays O(1) deep instead of O(iters).
    The driver-side loop holds only a changed-row COUNT per round — no
    data is collected.  (The alternating large-star/small-star variant
    [Kiveris et al., "Connected Components in MapReduce and Beyond"]
    drops the round count to O(log d) with the same per-round plan shape;
    min-propagation keeps the per-round work identical and the code
    simpler.)

    Only ids that appear in ``pairs`` are emitted; unpaired docs are their
    own singleton components by definition and need no shuffle.
    """
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    edges = (
        edges.union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    )
    changed = 0
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id2"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        updated = (
            labels.join(nbr, labels.id == nbr.id2, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", "comp")
                ).alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("__chg"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.filter(F.col("__chg")).count()
        labels = updated.drop("__chg")
        if changed == 0:
            break
    if changed != 0:
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing): components whose diameter "
            "exceeds the round budget are returned SPLIT (under-merged). "
            "Raise max_iters, or use connected_components_star (O(log d) "
            "rounds) for long-chain graphs.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("id", "comp")


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Alternating large-star/small-star connected components [Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14] — same
    (id, comp = min reachable id) contract as ``connected_components``,
    but O(log d) rounds instead of O(d): each round halves chain lengths
    by hooking every node toward its neighborhood minimum, so a path
    graph that costs min-propagation its full diameter in shuffles
    settles in ~log2(n) rounds.

    Per round (both steps are one groupBy + one equi-join, driver holds
    only counts):

    * large-star: for each node u, every STRICTLY LARGER neighbor v is
      re-pointed at m(u) = min(N(u) + {u});
    * small-star: edges oriented (larger, smaller); each node's smaller
      neighbors and the node itself are re-pointed at its minimum
      neighbor.

    Each round's edge set is localCheckpoint-ed (O(1) lineage) and
    convergence is exact: same edge count AND empty exceptAll diff.  At
    the fixed point the edge set IS the component star {(v, min) : v in
    comp}, so labels fall out without further joins.  Use this for
    adversarial/long-chain graphs; min-propagation stays the simpler
    choice for the star/clique graphs near-dup dedup produces.
    """
    # ONE checkpoint materializes the (possibly very expensive) pair
    # pipeline; nodes and the self-pair-free edge set both derive from
    # it.  The previous shape checkpointed edges AND nodes directly off
    # `pairs`, which — with no subtree reuse across branches — executed
    # the full upstream pair pipeline twice (measured: 6.3s + 2.1s on
    # near_dup_components_star's LSH chain at sf0.1).  Self-pairs
    # survive into edges0 so node coverage is unchanged.
    edges0 = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = edges0.filter(F.col("u") != F.col("v"))
    # the output must cover every id in `pairs` (self-pairs included),
    # even once star rounds rewrite the edge set
    nodes = (
        edges0.select(F.col("u").alias("id"))
        .union(edges0.select(F.col("v").alias("id")))
        .distinct()
    )
    converged = False
    for _ in range(max_iters):
        # large-star over the symmetric neighborhood
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmins = sym.groupBy("u").agg(F.min("v").alias("__mv")).select(
            "u", F.least(F.col("u"), F.col("__mv")).alias("m")
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(lmins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over (larger -> smaller) oriented edges
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if small.count() == edges.count() and small.exceptAll(edges).isEmpty():
            edges = small
            converged = True
            break
        edges = small
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components_star did not reach a fixed point in "
            f"{max_iters} rounds; components may be returned split "
            "(under-merged).  max_iters ~ log2(longest chain) + 3 suffices "
            "for any real graph — raise it.",
            RuntimeWarning,
            stacklevel=2,
        )
    return nodes.join(
        edges.select(F.col("u").alias("id"), F.col("v").alias("__m")),
        "id",
        "left",
    ).select("id", F.coalesce("__m", "id").alias("comp"))


def corpus_keeplist(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed corpus-dedup keep-list (the CorpusDedup CLI tool's
    logic, exposed as an operator so it is oracle-gateable): exact dedup
    on the normalized-text fingerprint first (cheap, kills byte-dups),
    MinHash-LSH near-dup pairs over the EXACT SURVIVORS only, connected
    components, then chain resolution doc -> exact_canon -> component
    min.  Resolving through the exact canon (not doc_id) matters: a
    byte-duplicate's exact canon may itself have merged into a near-dup
    component and been dropped — joining components on doc_id would
    leave such docs pointing at a dropped canonical.

    Returns (doc_id, canonical_id, keep 'T'|'F'); keep is 'T' exactly
    when doc_id == canonical_id (one survivor per transitive group).
    """
    from pyspark.sql.window import Window as W
    from pyspark.storagelevel import StorageLevel

    # NULL-text docs carry a NULL fingerprint and are dropped here —
    # explicitly, matching the declared oracle (its `m` CTE inner-joins
    # fps to canon ON fp, and NULL never equals NULL in SQL joins).  The
    # window form below would otherwise group every NULL-fp doc into ONE
    # partition and emit them deduped against each other — a silent
    # semantics change on legal input (ADVICE r13).
    fps = docs.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp")
    ).filter(F.col("fp").isNotNull())
    # exact_canon = min(doc_id) over the fingerprint group, as ONE window
    # over ONE fps pass.  The previous groupBy+self-join shape put the
    # fps subtree on both join sides (and again in the final resolution
    # join below) — with no subtree reuse that re-ran the full-corpus
    # normalize+md5 pass ~4x per keep-list.  m is persisted because it
    # is consumed twice (survivor filter + final resolution); it is two
    # bigint-ish columns per doc, spill-safe.
    m = fps.select(
        F.col(id_col),
        F.min(id_col).over(W.partitionBy("fp")).alias("exact_canon"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    exact_kept = docs.join(
        m.filter(F.col(id_col) == F.col("exact_canon")).select(id_col),
        id_col,
    )
    pairs = near_dup_pairs(
        exact_kept, text_col=text_col, id_col=id_col, threshold=threshold
    ).select("id_a", "id_b")
    comp = connected_components(pairs).select(
        F.col("id").alias("exact_canon"), F.col("comp").alias("near_canon")
    )
    return (
        m.join(comp, "exact_canon", "left")
        .select(
            id_col,
            F.coalesce("near_canon", "exact_canon").alias("canonical_id"),
        )
        .select(
            id_col,
            "canonical_id",
            F.when(F.col(id_col) == F.col("canonical_id"), F.lit("T"))
            .otherwise(F.lit("F"))
            .alias("keep"),
        )
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.8,
    hot_bucket_threshold: int = 1000,
) -> DataFrame:
    """Fused MinHash-LSH near-dup pipeline: shingle ONCE, persist the
    (id, shingles, hashes) table, then derive signatures, band candidates,
    and exact-Jaccard verification from it.

    The unfused path (minhash_signatures + minhash_lsh_pairs +
    ngram_jaccard_pairs) re-shingles the corpus three times because Spark
    does not share common subplans across join branches; at 100 TB the
    shingle scan IS the dominant cost, so the fused form persists it —
    spill-safe (MEMORY_AND_DISK) and ~3x less work.

    Hot-band guard: a band bucket with n members yields n^2/2 candidate
    pairs, so one degenerate bucket (a corpus of near-identical docs all
    hashing to the same band signature) goes quadratic no matter how good
    the banding is.  Buckets larger than ``hot_bucket_threshold`` switch
    from all-pairs to STAR pairing around the bucket's min-id
    representative — a pure projection (no join), linear in bucket size —
    dropping the worst case from O(n^2) to O(n).  Cold buckets are
    exhaustive, exactly as before.

    Recall contract of the guard: star candidates still pass the exact
    Jaccard verify, so for the degenerate case the guard targets
    (near-identical documents, rep-to-member similarity >= threshold) the
    whole bucket stays connected and component dedup collapses it.  A
    HETEROGENEOUS hot bucket — sub-clusters similar to each other but
    below threshold vs the representative — loses the member-member
    pairs the all-pairs path would have found: that is the explicit
    boundedness-for-recall trade; raise ``hot_bucket_threshold`` (or add
    bands) if such buckets are expected.

    The shingle and annotated-band tables are persisted MEMORY_AND_DISK
    for the lifetime of the returned plan; Spark's ContextCleaner drops
    both caches once the returned DataFrame is garbage collected, so
    repeated invocations in a long-lived driver do not accumulate pinned
    storage beyond live result references.
    """
    from pyspark.storagelevel import StorageLevel

    params = _perm_params(n_hashes)
    rows_per_band = n_hashes // bands
    sh = (
        df.select(
            F.col(id_col), shingles(F.col(text_col), shingle_k).alias("sh")
        )
        .withColumn("hashes", F.transform(F.col("sh"), shingle_hash))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def perm(a: int, b: int):
        return lambda h: ((h % MINHASH_PRIME) * a + b) % MINHASH_PRIME

    sig = sh.select(
        F.col(id_col),
        *[
            F.array_min(F.transform(F.col("hashes"), perm(a, b))).alias(f"sig_{i}")
            for i, (a, b) in enumerate(params)
        ],
    )
    band_cols = []
    for b in range(bands):
        parts = [
            F.col(f"sig_{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("_", *parts)).alias("band_hash"),
            )
        )
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")
    # per-bucket size + representative; the groupBy shuffles on the same
    # key the candidate self-join partitions on, and the annotated table
    # is persisted so the cold/hot branches don't recompute the banding
    stats = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("__n"), F.min(id_col).alias("__rep")
    )
    banded_s = banded.join(stats, ["band_idx", "band_hash"]).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cold = banded_s.filter(F.col("__n") <= hot_bucket_threshold)
    cold_pairs = (
        cold.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
        .join(
            cold.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash"),
            ["band_idx", "band_hash"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    hot_pairs = banded_s.filter(
        (F.col("__n") > hot_bucket_threshold) & (F.col(id_col) != F.col("__rep"))
    ).select(F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b"))
    cand = cold_pairs.union(hot_pairs).distinct()
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b_ = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = cand.join(a, "id_a").join(b_, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return joined.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def _shingle_hash_table(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int
) -> DataFrame:
    """(id, sh, hashes) — the shared front of every MinHash pipeline."""
    return df.select(
        F.col(id_col), shingles(F.col(text_col), shingle_k).alias("sh")
    ).withColumn("hashes", F.transform(F.col("sh"), shingle_hash))


def _banded_from_hashes(
    sh: DataFrame, id_col: str, n_hashes: int, bands: int
) -> DataFrame:
    """(id, band_idx, band_hash) from a `_shingle_hash_table` frame."""
    params = _perm_params(n_hashes)
    rows_per_band = n_hashes // bands

    def perm(a: int, b: int):
        return lambda h: ((h % MINHASH_PRIME) * a + b) % MINHASH_PRIME

    sig = sh.select(
        F.col(id_col),
        *[
            F.array_min(F.transform(F.col("hashes"), perm(a, b))).alias(
                f"sig_{i}"
            )
            for i, (a, b) in enumerate(params)
        ],
    )
    band_cols = []
    for b in range(bands):
        parts = [
            F.col(f"sig_{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("_", *parts)).alias("band_hash"),
            )
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")


def write_keeplist(keeplist: DataFrame, path: str) -> None:
    """Persist a corpus_keeplist result (doc_id, canonical_id, keep) —
    the production shape of incremental curation: today's refresh diffs
    against the STORED list (read_keeplist + one left join), never by
    re-running yesterday's exact->LSH->components chain.  Mirrors the
    write_lsh_index / write_pq_index build-once/query-many economics —
    at 100 TB the keep-list recompute IS the dedup cost."""
    keeplist.write.mode("overwrite").parquet(path)


def read_keeplist(spark, path: str) -> DataFrame:
    """Load a persisted keep-list written by write_keeplist."""
    return spark.read.parquet(path)


def write_lsh_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> None:
    """Persist the corpus's LSH dedup index for INCREMENTAL matching —
    the dedup-at-ingest production shape: the corpus is banded and
    shingled ONCE at index-build time; each arriving batch then probes
    the index without ever recomputing corpus signatures (at 100 TB the
    corpus re-shingle is the cost that makes naive re-dedup per batch
    infeasible).

    Two parquet tables under ``path``:
    * ``bands``: (id, band_idx, band_hash) — the probe side of the
      candidate equi-join.
    * ``shingles``: (id, sh) — exact-Jaccard verification joins.
    """
    from pyspark.storagelevel import StorageLevel

    sh = _shingle_hash_table(df, text_col, id_col, shingle_k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _banded_from_hashes(sh, id_col, n_hashes, bands).write.mode(
        "overwrite"
    ).parquet(f"{path}/bands")
    sh.select(id_col, "sh").write.mode("overwrite").parquet(
        f"{path}/shingles"
    )
    sh.unpersist()


def match_lsh_index(
    spark,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Match a NEW batch against a persisted LSH index (write_lsh_index):
    band-hash the batch, equi-join on (band_idx, band_hash) against the
    persisted band table, verify candidates with exact shingle Jaccard
    against the persisted shingle table.  Returns (batch_id, corpus_id,
    jaccard >= threshold).

    The batch side is the small side by construction — it broadcasts
    when under the threshold and the corpus band table never reshuffles
    on anything but the band key it was built on.  The same parameters
    (n_hashes, bands, shingle_k) MUST match the index build; degenerate
    hot band buckets are bounded the same way as `near_dup_pairs` —
    apply its star guard upstream if the corpus contains them.
    """
    corpus_bands = spark.read.parquet(f"{path}/bands").select(
        F.col(id_col).alias("corpus_id"), "band_idx", "band_hash"
    )
    corpus_sh = spark.read.parquet(f"{path}/shingles").select(
        F.col(id_col).alias("corpus_id"), F.col("sh").alias("sh_c")
    )
    return match_lsh_frames(
        corpus_bands,
        corpus_sh,
        new_docs,
        text_col=text_col,
        id_col=id_col,
        n_hashes=n_hashes,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
    )


def match_lsh_frames(
    corpus_bands: DataFrame,
    corpus_sh: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Frame-level core of `match_lsh_index`: corpus sides given as
    DataFrames (``corpus_bands``: (corpus_id, band_idx, band_hash);
    ``corpus_sh``: (corpus_id, sh_c)) so callers can pre-filter the
    index — e.g. the streaming ingest sink excludes the current batch's
    own prior write to stay idempotent under redelivery.

    The batch shingle frame is reused by two joins, so it is
    localCheckpoint(eager=False)-ed rather than persist()-ed: a
    localCheckpoint is released by the ContextCleaner when the frame
    goes out of scope, whereas an un-unpersisted cache entry would leak
    one CacheManager slot per call — this runs once per micro-batch in
    a long-lived streaming driver (same reasoning as dedup_upsert in
    operators/upsert.py)."""
    sh = _shingle_hash_table(new_docs, text_col, id_col, shingle_k)
    sh = sh.localCheckpoint(eager=False)
    batch_bands = _banded_from_hashes(sh, id_col, n_hashes, bands).select(
        F.col(id_col).alias("batch_id"), "band_idx", "band_hash"
    )
    cand = (
        batch_bands.join(corpus_bands, ["band_idx", "band_hash"])
        .select("batch_id", "corpus_id")
        .distinct()
    )
    joined = cand.join(
        sh.select(F.col(id_col).alias("batch_id"), F.col("sh").alias("sh_b")),
        "batch_id",
    ).join(corpus_sh, "corpus_id")
    inter = F.size(F.array_intersect("sh_b", "sh_c"))
    union = F.size(F.array_union("sh_b", "sh_c"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(
        F.lit(0.0)
    )
    return joined.select(
        "batch_id", "corpus_id", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def paragraph_dedup(
    df: DataFrame,
    blocks: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus paragraph-level deduplication [CCNet, Wenzek et al.
    2020 — public]: any paragraph whose normalized fingerprint appears in
    MORE THAN ONE document is removed from every document; survivors are
    reassembled in original order.  ``blocks`` supplies the paragraph
    array per row (newline paragraphs, or functions.text.word_blocks for
    corpora without newline structure).

    Output: (id, n_paras, n_kept, kept_fp) where kept_fp = md5 of the
    kept paragraphs newline-joined (md5('') when nothing survives).

    Scale: the only corpus-wide stage is a groupBy on the paragraph md5
    (uniform 128-bit key — no skew); the duplicated-hash set is tiny
    relative to the corpus (dup paragraphs are the point of removing
    them), so it BROADCASTS into a left_anti join and the corpus-sized
    side never shuffles on text.  Reassembly groups by the id — the
    natural partitioning the next pipeline stage wants anyway.
    """
    # ONE evaluation of the (O(n) transform) block expression: empty
    # docs ride the same explode as outer null-rows instead of a second
    # scan-and-rejoin branch off `base` (which re-evaluated `blocks`)
    paras = (
        df.withColumn("__ps", blocks)
        .select(
            F.col(id_col),
            F.size("__ps").alias("__np"),
            F.posexplode_outer("__ps").alias("idx", "para"),
        )
    ).withColumn(
        "__h",
        F.when(
            F.col("para").isNotNull(), F.md5(normalize_text(F.col("para")))
        ),
    )
    dup = (
        paras.filter(F.col("para").isNotNull())
        .groupBy("__h")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") > 1)
        .select("__h", F.lit(1).alias("__dup"))
    )
    marked = paras.join(F.broadcast(dup), "__h", "left")
    keep_cond = F.col("para").isNotNull() & F.col("__dup").isNull()
    return marked.groupBy(id_col).agg(
        F.first("__np").cast("int").alias("n_paras"),
        F.sum(F.when(keep_cond, 1).otherwise(0)).cast("int").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep_cond, F.struct("idx", "para"))
                        )
                    ),
                    lambda x: x["para"],
                ),
                "\n",
            )
        ).alias("kept_fp"),
    )


def dup_spans(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated k-gram spans — the scalable approximation
    of exact-substring training-data dedup [Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — public]: a span (word
    k-gram, distinct within its document) is duplicated when it occurs in
    at least 2 documents.  Output per document: (id, n_spans,
    n_dup_spans, dup_span_ratio).

    Scale: grams are hashed to 64-bit immediately after the explode so
    the corpus-frequency groupBy and the join back shuffle 8-byte keys,
    never gram text; both stages key on a uniform hash — no skew.  The
    suffix-array construction the paper uses is a single-node design;
    hashed span counting is the standard distributed reformulation.
    """
    g = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams(F.col(text_col), k))
        ).alias("gram"),
    ).select(id_col, shingle_hash64(F.col("gram")).alias("__h"))
    freq = g.groupBy("__h").agg(
        F.count_distinct(F.col(id_col)).alias("__nd")
    )
    per_doc = (
        g.join(freq, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(
                F.when(F.col("__nd") > 1, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_dup_spans"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("int").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0))
            .cast("int")
            .alias("n_dup_spans"),
            F.round(
                F.when(
                    F.coalesce("n_spans", F.lit(0)) > 0,
                    F.coalesce("n_dup_spans", F.lit(0)).cast("double")
                    / F.col("n_spans"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_span_ratio"),
        )
    )
