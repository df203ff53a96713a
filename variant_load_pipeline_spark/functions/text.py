"""Text-analysis column functions for large-scale training-data pipelines:
language-ID, quality scoring, token counting, fingerprinting.

All pure Spark column expressions (JVM-side, whole-stage codegen) — designed
so the same logic is expressible in ANSI SQL for DuckDB-oracle checks.
Counting idiom: ``length(s) - length(regexp_replace(s, pat, ''))`` stays
portable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/marker heuristic.
# Chosen to be disjoint, lowercase, and regex-safe.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "mit"],
    "fr": ["le", "la", "les", "est", "une", "dans", "pour", "que"],
    "es": ["el", "los", "las", "una", "por", "con", "para", "del"],
}

STOPWORDS_EN = LANG_MARKERS["en"]


def normalize_text(text: Column) -> Column:
    """Lowercase, trim, collapse internal whitespace — canonical dedup form."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def _let(value: Column, body) -> Column:
    """Single-evaluation let-binding for expressions referenced inside
    higher-order lambdas.

    A lambda body is re-evaluated PER ELEMENT, including any expensive
    subexpression that does not depend on the lambda variable — e.g. a
    k-gram builder slicing `split(normalize(text))` inside its per-index
    lambda re-normalizes and re-splits the document once per gram
    (O(len^2) per row; measured 12-15x slower than evaluating the split
    once).  `transform` evaluates its INPUT exactly once, so wrapping
    the value in a single-element array and binding it as the lambda
    variable makes every reference a cheap variable lookup.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank -> 0."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def char_count(text: Column, pattern: str) -> Column:
    """Number of chars matching regex class `pattern` (single-char class)."""
    s = F.coalesce(text, F.lit(""))
    return F.length(s) - F.length(F.regexp_replace(s, pattern, ""))


def words(text: Column) -> Column:
    """Lowercase alphanumeric word array (punctuation-stripped)."""
    s = F.trim(
        F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), r"[^a-z0-9]+", " ")
    )
    return F.when(s == "", F.array().cast("array<string>")).otherwise(
        F.split(s, " ")
    )


def word_occurrences(text: Column, word: str) -> Column:
    """Occurrences of `word` as a whole lowercase word.

    Expressed as a lambda filter over the word array — portable to DuckDB as
    ``len(list_filter(words, x -> x = 'the'))``.
    """
    return F.size(F.filter(words(text), lambda x: x == F.lit(word)))


def marker_hits(warr: Column, markers: list[str]) -> Column:
    """Total occurrences of any word in `markers` — ONE pass over the
    word array (the markers within a language are distinct, so a
    membership filter-count equals the sum of per-marker counts).

    This is the single-pass replacement for summing 8 `word_occurrences`
    terms: each of those re-derived `words(text)` (a full regexp_replace
    + split of the document) and codegen does not CSE it away — measured
    at 32 redundant text scans per row across 4 languages.
    """
    return F.size(F.filter(warr, lambda x: x.isin(*markers))).cast("long")


def quality_columns(
    text: Column, words_col: Column | None = None
) -> dict[str, Column]:
    """Length / punctuation / stopword / digit ratio features.

    Ratios are rounded to 6 decimals so Spark and the SQL oracle hash
    identically on float output.

    Pass `words_col` (a pre-materialized `words(text)` column, e.g. hoisted
    with ``withColumn``) to score stopwords in one array pass instead of
    re-deriving the word array per stopword.
    """
    s = F.coalesce(text, F.lit(""))
    n = F.length(s)
    n_nonzero = F.when(n == 0, F.lit(1)).otherwise(n)
    tokens = token_count(s)
    tokens_nz = F.when(tokens == 0, F.lit(1)).otherwise(tokens)
    punct = char_count(s, r"[!-/:-@\[-`{-~]")
    digits = char_count(s, r"[0-9]")
    upper = char_count(s, r"[A-Z]")
    warr = words_col if words_col is not None else words(s)
    stop_hits = marker_hits(warr, STOPWORDS_EN)
    return {
        "n_chars": n,
        "n_tokens": tokens,
        "mean_token_len": F.round(n.cast("double") / tokens_nz, 6),
        "punct_ratio": F.round(punct.cast("double") / n_nonzero, 6),
        "digit_ratio": F.round(digits.cast("double") / n_nonzero, 6),
        "upper_ratio": F.round(upper.cast("double") / n_nonzero, 6),
        "stopword_ratio": F.round(stop_hits.cast("double") / tokens_nz, 6),
    }


def lang_scores(
    text: Column, words_col: Column | None = None
) -> dict[str, Column]:
    """Marker-word hit count per language (the lang-ID signal).

    One `marker_hits` membership pass per language over the word array
    (4 passes total) instead of 8 per-marker filters each re-deriving
    `words(text)` (32 full regex scans of the document — the old shape,
    measured ~12 s/5k docs in `langid_confusion_matrix`).  Pass
    `words_col` to reuse a hoisted word-array column so the text is
    tokenized once per row rather than once per language.
    """
    warr = words_col if words_col is not None else words(text)
    return {
        f"score_{lang}": marker_hits(warr, markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id_from_scores(scores: dict[str, Column]) -> Column:
    """argmax language from a `lang_scores` dict; ties broken by language
    name order; 'und' (undetermined) when all scores are 0.

    Expression shape matters here: the obvious when-chain fold nests the
    running best INSIDE each next comparison, doubling the tree per
    language (2^L copies of every score).  Scores materialize ONCE into
    an array instead; argmax = array_position of the max, whose
    first-match rule IS the earliest-name tie-break (languages sorted
    ascending)."""
    langs = sorted(LANG_MARKERS)
    arr = F.array(*[scores[f"score_{lang}"] for lang in langs])
    mx = F.array_max(arr)
    names = F.array(*[F.lit(lang) for lang in langs])
    return F.when(
        mx > 0, F.element_at(names, F.array_position(arr, mx).cast("int"))
    ).otherwise(F.lit("und"))


def lang_id(text: Column, words_col: Column | None = None) -> Column:
    """argmax language by marker score (see `lang_id_from_scores`)."""
    return lang_id_from_scores(lang_scores(text, words_col=words_col))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Portable across Spark and DuckDB (both emit lowercase hex)."""
    return F.md5(normalize_text(text))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingle array over normalized text.

    The array is NOT deduplicated or sorted: every consumer is invariant
    to duplicates and order — MinHash takes array_min over the hashes,
    Jaccard verification uses array_intersect/array_union (set semantics
    by definition), and the explode sites dedup with .distinct() — so
    the per-row O(s log s) array_sort(array_distinct(...)) this helper
    used to pay (~10% of a shingle pass) bought nothing downstream.

    The word array is _let-bound: slicing it inside the per-gram lambda
    would otherwise re-normalize + re-split the text once per gram
    (measured 12-15x slower on the sf0.1 corpus).
    """

    def build(words: Column) -> Column:
        n = F.size(words)
        grams = F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(words, i + 1, k), " "),
        )
        return F.when(n >= k, grams).otherwise(
            F.when(n > 0, F.array(F.array_join(words, " "))).otherwise(
                F.array().cast("array<string>")
            )
        )

    return _let(F.split(normalize_text(text), " "), build)


def shingle_hash(shingle: Column) -> Column:
    """Portable 32-bit-ish shingle hash: first 8 hex chars of md5 -> bigint.
    Identical in DuckDB: ('0x' || substr(md5(s),1,8))::BIGINT.
    """
    return F.conv(F.substring(F.md5(shingle), 1, 8), 16, 10).cast("long")


def shingle_hash64(shingle: Column) -> Column:
    """Portable 64-bit hash: two independent 32-bit md5-derived halves,
    ``(hi << 32) | lo`` with hi = hex chars 9-16, lo = hex chars 1-8.

    Bitwise ops only (shiftleft + OR never overflow under ANSI mode); a
    set bit 63 yields a NEGATIVE long — the intended two's-complement
    view, and every consumer (shiftright-and-mask slicing, xor/bit_count
    hamming) is bit-pattern arithmetic that agrees between Spark and
    DuckDB (both shift arithmetically).  DuckDB twin::

        CAST(CAST(('0x'||substr(md5(s),9,8))::BIGINT AS HUGEINT)
             * 4294967296
             + ('0x'||substr(md5(s),1,8))::BIGINT
             - CASE WHEN ('0x'||substr(md5(s),9,8))::BIGINT >= 2147483648
                    THEN CAST('18446744073709551616' AS HUGEINT)
                    ELSE CAST(0 AS HUGEINT) END
             AS BIGINT)

    This is the 64-bit twin ``simhash(bits=64)`` requires: with the
    32-bit ``shingle_hash``, bit positions 32-63 would be constant zero
    and the high slices of multi-index banding would all collide.
    """
    hi = F.conv(F.substring(F.md5(shingle), 9, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5(shingle), 1, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


# GPT-2-ish pretokenizer classes, restricted to a regex dialect shared by
# Java (Spark) and RE2 (DuckDB): letter runs, digit runs, single
# non-alphanumeric marks.  No lookarounds, so counts replay identically in
# the SQL oracle.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_ish_tokens(text: Column) -> Column:
    """Subword-ish tokens: letter runs / digit runs / punctuation marks."""
    return F.regexp_extract_all(
        F.lower(F.coalesce(text, F.lit(""))), F.lit(BPE_ISH_PATTERN), 0
    )


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))


def tfidf_top_terms(
    df,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Top-k characteristic terms per document by TF-IDF
    (idf = ln((N+1)/(df+1)), smoothed) — the keyword/topic-surface step of
    corpus analysis.

    Plan shape: token explode -> (doc, term) count -> per-term doc
    frequency (one groupBy; stopword skew is AQE's case) -> 1-row corpus
    count broadcast -> per-doc top-k window on the doc key.  Ordering uses
    the ROUNDED score + term tiebreak so ranks replay identically in the
    SQL oracle.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "term"
        ),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    nd = df.agg(F.count_distinct(F.col(id_col)).alias("nd"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf")
                * F.log((F.col("nd") + 1.0) / (F.col("dft") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


# PII patterns restricted to the regex dialect Java (Spark) and RE2
# (DuckDB) share — no lookarounds, no backreferences — so counts and the
# scrubbed text replay identically in SQL oracles.  URL first: an email
# inside a URL must be swallowed by the URL token, not double-scrubbed.
PII_URL_PATTERN = r"(?i)https?://[^\s]+"
PII_EMAIL_PATTERN = r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_LONGNUM_PATTERN = r"[0-9]{7,}"


def pii_counts(text: Column) -> dict[str, Column]:
    """Occurrence counts of the scrub-target patterns (urls, emails,
    7+-digit runs).  Emails inside URLs count as URLs only — the counts
    are taken on the progressively-scrubbed text, matching scrub_pii."""
    s = F.coalesce(text, F.lit(""))
    urls = F.size(F.regexp_extract_all(s, F.lit(PII_URL_PATTERN), 0))
    s1 = F.regexp_replace(s, PII_URL_PATTERN, "<URL>")
    emails = F.size(F.regexp_extract_all(s1, F.lit(PII_EMAIL_PATTERN), 0))
    s2 = F.regexp_replace(s1, PII_EMAIL_PATTERN, "<EMAIL>")
    nums = F.size(F.regexp_extract_all(s2, F.lit(PII_LONGNUM_PATTERN), 0))
    return {"n_urls": urls, "n_emails": emails, "n_longnums": nums}


def scrub_pii(text: Column) -> Column:
    """Redact URLs -> <URL>, then emails -> <EMAIL>, then 7+-digit runs
    -> <NUM>.  Order is load-bearing (see pii_counts)."""
    s = F.coalesce(text, F.lit(""))
    s = F.regexp_replace(s, PII_URL_PATTERN, "<URL>")
    s = F.regexp_replace(s, PII_EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(s, PII_LONGNUM_PATTERN, "<NUM>")


def boilerplate_columns(text: Column) -> dict[str, Column]:
    """Repetition / boilerplate signals (Gopher-style corpus filters):
    duplicate-line ratio, top-line frequency share, bullet-line ratio,
    ellipsis-line ratio.  All from ONE line split; ratios rounded to 6
    decimals for oracle parity."""
    s = F.coalesce(text, F.lit(""))
    lines = F.filter(F.split(s, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    n_nz = F.when(n_lines == 0, F.lit(1)).otherwise(n_lines)
    n_distinct = F.size(F.array_distinct(lines))
    # most frequent line's share: max over distinct lines of their count.
    # _let-bound: referencing `lines` inside the per-distinct-line lambda
    # would re-split + re-filter the text once per distinct line
    top_freq = _let(
        lines,
        lambda L: F.array_max(
            F.transform(
                F.array_distinct(L),
                lambda d: F.size(F.filter(L, lambda x: x == d)),
            )
        ),
    )
    bullets = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"^[-*•]"))
    )
    ellipsis = F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"\.\.\.$")))
    return {
        "n_lines": n_lines,
        "dup_line_ratio": F.round(
            (n_lines - n_distinct).cast("double") / n_nz, 6
        ),
        "top_line_share": F.round(
            F.coalesce(top_freq, F.lit(0)).cast("double") / n_nz, 6
        ),
        "bullet_line_ratio": F.round(bullets.cast("double") / n_nz, 6),
        "ellipsis_line_ratio": F.round(ellipsis.cast("double") / n_nz, 6),
    }


def chunk_documents(
    df,
    max_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split documents into token-budget windows with overlap — the
    context-length packing step of training-data prep.  Chunk i covers
    tokens [i*stride, i*stride + max_tokens) with stride = max_tokens -
    overlap; the last window is the remainder (never empty, never
    duplicated).  Pure JVM: one tokenize, `sequence` + explode for the
    window index, `slice` for the window — no Python in the path, and
    the explode is the only row multiplication (bounded by
    n_tokens/stride per doc).

    Output: (id, chunk_idx, n_chunk_tokens, chunk_text).
    """
    from pyspark.sql import functions as F

    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    # coalesce per this file's convention: NULL text must chunk like ""
    # (one empty chunk), not propagate NULL through size() as -1 — a
    # negative token count would also corrupt pack_chunks' cumsum bins.
    # Empty text tokenizes to [] (not [""]) so the single emitted chunk
    # reports n_chunk_tokens = 0, keeping pack_chunks' bin budgets honest.
    norm = normalize_text(F.coalesce(F.col(text_col), F.lit("")))
    toks = df.select(
        F.col(id_col),
        F.when(norm == "", F.array().cast("array<string>"))
        .otherwise(F.split(norm, " "))
        .alias("__t"),
    ).withColumn("__n", F.size("__t"))
    # number of windows: 1 + ceil(max(0, n - max_tokens) / stride)
    n_chunks = 1 + F.ceil(
        F.greatest(F.col("__n") - max_tokens, F.lit(0)) / F.lit(stride)
    ).cast("int")
    return (
        toks.withColumn(
            "chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1))
        )
        .select(
            id_col,
            "chunk_idx",
            F.slice(
                F.col("__t"), F.col("chunk_idx") * stride + 1, max_tokens
            ).alias("__w"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("__w").alias("n_chunk_tokens"),
            F.array_join("__w", " ").alias("chunk_text"),
        )
    )


def pack_chunks(
    df,
    token_budget: int = 2048,
    shard_col: str | None = None,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_chunk_tokens",
):
    """Greedy sequence packing: assign chunks to fixed-token-budget bins
    (the pretraining-batch packing step) by exclusive running token count:
    ``bin_id = floor(cumsum_exclusive / token_budget)``.

    Deterministic (ordered by (id, chunk_idx) within a shard) and fully
    window-expressible, so the SQL oracle replays it exactly.  Packing is
    PER SHARD: a global order would funnel everything through one
    partition, and at corpus scale packing within hash shards is the
    standard practice anyway (bins never cross shards; each shard packs
    independently on its own executor).  The default shard is
    ``id % 32``.  Greedy cumsum packing lets the last chunk of a bin
    overflow the budget by up to one chunk — the usual trade against
    splitting chunks across bins.

    Output: input columns + (shard, bin_id, bin_pos).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    if shard_col is None:
        if "shard" in df.columns:
            raise ValueError(
                "df already has a 'shard' column; pass shard_col='shard' "
                "to use it (or rename it)"
            )
        out = df.select("*", (F.col(id_col) % 32).alias("shard"))
    elif shard_col != "shard":
        if "shard" in df.columns:
            raise ValueError(
                f"renaming shard_col={shard_col!r} to 'shard' would shadow "
                "an existing 'shard' column"
            )
        out = df.withColumnRenamed(shard_col, "shard")
    else:
        out = df
    w = W.partitionBy("shard").orderBy(F.col(id_col), F.col(idx_col))
    cum_excl = F.coalesce(
        F.sum(tokens_col).over(
            w.rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    staged = out.select(
        "*",
        F.floor(cum_excl / F.lit(token_budget)).cast("int").alias("bin_id"),
        F.row_number().over(w).alias("__rn"),
    )
    # bin_pos = 1-based position inside the bin; the (shard, bin_id)
    # window needs no extra shuffle — shard partitioning already
    # co-locates every bin
    wb = W.partitionBy("shard", "bin_id")
    return staged.select(
        "*",
        (F.col("__rn") - F.min("__rn").over(wb) + 1)
        .cast("int")
        .alias("bin_pos"),
    ).drop("__rn")


def bm25_scores(
    df,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """BM25 relevance of every document against a fixed term set — the
    ranked-retrieval complement of ``tfidf_top_terms`` (Robertson/Spärck
    Jones probabilistic model, public formula):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
        idf(t)   = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))

    Plan shape: one tokenize feeds BOTH the per-doc length table and the
    term-filtered tf table (query terms are a tiny IN-list evaluated in
    the scan, so the corpus-sized explode is filtered before any
    shuffle); N/avgdl is a 1-row broadcast; df_t is |terms| rows.

    Cross-term summation is ORDER-DEPENDENT in floats, so each per-term
    score is rounded to integer MICRO-units first (floor(x·1e6 + 0.5),
    the engine-portable half-up idiom) and the doc score is an exact
    BIGINT sum — identical in any summation order, hence in the SQL
    oracle.  Output: (id, bm25_micro) for docs matching >= 1 term.
    """
    from pyspark.sql import functions as F

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(
                normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
            )
        ).alias("term"),
    ).filter(F.col("term") != "")
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
    )
    per_term = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.floor(
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / avgdl)
                )
                * 1e6
                + 0.5
            )
            .cast("long")
            .alias("micro"),
        )
    )
    return per_term.groupBy(id_col).agg(
        F.sum("micro").alias("bm25_micro")
    )


# The Gopher rule-filter stop set [Rae et al. 2021, appendix A — public]:
# a document must contain at least 2 of these to pass the stopword rule.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_columns(
    text: Column, words_col: Column | None = None
) -> dict[str, Column]:
    """The Gopher composite quality-rule signals [Rae et al. 2021,
    appendix A — public rules]: word count, mean word length,
    symbol-to-word ratio ('#' and '...'), bullet/ellipsis line ratios,
    alphabetic-word fraction, and required-stopword hits.  All JVM-side
    column expressions; ratios rounded to 6 decimals so the flags (which
    compare the ROUNDED values) replay identically in the SQL oracle.

    Pass ``words_col`` (a hoisted `words(text)` column) so the word
    array computes once: it is referenced by four signals, and the
    stopword tally is ONE array_intersect pass (distinct stopwords
    present) instead of a full text re-scan per stopword.
    """
    s = F.coalesce(text, F.lit(""))
    w = words_col if words_col is not None else words(s)
    n_words = F.size(w)
    nw_nz = F.when(n_words == 0, F.lit(1)).otherwise(n_words)
    sum_len = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    n_hash = char_count(s, r"#")
    # non-overlapping left-to-right '...' count — both regex engines
    # consume greedily, so '....' counts once in each
    n_ell = (
        (F.length(s) - F.length(F.regexp_replace(s, r"\.\.\.", ""))) / 3
    ).cast("int")
    bp = boilerplate_columns(s)
    alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    # distinct-stopwords-present in one pass: array_intersect dedups, so
    # its size equals the count of stopwords with >=1 occurrence
    stop_hits = F.size(
        F.array_intersect(
            F.array(*[F.lit(x) for x in GOPHER_STOPWORDS]), w
        )
    )
    return {
        "n_words": n_words,
        "mean_word_len": F.round(sum_len.cast("double") / nw_nz, 6),
        "symbol_ratio": F.round((n_hash + n_ell).cast("double") / nw_nz, 6),
        "bullet_line_ratio": bp["bullet_line_ratio"],
        "ellipsis_line_ratio": bp["ellipsis_line_ratio"],
        "alpha_word_ratio": F.round(alpha.cast("double") / nw_nz, 6),
        "n_stop_hits": stop_hits,
    }


# Gopher thresholds (word-count window, mean-word-length window, max
# symbol ratio, max bullet-line share, max ellipsis-line share, min
# alphabetic-word fraction, min distinct stopword hits) — shared by the
# Spark flag expression and the SQL oracle; edit together.
GOPHER_LIMITS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "max_bullet_ratio": 0.9,
    "max_ellipsis_ratio": 0.3,
    "min_alpha_ratio": 0.8,
    "min_stop_hits": 2,
}


def gopher_pass(g: dict[str, Column]) -> Column:
    """'T'/'F' overall Gopher verdict from gopher_columns output — every
    comparison is over the rounded signals, so both engines agree."""
    L = GOPHER_LIMITS
    ok = (
        (g["n_words"] >= L["min_words"])
        & (g["n_words"] <= L["max_words"])
        & (g["mean_word_len"] >= L["min_mean_word_len"])
        & (g["mean_word_len"] <= L["max_mean_word_len"])
        & (g["symbol_ratio"] <= L["max_symbol_ratio"])
        & (g["bullet_line_ratio"] < L["max_bullet_ratio"])
        & (g["ellipsis_line_ratio"] < L["max_ellipsis_ratio"])
        & (g["alpha_word_ratio"] >= L["min_alpha_ratio"])
        & (g["n_stop_hits"] >= L["min_stop_hits"])
    )
    return F.when(ok, F.lit("T")).otherwise(F.lit("F"))


def word_blocks(text: Column, k: int = 5) -> Column:
    """Consecutive k-word blocks of the normalized text (last block may be
    short) — the paragraph unit for corpora without newline structure.
    Corpora WITH newlines should split on them instead (paragraph_dedup
    takes the block array, not the raw text, so either unit plugs in).
    Empty/NULL text -> empty array."""

    def build(w: Column) -> Column:
        nb = F.ceil(F.size(w) / F.lit(float(k))).cast("int")
        return F.transform(
            F.sequence(F.lit(0), nb - 1),
            lambda i: F.array_join(F.slice(w, i * k + 1, k), " "),
        )

    return F.when(
        F.trim(F.coalesce(text, F.lit(""))) == "",
        F.array().cast("array<string>"),
    ).otherwise(
        # _let: slicing the word array inside the per-block lambda would
        # re-split the text once per block
        _let(F.split(normalize_text(F.coalesce(text, F.lit(""))), " "), build)
    )


def word_ngrams_from_words(w: Column, k: int = 3) -> Column:
    """Word k-gram array from an already-split word array.  Pass a
    MATERIALIZED column (hoisted with ``withColumn``) when the caller
    references the gram array more than once: ``w`` appears 4 times in
    this expression, so an inlined split would re-tokenize per use."""
    return F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: F.array_join(F.slice(w, i + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column, k: int = 3) -> Column:
    """Raw (non-distinct, in-order) word k-gram array over normalized
    text — the repetition-signal counterpart of ``shingles`` (which
    dedups and sorts for MinHash); empty/short docs give an empty array."""
    # _let: word_ngrams_from_words references w inside its per-gram
    # lambda, so an inlined split would re-tokenize once per gram
    return _let(
        F.split(normalize_text(F.coalesce(text, F.lit(""))), " "),
        lambda w: word_ngrams_from_words(w, k),
    )


def unigram_surprisal(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Unigram language-model surprisal per document — the model-free
    stand-in for the LM-perplexity quality filter of CCNet [Wenzek et al.
    2020 — public technique]: train an add-1-smoothed unigram LM on the
    corpus itself, score every document by total/mean token surprisal
    -ln p(w), p(w) = (c_w + 1)/(N + V).  Outlier-high mean surprisal =
    gibberish/rare-token soup; outlier-low = boilerplate loops.

    Float determinism: per-TERM surprisal is rounded to integer
    micro-nats (floor(x·1e6 + 0.5)) before the per-document sum, so the
    document score is an exact BIGINT sum — identical in any summation
    order, hence replayable in the SQL oracle (the bm25_scores idiom).

    Plan shape: one tokenize feeds both the vocabulary counts and the
    per-(doc, term) tf table; corpus constants (N, V) are a 1-row
    broadcast; the tf-vocab join keys on the term — a shuffle whose skew
    (stopwords) is AQE's standard case, and at trillion-token scale the
    vocabulary is exactly what CAN'T broadcast, so the shuffle join is
    the honest plan.

    Output: (id, n_tokens, surprisal_micro, mean_surprisal).
    """
    from pyspark.sql import functions as F

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " ")
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cw"))
    consts = vocab.agg(
        F.sum("cw").alias("nn"), F.count(F.lit(1)).alias("vv")
    )
    term_micro = F.floor(
        -F.log((F.col("cw") + 1.0) / (F.col("nn") + F.col("vv")))
        * 1e6
        + 0.5
    ).cast("long")
    scored = (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(consts))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * term_micro).alias("surprisal_micro"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        "surprisal_micro",
        F.round(
            F.col("surprisal_micro").cast("double")
            / F.col("n_tokens")
            / 1e6,
            6,
        ).alias("mean_surprisal"),
    )


def rho_excess(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    pool_pred=None,
):
    """RHO reducible-holdout-loss scores [Mindermann et al. 2022;
    token-level twin RHO-1, Lin et al. 2024 — public]: every document's
    excess surprisal = (surprisal under the unigram LM of the training
    POOL) − (surprisal under the holdout REFERENCE LM).  High excess =
    the reference model finds the text learnable but the pool model
    hasn't learnt it — the documents worth adding next.  ``pool_pred``
    (boolean Column) splits pool from reference; default even/odd id.

    Both LMs are add-1-smoothed with their own (N, V); per-term
    surprisal rounds to integer micro-nats BEFORE the per-doc BIGINT
    sum (summation-order free, oracle-replayable).  Plan shape: one
    tokenize feeds tf and ONE conditional aggregation builds both
    half-vocabularies side by side — one term shuffle and one tf↔vocab
    join, not two of each; the combined (N, V)×2 frame is a 1-row
    broadcast.  At trillion-token scale the vocabulary is exactly what
    can't broadcast, so the term-keyed shuffle join is the honest plan.

    Output: (id, n_tokens, excess_micro).
    """
    from pyspark.sql import functions as F

    if pool_pred is None:
        pool_pred = F.col(id_col) % 2 == 0
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(
                normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
            )
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = toks.groupBy("term").agg(
        F.sum(F.when(pool_pred, 1).otherwise(0)).alias("cw_p"),
        F.sum(F.when(pool_pred, 0).otherwise(1)).alias("cw_r"),
    )
    consts = vocab.agg(
        F.sum("cw_p").alias("np"),
        F.sum(F.when(F.col("cw_p") > 0, 1).otherwise(0)).alias("vp"),
        F.sum("cw_r").alias("nr"),
        F.sum(F.when(F.col("cw_r") > 0, 1).otherwise(0)).alias("vr"),
    )
    s_pool = F.floor(
        -F.log((F.col("cw_p") + 1.0) / (F.col("np") + F.col("vp")))
        * 1e6
        + 0.5
    ).cast("long")
    s_ref = F.floor(
        -F.log((F.col("cw_r") + 1.0) / (F.col("nr") + F.col("vr")))
        * 1e6
        + 0.5
    ).cast("long")
    return (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(consts))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * (s_pool - s_ref)).alias("excess_micro"),
        )
    )


def bigram_backoff_surprisal(
    train,
    score,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
):
    """Bigram Stupid-Backoff surprisal [Brants et al. 2007, "Large
    Language Models in Machine Translation" — public]: a bigram LM with
    score-based (not normalized) backoff, trained on ``train`` and
    scoring ``score`` — the held-out-perplexity quality signal one step
    up from :func:`unigram_surprisal`.

    Per adjacent token pair (w1, w2):

    * seen bigram:    p = c2(w1,w2) / c1(w1)
    * unseen bigram:  p = alpha * c1(w2) / N        (unigram backoff)
    * unseen unigram: p = alpha / (N + V)           (OOV floor)

    Float determinism: the per-pair surprisal -ln(p) rounds to integer
    micro-nats BEFORE the per-document BIGINT sum (the unigram_surprisal
    idiom) — summation-order free, oracle-replayable.

    Plan shape: bigram generation is a per-row array transform (no
    window, no shuffle); the score-side pair stream joins the bigram
    counts on the pair key and the unigram counts on each word — three
    vocabulary-keyed shuffle joins, which is the honest plan at
    trillion-token scale where no count table broadcasts.  Stopword-pair
    skew is AQE's standard skew-join case.

    Output: (id, n_pairs, surprisal_micro, mean_surprisal); documents
    with < 2 tokens score 0 over 0 pairs.
    """
    from pyspark.sql import functions as F

    def pairs_of(df):
        toks = df.select(
            F.col(id_col),
            F.split(
                normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
            ).alias("toks"),
        ).withColumn(
            "toks", F.filter("toks", lambda t: t != F.lit(""))
        )
        return toks.select(
            F.col(id_col),
            F.explode(
                F.when(
                    F.size("toks") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("toks") - 1),
                        lambda i: F.struct(
                            F.element_at("toks", i).alias("w1"),
                            F.element_at("toks", i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<w1:string,w2:string>>")
                )
            ).alias("p"),
        ).select(id_col, "p.w1", "p.w2")

    train_pairs = pairs_of(train)
    c2 = train_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    train_toks = train.select(
        F.explode(
            F.split(
                normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "
            )
        ).alias("term")
    ).filter(F.col("term") != "")
    c1 = train_toks.groupBy("term").agg(F.count(F.lit(1)).alias("c1"))
    consts = c1.agg(F.sum("c1").alias("nn"), F.count(F.lit(1)).alias("vv"))

    sp = pairs_of(score)
    j = (
        sp.join(c2, ["w1", "w2"], "left")
        .join(
            c1.select(F.col("term").alias("w1"), F.col("c1").alias("c1_w1")),
            "w1",
            "left",
        )
        .join(
            c1.select(F.col("term").alias("w2"), F.col("c1").alias("c1_w2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(consts))
    )
    p = (
        F.when(
            F.col("c2").isNotNull(),
            F.col("c2").cast("double") / F.col("c1_w1"),
        )
        .when(
            F.col("c1_w2").isNotNull(),
            F.lit(alpha) * F.col("c1_w2") / F.col("nn"),
        )
        .otherwise(F.lit(alpha) / (F.col("nn") + F.col("vv")))
    )
    micro = F.floor(-F.log(p) * 1e6 + 0.5).cast("long")
    scored = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(micro).alias("surprisal_micro"),
    )
    return (
        score.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("surprisal_micro", F.lit(0))
            .cast("long")
            .alias("surprisal_micro"),
            F.round(
                F.when(
                    F.coalesce("n_pairs", F.lit(0)) > 0,
                    F.col("surprisal_micro").cast("double")
                    / F.col("n_pairs")
                    / 1e6,
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("mean_surprisal"),
        )
    )
