"""Property-based tests (SURVEY.md §5): invariants of the pure kernels that
back the CDS-splicing pipeline.  No SparkSession needed — these run on the
driver-side python used inside the applyInPandas kernel.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

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
