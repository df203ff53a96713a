"""PolyPhen input-generation plan — the Polyphen tool's query chain
(reference: Polyphen.java:144-341, 387-410).

Missense selection over the 5-way join (J14 + F9), strand attach (J15),
protein flank extraction around the AA position (C22) with the reference's
flank QC (left/right flank must match the stored RefSeq protein —
Polyphen.java:256-342), then the 'acc pos aa1 aa2' input file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missense_rows(
    variants: DataFrame,
    variant_map_data: DataFrame,
    variant_transcripts: DataFrame,
    transcripts: DataFrame,
) -> DataFrame:
    """J14 + F9: variant ⋈ vmd ⋈ variant_transcript ⋈ transcripts with the
    missense filter (Polyphen.java:148-165): ref_aa != var_aa, var_aa != '*',
    both nucleotides single ACGT, amino acids present."""
    v = variants.select(
        F.col("rgd_id").alias("variant_id"), "ref_nuc", "var_nuc"
    ).filter(
        F.col("ref_nuc").rlike("^[ACGT]$") & F.col("var_nuc").rlike("^[ACGT]$")
    )
    m = variant_map_data.select(
        F.col("rgd_id").alias("variant_id"), "chromosome", "start_pos"
    )
    vt = variant_transcripts.select(
        F.col("variant_rgd_id").alias("variant_id"),
        "transcript_rgd_id",
        "ref_aa",
        "var_aa",
        F.col("full_ref_aa_pos").alias("pos"),
    ).filter(
        F.col("ref_aa").isNotNull()
        & F.col("var_aa").isNotNull()
        & (F.col("ref_aa") != F.col("var_aa"))
        & (F.col("var_aa") != "*")
        & F.col("pos").isNotNull()
    )
    tr = transcripts.select(
        "transcript_rgd_id", "gene_rgd_id", "protein_acc_id"
    ).filter(F.col("protein_acc_id").isNotNull())
    return (
        v.join(m, "variant_id")
        .join(vt, "variant_id")
        .join(F.broadcast(tr), "transcript_rgd_id")
    )


def attach_strand(missense: DataFrame, features: DataFrame) -> DataFrame:
    """J15: DISTINCT strand of the transcript's features covering the
    variant position (Polyphen.java:387-410) — first match in sorted order
    (the reference takes the single distinct value; ambiguous transcripts
    keep the lexicographically first)."""
    f = features.select(
        "transcript_rgd_id",
        F.col("chromosome").alias("f_chrom"),
        F.col("start_pos").alias("f_start"),
        F.col("stop_pos").alias("f_stop"),
        "strand",
    )
    joined = missense.join(
        F.broadcast(f),
        (missense.transcript_rgd_id == f.transcript_rgd_id)
        & (missense.chromosome == f.f_chrom)
        & (missense.start_pos >= f.f_start)
        & (missense.start_pos <= f.f_stop),
        "left",
    ).drop(f.transcript_rgd_id)
    keys = [c for c in missense.columns]
    return joined.groupBy(*keys).agg(
        F.min("strand").alias("strand")
    )


def with_flanks(
    missense: DataFrame, protein_seqs: DataFrame
) -> DataFrame:
    """C22 + flank QC: left = seq[0:pos-1], right = seq[pos:] with any
    trailing '*' stripped (Polyphen.java:230-241, 296-299); QC flag 'Y' iff
    the stored protein's residue at ``pos`` equals ref_aa (the reference
    skips rows whose flanks disagree with the stored RefSeq protein)."""
    p = protein_seqs.select("protein_acc_id", F.col("seq").alias("protein_seq"))
    j = missense.join(F.broadcast(p), "protein_acc_id", "left")
    seq = F.regexp_replace(F.col("protein_seq"), r"\*$", "")
    return j.select(
        *missense.columns,
        F.expr("substring(regexp_replace(protein_seq, '\\\\*$', ''), 1, pos - 1)").alias(
            "left_flank"
        ),
        F.expr("substring(regexp_replace(protein_seq, '\\\\*$', ''), pos + 1)").alias(
            "right_flank"
        ),
        F.when(
            F.substring(seq, F.col("pos").cast("int"), 1) == F.col("ref_aa"),
            F.lit("Y"),
        )
        .otherwise(F.lit("N"))
        .alias("flank_match"),
    )


def build_polyphen_input(
    variants: DataFrame,
    variant_map_data: DataFrame,
    variant_transcripts: DataFrame,
    transcripts: DataFrame,
    features: DataFrame,
    protein_seqs: DataFrame | None = None,
    require_flank_match: bool = True,
) -> DataFrame:
    """End-to-end Polyphen tool chain: missense -> strand -> flanks/QC.

    Returns rows ready for ``sources.polyphen.write_polyphen_input`` plus
    the ``.info`` sidecar columns (variant_id, transcript, gene, strand,
    flanks)."""
    mm = missense_rows(
        variants, variant_map_data, variant_transcripts, transcripts
    )
    mm = attach_strand(mm, features)
    if protein_seqs is not None:
        mm = with_flanks(mm, protein_seqs)
        if require_flank_match:
            mm = mm.filter(F.col("flank_match") == "Y")
    return mm


def build_polyphen2_input(
    variants: DataFrame,
    variant_map_data: DataFrame,
    variant_transcripts: DataFrame,
    transcripts: DataFrame,
    features: DataFrame,
    genes: DataFrame | None = None,
    gene_symbols: list[str] | None = None,
    protein_seqs: DataFrame | None = None,
    require_flank_match: bool = True,
) -> DataFrame:
    """Polyphen2's input assembly (Polyphen2.java:105-135): the same
    missense -> strand -> flank chain, but sourced from the annotated
    VARIANT_TRANSCRIPT table joined to GENES for the region name
    (``g.gene_symbol AS region_name``) with optional gene-symbol scoping
    (``AND g.gene_symbol IN (...)``, :134-135).

    The reference's ``Collections.shuffle`` of output lines (:91 — load
    levelling for the downstream PolyPhen batch) is obsolete under
    Spark's shuffle partitioning (SURVEY §4 / W7): partitions already
    spread work evenly, and a deterministic order keeps the sink
    reproducible."""
    mm = build_polyphen_input(
        variants,
        variant_map_data,
        variant_transcripts,
        transcripts,
        features,
        protein_seqs=protein_seqs,
        require_flank_match=require_flank_match,
    )
    if genes is not None:
        id_col = "gene_rgd_id" if "gene_rgd_id" in genes.columns else "rgd_id"
        g = genes.select(
            F.col(id_col).alias("gene_rgd_id"),
            F.col("gene_symbol").alias("region_name"),
        )
        mm = mm.join(F.broadcast(g), "gene_rgd_id", "left")
        if gene_symbols:
            mm = mm.filter(F.col("region_name").isin(list(gene_symbols)))
    return mm
