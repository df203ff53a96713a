"""Table and file-format schemas (SURVEY.md §1).

Reference parity notes cite /root/reference file:line. Flags that the
reference stores as 'T'/'F'/'Y'/'N' strings stay strings so outputs can be
compared byte-for-byte; positions are LongType throughout (the reference
mixes int/long — VariantMapData.java:18-19 vs VariantLoad3.java:235 — we
standardize on 64-bit).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# CommonFormat2 — the pipeline's own 16-column TSV, one allele per row.
# Column order per CommonFormat2Line.java:8-33 / CommonFormat2Writer.java:57.
# ---------------------------------------------------------------------------
CF2_SCHEMA = T.StructType(
    [
        T.StructField("chr", T.StringType()),
        T.StructField("position", T.LongType()),
        T.StructField("ref_nuc", T.StringType()),
        T.StructField("var_nuc", T.StringType()),
        T.StructField("rs_id", T.StringType()),
        T.StructField("count_a", T.IntegerType()),
        T.StructField("count_c", T.IntegerType()),
        T.StructField("count_g", T.IntegerType()),
        T.StructField("count_t", T.IntegerType()),
        T.StructField("total_depth", T.IntegerType()),
        T.StructField("hgvs_name", T.StringType()),
        T.StructField("rgd_id", T.LongType()),
        T.StructField("allele_depth", T.IntegerType()),
        T.StructField("allele_count", T.IntegerType()),
        T.StructField("read_depth", T.IntegerType()),
        T.StructField("padding_base", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Entity tables written by the load stage (VariantProcessingBase.java:225-258)
# ---------------------------------------------------------------------------
VARIANT_SCHEMA = T.StructType(
    [
        T.StructField("rgd_id", T.LongType()),
        T.StructField("ref_nuc", T.StringType()),
        T.StructField("variant_type", T.StringType()),  # 'snv'|'insertion'|'deletion'
        T.StructField("var_nuc", T.StringType()),
        T.StructField("rs_id", T.StringType()),
        T.StructField("clinvar_id", T.StringType()),
        T.StructField("species_type_key", T.IntegerType()),
    ]
)

VARIANT_MAP_DATA_SCHEMA = T.StructType(
    [
        T.StructField("rgd_id", T.LongType()),
        T.StructField("chromosome", T.StringType()),
        T.StructField("start_pos", T.LongType()),
        T.StructField("end_pos", T.LongType()),
        T.StructField("padding_base", T.StringType()),
        T.StructField("genic_status", T.StringType()),  # 'GENIC'|'INTERGENIC'
        T.StructField("map_key", T.IntegerType()),
    ]
)

VARIANT_SAMPLE_DETAIL_SCHEMA = T.StructType(
    [
        T.StructField("rgd_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("sample_id", T.IntegerType()),
        T.StructField("total_depth", T.IntegerType()),
        T.StructField("var_freq", T.IntegerType()),
        T.StructField("zygosity_status", T.StringType()),
        T.StructField("zygosity_percent_read", T.IntegerType()),
        T.StructField("zygosity_poss_error", T.StringType()),  # 'Y'/'N'
        T.StructField("zygosity_ref_allele", T.StringType()),  # 'Y'/'N'
        T.StructField("zygosity_num_allele", T.IntegerType()),
        T.StructField("zygosity_in_pseudo", T.StringType()),  # 'Y'/'N'
        T.StructField("quality_score", T.IntegerType()),
    ]
)

VARIANT_TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("variant_rgd_id", T.LongType()),
        T.StructField("transcript_rgd_id", T.LongType()),
        T.StructField("ref_aa", T.StringType()),
        T.StructField("var_aa", T.StringType()),
        T.StructField("syn_status", T.StringType()),
        T.StructField("location_name", T.StringType()),
        T.StructField("near_splice_site", T.StringType()),  # 'T'/'F'
        T.StructField("full_ref_aa_pos", T.IntegerType()),
        T.StructField("full_ref_nuc_pos", T.IntegerType()),
        T.StructField("triplet_error", T.StringType()),  # 'T'/'F'
        T.StructField("frameshift", T.StringType()),  # 'T'/'F'
        T.StructField("map_key", T.IntegerType()),
    ]
)

# ---------------------------------------------------------------------------
# Reference/lookup tables (GeneCache.java:29-34, TranscriptCache.java:29-30,
# TranscriptFeatureCache.java:26-29, CommonFormat2Writer.java:139,
# LoadRn6Rn7Samples.java:252)
# ---------------------------------------------------------------------------
GENES_SCHEMA = T.StructType(
    [
        T.StructField("gene_rgd_id", T.LongType()),
        T.StructField("chromosome", T.StringType()),
        T.StructField("start_pos", T.LongType()),
        T.StructField("stop_pos", T.LongType()),
        T.StructField("map_key", T.IntegerType()),
        T.StructField("object_status", T.StringType()),
    ]
)

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("transcript_rgd_id", T.LongType()),
        T.StructField("gene_rgd_id", T.LongType()),
        T.StructField("is_non_coding_ind", T.StringType()),  # 'Y'/'N'
        T.StructField("acc_id", T.StringType()),
        T.StructField("protein_acc_id", T.StringType()),
    ]
)

TRANSCRIPT_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("transcript_rgd_id", T.LongType()),
        T.StructField("object_name", T.StringType()),  # 'EXONS'|'3UTRS'|'5UTRS'
        T.StructField("strand", T.StringType()),  # '+'|'-'
        T.StructField("chromosome", T.StringType()),
        T.StructField("start_pos", T.LongType()),
        T.StructField("stop_pos", T.LongType()),
        T.StructField("map_key", T.IntegerType()),
    ]
)

DB_SNP_SCHEMA = T.StructType(
    [
        T.StructField("position", T.LongType()),
        T.StructField("map_key", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("chromosome", T.StringType()),
        T.StructField("allele", T.StringType()),
        T.StructField("snp_name", T.StringType()),
        T.StructField("snp_class", T.StringType()),
    ]
)

SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.IntegerType()),
        T.StructField("analysis_name", T.StringType()),
        T.StructField("gender", T.StringType()),  # 'M'|'F'|'U'|'P'
        T.StructField("map_key", T.IntegerType()),
        T.StructField("patient_id", T.IntegerType()),
    ]
)

FASTA_SCHEMA = T.StructType(
    [
        T.StructField("chromosome", T.StringType()),
        T.StructField("seq", T.StringType()),
    ]
)

CONSERVATION_SCHEMA = T.StructType(
    [
        T.StructField("chr", T.StringType()),
        T.StructField("position", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)

# SnpEff ANN sub-fields in order (SnpEffLoader.java:130-163)
SNPEFF_ANN_FIELDS = [
    "allele",
    "effect",
    "impact",
    "gene_symbol",
    "gene_id",
    "feature",
    "feature_id",
    "biotype",
    "rank",
    "hgvs_c",
    "hgvs_p",
    "cdna_pos_len",
    "cds_pos_len",
    "aa_pos_len",
    "distance",
    "errors",
]
