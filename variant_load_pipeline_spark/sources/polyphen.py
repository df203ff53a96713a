"""PolyPhen-2 result source (SURVEY.md §2.1 S9, J16) and input sink.

* ``read_polyphen_results`` — 55-column whitespace-padded TSV (header line
  skipped); column indices per PolyphenLoader.java:100-169; all values
  trimmed; the swapped-AA QC filter (oAA1==varAA && oAA2==refAA -> reject,
  :171-180) is applied as a relational filter.
* ``read_polyphen_info`` — the .info sidecar (variant_id, locus_name, ...,
  strand, transcript_rgd_id; Polyphen.java:113-114).
* ``pair_results_with_info`` — the consume-first-match 4-key join (J16)
  expressed as rank-pairing (operators.windows.consume_first_match_join).
* ``write_polyphen_input`` — 'acc pos aa1 aa2' space-separated input lines
  (Polyphen.java:243-244).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import consume_first_match_join

# (output_name, 0-based column index) per PolyphenLoader.java:118-168
RESULT_COLS: list[tuple[str, int]] = [
    ("protein_acc_id", 0),
    ("var_pos", 1),
    ("o_aa1", 2),
    ("o_aa2", 3),
    ("rsid", 4),
    ("uniprot_acc_id", 5),
    ("pos", 6),
    ("ref_aa", 7),
    ("var_aa", 8),
    ("nt1", 9),
    ("nt2", 10),
    ("prediction", 11),
    ("based_on", 12),
    ("effect", 13),
    ("pph2_class", 14),
    ("pph2_prob", 15),
    ("pph2_fpr", 16),
    ("pph2_tpr", 17),
    ("pph2_fdr", 18),
    ("site", 19),
    ("region", 20),
    ("phat", 21),
    ("d_score", 22),
    ("score1", 23),
    ("score2", 24),
    ("msav", 25),
    ("num_observ", 26),
    ("num_struct_init", 27),
    ("num_struct_filt", 28),
    ("pdb_id", 29),
    ("res_num", 30),
    ("chain_id", 31),
    ("ali_ide", 32),
    ("ali_len", 33),
    ("acc_normed", 34),
    ("sec_str", 35),
    ("map_region", 36),
    ("delta_volume", 37),
    ("delta_prop", 38),
    ("b_fact", 39),
    ("num_h_bonds", 40),
    ("het_cont_ave_num", 41),
    ("het_cont_min_dist", 42),
    ("inter_cont_ave_num", 43),
    ("inter_cont_min_dist", 44),
    ("sites_cont_ave_num", 45),
    ("sites_cont_min_dist", 46),
    ("transv", 47),
    ("cod_pos", 48),
    ("cpg", 49),
    ("min_djxn", 50),
    ("pfam_hit", 51),
    ("id_pmax", 52),
    ("id_psnp", 53),
    ("id_qmin", 54),
]

INFO_COLS = [
    "variant_id",
    "locus_name",
    "protein_acc_id",
    "pos",
    "ref_aa",
    "var_aa",
    "strand",
    "transcript_rgd_id",
]


def read_polyphen_results(spark: SparkSession, path: str) -> DataFrame:
    """55-col result TSV -> named trimmed columns, swapped-AA rows rejected."""
    lines = spark.read.text(path).filter(~F.col("value").startswith("#"))
    cols = F.split(F.col("value"), "\t", -1)
    out = lines.select(
        *[
            F.trim(F.try_element_at(cols, F.lit(idx + 1))).alias(name)
            for name, idx in RESULT_COLS
        ],
        F.size(cols).alias("__n"),
    ).filter(F.col("__n") >= 55).drop("__n")
    out = out.withColumn("var_pos", F.col("var_pos").cast("int"))
    # swapped-AA QC (PolyphenLoader.java:171-180)
    return out.filter(
        ~((F.col("o_aa1") == F.col("var_aa")) & (F.col("o_aa2") == F.col("ref_aa")))
    )


def read_polyphen_info(spark: SparkSession, path: str) -> DataFrame:
    lines = spark.read.text(path).filter(~F.col("value").startswith("#"))
    cols = F.split(F.col("value"), "\t", -1)
    return lines.select(
        F.try_element_at(cols, F.lit(1)).cast("long").alias("variant_id"),
        F.try_element_at(cols, F.lit(2)).alias("locus_name"),
        F.try_element_at(cols, F.lit(3)).alias("protein_acc_id"),
        F.try_element_at(cols, F.lit(4)).cast("int").alias("pos"),
        F.try_element_at(cols, F.lit(5)).alias("ref_aa"),
        F.try_element_at(cols, F.lit(6)).alias("var_aa"),
        F.try_element_at(cols, F.lit(7)).alias("strand"),
        F.when(
            F.size(cols) > 7, F.try_element_at(cols, F.lit(8)).cast("long")
        ).alias("transcript_rgd_id"),
    )


def read_polyphen_info2(spark: SparkSession, path: str) -> DataFrame:
    """The 9-column .info layout PolyphenLoader2 consumes
    (PolyphenLoader2.java:68,160-168): unlike the 8-column variant above
    (PolyphenLoader.java:187-195), ``variant_transcript_id`` sits at
    column 2 and shifts everything after it — the id the loader needs to
    stamp polyphen_status back onto variant_transcript rows."""
    lines = spark.read.text(path).filter(~F.col("value").startswith("#"))
    cols = F.split(F.col("value"), "\t", -1)
    return lines.select(
        F.try_element_at(cols, F.lit(1)).cast("long").alias("variant_id"),
        F.try_element_at(cols, F.lit(2))
        .cast("long")
        .alias("variant_transcript_id"),
        F.try_element_at(cols, F.lit(3)).alias("locus_name"),
        F.try_element_at(cols, F.lit(4)).alias("protein_acc_id"),
        F.try_element_at(cols, F.lit(5)).cast("int").alias("pos"),
        F.try_element_at(cols, F.lit(6)).alias("ref_aa"),
        F.try_element_at(cols, F.lit(7)).alias("var_aa"),
        F.try_element_at(cols, F.lit(8)).alias("strand"),
        F.when(
            F.size(cols) > 8, F.try_element_at(cols, F.lit(9)).cast("long")
        ).alias("transcript_rgd_id"),
    )


def pair_results_with_info(
    results: DataFrame,
    info: DataFrame,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """J16: match each result to ONE info row on the 4-key (protein_acc_id,
    pos, aa1, aa2) with consume-first-match semantics — the n-th duplicate
    result pairs with the n-th duplicate info row (file order on the info
    side is approximated by variant_id order, deterministic).

    ``extra_cols``: further info-side columns carried through the pairing
    (PolyphenLoader2 needs ``variant_transcript_id``)."""
    r = results.withColumnRenamed("var_pos", "key_pos")
    i = info.select(
        F.col("protein_acc_id"),
        F.col("pos").alias("key_pos"),
        F.col("ref_aa").alias("o_aa1"),
        F.col("var_aa").alias("o_aa2"),
        "variant_id",
        F.col("locus_name").alias("gene_symbol"),
        "strand",
        "transcript_rgd_id",
        *(extra_cols or []),
    )
    return consume_first_match_join(
        r,
        i,
        keys=["protein_acc_id", "key_pos", "o_aa1", "o_aa2"],
        left_order=["pos", "ref_aa", "var_aa", "prediction"],
        right_order=["variant_id"],
    ).withColumn("protein_status", F.lit("100 PERC MATCH"))


def write_polyphen_input(df: DataFrame, path: str) -> None:
    """'acc pos aa1 aa2' space-separated input lines (Polyphen.java:243-244)."""
    out = df.select(
        F.concat_ws(
            " ",
            F.col("protein_acc_id"),
            F.col("pos").cast("string"),
            F.col("ref_aa"),
            F.col("var_aa"),
        ).alias("value")
    )
    out.write.mode("overwrite").text(path)
