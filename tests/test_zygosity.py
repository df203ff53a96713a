"""Zygosity suite tests against a pure-Python mirror of the decompiled
edu.mcw.rgd.util.Zygosity bytecode (float32 arithmetic, exact thresholds)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from variant_load_pipeline_spark.functions import zygosity as Z


def py_pseudo_error(pct: float, chrom: str, gender: str, pos: int):
    """Python mirror of computeZygosityStatusPseudoError (build 36)."""
    par = any(
        c == chrom and s <= pos <= e for c, s, e in Z.PAR_INTERVALS["36"]
    )
    if gender in ("M", "P") and chrom in ("X", "Y") and not par:
        if pct == 100:
            status = "hemizygous"
        elif pct >= 85:
            status = "probably hemizygous"
        else:
            status = "possibly hemizygous"
        in_pseudo = "N"
    else:
        if pct == 100:
            status = "homozygous"
        elif pct >= 85:
            status = "possibly homozygous"
        else:
            status = "heterozygous"
        in_pseudo = (
            "Y" if gender in ("M", "P") and chrom in ("X", "Y") and par else "N"
        )
    poss_error = "Y" if pct <= 15 else "N"
    return status, in_pseudo, poss_error


def py_snv(a, c, g, t, ref, var, chrom, pos, gender):
    total = np.float32(a + c + g + t)
    pcts = {
        b: np.float32(np.float32(cnt * 100) / total)
        for b, cnt in zip("ACGT", (a, c, g, t))
    }
    pct = pcts.get(var, np.float32(0))
    status, in_pseudo, poss_error = py_pseudo_error(float(pct), chrom, gender, pos)
    return {
        "zygosity_status": status,
        "zygosity_percent_read": int(np.float32(pct) + np.float32(0.5)),
        "zygosity_poss_error": poss_error,
        "zygosity_ref_allele": "Y" if float(pcts.get(ref, 0)) > 0 else "N",
        "zygosity_num_allele": sum(1 for b in "ACGT" if float(pcts[b]) > 0),
        "zygosity_in_pseudo": in_pseudo,
        "score": {"A": a, "C": c, "G": g, "T": t}.get(var, 0),
    }


CASES = [
    # (a, c, g, t, ref, var, chrom, pos, gender)
    (0, 0, 0, 10, "A", "T", "1", 500, "F"),      # 100% homozygous
    (15, 0, 0, 85, "A", "T", "1", 500, "F"),     # exactly 85 -> possibly hom
    (16, 0, 0, 84, "A", "T", "1", 500, "F"),     # 84 -> heterozygous
    (470, 63, 0, 0, "A", "C", "1", 500, "F"),    # low pct -> poss_error check
    (97, 3, 0, 0, "A", "C", "1", 500, "F"),      # pct ~3 -> poss_error Y
    (1, 2, 3, 4, "G", "T", "2", 10, "U"),        # multi-allele
    (0, 0, 0, 7, "A", "T", "X", 500, "M"),       # male X outside PAR -> hemizygous
    (0, 0, 0, 7, "A", "T", "X", 500, "F"),       # female X -> homozygous
    (1, 0, 0, 9, "A", "T", "X", 500, "M"),       # 90 -> probably hemizygous
    (3, 0, 0, 7, "A", "T", "X", 500, "M"),       # 70 -> possibly hemizygous
    (0, 0, 0, 7, "X", "T", "X", 2_709_520, "M"), # PAR edge inclusive -> homozygous+pseudo
    (0, 0, 0, 7, "A", "T", "X", 2_709_521, "M"), # just outside PAR -> hemizygous
    (0, 0, 0, 7, "A", "T", "Y", 57_443_438, "P"),# Y PAR start, gender P
    (1, 1, 1, 1, "A", "A", "1", 5, "F"),         # var==ref still computed
    (5, 5, 0, 0, "A", "N", "1", 5, "F"),         # var not ACGT -> score 0
    (2, 0, 0, 14, "A", "T", "1", 5, "F"),        # 87.5 -> percent_read 88
    (1, 0, 0, 7, "A", "T", "1", 5, "F"),         # 87.5 family
    (1, 0, 0, 2, "A", "T", "1", 5, "F"),         # 66.67
]


def test_snv_zygosity_matches_java_mirror(spark):
    df = spark.createDataFrame(
        CASES, ["a", "c", "g", "t", "ref", "var", "chrom", "pos", "gender"]
    )
    cols = Z.snv_zygosity_columns(
        F.col("a"), F.col("c"), F.col("g"), F.col("t"),
        F.col("ref"), F.col("var"), F.col("chrom"), F.col("pos"), F.col("gender"),
    )
    rows = df.select([v.alias(k) for k, v in cols.items()]).collect()
    for case, row in zip(CASES, rows):
        exp = py_snv(*case)
        for k, v in exp.items():
            assert row[k] == v, f"{k} mismatch for {case}: spark={row[k]} java={v}"


def test_indel_zygosity(spark):
    # (allele_depth, read_depth, ref, a, c, g, t, chrom, pos, gender)
    cases = [
        (10, 10, "", 0, 0, 0, 0, "1", 5, "F"),   # 100 homozygous, ref_allele NULL
        (9, 10, "A", 3, 0, 0, 0, "1", 5, "F"),   # 90 possibly hom, ref seen
        (0, 10, "C", 0, 0, 0, 0, "1", 5, "F"),   # score 0
        (1, 10, "G", 0, 0, 0, 0, "1", 5, "F"),   # pct 10 -> poss_error Y
        (5, 0, "T", 0, 0, 0, 1, "1", 5, "F"),    # read_depth 0 -> pct 0
    ]
    df = spark.createDataFrame(
        cases, ["ad", "rd", "ref", "a", "c", "g", "t", "chrom", "pos", "gender"]
    )
    cols = Z.indel_zygosity_columns(
        F.col("ad"), F.col("rd"), F.col("ref"),
        F.col("a"), F.col("c"), F.col("g"), F.col("t"),
        F.col("chrom"), F.col("pos"), F.col("gender"),
    )
    rows = df.select([v.alias(k) for k, v in cols.items()]).collect()

    r = rows[0]
    assert r["zygosity_status"] == "homozygous"
    assert r["zygosity_percent_read"] == 100
    assert r["zygosity_ref_allele"] is None
    assert r["zygosity_num_allele"] is None
    assert r["score"] == 100

    r = rows[1]
    assert r["zygosity_status"] == "possibly homozygous"
    assert r["zygosity_percent_read"] == 90
    assert r["zygosity_ref_allele"] == "Y"
    assert r["score"] == 90

    assert rows[2]["score"] == 0
    assert rows[3]["zygosity_poss_error"] == "Y"
    assert rows[4]["zygosity_percent_read"] == 0
    assert rows[4]["zygosity_ref_allele"] == "Y"  # count_t=1 > 0 for ref 'T'


@pytest.mark.parametrize(
    "chrom,pos,expected",
    [
        ("X", 1, True),
        ("X", 2_709_520, True),
        ("X", 2_709_521, False),
        ("X", 154_584_238, True),
        ("X", 154_913_754, True),
        ("X", 154_913_755, False),
        ("Y", 57_443_438, True),
        ("Y", 57_772_954, True),
        ("1", 100, False),
    ],
)
def test_in_par(spark, chrom, pos, expected):
    df = spark.createDataFrame([(chrom, pos)], ["c", "p"])
    got = df.select(Z.in_par(F.col("c"), F.col("p")).alias("o")).collect()[0]["o"]
    assert got == expected
