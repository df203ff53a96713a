"""Zygosity suite (SURVEY.md §2.3 C10/C11) as pure Spark column expressions.

Semantics recovered from the decompiled ``edu.mcw.rgd.util.Zygosity`` class in
/root/reference/lib/rgdcore_1.1.3.jar (bytecode-verified):

* constants (static init): HOMOZYGOUS_PERCENT=100, POSSIBLY_HOMOZYGOUS_PERCENT=85,
  PROBABLY_HEMIZYGOUSE_PERCENT=85, POSSIBLE_ERROR_PERCENT=15;
  TRUE='Y', FALSE='N'; status strings are lowercase.
* SNV path ``computeVariant``: total = float(A+C+G+T); per-base pct =
  100*cnt/total in **float32**; the variant allele's pct drives status;
  score (drop-if-0) = read count of the variant base.
* ``computeZygosity``: num_allele = count of bases with pct>0;
  ref_allele = 'Y' iff ref base in ACGT and its pct>0 (else 'N');
  percent_read = (int)(pct_var + 0.5f) — truncation, not round-half-even.
* ``computeZygosityStatusPseudoError``: gender in (M,P) and chr in (X,Y):
  in PAR → normal statuses + in_pseudo='Y'; outside PAR → ==100 'hemizygous',
  >=85 'probably hemizygous', else 'possibly hemizygous', in_pseudo='N'.
  Otherwise normal: ==100 'homozygous', >=85 'possibly homozygous', else
  'heterozygous', in_pseudo='N'.  poss_error='Y' iff pct<=15.
  Threshold compares use the FLOAT pct, not the rounded int.
* indel path ``computeZygosityStatus(alleleDepth, readDepth, ...)``:
  pct = readDepth==0 ? 0 : 100*alleleDepth/readDepth (float32);
  ref_allele/num_allele handled by the caller (VariantLoad3.java:320-342).

PAR intervals from decompiled ``PseudoAutosomalRegion.buildPAR`` — build 36:
X 1..2709520, X 154584238..154913754, Y 1..2709520, Y 57443438..57772954;
build 37: X 60001..2699520, X 154931044..155260560, Y 10001..2649520,
Y 59034050..59363566.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HOMOZYGOUS_PERCENT = 100
POSSIBLY_HOMOZYGOUS_PERCENT = 85
PROBABLY_HEMIZYGOUS_PERCENT = 85
POSSIBLE_ERROR_PERCENT = 15

# (chromosome, start, stop) inclusive — decompiled PseudoAutosomalRegion
PAR_INTERVALS: dict[str, list[tuple[str, int, int]]] = {
    "36": [
        ("X", 1, 2_709_520),
        ("X", 154_584_238, 154_913_754),
        ("Y", 1, 2_709_520),
        ("Y", 57_443_438, 57_772_954),
    ],
    "37": [
        ("X", 60_001, 2_699_520),
        ("X", 154_931_044, 155_260_560),
        ("Y", 10_001, 2_649_520),
        ("Y", 59_034_050, 59_363_566),
    ],
}


def _f32(c: Column) -> Column:
    return c.cast("float")


def in_par(chromosome: Column, pos: Column, build: str = "36") -> Column:
    """True iff (chromosome, pos) falls in a pseudo-autosomal region
    (inclusive bounds), per the decompiled ``PseudoAutosomalRegion.inPAR``."""
    cond = F.lit(False)
    for chrom, start, stop in PAR_INTERVALS[build]:
        cond = cond | (
            (chromosome == chrom) & (pos >= F.lit(start)) & (pos <= F.lit(stop))
        )
    return cond


def percent_read(pct: Column) -> Column:
    """Java ``(int)(pct + 0.5f)`` — floor of pct+0.5 for non-negative pct."""
    return F.floor(_f32(pct) + F.lit(0.5).cast("float")).cast("int")


def zygosity_status(
    pct: Column, chromosome: Column, gender: Column, pos: Column, build: str = "36"
) -> Column:
    """Full status chain incl. hemizygous branch (computeZygosityStatusPseudoError)."""
    sexed = gender.isin("M", "P") & chromosome.isin("X", "Y")
    par = in_par(chromosome, pos, build)
    normal = (
        F.when(pct == F.lit(float(HOMOZYGOUS_PERCENT)), F.lit("homozygous"))
        .when(pct >= F.lit(float(POSSIBLY_HOMOZYGOUS_PERCENT)), F.lit("possibly homozygous"))
        .otherwise(F.lit("heterozygous"))
    )
    hemi = (
        F.when(pct == F.lit(float(HOMOZYGOUS_PERCENT)), F.lit("hemizygous"))
        .when(pct >= F.lit(float(PROBABLY_HEMIZYGOUS_PERCENT)), F.lit("probably hemizygous"))
        .otherwise(F.lit("possibly hemizygous"))
    )
    return F.when(sexed & ~par, hemi).otherwise(normal)


def zygosity_in_pseudo(
    chromosome: Column, gender: Column, pos: Column, build: str = "36"
) -> Column:
    sexed = gender.isin("M", "P") & chromosome.isin("X", "Y")
    return F.when(sexed & in_par(chromosome, pos, build), F.lit("Y")).otherwise(
        F.lit("N")
    )


def zygosity_poss_error(pct: Column) -> Column:
    """'Y' iff pct <= 15 (float compare)."""
    return F.when(pct <= F.lit(float(POSSIBLE_ERROR_PERCENT)), F.lit("Y")).otherwise(
        F.lit("N")
    )


def snv_zygosity_columns(
    count_a: Column,
    count_c: Column,
    count_g: Column,
    count_t: Column,
    ref_nuc: Column,
    var_nuc: Column,
    chromosome: Column,
    pos: Column,
    gender: Column,
    build: str = "36",
) -> dict[str, Column]:
    """All six zygosity output columns for the SNV path, plus ``score``
    (the variant base's read count; row dropped when 0 — VariantLoad3.java:338-346).
    """
    a = F.coalesce(count_a, F.lit(0))
    c = F.coalesce(count_c, F.lit(0))
    g = F.coalesce(count_g, F.lit(0))
    t = F.coalesce(count_t, F.lit(0))
    total = _f32(a + c + g + t)

    def pct_of(cnt: Column) -> Column:
        return _f32(_f32(cnt * 100) / total)

    pct_a, pct_c, pct_g, pct_t = pct_of(a), pct_of(c), pct_of(g), pct_of(t)
    var_cnt = (
        F.when(var_nuc == "A", a)
        .when(var_nuc == "C", c)
        .when(var_nuc == "G", g)
        .when(var_nuc == "T", t)
        .otherwise(F.lit(0))
    )
    pct_var = (
        F.when(var_nuc == "A", pct_a)
        .when(var_nuc == "C", pct_c)
        .when(var_nuc == "G", pct_g)
        .when(var_nuc == "T", pct_t)
        .otherwise(F.lit(0.0).cast("float"))
    )
    num_allele = (
        F.when(pct_a > 0, 1).otherwise(0)
        + F.when(pct_c > 0, 1).otherwise(0)
        + F.when(pct_g > 0, 1).otherwise(0)
        + F.when(pct_t > 0, 1).otherwise(0)
    )
    ref_pct = (
        F.when(ref_nuc == "A", pct_a)
        .when(ref_nuc == "C", pct_c)
        .when(ref_nuc == "G", pct_g)
        .when(ref_nuc == "T", pct_t)
        .otherwise(F.lit(0.0).cast("float"))
    )
    return {
        "zygosity_status": zygosity_status(pct_var, chromosome, gender, pos, build),
        "zygosity_percent_read": percent_read(pct_var),
        "zygosity_poss_error": zygosity_poss_error(pct_var),
        "zygosity_ref_allele": F.when(ref_pct > 0, F.lit("Y")).otherwise(F.lit("N")),
        "zygosity_num_allele": num_allele,
        "zygosity_in_pseudo": zygosity_in_pseudo(chromosome, gender, pos, build),
        "score": var_cnt,
    }


def indel_zygosity_columns(
    allele_depth: Column,
    read_depth: Column,
    ref_nuc: Column,
    count_a: Column,
    count_c: Column,
    count_g: Column,
    count_t: Column,
    chromosome: Column,
    pos: Column,
    gender: Column,
    build: str = "36",
) -> dict[str, Column]:
    """Indel path: pct from AD/readDepth; ref_allele from the ACGT count of a
    single-base ref (NULL otherwise); num_allele not set (NULL).
    Score = 0 when allele_depth==0, else percent_read (VariantLoad3.java:338-346).
    """
    ad = F.coalesce(allele_depth, F.lit(0))
    rd = F.coalesce(read_depth, F.lit(0))
    pct = F.when(rd == 0, F.lit(0.0).cast("float")).otherwise(
        _f32(_f32(ad) * F.lit(100.0).cast("float") / _f32(rd))
    )
    ref_cnt = (
        F.when(ref_nuc == "A", count_a)
        .when(ref_nuc == "C", count_c)
        .when(ref_nuc == "G", count_g)
        .when(ref_nuc == "T", count_t)
        .otherwise(F.lit(None).cast("int"))
    )
    pr = percent_read(pct)
    return {
        "zygosity_status": zygosity_status(pct, chromosome, gender, pos, build),
        "zygosity_percent_read": pr,
        "zygosity_poss_error": zygosity_poss_error(pct),
        "zygosity_ref_allele": F.when(ref_cnt.isNull(), F.lit(None).cast("string"))
        .when(ref_cnt > 0, F.lit("Y"))
        .otherwise(F.lit("N")),
        "zygosity_num_allele": F.lit(None).cast("int"),
        "zygosity_in_pseudo": zygosity_in_pseudo(chromosome, gender, pos, build),
        "score": F.when(ad == 0, F.lit(0)).otherwise(pr),
    }
