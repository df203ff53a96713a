"""Unit tests for functions/scalar.py against the reference semantics
(VariantLoad3.java, CommonFormat2Line.java, VcfToCommonFormat2Base.java)."""

from __future__ import annotations

from pyspark.sql import functions as F

from variant_load_pipeline_spark.functions import scalar


def _one(spark, col, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(col.alias("out")).collect()[0]["out"]


def test_variant_type(spark):
    rows = [
        ("", "A", "insertion"),
        (None, "A", "insertion"),
        ("A", "", "deletion"),
        ("A", None, "deletion"),
        ("A", "G", "snv"),
        ("AC", "GT", "snv"),
    ]
    df = spark.createDataFrame([(r, v) for r, v, _ in rows], ["r", "v"])
    got = [
        x["t"]
        for x in df.select(
            scalar.variant_type(F.col("r"), F.col("v")).alias("t")
        ).collect()
    ]
    assert got == [e for _, _, e in rows]


def test_variant_type_dashed(spark):
    rows = [
        ("-", "A", "ins"),
        ("A", "-", "del"),
        ("A", "AT", "ins"),
        ("AT", "A", "del"),
        ("A", "G", "snv"),
    ]
    df = spark.createDataFrame([(r, v) for r, v, _ in rows], ["r", "v"])
    got = [
        x["t"]
        for x in df.select(
            scalar.variant_type_dashed(F.col("r"), F.col("v")).alias("t")
        ).collect()
    ]
    assert got == [e for _, _, e in rows]


def test_end_pos(spark):
    # snv: start+1; insertion: start; deletion: start+len(ref)
    rows = [
        (100, "A", "snv", 101),
        (100, "", "insertion", 100),
        (100, "ACG", "deletion", 103),
    ]
    df = spark.createDataFrame([(p, r, t) for p, r, t, _ in rows], ["p", "r", "t"])
    got = [
        x["e"]
        for x in df.select(
            scalar.end_pos(F.col("p"), F.col("r"), F.col("t")).alias("e")
        ).collect()
    ]
    assert got == [e for *_, e in rows]


def test_quality_score_java_int_division(spark):
    # (100*rd + td/2) / td with Java int division (VariantLoad3.java:270-274)
    cases = [(63, 533), (1, 3), (2, 3), (0, 10), (10, 0), (7, 7), (5, 9)]
    exp = [
        (100 * rd + td // 2) // td if td > 0 else 0 for rd, td in cases
    ]
    df = spark.createDataFrame(cases, ["rd", "td"])
    got = [
        x["q"]
        for x in df.select(
            scalar.quality_score(F.col("rd"), F.col("td")).alias("q")
        ).collect()
    ]
    assert got == exp


def test_total_depth_default(spark):
    # empty DP -> snv: A+C+G+T; indel: read_depth
    df = spark.createDataFrame(
        [
            (0, "snv", 1, 2, 3, 4, 99),
            (None, "snv", 1, 2, 3, 4, 99),
            (0, "insertion", 1, 2, 3, 4, 99),
            (55, "snv", 1, 2, 3, 4, 99),
        ],
        ["dp", "t", "a", "c", "g", "tt", "rd"],
    )
    got = [
        x["o"]
        for x in df.select(
            scalar.total_depth_default(
                F.col("dp"), F.col("t"), F.col("a"), F.col("c"),
                F.col("g"), F.col("tt"), F.col("rd"),
            ).alias("o")
        ).collect()
    ]
    assert got == [10, 10, 99, 55]


def test_indel_padding_adjust(spark):
    # VCF left-anchored -> CF2 stripped (CommonFormat2Line.java:54-90)
    df = spark.createDataFrame(
        [
            (100, "A", "AT"),   # insertion: ref='' var='T' pos=101 pad='A'
            (100, "AT", "A"),   # deletion:  ref='T' var='' pos=101 pad='A'
            (100, "A", "G"),    # snv unchanged
            (100, "AC", "GT"),  # block sub unchanged
        ],
        ["pos", "ref", "var"],
    )
    adj = scalar.indel_padding_adjust(F.col("pos"), F.col("ref"), F.col("var"))
    rows = df.select(
        adj["position"].alias("p"),
        adj["ref_nuc"].alias("r"),
        adj["var_nuc"].alias("v"),
        adj["padding_base"].alias("pb"),
    ).collect()
    assert [tuple(r) for r in rows] == [
        (101, "", "T", "A"),
        (101, "T", "", "A"),
        (100, "A", "G", None),
        (100, "AC", "GT", None),
    ]


def test_allele_count_and_reads(spark):
    df = spark.createDataFrame(
        [("A,G", [470, 63, 10], ["C", "A", "G"], "G")],
        ["alt", "ad", "alleles", "allele"],
    )
    assert _first(df, scalar.allele_count(F.col("alt"))) == 2
    assert (
        _first(
            df,
            scalar.allele_read_count(
                F.col("ad"), F.col("alleles"), F.col("allele")
            ),
        )
        == 10
    )
    # absent allele -> 0
    assert (
        _first(
            df,
            scalar.allele_read_count(F.col("ad"), F.col("alleles"), F.lit("T")),
        )
        == 0
    )


def _first(df, col):
    return df.select(col.alias("x")).collect()[0]["x"]


def test_reverse_complement(spark):
    df = spark.createDataFrame([("ACGTN-",), ("acgt",)], ["s"])
    got = [
        x["o"]
        for x in df.select(scalar.reverse_complement(F.col("s")).alias("o")).collect()
    ]
    assert got == ["-NACGT", "ACGT"]


def test_is_valid_nuc(spark):
    df = spark.createDataFrame(
        [("ACGTN",), ("ACGU",), ("",), ("A-C",)], ["s"]
    )
    got = [
        x["o"]
        for x in df.select(scalar.is_valid_nuc(F.col("s")).alias("o")).collect()
    ]
    assert got == [True, False, True, True]


def test_syn_status(spark):
    df = spark.createDataFrame(
        [("K", "K"), ("K", "R"), ("X", "K"), ("K", "X")], ["r", "v"]
    )
    got = [
        x["o"]
        for x in df.select(
            scalar.syn_status(F.col("r"), F.col("v")).alias("o")
        ).collect()
    ]
    assert got == ["synonymous", "nonsynonymous", "unassignable", "unassignable"]


def test_frameshift(spark):
    df = spark.createDataFrame(
        [("A", ""), ("ACG", ""), ("-", "AT"), ("A", "G"), ("ACGT", "A")],
        ["r", "v"],
    )
    got = [
        x["o"]
        for x in df.select(scalar.frameshift(F.col("r"), F.col("v")).alias("o")).collect()
    ]
    # len diffs: 1, 3, 2, 0, 3 -> T, F, T, F, F
    assert got == ["T", "F", "T", "F", "F"]


def test_iupac(spark):
    df = spark.createDataFrame([("R",), ("N",), ("Z",), ("a",)], ["c"])
    got = [
        x["o"] for x in df.select(scalar.iupac_expand(F.col("c")).alias("o")).collect()
    ]
    assert got == ["AG", "ATCG", "Unknown", "A"]


def test_parse_rgd_id_field(spark):
    df = spark.createDataFrame(
        [
            ("RGDID:8650299;NM_12345",),
            ("rs123",),
            ("RGDID:7;",),
            # no semicolon: the reference logs "missing semicolon" and
            # leaves BOTH fields null (VcfToCommonFormat2Converter.java:
            # 207-217)
            ("RGDID:42",),
            # hgvs carries everything after the FIRST semicolon
            ("RGDID:5;NM_1(X);c.1A>G",),
        ],
        ["i"],
    )
    p = scalar.parse_rgd_id_field(F.col("i"))
    rows = df.select(p["rgd_id"].alias("r"), p["hgvs_name"].alias("h")).collect()
    assert [tuple(r) for r in rows] == [
        (8650299, "NM_12345"),
        (None, None),
        (7, ""),
        (None, None),
        (5, "NM_1(X);c.1A>G"),
    ]


def test_clean_position(spark):
    df = spark.createDataFrame([("1,079",), ("123",)], ["p"])
    got = [x["o"] for x in df.select(scalar.clean_position(F.col("p")).alias("o")).collect()]
    assert got == [1079, 123]


def test_normalize_chromosome(spark):
    # Java replace-all 'chr' then 'c'; invalid if len>2 | contains 'r' | =='Un'
    cases = [
        ("chr5", "5"),
        ("c12", "12"),
        ("M", "MT"),
        ("chrM", "MT"),
        ("Un", None),
        ("1_random", None),
        ("X", "X"),
        ("20", "20"),
        ("chrUn", None),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], ["c"])
    got = [
        x["o"]
        for x in df.select(
            scalar.normalize_chromosome(F.col("c")).alias("o")
        ).collect()
    ]
    assert got == [e for _, e in cases]


def test_protein_flanks(spark):
    df = spark.createDataFrame([("MKLV*", 3)], ["seq", "pos"])
    p = scalar.protein_flanks(F.col("seq"), F.col("pos"))
    r = df.select(p["left_flank"].alias("l"), p["right_flank"].alias("r")).collect()[0]
    assert (r["l"], r["r"]) == ("MK", "V")


def test_parse_hgvs_change(spark):
    df = spark.createDataFrame(
        [("c.749C>T",), ("delCT",), ("dupA",), ("insT",)], ["h"]
    )
    p = scalar.parse_hgvs_change(F.col("h"))
    rows = df.select(p["ref_nuc"].alias("r"), p["var_nuc"].alias("v")).collect()
    assert [tuple(r) for r in rows] == [
        ("C", "T"),
        ("CT", ""),
        ("", "AA"),
        ("", "T"),
    ]
