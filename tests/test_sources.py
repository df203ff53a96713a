"""Source-layer tests over tiny fixture files (FIXTURES.md shapes)."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from variant_load_pipeline_spark.sources import cf2, fasta, polyphen, snpeff, vcf, wiggle

CF2_LINES = [
    "#chr\tposition\tref nuc\tvar nuc\trsId\tA reads\tC reads\tG reads\tT reads\ttotal depth\thgvs name\trgd id\tallele depth\tallele count\tread depth\tpadding base",
    "1\t100\tA\tG\trs1\t10\t0\t5\t0\t15\t\t\t5\t2\t15\t",
    "X\t200\t\tTT\t\t0\t0\t0\t0\t\tNM_1\t42\t9\t1\t9\tC",
    "2\t300\tACG\t\trs2\t\t\t\t\t20\t\t\t20\t1\t20\tG",
]


def test_read_cf2(spark, tmp_path):
    p = tmp_path / "in.cf2"
    p.write_text("\n".join(CF2_LINES) + "\n")
    df = cf2.read_cf2(spark, str(p))
    rows = {r["position"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows[100]["chr"] == "1" and rows[100]["count_a"] == 10
    # empty ints -> 0; empty strings stay ''
    assert rows[200]["total_depth"] == 0
    assert rows[200]["ref_nuc"] == "" and rows[200]["padding_base"] == "C"
    assert rows[200]["rgd_id"] == 42
    assert rows[300]["count_a"] == 0 and rows[300]["allele_depth"] == 20


def test_cf2_gzip_roundtrip(spark, tmp_path):
    p = tmp_path / "in.cf2.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("\n".join(CF2_LINES) + "\n")
    assert cf2.read_cf2(spark, str(p)).count() == 3


VCF_LINES = [
    "##fileformat=VCFv4.1",
    "##source=test",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSTRAIN_A\tSTRAIN_B",
    "chr1\t100\trs10\tA\tG\t50\tPASS\tDP=30\tGT:AD:DP\t0/1:20,10:30\t0/0:30,0:30",
    "chr2\t200\t.\tC\tT,G\t99\tPASS\t.\tGT:AD:DP\t1/2:0,5,5:10\t./.:.:.",
]


def test_read_vcf_multisample(spark, tmp_path):
    p = tmp_path / "in.vcf"
    p.write_text("\n".join(VCF_LINES) + "\n")
    assert vcf.strain_names(str(p)) == ["STRAIN_A", "STRAIN_B"]
    df = vcf.read_vcf_multisample(spark, str(p))
    rows = df.collect()
    assert len(rows) == 4  # 2 lines x 2 strains
    a100 = [r for r in rows if r["strain"] == "STRAIN_A" and r["pos"] == 100][0]
    assert a100["sample_value"] == "0/1:20,10:30"
    assert a100["chrom"] == "chr1" and a100["ref"] == "A"

    # FORMAT indexing + field extraction
    parsed = df.select(
        "strain",
        "pos",
        vcf.sample_field(
            F.col("sample_value"), vcf.format_index(F.col("format"), "AD")
        ).alias("ad"),
        vcf.sample_field(
            F.col("sample_value"), vcf.format_index(F.col("format"), "GT")
        ).alias("gt"),
    ).collect()
    byk = {(r["strain"], r["pos"]): r for r in parsed}
    assert byk[("STRAIN_A", 100)]["ad"] == "20,10"
    assert byk[("STRAIN_B", 200)]["gt"] == "./."


def test_genotype_filter(spark, tmp_path):
    p = tmp_path / "in.vcf"
    p.write_text("\n".join(VCF_LINES) + "\n")
    df = vcf.read_vcf_multisample(spark, str(p))
    gt = vcf.sample_field(
        F.col("sample_value"), vcf.format_index(F.col("format"), "GT")
    )
    kept = df.filter(vcf.genotype_is_called(gt)).collect()
    # drops STRAIN_B 0/0 at pos 100 and ./. at pos 200
    assert {(r["strain"], r["pos"]) for r in kept} == {
        ("STRAIN_A", 100),
        ("STRAIN_A", 200),
    }


def test_read_vcf8col(spark, tmp_path):
    p = tmp_path / "in8.vcf"
    p.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "1\t64603\t.\tG\tA,T\t.\t.\tEND=64603;DP=16;AC=9,7\n"
    )
    df = vcf.read_vcf8col(spark, str(p))
    r = df.collect()[0]
    assert r["info_map"]["DP"] == "16"
    assert r["info_map"]["AC"] == "9,7"


FASTA_TEXT = """>chr1 assembly test
ACGTacgt
NNNNACGT
>2
TTTTCCCC
GG
"""


def test_read_fasta(spark, tmp_path):
    p = tmp_path / "ref.fa"
    p.write_text(FASTA_TEXT)
    out = {r["chromosome"]: r["seq"] for r in fasta.read_fasta(spark, str(p)).collect()}
    assert out == {"1": "ACGTACGTNNNNACGT", "2": "TTTTCCCCGG"}


def test_fasta_chunk_and_dna_chunk(spark, tmp_path):
    p = tmp_path / "ref.fa"
    p.write_text(FASTA_TEXT)
    f = fasta.read_fasta(spark, str(p))
    chunks = fasta.chunked_fasta(f, chunk_size=6).collect()
    c1 = sorted(
        [(r["bucket"], r["seq"]) for r in chunks if r["chromosome"] == "1"]
    )
    assert c1 == [(0, "ACGTAC"), (1, "GTNNNN"), (2, "ACGT")]
    # 1-based inclusive chunk (ChrFastaFile.getDnaChunk)
    got = f.filter(F.col("chromosome") == "1").select(
        fasta.dna_chunk(F.col("seq"), F.lit(5), F.lit(8)).alias("x")
    ).collect()[0]["x"]
    assert got == "ACGT"


def test_write_fasta_wrap(spark, tmp_path):
    df = spark.createDataFrame([("NP_1", "A" * 150)], ["acc_id", "seq"])
    out_dir = tmp_path / "out_fa"
    fasta.write_fasta(df, str(out_dir))
    text = "\n".join(
        r["value"] for r in spark.read.text(str(out_dir)).collect()
    )
    lines = text.splitlines()
    assert lines[0] == ">NP_1"
    assert lines[1] == "A" * 70 and lines[2] == "A" * 70 and lines[3] == "A" * 10


WIGGLE_TEXT = """fixedStep chrom=chr1 start=3462 step=1
0.5
0.75
1.0
fixedStep chrom=chr1 start=9000 step=5
0.1
0.2
fixedStep chrom=chr1_random start=10 step=1
9.9
fixedStep chrom=chrX start=77 step=1
0.3
"""


def test_read_wiggle(spark, tmp_path):
    p = tmp_path / "cons.wig"
    p.write_text(WIGGLE_TEXT)
    rows = sorted(
        [
            (r["chr"], r["position"], r["score"])
            for r in wiggle.read_wiggle(spark, str(p)).collect()
        ]
    )
    assert rows == [
        ("1", 3462, 0.5),
        ("1", 3463, 0.75),
        ("1", 3464, 1.0),
        ("1", 9000, 0.1),
        ("1", 9005, 0.2),  # step=5
        ("X", 77, 0.3),
    ]  # chr1_random skipped (len>2)


SNPEFF_LINES = [
    "##fileformat=VCFv4.1",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    "1\t100\t.\tA\tG\t.\t.\tDP=5;ANN=G|missense_variant|MODERATE|Gene1|G1|transcript|T1|protein_coding|1/3|c.1A>G|p.M1V|1|1|1||;XX=1",
    "2\t200\t.\tC\tT\t.\t.\tANN=T|syn|LOW|Gene2|G2|transcript|T2|coding|||||||,T|stop_gained|HIGH|Gene2|G2|transcript|T3|coding|||||||",
]


def test_read_snpeff(spark, tmp_path):
    p = tmp_path / "se.vcf"
    p.write_text("\n".join(SNPEFF_LINES) + "\n")
    df = snpeff.read_snpeff_vcf(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3  # 1 + 2 annotations
    r0 = [r for r in rows if r["pos"] == 100][0]
    assert r0["effect"] == "missense_variant" and r0["impact"] == "MODERATE"
    assert r0["gene_symbol"] == "Gene1" and r0["hgvs_p"] == "p.M1V"
    assert r0["errors"] is None  # empty -> NULL
    effects = {r["feature_id"] for r in rows if r["pos"] == 200}
    assert effects == {"T2", "T3"}


def test_snpeff_match_variants(spark, tmp_path):
    p = tmp_path / "se.vcf"
    p.write_text("\n".join(SNPEFF_LINES) + "\n")
    se = snpeff.read_snpeff_vcf(spark, str(p))
    variants = spark.createDataFrame(
        [(11, "1", 100, "A", "G"), (12, "1", 100, "A", "T"), (13, "2", 200, "C", "T")],
        ["rgd_id", "chromosome", "start_pos", "ref_nuc", "var_nuc"],
    )
    out = snpeff.match_variants(se, variants).collect()
    assert {(r["variant_id"], r["feature_id"]) for r in out} == {
        (11, "T1"),
        (13, "T2"),
        (13, "T3"),
    }


def _pp_result_line(acc="NP_1", opos="7", oaa1="D", oaa2="N", aa1="D", aa2="N",
                    pred="benign"):
    cols = [""] * 55
    cols[0], cols[1], cols[2], cols[3] = acc, opos, oaa1, oaa2
    cols[5] = "Q4TU74"
    cols[6], cols[7], cols[8] = opos, aa1, aa2
    cols[11] = pred
    cols[14], cols[15] = "neutral", "0.001"
    return "\t".join(cols)


def test_polyphen_results_and_pairing(spark, tmp_path):
    rp = tmp_path / "res.tsv"
    rp.write_text(
        "#header\n"
        + _pp_result_line()                       # ok row
        + "\n"
        + _pp_result_line(oaa1="N", oaa2="D")     # swapped -> rejected
        + "\n"
        + _pp_result_line(pred="damaging")        # duplicate 4-key, ok
        + "\n"
    )
    ip = tmp_path / "res.info"
    ip.write_text(
        "101\tGeneA\tNP_1\t7\tD\tN\t+\t555\n"
        "102\tGeneA\tNP_1\t7\tD\tN\t-\t556\n"
    )
    res = polyphen.read_polyphen_results(spark, str(rp))
    assert res.count() == 2  # swapped row rejected
    info = polyphen.read_polyphen_info(spark, str(ip))
    paired = polyphen.pair_results_with_info(res, info).collect()
    assert len(paired) == 2
    # consume-first-match: first result (benign) -> variant 101, second -> 102
    by_pred = {r["prediction"]: r["variant_id"] for r in paired}
    assert by_pred == {"benign": 101, "damaging": 102}
    assert all(r["protein_status"] == "100 PERC MATCH" for r in paired)


def test_cf2_gzip_transparent(spark, tmp_path):
    """S1: gzip-compressed CF2 reads identically to plain text
    (VariantLoad3.java:193-198 gzip branch)."""
    import gzip as _gzip

    from variant_load_pipeline_spark.sources import cf2 as cf2_src

    line = "\t".join(
        ["1", "100", "A", "G", "rs1", "20", "0", "0", "10", "30",
         "hgvs1", "8650299", "10", "1", "30", ""]
    )
    plain = tmp_path / "v.cf2"
    plain.write_text(line + "\n")
    gz = tmp_path / "v.cf2.gz"
    with _gzip.open(gz, "wt") as fh:
        fh.write(line + "\n")
    a = cf2_src.read_cf2(spark, str(plain)).collect()
    b = cf2_src.read_cf2(spark, str(gz)).collect()
    assert a == b and len(a) == 1


def test_tar_shard_scan_and_sample_grouping(spark, tmp_path):
    import io
    import tarfile

    from pyspark.sql import functions as F

    from variant_load_pipeline_spark.sources.tarshard import (
        group_samples,
        read_tar_shards,
    )

    def add(tf, name, data):
        info = tarfile.TarInfo(name=name)
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))

    p1 = str(tmp_path / "w-0.tar")
    with tarfile.open(p1, "w") as tf:
        d = tarfile.TarInfo(name="subdir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)  # dir entry: skipped
        add(tf, "007.txt", b"hello world")
        add(tf, "007.seg.png", b"\x89PNGfake")  # multi-dot extension
        add(tf, "008.txt", b"")
    # a gzip-compressed shard must read transparently (tarfile auto-detect)
    p2 = str(tmp_path / "w-1.tar.gz")
    with tarfile.open(p2, "w:gz") as tf:
        add(tf, "009.txt", b"third shard doc")
        add(tf, "009.cls", b"3")

    m = read_tar_shards(spark, str(tmp_path / "w-*")).collect()
    got = {(r["shard"], r["member"]): (r["size"], bytes(r["payload"])) for r in m}
    assert got[("w-0.tar", "007.txt")] == (11, b"hello world")
    assert got[("w-0.tar", "008.txt")] == (0, b"")
    assert got[("w-1.tar.gz", "009.cls")] == (1, b"3")
    assert len(got) == 5  # dir entry dropped

    s = group_samples(read_tar_shards(spark, str(tmp_path / "w-*")))
    rows = {r["key"]: r for r in s.collect()}
    assert rows["007"]["n_parts"] == 2
    assert bytes(rows["007"]["parts"]["seg.png"]) == b"\x89PNGfake"
    assert rows["009"]["n_parts"] == 2
    assert bytes(rows["009"]["parts"]["txt"]) == b"third shard doc"
    assert rows["008"]["n_parts"] == 1


def test_jsonl_source_modes(spark, tmp_path):
    import gzip

    from py4j.protocol import Py4JJavaError

    from variant_load_pipeline_spark.sources.jsonl import read_jsonl

    lines = [
        '{"id": 1, "t": "alpha"}',
        '{"id": 2, "t": "beta"',          # malformed: unclosed object
        '{"id": 3, "t": "gamma", "extra": 9}',  # extra field ignored
        'not json at all',
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")

    # PERMISSIVE: malformed lines surface in the corrupt channel
    df = read_jsonl(spark, str(p), "id long, t string")
    rows = sorted(
        df.select("id", "t", "_corrupt_record").collect(),
        key=lambda r: (r["id"] is None, r["id"] or 0, r["_corrupt_record"] or ""),
    )
    assert [(r["id"], r["t"]) for r in rows[:2]] == [(1, "alpha"), (3, "gamma")]
    corrupt_raws = {rows[2]["_corrupt_record"], rows[3]["_corrupt_record"]}
    assert rows[2]["id"] is None and rows[3]["id"] is None
    assert corrupt_raws == {lines[1], "not json at all"}

    # DROPMALFORMED: only clean rows remain, no corrupt column
    dropped = read_jsonl(spark, str(p), "id long, t string", mode="DROPMALFORMED")
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3]
    assert "_corrupt_record" not in dropped.columns

    # FAILFAST: raises on the first malformed line
    try:
        read_jsonl(spark, str(p), "id long, t string", mode="FAILFAST").collect()
        raise AssertionError("FAILFAST should have raised")
    except Py4JJavaError:
        pass

    # gzip transparency — same parse through .jsonl.gz
    pg = tmp_path / "docs2.jsonl.gz"
    with gzip.open(pg, "wt") as fh:
        fh.write('{"id": 7, "t": "zeta"}\n')
    got = read_jsonl(spark, str(pg), "id long, t string").collect()
    assert [(r["id"], r["t"]) for r in got] == [(7, "zeta")]
