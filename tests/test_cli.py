"""CLI tool-parity tests: each subcommand runs end-to-end on tiny fixtures."""

from __future__ import annotations

import gzip
import glob

from pyspark.sql import functions as F

from variant_load_pipeline_spark.cli import main

VCF = """##fileformat=VCFv4.2
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tBN\tSHR
chr1\t100\trs1\tA\tG\t50\tPASS\t.\tGT:AD:DP\t0/1:10,5:15\t1/1:0,9:9
chr2\t200\trs2\tC\tT\t50\tPASS\t.\tGT:AD:DP\t./.:.:.\t0/1:3,4:7
"""

WIG = """fixedStep chrom=chr1 start=100 step=2
0.5
0.75
fixedStep chrom=chr2 start=50 step=1
1.0
"""


def test_cli_vcf_converter2(spark, tmp_path):
    vcf = tmp_path / "in.vcf"
    vcf.write_text(VCF)
    out = str(tmp_path / "cf2")
    main(["--tool", "VcfConverter2", "--vcf", str(vcf), "--out", out], spark)
    files = glob.glob(f"{out}/strain=*/*.csv")
    assert files, "expected per-strain partitioned CF2 output"
    strains = {p.split("strain=")[1].split("/")[0] for p in files}
    assert strains == {"BN", "SHR"}


def test_cli_clinvar2vcf_sorted_export(spark, tmp_path):
    src = tmp_path / "variants"
    spark.createDataFrame(
        [
            ("2", 5, "RSb", "C", "T", 9),
            ("1", 300, "rsA", "A", "G", 7),
            ("1", 20, "rsC", "G", "A", 3),
        ],
        "chromosome string, position int, id string, ref string, "
        "alt string, depth int",
    ).write.parquet(str(src))
    out = str(tmp_path / "out_vcf")
    main(["--tool", "ClinVar2Vcf", "--variants", str(src), "--out", out], spark)
    [part] = glob.glob(f"{out}/part-*.txt")
    lines = open(part).read().splitlines()
    assert lines[0].startswith("##fileformat")
    assert lines[2].startswith("#CHROM")
    data = lines[3:]
    assert [l.split("\t")[1] for l in data] == ["20", "300", "5"]
    assert data[0].endswith("DP=3")


def test_cli_conservation_loader(spark, tmp_path):
    wig = tmp_path / "scores.wig"
    wig.write_text(WIG)
    out = str(tmp_path / "cons")
    main(
        ["--tool", "ConservationScoreLoader", "--wiggle", str(wig), "--out", out],
        spark,
    )
    rows = {
        (r["chr"], r["position"]): r["score"]
        for r in spark.read.parquet(out).collect()
    }
    assert rows[("1", 100)] == 0.5
    assert rows[("1", 102)] == 0.75
    assert rows[("2", 50)] == 1.0


def test_cli_variant_type_fixup(spark, tmp_path):
    src = tmp_path / "variants"
    spark.createDataFrame(
        [
            ("A", "G", "snv"),          # up to date
            ("", "GT", "snv"),          # wrong: should be insertion
            ("AC", "", "deletion"),     # up to date
        ],
        "ref_nuc string, var_nuc string, variant_type string",
    ).write.parquet(str(src))
    out = str(tmp_path / "report")
    main(
        ["--tool", "VariantTypeFixUp", "--variants", str(src), "--out", out],
        spark,
    )
    got = {r["status"]: r["n"] for r in spark.read.parquet(out).collect()}
    assert got == {"up_to_date": 2, "fixed": 1}
