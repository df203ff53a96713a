"""Codon translation tests: expression path vs pure-Python kernel vs known
genetic-code facts, exhaustively over {A,C,G,T,N}^3."""

from __future__ import annotations

from itertools import product

from pyspark.sql import functions as F

from variant_load_pipeline_spark.functions.translate import (
    translate_dna,
    translate_dna_py,
)

KNOWN = {
    "ATG": "M",
    "TAA": "*",
    "TAG": "*",
    "TGA": "*",
    "TGG": "W",
    "TTT": "F",
    "GCN": "A",   # 3rd base never inspected for GC*
    "CCN": "P",
    "ACN": "T",   # the A-quarter c2=='C' family also skips the 3rd base
    "ACA": "T",
    "GTN": "V",
    "CGN": "R",
    "CTN": "L",
    "GGN": "G",
    "TCN": "S",
    "AAN": "X",   # 3rd base inspected -> unknown
    "NNN": "X",
    "NAA": "X",
    "ANA": "X",
}


def test_known_codons_python():
    for codon, aa in KNOWN.items():
        assert translate_dna_py(codon) == aa, codon


def test_lowercase_and_truncation():
    assert translate_dna_py("atgtaa") == "M*"
    assert translate_dna_py("ATGTA") == "M"  # partial trailing codon ignored
    assert translate_dna_py("") == ""


def test_expression_matches_python_exhaustive(spark):
    codons = ["".join(p) for p in product("ACGTN", repeat=3)]
    # also multi-codon strings and lowercase
    extra = ["ATGTAA", "atgccctga", "NNNATG", "ATGN", ""]
    data = [(c,) for c in codons + extra]
    df = spark.createDataFrame(data, ["dna"])
    rows = df.select("dna", translate_dna(F.col("dna")).alias("aa")).collect()
    for r in rows:
        assert r["aa"] == translate_dna_py(r["dna"]), r["dna"]


def test_jvm_expression_equals_python_kernel(spark):
    """The JVM CASE-expression translate (query path) and the python
    translate (applyInPandas CDS kernel) share one codon table — prove the
    two code paths cannot diverge on random DNA incl. N and trailing bases."""
    import random

    from pyspark.sql import functions as F

    from variant_load_pipeline_spark.functions.translate import (
        translate_dna,
        translate_dna_py,
    )

    rng = random.Random(99)
    seqs = [
        "".join(rng.choice("ACGTN") for _ in range(rng.randrange(0, 60)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in seqs], ["dna"])
    got = {
        r["dna"]: r["protein"]
        for r in df.select(
            "dna", translate_dna(F.col("dna")).alias("protein")
        ).collect()
    }
    for s in seqs:
        assert got[s] == translate_dna_py(s), s
