"""DNA -> protein translation (SURVEY.md §2.3 C13).

Parity: VariantPostProcessing.java:695-837 — standard genetic code, '*' for
stops, 'X' for any codon containing a non-ACGT char EXCEPT the families where
the third base is never inspected (CC*, CG*, CT*, GC*, GG*, GT*, TC* — e.g.
'CCN' is still 'P').  Input is upper-cased per char; only full triplets are
processed (callers truncate to a multiple of 3 first — the triplet-error path,
VariantPostProcessing.java:520-542).

Two implementations that must agree (tested exhaustively over {A,C,G,T,N}^3):

* ``translate_dna`` — Spark Column expression: stays JVM-side (whole-stage
  codegen) via a codon->AA map literal + ``transform`` over triplet offsets.
  This is the hot path for bulk translation at scale: no Python, no Arrow.
* ``translate_dna_py`` — pure-Python kernel used inside the applyInPandas CDS
  assembler (plans/postprocess.py) where translation happens per-group anyway.
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import Column
from pyspark.sql import functions as F

# codon families where the 3rd base is never inspected
_TWO_BASE: dict[str, str] = {
    "CC": "P",
    "CG": "R",
    "CT": "L",
    "GC": "A",
    "GG": "G",
    "GT": "V",
    "AC": "T",
    "TC": "S",
}

# full-codon table for the rest (3rd base inspected; non-ACGT 3rd -> X)
_THREE_BASE: dict[str, str] = {}
for c3 in "TC":
    _THREE_BASE["CA" + c3] = "H"
    _THREE_BASE["GA" + c3] = "D"
    _THREE_BASE["AA" + c3] = "N"
    _THREE_BASE["AG" + c3] = "S"
    _THREE_BASE["TA" + c3] = "Y"
    _THREE_BASE["TG" + c3] = "C"
    _THREE_BASE["TT" + c3] = "F"
for c3 in "AG":
    _THREE_BASE["CA" + c3] = "Q"
    _THREE_BASE["GA" + c3] = "E"
    _THREE_BASE["AA" + c3] = "K"
    _THREE_BASE["AG" + c3] = "R"
    _THREE_BASE["TA" + c3] = "*"
    _THREE_BASE["TT" + c3] = "L"
for c3 in "TCA":
    _THREE_BASE["AT" + c3] = "I"
_THREE_BASE["ATG"] = "M"
_THREE_BASE["TGA"] = "*"
_THREE_BASE["TGG"] = "W"


def translate_codon_py(codon: str) -> str:
    """Translate one 3-char codon exactly like the reference's switch tree."""
    c = codon.upper()
    aa = _TWO_BASE.get(c[:2])
    if aa is not None:
        return aa
    return _THREE_BASE.get(c, "X")


def translate_dna_py(dna: str) -> str:
    """Translate full triplets of ``dna``; trailing partial codon ignored."""
    n = len(dna) - len(dna) % 3
    return "".join(translate_codon_py(dna[i : i + 3]) for i in range(0, n, 3))


def _codon_map_literal() -> Column:
    """MapType literal codon->AA covering {A,C,G,T}^3 (64 entries)."""
    pairs: list[Column] = []
    for b1, b2, b3 in product("ACGT", repeat=3):
        codon = b1 + b2 + b3
        pairs.append(F.lit(codon))
        pairs.append(F.lit(translate_codon_py(codon)))
    return F.create_map(*pairs)


_TWO_BASE_KEYS = list(_TWO_BASE.keys())


def _two_base_map_literal() -> Column:
    pairs: list[Column] = []
    for k, v in _TWO_BASE.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def translate_dna(dna: Column) -> Column:
    """JVM-side translation: transform over triplet offsets + map lookups.

    ``element_at(map, key)`` returns NULL on miss -> coalesce to 'X', which
    reproduces the reference's unknown-codon handling; the 2-base families are
    looked up first so 'CCN' -> 'P' like the reference.
    """
    up = F.upper(dna)
    n_codons = F.floor(F.length(up) / 3).cast("int")
    codon_map = _codon_map_literal()
    duo_map = _two_base_map_literal()
    idx = F.sequence(F.lit(0), n_codons - 1)
    aas = F.transform(
        idx,
        lambda i: F.coalesce(
            F.element_at(duo_map, F.substring(up, (i * 3 + 1).cast("int"), 2)),
            F.element_at(codon_map, F.substring(up, (i * 3 + 1).cast("int"), 3)),
            F.lit("X"),
        ),
    )
    return F.when(n_codons > 0, F.array_join(aas, "")).otherwise(F.lit(""))
