"""Generate a scaled-up copy of the driver's sf0.1 testdata for the
scaling sweep (tools/scaling.py) — 10x by default, written to /tmp (the
driver's /root/testdata is read-only and tops out at sf0.1).

Replication strategy (what "10x more data" means per table):

* region/nation stay fixed — TPC-H dims do not scale.
* Fact/dim tables replicate REPLICAS times with consistent key shifts:
  every foreign key shifts by the same offset as its primary key, so
  join fan-outs and FK selectivities are preserved.  Offsets are
  divisible by every modulus the synthetic-fixture queries use
  (%2 %3 %4 %7 %10 %20 %22 %25 %50 -> lcm-friendly 23100 family), so
  modulo-derived attributes (chromosome, gender, held-out flags, query
  sets) keep their distribution and replica rows land in the SAME
  modulo classes as their originals.
* documents: doc_id shifts; in replica i>0 every 3rd word is REPLACED
  by a replica-suffixed variant (w -> w || 'q{i}z').  Two properties
  make replicas behave like fresh corpus rather than duplicates:
  (a) zero shared word TRIGRAMS across replicas (no 3-consecutive-word
  run survives unreplaced), so shingle-based near-dup / decontaminate
  ops see 10x more docs with only the original WITHIN-replica duplicate
  structure — pairs scale ~10x, not the C(10,2)=45x explosion that 10
  near-identical copies would cause; (b) word SETS share only ~50%
  cross-replica (2/3 kept / 4/3 union), under every similarity-join
  threshold in the registry — an earlier token-INSERTION scheme kept
  word sets ~95% identical and sent the exact all-pairs join
  quadratic across replicas.  Word counts are unchanged; within-replica
  dedup structure is preserved.
* embeddings: vec_id shifts; label shifts by 10*i — a bigger corpus
  gets MORE buckets of the same size (how LSH/IVF bucket counts grow),
  not 10x-fatter buckets.

Usage: python tools/make_sfx.py [--replicas 10] [--out /tmp/vlp_sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

OFF = {
    "o_orderkey": 231000,
    "c_custkey": 23100,
    "s_suppkey": 1200,
    "p_partkey": 23100,
    "event_id": 115500,
    "user_id": 4620,
    "doc_id": 23100,
    "vec_id": 23100,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default="/tmp/vlp_sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    R = args.replicas

    def copy(table: str, select: str) -> None:
        # 30k-row row groups: the driver's sf0.1 files are ONE row group
        # (600k rows), which caps the parquet scan at a single task; the
        # sweep needs both scale points equally splittable so ratios
        # measure work, not parallelism (a --replicas 1 run of this tool
        # produces the re-chunked sf0.1 baseline for the same reason)
        con.sql(
            f"COPY ({select}) TO '{args.out}/{table}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 30000)"
        )
        n = con.sql(
            f"SELECT COUNT(*) FROM '{args.out}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    rep = f"(SELECT UNNEST(range({R})) AS i)"
    copy(
        "customer",
        f"""SELECT c_custkey + i*{OFF['c_custkey']} AS c_custkey,
            c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet', {rep}""",
    )
    copy(
        "supplier",
        f"""SELECT s_suppkey + i*{OFF['s_suppkey']} AS s_suppkey,
            s_name, s_nationkey, s_acctbal
            FROM '{SRC}/supplier.parquet', {rep}""",
    )
    copy(
        "part",
        f"""SELECT p_partkey + i*{OFF['p_partkey']} AS p_partkey,
            p_name, p_brand, p_type, p_size, p_retailprice
            FROM '{SRC}/part.parquet', {rep}""",
    )
    copy(
        "orders",
        f"""SELECT o_orderkey + i*{OFF['o_orderkey']} AS o_orderkey,
            o_custkey + i*{OFF['c_custkey']} AS o_custkey,
            o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet', {rep}""",
    )
    copy(
        "lineitem",
        f"""SELECT l_orderkey + i*{OFF['o_orderkey']} AS l_orderkey,
            l_partkey + i*{OFF['p_partkey']} AS l_partkey,
            l_suppkey + i*{OFF['s_suppkey']} AS l_suppkey,
            l_linenumber, l_quantity, l_extendedprice, l_discount,
            l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet', {rep}""",
    )
    copy(
        "events",
        f"""SELECT event_id + i*{OFF['event_id']} AS event_id, ts,
            user_id + i*{OFF['user_id']} AS user_id,
            event_type, value, props
            FROM '{SRC}/events.parquet', {rep}""",
    )
    copy(
        "embeddings",
        f"""SELECT vec_id + i*{OFF['vec_id']} AS vec_id, embedding,
            label + i*10 AS label
            FROM '{SRC}/embeddings.parquet', {rep}""",
    )
    # documents: replace every 3rd word with a replica-suffixed variant
    # for i>0 (see module docstring); n_chars re-derives from new text
    mutate = (
        "array_to_string(list_transform(string_split(text, ' '), "
        "(w, j) -> CASE WHEN j % 3 = 0 THEN w || 'q' || i || 'z' "
        "ELSE w END), ' ')"
    )
    copy(
        "documents",
        f"""SELECT doc_id + i*{OFF['doc_id']} AS doc_id,
            CASE WHEN i = 0 THEN text ELSE {mutate} END AS text,
            lang, source,
            CAST(length(CASE WHEN i = 0 THEN text ELSE {mutate} END)
                AS BIGINT) AS n_chars
            FROM '{SRC}/documents.parquet', {rep}""",
    )


if __name__ == "__main__":
    main()
