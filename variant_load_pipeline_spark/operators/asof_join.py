"""As-of (temporal point) join — the custom join Spark's optimizer has no
native operator for: each left row matched to the single right row with
the greatest right timestamp <= the left timestamp (direction='backward';
'forward' mirrors it with the smallest right ts >= left ts), per key,
optionally bounded by a tolerance window.

The naive formulation (range join + per-left argmax) is a
BroadcastNestedLoop / O(n*m) disaster at scale.  This implementation is
the classic distributed reformulation: UNION the two sides with a
side tag, shuffle ONCE on the key, and carry the most recent right-side
payload forward with a ``last(..., ignorenulls=True)`` running window —
the same merge-sorted sweep a single-node engine (e.g. pandas
``merge_asof``, DuckDB ASOF JOIN) does per key, expressed as one window
over (key) ordered by (ts, side, seq).  No join node appears in the
plan; cost is one shuffle + one sort, identical to a groupBy on the key.

Determinism: rows are ordered by (ts, side, seq) with right rows BEFORE
left rows at equal ts (equality matches, as in pandas/DuckDB backward
asof) and ties inside the right stream broken by ``right_seq`` — the
LAST right row in that order wins, bit-reproducible across engines.

Scale notes (100 TB): the single shuffle keys on the join key — the
partitioning the downstream per-key analytics want anyway; key skew is
event-volume skew and AQE's skew-split handles it because the window is
preceded by a plain hash partition.  ``tolerance`` does not change the
plan — matches older than the window are nulled out after the sweep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    left_seq: str | None = None,
    right_seq: str | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``right_cols`` from the
    matching right row (NULL when no right row qualifies).

    on              -- equality key column(s), present on both sides.
    left_ts/right_ts-- ordering columns (timestamp or numeric).
    right_cols      -- right payload columns to attach (default: all
                       right columns except the key and right_ts).
    right_seq       -- deterministic tie-break inside the right stream
                       (required when right may repeat a timestamp).
    direction       -- 'backward' (match ts <= left ts, greatest wins) or
                       'forward' (match ts >= left ts, smallest wins).
    tolerance_seconds -- max |left_ts - right_ts|; matches beyond it null.
    prefix          -- prefix for the attached columns: ``{prefix}ts`` and
                       ``{prefix}{col}`` for each payload column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    # side tag: right rows sort BEFORE left rows at equal ts under
    # 'backward' (so equality matches); AFTER under 'forward'
    right_first = direction == "backward"
    l_tag = F.lit(1 if right_first else 0)
    r_tag = F.lit(0 if right_first else 1)
    lseq = F.col(left_seq) if left_seq else F.lit(0)
    rseq = F.col(right_seq) if right_seq else F.lit(0)

    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        l_tag.alias("__side_left"),
        lseq.alias("__seq"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("__rts"),
                    *[F.col(c) for c in right_cols],
                ).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("__rpay"),
    )
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        r_tag.alias("__side_left"),
        rseq.alias("__seq"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("__lrow"),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias("__rpay"),
    )
    u = l_side.unionByName(r_side)
    order = [F.col("__ts"), F.col("__side_left"), F.col("__seq")]
    if direction == "forward":
        order = [c.desc() for c in order]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    swept = u.withColumn(
        "__match", F.last("__rpay", ignorenulls=True).over(w)
    ).filter(F.col("__lrow").isNotNull())

    match: Column = F.col("__match")
    if tolerance_seconds is not None:
        lag = F.abs(
            F.col("__ts").cast("double")
            - match["__rts"].cast("double")
        )
        match = F.when(lag <= F.lit(float(tolerance_seconds)), match)

    out_cols = [F.col("__lrow")[c].alias(c) for c in left.columns]
    out_cols.append(match["__rts"].alias(prefix + "ts"))
    out_cols.extend(match[c].alias(prefix + c) for c in right_cols)
    return swept.select(*out_cols)
