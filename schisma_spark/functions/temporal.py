"""Temporal operators: gap-based sessionization and as-of joins.

The reference is a per-value interpreter with no temporal semantics
(schisma.mjs has no time type beyond Date typeof checks, schisma.mjs:579);
these are engine operators for event/interaction corpora — the shapes a
training-data pipeline needs when the corpus is logs rather than documents
(RLHF interaction streams, clickstream curation, feature snapshots).

Both are single-shuffle window compositions — no range-explosion joins:

- ``sessionize``: one shuffle on the entity key, one in-partition sort by
  time. Per-entity history lands in one task, so the scaling assumption is
  bounded events-per-entity (true for user logs; for a pathological hot
  key, pre-split by time range and stitch at the boundary).
- ``asof_join``: the classic union-tag trick — concatenate state rows and
  query rows, sort per key by (time, tag), carry the latest state forward
  with ``last(ignorenulls)``. Exactly one shuffle + sort, same cost as a
  sort-merge equi-join; never builds the O(queries x states) range join.
  The whole state row travels as ONE struct so a NULL field inside a
  newer state never resurrects an older value.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(col):
    """Epoch microseconds for TIMESTAMP and TIMESTAMP_NTZ alike
    (``unix_micros`` rejects NTZ; the cast shifts NTZ by the session
    offset, which cancels everywhere here — only DIFFERENCES are used)."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: float,
    order_tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Label every row with a per-entity session index (1-based): a new
    session starts when the time since the previous event is STRICTLY
    greater than ``gap_seconds``. Exact ANSI-SQL twin::

        sum(CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > gap_us
             THEN 1 ELSE 0 END) OVER (w ROWS UNBOUNDED PRECEDING)

    Microsecond integer arithmetic on both engines (``unix_micros`` /
    ``epoch_us``) — no float-seconds rounding to disagree about. Ties in
    ``ts`` can never open a session (diff 0), so the labels are
    deterministic even without ``order_tiebreak``; pass one anyway when
    downstream consumes row order.
    """
    order = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(entity_col).orderBy(*order)
    gap_us = int(round(gap_seconds * 1_000_000))
    prev = F.lag(_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev.isNull() | (_micros(F.col(ts_col)) - prev > F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(entity_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(is_new).over(cum))


def session_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: float,
    id_col: str | None = None,
) -> DataFrame:
    """Per-session aggregate over :func:`sessionize` labels:
    ``entity, session_id, n_events, span_sec, first_id, last_id``.
    ``first_id``/``last_id`` are MIN/MAX of ``id_col`` within the
    session — deterministic (and oracle-stable under ts ties, where a
    time-ordered min_by would be tie-broken arbitrarily); they coincide
    with the first/last event by time exactly when ids are assigned
    time-monotonically, as ingestion ids are. One extra hash aggregate
    on (entity, session) — still one shuffle total once AQE reuses the
    window's hash partitioning."""
    lab = sessionize(df, entity_col, ts_col, gap_seconds)
    us = _micros(F.col(ts_col))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        ((F.max(us) - F.min(us)) / F.lit(1_000_000.0)).alias("span_sec"),
    ]
    if id_col is not None:
        aggs += [F.min(id_col).alias("first_id"), F.max(id_col).alias("last_id")]
    return lab.groupBy(entity_col, "session_id").agg(*aggs)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: every left row gains the payload of the closest right
    row with the same key — ``direction='backward'`` (default) matches
    the LATEST state with ``right_ts <= left_ts``, ``'forward'`` the
    EARLIEST state with ``right_ts >= left_ts`` (pandas ``merge_asof``
    directions; NULLs when no such state exists). DuckDB twins:
    ``ASOF LEFT JOIN ... ON key AND l.ts >= r.ts`` / ``l.ts <= r.ts`` —
    at equal timestamps the state DOES match in both directions, which
    the union ordering reproduces by sorting state rows before query
    rows at equal time (forward simply scans time DESCENDING).

    Emits every left column, then ``<right_ts><suffix>`` (the matched
    state's timestamp) and each requested right payload column under
    ``<name><suffix>``. Right rows should be unique per (key, ts) —
    pre-aggregate if not, or the carried state is whichever survived the
    sort. ``tolerance_seconds`` voids matches farther than the window
    (pandas ``merge_asof`` semantics): payload AND matched ts go NULL.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    on = list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    right_cols = list(right_cols)
    # '_ts' guards the carried-struct timestamp field (r7, ADVICE): a
    # right payload column literally named '_ts' would duplicate the
    # matched-timestamp field inside the carried struct
    reserved = {"_t", "_tag", "_state", "_carried", "_ts"}
    clash = (reserved & set(left.columns)) | (reserved & set(right.columns))
    clash |= {f"{c}{suffix}" for c in [right_ts, *right_cols]} & set(
        left.columns)
    if clash:
        raise ValueError(
            f"asof_join column collision with internal/output names: "
            f"{sorted(clash)} — rename before joining")
    # a NULL right_ts would sort FIRST (asc_nulls_first) and be carried
    # into every pre-first-state left row; the ASOF predicate
    # right_ts <= left_ts is unknowable for it, so drop it (DuckDB ASOF
    # and pandas merge_asof both produce no match for NULL state times)
    right = right.where(F.col(right_ts).isNotNull())

    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        payload.alias("_state"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_state"].dataType).alias("_state"),
        *[F.col(c) for c in left.columns if c not in on],
    )
    # forward = the same carry-forward scan over DESCENDING time: the
    # last state seen is then the earliest one at-or-after the query ts;
    # the tag still orders states before queries at EQUAL time so
    # equal-ts matches hold in both directions
    t_order = (F.col("_t").asc() if direction == "backward"
               else F.col("_t").desc())
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).withColumn(
        "_carried", F.last("_state", ignorenulls=True).over(w)
    )
    out = filled.where(F.col("_tag") == 1)
    # a left row with NULL ts has no defined match in either direction
    # (it happens to sort first under backward asc, but LAST under
    # forward desc, where it would grab the earliest state) — void it
    carried = F.when(F.col("_t").isNotNull(), F.col("_carried"))
    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        gap = _micros(F.col("_t")) - _micros(carried.getField("_ts"))
        if direction == "forward":
            gap = -gap
        carried = F.when(gap <= F.lit(tol_us), carried)
    return out.select(
        *on,
        *[F.col(c) for c in left.columns if c not in on],
        carried.getField("_ts").alias(f"{right_ts}{suffix}"),
        *[carried.getField(c).alias(f"{c}{suffix}") for c in right_cols],
    )
