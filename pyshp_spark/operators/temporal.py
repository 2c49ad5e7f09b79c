"""Temporal operators Spark's DataFrame API lacks as primitives —
expressed as compositions of built-in ops so Catalyst still owns the
physical plan (no Python in any hot path):

* :func:`sessionize` — gap-based session assignment: one window per
  key, two stacked window functions (lag + running sum), a single
  shuffle on the key.
* :func:`asof_join` — point-in-time "latest right row at or before
  each left row" per key, WITHOUT a join: both sides union into one
  frame, a single ordered window per key carries the right payload
  forward (``last(..., ignorenulls=True)``), left rows filter back
  out.  One shuffle total, no row explosion, no range predicate — the
  union-window formulation is the scalable alternative to the
  O(n·m) inequality join (same trick Flink/Kafka-Streams temporal
  joins use).
* :func:`interval_join` — events x intervals range join via
  time-bucket blocking: intervals explode to the (few) fixed-width
  buckets they cover, events carry exactly one bucket, the match is a
  bucket EQUI-join + exact refine — the 1-D analogue of this engine's
  spatial cell join.  An event's bucket is unique and an interval
  covers each bucket once, so the pair set needs no dedup.

All timestamps are compared in integer epoch microseconds
(``unix_micros`` / DuckDB ``epoch_us``), so every predicate and every
oracle mirror is exact integer arithmetic.

At 100 TB: sessionize/asof are one hash-partition + sort per key
(Spark's window spills; skewed keys salt like any window — see
operators/skew); interval_join's shuffle is bucket-count-bounded on
the interval side and linear on the event side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

US = 1_000_000  # microseconds per second


def _us(df: DataFrame, ts: str) -> Column:
    """Epoch microseconds of a timestamp column, exact and
    timezone-independent: TIMESTAMP_NTZ diffs against the NTZ epoch
    (no session-timezone reinterpretation), TIMESTAMP uses
    unix_micros."""
    if dict(df.dtypes).get(ts) == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MICROSECOND,"
            f" TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts}`)"
        )
    return F.unix_micros(F.col(ts))


#: public name — callers deriving interval bounds need the same exact
#: NTZ-safe conversion the operators use internally
epoch_us = _us


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: float = 1800.0,
    tiebreak: str = "event_id",
    out: str = "session_idx",
) -> DataFrame:
    """Append ``out``: 1-based session index per ``key``, a new session
    whenever the gap to the previous event exceeds ``gap_s`` seconds.
    Deterministic total order inside a key: (ts, tiebreak)."""
    gap_us = int(round(gap_s * US))
    us = _us(df, ts)
    w = Window.partitionBy(key).orderBy(us.asc(), F.col(tiebreak).asc())
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | (us - prev > gap_us), 1).otherwise(0)
    return df.withColumn(
        out,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def sessionize_sql(
    table: str,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: float = 1800.0,
    tiebreak: str = "event_id",
    columns: str = "*",
) -> str:
    """DuckDB mirror of :func:`sessionize` (same integer-microsecond
    gap test, same (ts, tiebreak) order)."""
    gap_us = int(round(gap_s * US))
    if columns == "*":
        # don't leak the helper columns the Spark operator never emits
        columns = "* EXCLUDE (__us, __prev_us)"
    return f"""
        SELECT {columns}, CAST(sum(
                   CASE WHEN __prev_us IS NULL OR __us - __prev_us > {gap_us}
                        THEN 1 ELSE 0 END
               ) OVER (
                   PARTITION BY {key} ORDER BY __us ASC, {tiebreak} ASC
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS session_idx
        FROM (
            SELECT *, epoch_us({ts}) AS __us,
                   lag(epoch_us({ts})) OVER (
                       PARTITION BY {key}
                       ORDER BY epoch_us({ts}) ASC, {tiebreak} ASC
                   ) AS __prev_us
            FROM {table}
        )
    """


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    ts: str,
    payload: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: every ``left`` row gains the ``payload`` columns of
    ONE ``right`` row of the same ``key`` (a column name or a list for
    composite keys) — with ``direction='backward'`` (default) the
    LATEST right row at or before the left timestamp, with
    ``'forward'`` the EARLIEST right row at or after it (nulls when
    none qualifies).

    At equal timestamps the right row wins (<=/>= semantics); among
    right rows sharing (key, ts) the greatest ``tiebreak`` wins for
    backward and the smallest for forward (matching
    ``pandas.merge_asof`` against a (ts, tiebreak)-sorted right side)
    — making the match total-order deterministic either way.

    Plan shape: union (no shuffle) -> one window per key -> filter.
    The right payload rides a running ``last(ignorenulls)`` instead of
    any join, so there is exactly ONE exchange and zero fan-out.  All
    payload columns travel as ONE struct (non-null on every right
    row), so the match really is a single right row: a payload field
    that is legitimately NULL on the matched row stays NULL — it is
    never backfilled from an older row, and different fields are never
    stitched from different right rows.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [key] if isinstance(key, str) else list(key)
    if not keys:
        raise ValueError("key must name at least one column")
    clash = [f"asof_{c}" for c in payload if f"asof_{c}" in left.columns]
    if clash:
        raise ValueError(
            f"asof_join output column(s) {clash} already exist in left — "
            "rename or drop them before joining"
        )
    from pyspark.sql import types as T  # noqa: PLC0415

    ts_us = "__asof_us"
    side = "__asof_side"
    ordc = "__asof_ord"
    payc = "__asof_pay"
    pay_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload]
    )

    lt = left.withColumn(ts_us, _us(left, ts)).withColumn(side, F.lit(1))
    lt = lt.withColumn(payc, F.lit(None).cast(pay_t))
    lt = lt.withColumn(
        ordc,
        F.lit(None).cast(
            right.schema[tiebreak].dataType if tiebreak else "long"
        ),
    )

    rt = right.withColumn(ts_us, _us(right, ts)).withColumn(side, F.lit(0))
    rt = rt.withColumn(
        payc, F.struct(*[F.col(c).alias(c) for c in payload])
    )
    rt = rt.withColumn(
        ordc, F.col(tiebreak) if tiebreak else F.lit(None).cast("long")
    )
    rt = rt.select(*keys, ts_us, side, ordc, payc)
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))

    # right rows (side 0) sort before left rows at equal ts (<=/>=
    # semantics); among right rows sharing (key, ts) the winning
    # tiebreak sorts LAST so last(ignorenulls) picks it (greatest for
    # backward's ascending order, smallest for forward's descending).
    # Left rows all carry null ord + null payload struct, so their
    # relative order among ties cannot change any left row's carried
    # value.  Forward is backward on reversed time: descending ts makes
    # the "most recently passed" right row the earliest one at/after
    # the left timestamp.
    if direction == "backward":
        order = [
            F.col(ts_us).asc(), F.col(side).asc(),
            F.col(ordc).asc_nulls_first(),
        ]
    else:
        order = [
            F.col(ts_us).desc(), F.col(side).asc(),
            F.col(ordc).desc_nulls_first(),
        ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    both = lt.select(*rt.columns).unionByName(rt)
    both = both.withColumn(
        payc, F.last(F.col(payc), ignorenulls=True).over(w)
    )
    keep = [F.col(c) for c in left.columns] + [
        F.col(payc).getField(c).alias(f"asof_{c}") for c in payload
    ]
    return both.where(F.col(side) == 1).select(*keep)


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    key: str | list[str],
    ts: str,
    payload: list[str],
    left_cols: str,
    tiebreak: str = "event_id",
) -> str:
    """DuckDB mirror of :func:`asof_join`: dedup the right side to one
    row per (key, ts) keeping the greatest ``tiebreak`` (exactly the
    row the window formulation selects), then ASOF JOIN on
    ``l.ts >= r.ts``."""
    keys = [key] if isinstance(key, str) else list(key)
    pay = ", ".join(f"r.{c} AS asof_{c}" for c in payload)
    part = ", ".join(keys)
    on = " AND ".join(f"l.{k} = r.{k}" for k in keys)
    return f"""
        WITH l AS ({left_sql}),
        r0 AS ({right_sql}),
        r AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY {part}, {ts} ORDER BY {tiebreak} DESC
                ) AS __rn FROM r0
            ) WHERE __rn = 1
        )
        SELECT {left_cols}, {pay}
        FROM l ASOF LEFT JOIN r
          ON {on} AND l.{ts} >= r.{ts}
    """


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start_us",
    end: str = "end_us",
    bucket_s: float = 600.0,
    salt_k: int | None = None,
) -> DataFrame:
    """All (point, interval) pairs with ``start_us <= unix_micros(ts)
    < end_us`` (end-exclusive), via fixed-width time-bucket blocking.
    ``intervals`` carries integer-microsecond bounds; each interval
    explodes to its covered buckets (ceil(width/bucket)+1 rows — keep
    ``bucket_s`` at or above the typical interval width), each point
    computes one bucket, and the match is a bucket equi-join + exact
    integer refine.  No dedup needed: a point's bucket is unique and an
    interval lists each bucket once.

    ``salt_k`` is the hot-bucket guard (the 1-D analogue of the PIP
    join's salt): a burst window concentrating a large share of events
    in ONE time bucket would land them all on one reducer of the
    sort-merge join.  With ``salt_k=N`` each event adds a deterministic
    hash salt in [0, N) to the join key and each interval-bucket row
    replicates N ways, splitting a hot bucket across N tasks at the
    cost of an interval-side (dimension-side, bounded) fan-out.  AQE's
    skew-join split stays the first line of defense; the salt covers
    plans AQE can't re-split (e.g. immediately-aggregated joins)."""
    b_us = int(round(bucket_s * US))
    # integer div keeps the bucket math exact at epoch-microsecond
    # magnitudes (double division can be off by one at the boundary);
    # empty/inverted intervals are dropped (they match nothing, and a
    # descending sequence() would mis-bucket them)
    iv = intervals.where(F.col(end) > F.col(start)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"({start}) div {b_us}"),
                F.expr(f"(({end}) - 1) div {b_us}"),
            )
        ),
    )
    pt = points.withColumn("__pt_us", _us(points, ts)).withColumn(
        "__bucket", F.expr(f"__pt_us div {b_us}")
    )
    on = ["__bucket"]
    drop = ["__bucket", "__pt_us"]
    if salt_k:
        iv = iv.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_k - 1)))
        )
        # salt on the timestamp PLUS every hashable event column: a
        # burst of same-timestamp events must still spread across
        # reducers.  xxhash64 accepts atomic, array, and struct types
        # but rejects MAP anywhere in the type tree — excluding only
        # (nested) maps keeps arrays/structs contributing salt entropy
        # while not failing analysis on frames where salt_k=None works
        from pyspark.sql.types import (  # noqa: PLC0415
            ArrayType,
            MapType,
            StructType,
        )

        def _hashable(dt) -> bool:
            if isinstance(dt, MapType):
                return False
            if isinstance(dt, ArrayType):
                return _hashable(dt.elementType)
            if isinstance(dt, StructType):
                return all(_hashable(f.dataType) for f in dt.fields)
            return True

        hashable = [
            f.name for f in points.schema.fields if _hashable(f.dataType)
        ]
        pt = pt.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(
                    F.col("__pt_us"), *[F.col(c) for c in hashable]
                ),
                F.lit(salt_k),
            ).cast("int"),
        )
        on = ["__bucket", "__salt"]
        drop = ["__bucket", "__salt", "__pt_us"]
    return (
        pt.join(iv, on)
        .where(
            (F.col("__pt_us") >= F.col(start)) & (F.col("__pt_us") < F.col(end))
        )
        .drop(*drop)
    )


def rollup_counts(
    df: DataFrame,
    ts: str = "ts",
    keys: list[str] | None = None,
    levels_s: list[int] | None = None,
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: per-key row counts
    at multiple time resolutions, computed as a CASCADE — the corpus is
    scanned ONCE for the finest level, and every coarser level
    re-aggregates the previous level's (tiny) output instead of the
    raw events.  Levels must nest (each must divide the next), which
    makes the cascade exactly equal to aggregating the raw table at
    every level.

    Output: (level_s, bucket_us, *keys, n) — bucket_us is the bucket's
    start in epoch microseconds (integer arithmetic end to end).

    At 100 TB the cascade is the whole point: the raw scan + one
    corpus-sized shuffle happen once; each further level shuffles only
    rows(finest) ≈ cardinality(keys) x time-range/finest-bucket.
    """
    keys = keys if keys is not None else ["event_type"]
    levels_s = levels_s if levels_s is not None else [60, 3600, 86400]
    levels_s = list(levels_s)
    if sorted(levels_s) != levels_s or len(set(levels_s)) != len(levels_s):
        raise ValueError("levels_s must be strictly ascending")
    for fine, coarse in zip(levels_s, levels_s[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"levels must nest: {coarse} is not a multiple of {fine}"
            )
    lvl_us = [lvl * US for lvl in levels_s]
    # level branches are identical plan prefixes: the single corpus
    # shuffle is deduplicated at runtime by exchange/query-stage reuse
    # (see tile_pyramid — an interleaved A/B measured per-level
    # persist strictly worse: eager planning at construction plus a
    # cache-scan tax, for work stage reuse already dedups).
    cur = (
        df.withColumn("__us", _us(df, ts))
        .withColumn(
            "bucket_us", F.expr(f"(__us div {lvl_us[0]}) * {lvl_us[0]}")
        )
        .groupBy("bucket_us", *keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = cur.withColumn("level_s", F.lit(levels_s[0]).cast("long"))
    for lvl in lvl_us[1:]:
        cur = (
            cur.withColumn(
                "bucket_us", F.expr(f"(bucket_us div {lvl}) * {lvl}")
            )
            .groupBy("bucket_us", *keys)
            .agg(F.sum("n").alias("n"))
        )
        out = out.unionByName(
            cur.withColumn("level_s", F.lit(lvl // US).cast("long"))
        )
    return out.select("level_s", "bucket_us", *keys, "n")


def rollup_counts_sql(
    table: str,
    ts: str = "ts",
    keys: list[str] | None = None,
    levels_s: list[int] | None = None,
) -> str:
    """DuckDB mirror of :func:`rollup_counts`: each level aggregated
    directly from the raw table (the cascade is exactly equal because
    the levels nest)."""
    keys = keys if keys is not None else ["event_type"]
    levels_s = levels_s if levels_s is not None else [60, 3600, 86400]
    ks = ", ".join(keys)
    parts = []
    for lvl in levels_s:
        lvl_us = lvl * US
        parts.append(f"""
            SELECT CAST({lvl} AS BIGINT) AS level_s,
                   (epoch_us({ts}) // {lvl_us}) * {lvl_us} AS bucket_us,
                   {ks}, CAST(count(*) AS BIGINT) AS n
            FROM {table} GROUP BY 1, 2, {ks}
        """)
    return " UNION ALL ".join(parts)
