"""KMV (K-Minimum-Values) distinct-count sketch.

A distributed cardinality estimator whose every step is EXACT integer
arithmetic, so unlike HyperLogLog it admits a token-for-token ANSI-SQL
oracle: hash each value into [0, 2^31), keep the k smallest DISTINCT
hashes, and estimate the domain fraction covered —

    estimate = (k - 1) * DOMAIN div h_k        (h_k = k-th minimum)

with the exact count used verbatim when fewer than k distinct hashes
exist.  Standard KMV theory (Bar-Yossef et al. 2002): relative error
~ 1/sqrt(k).

Plan shape at 100 TB: the hash is a codegen'd Column expression; each
input partition then pre-reduces to its own k smallest DISTINCT hashes
inside one Arrow-batched map (a running unique-merge across the
partition's batches — no shuffle, no per-row Python), so the ONE
exchange carries at most k rows per upstream partition regardless of
the column's cardinality — a near-unique BIGINT key no longer ships
its full distinct domain.  The final distinct().orderBy(h).limit(k)
runs over <= k x partitions rows and compiles to
TakeOrderedAndProject (k-bounded, driver-free).  Mergeability falls
out of the math: the union's sketch is the k smallest of the
concatenated sketches — which is exactly what the per-partition
pre-reduce + final take computes.

The ``knuth`` flavor is the oracle-exact one (the same two-round
multiply-mod spreader as operators/sample.py); production can swap in
``xxhash64`` for better dispersion at the cost of SQL mirrorability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyshp_spark.operators.sample import _bucket_expr, knuth_bucket_sql

#: hash domain: knuth spreader output range (see sample.py _M1)
KMV_DOMAIN = 1 << 31


def _partition_kmin(k: int):
    """mapInPandas kernel: running k smallest distinct values across a
    partition's Arrow batches.  State is one sorted numpy array of at
    most k int64s; each batch merges via np.unique (C-level sort+dedup)
    and truncates — O(batch log batch) per batch, O(k) memory."""

    def f(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        best = None
        for pdf in batches:
            vals = pdf["h"].to_numpy()
            if best is None:
                best = np.unique(vals)[:k]
            else:
                best = np.unique(np.concatenate([best, vals]))[:k]
        if best is not None and len(best):
            yield pd.DataFrame({"h": best})

    return f


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 256,
    salt: int = 0,
    hash: str = "knuth",
) -> DataFrame:
    """One-row DataFrame: (k_actual, h_k, estimate) for the distinct
    count of ``df[col]``.  ``estimate`` equals the exact distinct count
    whenever it is below ``k`` (the sketch holds every hash)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    dtype = dict(df.dtypes).get(col)
    if hash == "knuth":
        # the integer spreader needs a true integer key: a silent
        # cast('long') would null out strings (corrupting the sketch to
        # estimate≈1) and collapse float values — reject instead
        if dtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"kmv_distinct(hash='knuth') needs an integer column; "
                f"{col!r} is {dtype} — use hash='xxhash64' for "
                "arbitrary types (no SQL oracle)"
            )
        h = _bucket_expr(F.col(col).cast("long"), hash, salt, KMV_DOMAIN)
    else:
        # xxhash64 hashes any Spark type natively
        h = _bucket_expr(F.col(col), hash, salt, KMV_DOMAIN)
    # count non-null values only: Spark sorts NULLs first and DuckDB
    # last, so letting a null hash into the sketch breaks the mirror
    hashed = df.where(F.col(col).isNotNull()).select(h.alias("h"))
    # per-partition k-min pre-reduce (Arrow-batched, no per-row
    # Python): each input partition emits at most its k smallest
    # DISTINCT hashes, so the exchange below carries <= k rows per
    # partition even for a near-unique key — without this, a unique
    # BIGINT column shuffles its entire distinct domain
    mins = (
        hashed.mapInPandas(_partition_kmin(k), schema="h long")
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return mins.agg(
        F.count(F.lit(1)).alias("k_actual"),
        F.max("h").alias("h_k"),
    ).select(
        "k_actual",
        "h_k",
        F.when(
            F.col("k_actual") < k, F.col("k_actual").cast("long")
        )
        .otherwise(
            F.expr(f"(({k} - 1) * CAST({KMV_DOMAIN} AS BIGINT)) div h_k")
        )
        .alias("estimate"),
    )


def kmv_distinct_sql(table: str, col: str, k: int = 256, salt: int = 0) -> str:
    """DuckDB mirror of ``kmv_distinct(..., hash='knuth')``."""
    bucket = knuth_bucket_sql(col, salt, KMV_DOMAIN)
    return f"""
        WITH mins AS (
            SELECT DISTINCT ({bucket}) AS h FROM {table}
            WHERE {col} IS NOT NULL
            ORDER BY h ASC LIMIT {k}
        )
        SELECT CAST(count(*) AS BIGINT) AS k_actual,
               CAST(max(h) AS BIGINT) AS h_k,
               CASE WHEN count(*) < {k} THEN CAST(count(*) AS BIGINT)
                    ELSE (({k} - 1) * CAST({KMV_DOMAIN} AS BIGINT)) // max(h)
               END AS estimate
        FROM mins
    """
