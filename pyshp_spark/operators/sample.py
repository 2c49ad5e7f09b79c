"""Deterministic splitting and sampling for training-data pipelines.

Two operations every large-scale curation pipeline needs, expressed so
they are reproducible across runs, engines, and cluster sizes (the
property `df.sample()` does NOT have — its output depends on partition
layout):

* :func:`hash_split` — assign each row to train/val/test by hashing its
  KEY, not by position.  Map-only: zero shuffle, zero state, stable
  under repartitioning, appends compose (a doc keeps its split when the
  corpus grows — the property that prevents eval-set leakage across
  dataset versions).
* :func:`stratified_sample_n` — EXACTLY n rows per stratum (e.g. per
  language), chosen by ranking a per-row hash within each stratum: a
  deterministic uniform-without-replacement sample.  One shuffle (the
  window partition); candidates never collect to the driver.

Both come in two hash flavors: Spark's native ``xxhash64`` (default —
JVM codegen, no Python anywhere) and a ``knuth`` integer mix that is
exactly mirrorable in ANSI SQL (the driver-gate flavor; all arithmetic
stays under 2^62 so BIGINT never overflows on either engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative constants: two rounds of multiply-mod keep every
# intermediate below 2^62 for key < 2^31 while mixing low bits into the
# bucket range.  NOT a cryptographic hash — a deterministic spreader
# whose SQL mirror is token-for-token identical.
_K1 = 2654435761  # 2^32 / golden ratio
_K2 = 40503       # Knuth's 16-bit multiplier
_M1 = 1 << 31
_BUCKETS_DEFAULT = 10_000


def _knuth_bucket_expr(key: Column, salt: int, buckets: int) -> Column:
    # pmod form ((x % m) + m) % m, NOT bare %: Spark and DuckDB both have
    # sign-preserving %, so a negative key would otherwise produce a
    # negative bucket that compares < every positive bound (all negative
    # keys landing in the first split / poisoning the KMV minima).  The
    # expanded form is token-identical in ANSI SQL, keeping the mirror
    # exact.  Intermediates stay < 2^62 for |key| < 2^31.
    m1 = F.lit(_M1)
    h1 = (((key + F.lit(salt)) * F.lit(_K1)) % m1 + m1) % m1
    h2 = ((h1 * F.lit(_K2) + F.lit(9973)) % m1 + m1) % m1
    b = F.lit(buckets)
    return (h2 % b + b) % b


def knuth_bucket_sql(key: str, salt: int, buckets: int) -> str:
    """The exact SQL mirror of the ``knuth`` hash flavor (pmod form —
    negative keys bucket identically to the Spark side)."""
    h1 = f"(((({key} + {salt}) * {_K1}) % {_M1} + {_M1}) % {_M1})"
    h2 = f"((({h1} * {_K2} + 9973) % {_M1} + {_M1}) % {_M1})"
    return f"(({h2} % {buckets} + {buckets}) % {buckets})"


def _bucket_expr(key: Column, hash: str, salt: int, buckets: int) -> Column:
    if hash == "xxhash64":
        return F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(buckets))
    if hash == "knuth":
        return _knuth_bucket_expr(key, salt, buckets)
    raise ValueError(f"unknown hash flavor {hash!r} (xxhash64 | knuth)")


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float] | None = None,
    salt: int = 0,
    buckets: int = _BUCKETS_DEFAULT,
    hash: str = "xxhash64",
    split_col: str = "split",
) -> DataFrame:
    """Append ``split_col`` assigning each row to a named split by its
    hashed key.  Weights are fractions summing to ~1; boundaries are
    cumulative over ``buckets`` hash buckets, so realized fractions are
    exact to 1/buckets.  Deterministic in (key, salt) only — immune to
    partitioning, ordering, and corpus growth."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    b = _bucket_expr(F.col(key), hash, salt, buckets)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bound = int(round(cum * buckets))
        cond = b < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def hash_split_sql(
    table: str,
    key: str,
    weights: dict[str, float] | None = None,
    salt: int = 0,
    buckets: int = _BUCKETS_DEFAULT,
) -> str:
    """DuckDB mirror of ``hash_split(..., hash='knuth')``."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = knuth_bucket_sql(key, salt, buckets)
    cases = []
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bound = int(round(cum * buckets))
        cases.append(f"WHEN ({bucket}) < {bound} THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return f"SELECT *, {case} AS split FROM {table}"


def stratified_sample_n(
    df: DataFrame,
    strata: str,
    n: int,
    key: str,
    salt: int = 0,
    hash: str = "xxhash64",
    prefilter: bool = False,
    oversample: int = 4,
) -> DataFrame:
    """Exactly ``min(n, stratum size)`` rows per stratum, selected by
    ranking the hashed key within each stratum — a deterministic
    uniform sample without replacement (every run, every cluster size,
    same rows).  One shuffle: the window partition on ``strata``; ties
    are impossible at the rank step because the key breaks them.

    ``prefilter=True`` is the giant-stratum guard: a stratum holding a
    large share of the corpus lands in ONE window partition and one
    task sorts it all.  The two-level variant first computes per-stratum
    counts (map-side-combined agg), derives a per-stratum hash-bucket
    threshold keeping ~``oversample * n`` expected survivors, and
    prefilters with a broadcast threshold join BEFORE the window — so
    the window sorts O(strata x oversample x n) rows, not the corpus.
    It is EXACT, not approximate: the n smallest (hash, key) rows all
    lie below the threshold whenever at least n rows survive it, and
    any hash-unlucky stratum (plus NULL strata, which a join can't
    carry) is detected lazily and routed through the full window — the
    output rows are bit-identical to ``prefilter=False`` in every
    case.  Use it when strata are few and fat (the threshold frame is
    one row per stratum, broadcastable by construction in exactly the
    regime where the guard matters).  Cost: two corpus scans (count +
    prefilter — inherent, the threshold derives from the counts); both
    small intermediates are lazily ``persist()``-ed so no subtree
    re-scans within an action, and the rare-fallback branch's scan is
    elided at runtime by AQE's empty-relation propagation when no
    stratum falls short.

    The plan is FULLY LAZY: construction runs zero Spark jobs (safe
    for explain/plan-only composition), and the persisted blocks keep
    plain lineage — an executor lost mid-query recomputes them instead
    of invalidating the result (the old eager-localCheckpoint variant
    had lineage-free executor-local blocks).  The two caches are
    tracked as one generation per call
    (operators.opcache.release_operator_caches("stratified_sample"))."""
    if n <= 0:
        raise ValueError("n must be positive")
    from pyspark.sql import Window

    h = _bucket_expr(F.col(key), hash, salt, 1 << 30)
    w = Window.partitionBy(strata).orderBy(h.asc(), F.col(key).asc())

    def rank_top_n(frame: DataFrame) -> DataFrame:
        return (
            frame.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= n)
            .drop("__rk")
        )

    if not prefilter:
        return rank_top_n(df)
    if oversample < 2:
        raise ValueError("oversample must be >= 2")
    from pyshp_spark.operators.opcache import register_op_caches  # noqa: PLC0415

    buckets = 1 << 30
    # one row per stratum; persisted (lazy, lineage-recoverable) so thr
    # and the shortfall check below don't each re-run the counting scan
    counts = (
        df.groupBy(strata)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .persist()
    )
    thr = counts.select(
        F.col(strata).alias("__ps_strata"),
        F.least(
            F.lit(buckets).cast("long"),
            F.ceil(
                F.lit(float(buckets) * n * oversample) / F.col("__cnt")
            ).cast("long"),
        ).alias("__thr"),
    )
    # NULL strata can't ride an equi-join: send them straight to the
    # full-window path (they are one partition there regardless)
    notnull = df.where(F.col(strata).isNotNull())
    # pre is O(strata x oversample x n) rows; persisted so the main
    # window, the shortfall check, and the anti join share ONE corpus
    # scan instead of re-reading the input per subtree.
    # NULL-hash rows (a NULL key under the knuth flavor) sort FIRST in
    # the window's ascending order, so the full path always selects
    # them — the prefilter must pass them too, or `h < thr` (NULL)
    # silently drops rows the contract says win
    pre = (
        notnull.join(
            F.broadcast(thr),
            notnull[strata] == F.col("__ps_strata"),
        )
        .where((h < F.col("__thr")) | h.isNull())
        .drop("__ps_strata", "__thr")
        .persist()
    )
    register_op_caches("stratified_sample", [counts, pre])
    # hash-unlucky strata (fewer survivors than n while the stratum
    # holds more rows than survived — INCLUDING zero survivors, so the
    # check must start from `counts`, where every stratum appears, not
    # from pre's groups): re-run those through the full window.
    # Broadcastable: one row per failing stratum, ~never any.
    got = pre.groupBy(strata).agg(F.count(F.lit(1)).alias("__got"))
    short = (
        counts.withColumnRenamed(strata, "__cs")
        .join(got, F.col("__cs") == got[strata], "left")
        .select(
            "__cs",
            "__cnt",
            F.coalesce(F.col("__got"), F.lit(0)).alias("__got"),
        )
        .where((F.col("__got") < n) & (F.col("__cnt") > F.col("__got")))
        .select(F.col("__cs").alias("__fb_strata"))
    )
    main = rank_top_n(
        pre.join(
            F.broadcast(short),
            pre[strata] == F.col("__fb_strata"),
            "left_anti",
        )
    )
    fallback = rank_top_n(
        df.where(F.col(strata).isNull()).unionByName(
            notnull.join(
                F.broadcast(short),
                notnull[strata] == F.col("__fb_strata"),
                "left_semi",
            )
        )
    )
    return main.unionByName(fallback)


def stratified_sample_n_sql(
    table: str,
    strata: str,
    n: int,
    key: str,
    salt: int = 0,
    columns: str = "*",
) -> str:
    """DuckDB mirror of ``stratified_sample_n(..., hash='knuth')``.
    ``columns='*'`` uses EXCLUDE to drop the rank column like the
    Spark side does."""
    bucket = knuth_bucket_sql(key, salt, 1 << 30)
    cols = "* EXCLUDE (__rk)" if columns == "*" else columns
    return f"""
        SELECT {cols} FROM (
            SELECT *, row_number() OVER (
                PARTITION BY {strata}
                ORDER BY ({bucket}) ASC, {key} ASC
            ) AS __rk
            FROM {table}
        ) WHERE __rk <= {n}
    """


def mix_corpora(
    df: DataFrame,
    weights: dict[str, float],
    source: str = "source",
    key: str = "doc_id",
    salt: int = 0,
    buckets: int = _BUCKETS_DEFAULT,
    hash: str = "xxhash64",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic source-weighted dataset mixing: each row of source
    ``s`` appears ``floor(w_s)`` times plus once more for a hashed
    ``frac(w_s)`` fraction of its keys — so a weight of 1.5 replays
    every doc once and half the docs twice, and 0.25 keeps a quarter.
    Copies are numbered 1..n in ``epoch_col`` (the training-epoch tag).

    Like :func:`hash_split`, membership in the fractional slice depends
    only on (key, salt): reproducible at any parallelism, stable under
    corpus growth, and the same doc is up/down-sampled consistently
    across pipeline re-runs.  Sources absent from ``weights`` get
    weight 0 (dropped) — an explicit decision, not a default of 1.

    One projection + one explode; no join, no shuffle.  The epoch copies
    are materialized rows, so downstream shuffles see the mixed
    distribution exactly as a training loader would.
    """
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    b = _bucket_expr(F.col(key), hash, salt, buckets)
    n = None
    for name, w in weights.items():
        whole = int(w)
        frac_buckets = int(round((w - whole) * buckets))
        copies = F.lit(whole) + F.when(b < F.lit(frac_buckets), 1).otherwise(0)
        cond = F.col(source) == name
        n = F.when(cond, copies) if n is None else n.when(cond, copies)
    n = (n.otherwise(0) if n is not None else F.lit(0)).cast("int")
    return (
        df.withColumn("__n_copies", n)
        .where(F.col("__n_copies") >= 1)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(1), F.col("__n_copies"))),
        )
        .drop("__n_copies")
    )


def mix_corpora_sql(
    table: str,
    weights: dict[str, float],
    source: str = "source",
    key: str = "doc_id",
    salt: int = 0,
    buckets: int = _BUCKETS_DEFAULT,
    columns: str = "*",
) -> str:
    """DuckDB mirror of ``mix_corpora(..., hash='knuth')``."""
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    bucket = knuth_bucket_sql(key, salt, buckets)
    cases = []
    for name, w in weights.items():
        whole = int(w)
        frac_buckets = int(round((w - whole) * buckets))
        cases.append(
            f"WHEN {source} = '{name}' THEN {whole}"
            f" + (CASE WHEN ({bucket}) < {frac_buckets} THEN 1 ELSE 0 END)"
        )
    n = "CASE " + " ".join(cases) + " ELSE 0 END"
    if columns == "*":
        columns = "* EXCLUDE (__n_copies)"
    return f"""
        SELECT {columns}, CAST(unnest(range(1, __n_copies + 1)) AS BIGINT)
               AS epoch
        FROM (
            SELECT *, ({n}) AS __n_copies FROM {table}
        ) WHERE __n_copies >= 1
    """
