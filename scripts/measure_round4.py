"""Round-4 measurement evidence (writes numbers quoted in BENCH.md):

1. MinHash verify throughput: factorized-batch verify vs the round-3
   per-pair re-shingling loop on a ~50k-candidate-pair set.
2. embedding_dedup_pairs shuffle volume at dim=64 vs dim=1024 (16x):
   with vectors off the bucket exchange, shuffle write should be
   ~flat in dim (pair-id exchange dominates).

Shuffle bytes come from the status REST API (UI enabled here only).
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def shuffle_write_bytes(ui_port: int, app_id: str) -> int:
    url = f"http://localhost:{ui_port}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("round4-measure")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    # ---- 1. verify throughput: 50k candidate pairs over 5k hot docs --
    from pyshp_spark.operators.dedup import minhash_dedup_pairs, shingles

    rng = np.random.default_rng(1)
    words = [f"w{i}" for i in range(500)]
    docs = [
        " ".join(rng.choice(words, size=60)) for _ in range(5000)
    ]
    # candidate pairs with heavy doc reuse (hot docs) — the shape the
    # banded candidate set has at corpus scale
    ia = rng.integers(0, 5000, size=50_000)
    ib = (ia + rng.integers(1, 100, size=50_000)) % 5000

    # In-process kernel timing (single core, same pandas batch shape
    # the UDF sees) — through local Spark at this toy scale the wall is
    # Arrow-transfer-bound and both kernels tie; the CPU cost per
    # executor-core is what scales to a 100 TB candidate set.
    ta = pd.Series([docs[i] for i in ia])
    tb = pd.Series([docs[i] for i in ib])

    def loop_kernel(ta, tb):
        out = np.empty(len(ta))
        for i, (x, y) in enumerate(zip(ta, tb)):
            sa, sb = shingles(x, 3), shingles(y, 3)
            u = len(sa | sb)
            out[i] = len(sa & sb) / u if u else 0.0
        return out

    def fact_kernel(ta, tb):
        both = pd.concat([ta, tb], ignore_index=True).fillna("")
        codes, uniques = pd.factorize(both)
        sets = [shingles(u, 3) for u in uniques]
        n = len(ta)
        out = np.empty(n)
        ca, cb = codes[:n], codes[n:]
        for i in range(n):
            sa, sb = sets[ca[i]], sets[cb[i]]
            inter = len(sa & sb)
            u = len(sa) + len(sb) - inter
            out[i] = inter / u if u else 0.0
        return out

    t0 = time.time()
    r_loop = loop_kernel(ta, tb)
    t_loop = time.time() - t0
    t0 = time.time()
    r_fact = fact_kernel(ta, tb)
    t_fact = time.time() - t0
    assert np.allclose(r_loop, r_fact)
    print(
        json.dumps(
            {
                "verify_pairs": 50_000,
                "unique_docs": 5_000,
                "loop_sec": round(t_loop, 3),
                "factorized_sec": round(t_fact, 3),
                "speedup": round(t_loop / t_fact, 2),
            }
        )
    )

    # ---- 2. embedding_dedup shuffle bytes: old plan vs new, and new
    # plan across a 16x dim scale-up.  Default broadcast threshold
    # (10 MB): at dim=1024 the 2k-row vector frames are ~16 MB so the
    # OLD plan's vector-carrying self-join must sort-merge (vectors
    # cross the exchange twice), while the NEW plan's (id, bucket) and
    # pair-id frames broadcast — the corpus vectors never shuffle.
    from pyshp_spark.operators.similarity import (
        cosine_pair_udf,
        embedding_dedup_pairs,
        lsh_bucket_udf,
    )

    def old_plan(df, tau, dim):
        bucket = lsh_bucket_udf(dim, 8, 5)
        b = df.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("__v"),
            bucket(F.col("embedding")).alias("__bucket"),
        )
        left = b.select(F.col("id").alias("id_a"), F.col("__v").alias("__va"), "__bucket")
        right = b.select(F.col("id").alias("id_b"), F.col("__v").alias("__vb"), "__bucket")
        return (
            left.join(right, on="__bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", F.round(cosine_pair_udf()(F.col("__va"), F.col("__vb")), 6))
            .where(F.col("cosine") >= tau)
            .select("id_a", "id_b", "cosine")
            .dropDuplicates(["id_a", "id_b"])
        )

    def make_df(dim):
        base = rng.normal(size=(1000, dim))
        vecs = np.vstack([base, base + rng.normal(scale=0.01, size=base.shape)])
        pdf = pd.DataFrame(
            {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
        )
        return spark.createDataFrame(pdf).localCheckpoint(eager=True)

    results = {}
    df1024 = make_df(1024)
    for name, out in [
        ("old_dim1024", old_plan(df1024, 0.95, 1024)),
        ("new_dim1024", embedding_dedup_pairs(df1024, tau=0.95, dim=1024)),
        ("new_dim64", embedding_dedup_pairs(make_df(64), tau=0.95, dim=64)),
    ]:
        before = shuffle_write_bytes(4049, app_id)
        n = out.count()
        after = shuffle_write_bytes(4049, app_id)
        results[name] = {"pairs": n, "shuffle_write_bytes": after - before}
    results["old_over_new_at_1024"] = round(
        results["old_dim1024"]["shuffle_write_bytes"]
        / max(results["new_dim1024"]["shuffle_write_bytes"], 1),
        1,
    )
    results["new_1024_over_64"] = round(
        results["new_dim1024"]["shuffle_write_bytes"]
        / max(results["new_dim64"]["shuffle_write_bytes"], 1),
        2,
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
