"""Streaming MinHash near-duplicate filtering against a GROWING corpus.

The batch near-dup pipeline (operators/dedup.py: banded signatures ->
band equi-join -> exact-Jaccard verify -> connected components) answers
"which docs in this corpus duplicate each other".  The streaming
question is different: docs arrive forever, and each micro-batch must
be deduplicated BOTH within itself AND against everything accepted so
far — without ever rescanning the full corpus.

The incremental trick is the same one that makes the batch band join
scale: the accepted corpus is persisted as its BANDED SIGNATURES
(id, band, band_sig — constant bytes per doc regardless of text size)
plus an (id, text) side table used only to verify the (tiny) candidate
set.  Per micro-batch cost is O(batch + collisions), never O(corpus):

1. intra-batch: the full batch pipeline (band join + verify +
   connected components) keeps one canonical doc per new cluster;
2. vs corpus: the batch's banded signatures equi-join the corpus band
   store; colliding pairs attach texts (corpus side from the side
   table) and verify with the exact factorized-Jaccard kernel; any
   batch doc whose cluster already exists in the corpus is dropped;
3. survivors' bands + texts are appended to the store, tagged with the
   micro-batch id — on a retried batch the state reads filter
   ``batch_id < current``, so half-written state from a failed attempt
   can never double-drop or double-keep (idempotent re-run).

The reference has no streaming surface (SURVEY.md §2.10); this is the
engine's forward-looking ingest-bus shape, mirroring
``streaming_exact_dedup``'s first-arrival-wins contract at near-dup
granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyshp_spark.operators.dedup import (
    minhash_banded,
    minhash_dedup_pairs,
    neardup_keepers,
    true_jaccard_udf,
)

_BANDS_SUB = "bands"
_TEXTS_SUB = "texts"


def _read_state(spark: SparkSession, path: str, batch_id: int) -> DataFrame | None:
    if not os.path.isdir(path):
        return None
    try:
        df = spark.read.parquet(path)
    except Exception:
        return None
    # ignore this batch's own half-written state from a failed attempt
    return df.where(F.col("batch_id") < F.lit(batch_id))


def neardup_filter_batch(
    batch_df: DataFrame,
    state_dir: str,
    batch_id: int,
    key: str = "doc_id",
    text: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    width: int = 3,
    threshold: float = 0.5,
    seed: int = 1,
) -> DataFrame:
    """One micro-batch of the streaming near-dup filter: returns the
    ACCEPTED rows of ``batch_df`` (all original columns) and appends
    their banded signatures + texts to ``state_dir``.  Deterministic
    given (batch content, prior state): within the batch the smallest
    id per near-dup cluster wins; any doc near-duplicating an already-
    accepted corpus doc is dropped."""
    spark = batch_df.sparkSession
    b = batch_df.dropDuplicates([key]).localCheckpoint(eager=True)

    # 1. intra-batch near-dup resolution (the batch operators verbatim)
    pairs = minhash_dedup_pairs(
        b, key, text, num_perm, bands, width, threshold, seed
    )
    keepers = neardup_keepers(b, pairs, key)
    survivors = b.join(
        keepers.where(~F.col("is_dup")).select(key), on=key
    ).localCheckpoint(eager=True)

    # 2. vs the accepted corpus: band-collide, attach texts, verify
    new_bands = minhash_banded(
        survivors, key, text, num_perm, bands, width, seed
    ).localCheckpoint(eager=True)
    corpus_bands = _read_state(
        spark, os.path.join(state_dir, _BANDS_SUB), batch_id
    )
    if corpus_bands is not None:
        cand = (
            new_bands.select(F.col("id").alias("__nid"), "band", "band_sig")
            .join(
                corpus_bands.select(
                    F.col("id").alias("__cid"), "band", "band_sig"
                ),
                on=["band", "band_sig"],
            )
            .select("__nid", "__cid")
            .dropDuplicates(["__nid", "__cid"])
        )
        corpus_texts = _read_state(
            spark, os.path.join(state_dir, _TEXTS_SUB), batch_id
        )
        verify = true_jaccard_udf(width)
        dup_ids = (
            cand.join(
                b.select(F.col(key).alias("__nid"), F.col(text).alias("__ta")),
                on="__nid",
            )
            .join(
                corpus_texts.select(
                    F.col("id").alias("__cid"), F.col("text").alias("__tb")
                ),
                on="__cid",
            )
            .where(F.round(verify("__ta", "__tb"), 6) >= threshold)
            .select(F.col("__nid").alias(key))
            .distinct()
        )
        survivors = survivors.join(dup_ids, on=key, how="left_anti")
        new_bands = new_bands.join(
            dup_ids.select(F.col(key).alias("id")), on="id", how="left_anti"
        )
        survivors = survivors.localCheckpoint(eager=True)

    # 3. append the accepted docs' state (bands + texts), batch-tagged
    new_bands.withColumn("batch_id", F.lit(batch_id)).write.mode(
        "append"
    ).parquet(os.path.join(state_dir, _BANDS_SUB))
    survivors.select(
        F.col(key).alias("id"), F.col(text).alias("text")
    ).withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
        os.path.join(state_dir, _TEXTS_SUB)
    )
    return survivors


def minhash_neardup_sink(
    state_dir: str,
    out_dir: str,
    key: str = "doc_id",
    text: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    width: int = 3,
    threshold: float = 0.5,
    seed: int = 1,
):
    """foreachBatch function for a streaming query: only the FIRST
    arrival of each near-dup cluster reaches ``out_dir``.

        stream.writeStream.foreachBatch(
            minhash_neardup_sink(state, out)
        ).start()

    Accepted rows land under ``out_dir/batch_id=N`` (overwritten on a
    retried batch, so the sink is idempotent like the state store)."""

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        kept = neardup_filter_batch(
            batch_df, state_dir, int(batch_id),
            key=key, text=text, num_perm=num_perm, bands=bands,
            width=width, threshold=threshold, seed=seed,
        )
        kept.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={int(batch_id)}")
        )

    return fb
