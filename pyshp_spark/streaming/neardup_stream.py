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
2. vs corpus: ALL batch docs' banded signatures equi-join the corpus
   band store; colliding pairs attach texts (corpus side from the side
   table) and verify with the exact factorized-Jaccard kernel; any
   intra-batch CLUSTER with at least one member near-duplicating an
   accepted corpus doc is dropped whole (its canonical doc already
   exists in the corpus — checking only the cluster keeper would let a
   cluster chained to the corpus through a non-keeper member slip in);
3. survivors' bands + texts land in per-batch partition directories
   (``.../batch_id=N``, overwrite mode) — a retried batch REPLACES its
   own half-written state instead of appending a second copy, and the
   state reads filter ``batch_id < current``, so a failed attempt can
   never double-drop, double-keep, or grow the store (idempotent
   re-run).

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
    from pyspark.errors import AnalysisException

    if not os.path.isdir(path):
        return None
    try:
        df = spark.read.parquet(path)
    except AnalysisException as e:
        # only "dir exists but holds no readable parquet yet" (a first
        # batch's own half-write) means an empty corpus.  Any OTHER
        # analysis error — conflicting directory layout, duplicate
        # columns, schema drift — must propagate and fail the batch:
        # treating it as "no corpus" would silently accept duplicates
        # and pollute the store.
        if "UNABLE_TO_INFER_SCHEMA" in str(e) or "PATH_NOT_FOUND" in str(e):
            return None
        raise
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
    ACCEPTED rows of ``batch_df`` (all original columns) and writes
    their banded signatures + texts into ``state_dir``'s per-batch
    partitions.  Deterministic given (batch content, prior state):
    within the batch the smallest id per near-dup cluster wins, and an
    intra-batch cluster is dropped WHOLE when any of its members
    near-duplicates an already-accepted corpus doc (its canonical
    representative already lives in the corpus)."""
    spark = batch_df.sparkSession
    b = batch_df.dropDuplicates([key]).localCheckpoint(eager=True)

    # signatures are the dominant per-batch compute: materialize them
    # ONCE and feed both the intra-batch pair pipeline and the corpus
    # band join below
    all_bands = minhash_banded(
        b, key, text, num_perm, bands, width, seed
    ).localCheckpoint(eager=True)

    # 1. intra-batch near-dup resolution (the batch operators verbatim)
    pairs = minhash_dedup_pairs(
        b, key, text, num_perm, bands, width, threshold, seed,
        precomputed_bands=all_bands,
    )
    keepers = neardup_keepers(b, pairs, key).localCheckpoint(eager=True)

    # 2. vs the accepted corpus: band-collide ALL batch docs (not just
    # intra-batch keepers — a cluster can chain to the corpus through a
    # member that lost the intra-batch keeper vote), attach texts,
    # verify, and drop every intra-batch cluster with a corpus hit
    corpus_bands = _read_state(
        spark, os.path.join(state_dir, _BANDS_SUB), batch_id
    )
    corpus_texts = _read_state(
        spark, os.path.join(state_dir, _TEXTS_SUB), batch_id
    )
    if (corpus_bands is None) != (corpus_texts is None):
        # one store readable, the other absent.  Legitimate only when
        # the readable one holds NO prior-batch rows (this batch's own
        # half-write being retried); any prior-batch rows without their
        # twin store mean duplicates would be silently re-admitted, so
        # fail loudly instead of skipping the corpus check.
        present = corpus_bands if corpus_bands is not None else corpus_texts
        if present.limit(1).count() > 0:
            raise RuntimeError(
                f"inconsistent near-dup state under {state_dir}: bands "
                f"{'present' if corpus_bands is not None else 'missing'}, "
                f"texts {'present' if corpus_texts is not None else 'missing'}"
            )
        corpus_bands = corpus_texts = None
    keep = keepers.where(~F.col("is_dup"))
    if corpus_bands is not None and corpus_texts is not None:
        cand = (
            all_bands.select(F.col("id").alias("__nid"), "band", "band_sig")
            .join(
                corpus_bands.select(
                    F.col("id").alias("__cid"), "band", "band_sig"
                ),
                on=["band", "band_sig"],
            )
            .select("__nid", "__cid")
            .dropDuplicates(["__nid", "__cid"])
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
        hit_clusters = (
            keepers.join(dup_ids, on=key)
            .select("keeper_id")
            .distinct()
        )
        keep = keep.join(hit_clusters, on="keeper_id", how="left_anti")
    survivors = b.join(keep.select(key), on=key).localCheckpoint(eager=True)
    new_bands = all_bands.join(
        survivors.select(F.col(key).alias("id")), on="id", how="left_semi"
    )

    # 3. write the accepted docs' state into per-batch partition dirs
    # (overwrite: a retried batch replaces its own half-written state
    # instead of appending a duplicate copy)
    new_bands.write.mode("overwrite").parquet(
        os.path.join(state_dir, _BANDS_SUB, f"batch_id={batch_id}")
    )
    survivors.select(
        F.col(key).alias("id"), F.col(text).alias("text")
    ).write.mode("overwrite").parquet(
        os.path.join(state_dir, _TEXTS_SUB, f"batch_id={batch_id}")
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
