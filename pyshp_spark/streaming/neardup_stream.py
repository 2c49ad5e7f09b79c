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

State-store layout (the 100 TB shape):

* Both stores carry a second partition column ``__bucket`` =
  pmod(xxhash64(probe key), _NUM_BUCKETS) — bands bucket on
  (band, band_sig), texts on id.  A per-batch probe first computes the
  (bounded, <= _NUM_BUCKETS) set of buckets its own keys hash to and
  filters the corpus read with a literal IN, so Spark's partition
  pruning skips every non-matching bucket directory at listing time.
  For the text side this prunes hard every batch (the candidate set is
  tiny); for the band side it prunes trickle batches (a large batch
  touches every bucket — inherent to an LSH probe without an index
  server).  Band files are additionally sorted by (band, band_sig) so
  parquet row-group stats skip within files.
* Every ``compact_every`` batches the accumulated ``batch_id=N``
  directories fold into ONE consolidated partition (named after the
  newest compacted batch), so directory count — and with it listing
  cost and small-file count — stays bounded by
  O(compact_every x buckets) instead of growing one directory per
  micro-batch forever.  Compaction is crash-safe and retry-idempotent:
  it only ever touches batches ``< current`` (already committed by the
  streaming engine, never retried), stages into a dot-prefixed temp
  dir that Spark's file listing ignores, requires the temp's _SUCCESS
  marker before retiring old directories, and dedups on the state key
  so a partially-compacted store re-compacts to the same rows.

Semantics note (first-arrival-wins + member→keeper mapping): with the
default ``track_dropped=True``, EVERY batch doc's bands and text
persist — dropped members carry a ``keeper`` pointer to their accepted
representative (their intra-batch keeper, or, for clusters that hit
the corpus, the matched corpus doc's own keeper).  A later doc that
near-duplicates only a dropped non-keeper member of an earlier batch —
but not that cluster's keeper (Jaccard is not transitive) — is
therefore still REJECTED and resolves to the accepted representative,
matching what the batch pipeline's connected components over the full
stream would have chained.  The cost is state that grows with the RAW
stream rather than the deduped corpus — compaction claws much of it
back by folding fully-redundant band rows (same band slice, same
representative, same text: retries and re-admitted content), so the
compacted band store is bounded by the DISTINCT (signature,
representative, text) population.  Pass ``track_dropped=False`` to
restore the corpus-proportional store and the (then-documented)
first-arrival-wins divergence: acceptance judged against accepted
docs only.

MIGRATION NOTE (round-6 behavior change): ``track_dropped=True``
became the default in round 6.  A deployment upgrading with a
PRE-EXISTING state directory keeps its old (accepted-docs-only) rows —
those still work — but from the upgrade on, state grows with the raw
stream unless ``track_dropped=False`` is passed explicitly, and
accept/reject decisions can differ for arrivals that chain through
previously-unpersisted dropped members.  Pick the flag deliberately
when attaching to an old store.

The reference has no streaming surface (SURVEY.md §2.10); this is the
engine's forward-looking ingest-bus shape, mirroring
``streaming_exact_dedup``'s first-arrival-wins contract at near-dup
granularity.
"""

from __future__ import annotations

import json
import os
import shutil

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
_TEXTS_SCHEMA_FILE = "_texts_schema.json"

#: hash buckets per state store: the partition-pruning granularity.
#: Listing cost after compaction is O(_NUM_BUCKETS); a probe that
#: touches B distinct buckets reads B/_NUM_BUCKETS of the store.
_NUM_BUCKETS = 32


def _bucket_of(*cols) -> F.Column:
    return F.pmod(F.xxhash64(*cols), F.lit(_NUM_BUCKETS))


def _batch_id_of(dirname: str) -> int | None:
    """The N of a ``batch_id=N`` state directory, or None for anything
    else (including a stray non-integer ``batch_id=`` name, which used
    to raise ValueError out of every listing site)."""
    if not dirname.startswith("batch_id="):
        return None
    try:
        return int(dirname.split("=", 1)[1])
    except ValueError:
        return None


# lossless automatic widenings for a drifted batch column vs the
# store's pinned type; anything else fails loudly (a narrowing cast
# would silently wrap ids, an un-castable type would NULL them out)
_INT_WIDTH = {"byte": 0, "short": 1, "integer": 2, "long": 3}


def _is_safe_widening(src, dst) -> bool:
    s, d = src.typeName(), dst.typeName()
    if s in _INT_WIDTH and d in _INT_WIDTH:
        return _INT_WIDTH[s] <= _INT_WIDTH[d]
    return (s, d) == ("float", "double")


def _pinned_texts_schema(
    state_dir: str, b: DataFrame, key: str, text: str, batch_id: int
):
    """The texts store's reader schema, pinned to the STORE, not the
    caller: ``_texts_schema.json`` under ``state_dir`` holds it; every
    batch reads with the pinned one, so the store stays self-describing
    without mergeSchema's per-batch all-footer scan.  Legacy files
    lacking the keeper column NULL-fill it (parquet schema evolution).

    When the pin is absent (a pre-pin store, or a deleted/corrupt
    file) but COMMITTED store data exists, the pin is re-derived from
    the committed partitions' merged footers — a one-time scan, never
    from the current batch, whose types may be exactly the drift the
    pin exists to survive, and never from this batch's own
    uncommitted ``batch_id=N`` half-write (a crashed attempt's files
    must not influence the pin).  Errors reading COMMITTED partitions
    propagate — a store that cannot describe itself is corruption to
    surface, not paper over.  Only a genuinely fresh store pins from
    the first batch's types.  The pin is written atomically (tmp +
    rename) and is idempotent under batch retry."""
    from pyspark.sql.types import (  # noqa: PLC0415
        LongType, StructField, StructType,
    )

    path = os.path.join(state_dir, _TEXTS_SCHEMA_FILE)
    try:
        with open(path) as f:
            return StructType.fromJson(json.load(f))
    except (OSError, ValueError, KeyError, TypeError):
        # TypeError included: a pin whose JSON parses but is not a
        # StructType description must fall through to re-derivation,
        # not crash every subsequent batch
        pass
    id_t = text_t = None
    texts_path = os.path.join(state_dir, _TEXTS_SUB)
    committed = []
    if os.path.isdir(texts_path):
        committed = [
            os.path.join(texts_path, d)
            for d in os.listdir(texts_path)
            if (bid := _batch_id_of(d)) is not None and bid < batch_id
        ]
    if committed:
        store = b.sparkSession.read.option("mergeSchema", "true").parquet(
            *committed
        )
        try:
            id_t = store.schema["id"].dataType
            text_t = store.schema["text"].dataType
        except KeyError as e:
            raise ValueError(
                f"texts store under {texts_path} lacks expected column "
                f"{e}; cannot derive a reader schema from it"
            ) from None
    if id_t is None:
        id_t = b.schema[key].dataType
        text_t = b.schema[text].dataType
    schema = StructType([
        StructField("id", id_t),
        StructField("text", text_t),
        StructField("keeper", id_t),  # NULL-filled in legacy files
        StructField("batch_id", LongType()),   # partition dirs
        StructField("__bucket", LongType()),
    ])
    os.makedirs(state_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(schema.jsonValue(), f)
    os.replace(tmp, path)
    return schema


def _error_condition(e) -> str:
    """The structured error class of a Spark exception — matched on in
    preference to message substrings, which drift across versions."""
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(e, attr, None)
        if fn is not None:
            try:
                cond = fn()
            except Exception:
                continue
            if cond:
                return cond
    return ""


def _read_state(
    spark: SparkSession, path: str, batch_id: int,
    schema=None,
) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    if not os.path.isdir(path):
        return None
    try:
        # explicit schema (texts store): a store can mix partitions
        # written before keeper tracking with partitions after (or
        # across track_dropped settings); plain schema inference
        # samples ONE file and would make the keeper column randomly
        # visible or invisible, and mergeSchema re-reads EVERY file
        # footer per micro-batch — measured as per-batch wall ramping
        # linearly with state file count until compaction.  A declared
        # schema gets the merged view for free: parquet reads NULL-fill
        # columns a file lacks.  The bands store's schema never varies,
        # so it stays on single-file inference.
        if schema is not None:
            # mirror inference's "dir exists but holds no partitions
            # yet" -> empty corpus (an explicit schema would otherwise
            # happily return an empty frame for a half-created store)
            if not any(
                d.startswith("batch_id=") for d in os.listdir(path)
            ):
                return None
            df = spark.read.schema(schema).parquet(path)
        else:
            df = spark.read.parquet(path)
    except AnalysisException as e:
        # only "dir exists but holds no readable parquet yet" (a first
        # batch's own half-write) means an empty corpus.  Any OTHER
        # analysis error — conflicting directory layout, duplicate
        # columns, schema drift — must propagate and fail the batch:
        # treating it as "no corpus" would silently accept duplicates
        # and pollute the store.  Match the structured error class
        # first; the message substring is a fallback for versions
        # without one.
        cond = _error_condition(e)
        empty = {"UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND"}
        if any(c in cond for c in empty) or any(c in str(e) for c in empty):
            return None
        raise
    # ignore this batch's own half-written state from a failed attempt
    return df.where(F.col("batch_id") < F.lit(batch_id))


def _write_state_partition(
    df: DataFrame, path: str, sort_cols: list[str]
) -> None:
    """One ``batch_id=N`` state partition: sub-partitioned by
    ``__bucket`` (pruning), one file per bucket (repartition), rows
    sorted so parquet min/max stats are tight."""
    (
        df.repartition("__bucket")
        .sortWithinPartitions(*sort_cols)
        .write.partitionBy("__bucket")
        .mode("overwrite")
        .parquet(path)
    )


def _finish_compaction(path: str, tmp_name: str) -> None:
    """Retire the source ``batch_id=N`` dirs of a COMPLETED staging dir
    (``.compact_tmp_<cid>`` holding a _SUCCESS marker) and promote it to
    ``batch_id=<cid - 1>``.  rmtree failures propagate — silently
    ignoring them could leave the rename destination occupied and a
    half-retired store behind."""
    cid = int(tmp_name.rsplit("_", 1)[1])
    for d in os.listdir(path):
        bid = _batch_id_of(d)
        if bid is not None and bid < cid:
            shutil.rmtree(os.path.join(path, d))
    os.rename(os.path.join(path, tmp_name), os.path.join(path, f"batch_id={cid - 1}"))


def _recover_compaction(path: str) -> None:
    """Finish or discard any orphaned compaction staging dir — called
    UNCONDITIONALLY at every batch start (not just on the compaction
    cadence), so a crash between staging and promotion can never leave
    the store invisible: a changed ``compact_every`` (or 0) after the
    crash would otherwise silently empty the corpus and re-admit
    duplicates.  Staging dirs with _SUCCESS are promoted; half-written
    ones (sources intact) are dropped."""
    if not os.path.isdir(path):
        return
    for d in os.listdir(path):
        if not d.startswith(".compact_tmp_"):
            continue
        if os.path.exists(os.path.join(path, d, "_SUCCESS")):
            _finish_compaction(path, d)
        else:
            shutil.rmtree(os.path.join(path, d))


def _compact_state(
    spark: SparkSession,
    path: str,
    batch_id: int,
    key_cols: list[str],
    sort_cols: list[str],
    collapse=None,
) -> None:
    """Fold every ``batch_id=N`` directory with N < ``batch_id`` into a
    single consolidated partition named ``batch_id=<batch_id - 1>``.

    Crash-safe at every step when the processing of ``batch_id`` is
    retried: batches < current are committed (never retried), the temp
    dir is dot-prefixed (invisible to Spark reads), old directories are
    retired only once the temp's _SUCCESS marker exists (and a crash
    mid-retirement is finished by :func:`_recover_compaction` at the
    next batch start, whatever the cadence), and the pre-compaction
    dedup on ``key_cols`` makes a re-run over a partially-retired store
    produce identical rows.

    ``collapse``: optional store-specific reducer applied to the
    consolidated frame before the write (deterministic, so re-runs
    still produce identical rows) — the bands store uses it to fold
    fully-redundant rows (see :func:`neardup_filter_batch`)."""
    if not os.path.isdir(path):
        return
    old = [
        d
        for d in os.listdir(path)
        if (bid := _batch_id_of(d)) is not None and bid < batch_id
    ]
    tmp_name = f".compact_tmp_{batch_id}"
    tmp = os.path.join(path, tmp_name)
    done = os.path.exists(os.path.join(tmp, "_SUCCESS"))
    if len(old) <= 1 and not done:
        return
    if not done:
        if os.path.isdir(tmp):
            # half-write from a crashed attempt; sources are intact
            shutil.rmtree(tmp)
        # mergeSchema: compaction REWRITES the store from this read —
        # a single-file schema sample over mixed keeper-less/keeper-full
        # partitions could consolidate WITHOUT the keeper column,
        # permanently erasing the member→keeper pointers
        df = (
            spark.read.option("mergeSchema", "true").parquet(path)
            .where(F.col("batch_id") < F.lit(batch_id))
            .dropDuplicates(key_cols)
            .drop("batch_id")
        )
        if collapse is not None:
            df = collapse(df)
        (
            df.repartition("__bucket")
            .sortWithinPartitions(*sort_cols)
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(tmp)
        )
    _finish_compaction(path, tmp_name)


def _pruned(corpus: DataFrame, probe: DataFrame, bucket_col) -> DataFrame:
    """Filter a state read to the (bounded) set of ``__bucket`` values
    the probe side's keys hash into — a literal IN, so the non-matching
    bucket directories are pruned at file-listing time.  The collect is
    at most _NUM_BUCKETS small integers."""
    buckets = [
        r[0]
        for r in probe.select(bucket_col.alias("__b")).distinct().collect()
    ]
    if len(buckets) >= _NUM_BUCKETS:
        return corpus
    return corpus.where(F.col("__bucket").isin(buckets))


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
    compact_every: int = 16,
    track_dropped: bool = True,
) -> DataFrame:
    """One micro-batch of the streaming near-dup filter: returns the
    ACCEPTED rows of ``batch_df`` (all original columns) and writes
    banded signatures + texts into ``state_dir``'s per-batch
    partitions.  Deterministic given (batch content, prior state):
    within the batch the smallest id per near-dup cluster wins, and an
    intra-batch cluster is dropped WHOLE when any of its members
    near-duplicates an already-accepted corpus doc (its canonical
    representative already lives in the corpus).  Every
    ``compact_every`` batches the state directories fold into one
    consolidated partition (set ``compact_every=0`` to disable).

    ``track_dropped=True`` (default) persists DROPPED docs' bands and
    texts too, each with a ``keeper`` pointer to its accepted
    representative — so a later arrival that near-dups only a dropped
    member is still rejected and maps to the representative (batch-
    equivalent chaining; see module docstring for the state-size
    trade-off)."""
    spark = batch_df.sparkSession
    # unconditional: a crash mid-compaction must be repaired even if the
    # cadence changed (or compaction was disabled) since
    _recover_compaction(os.path.join(state_dir, _BANDS_SUB))
    _recover_compaction(os.path.join(state_dir, _TEXTS_SUB))
    # pinned BEFORE compaction: the band-collapse below reads the texts
    # store with the pinned schema (compaction preserves the schema, so
    # deriving first changes nothing else)
    texts_schema = _pinned_texts_schema(state_dir, batch_df, key, text,
                                        batch_id)
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:

        def _collapse_bands(df: DataFrame) -> DataFrame:
            """Fold fully-redundant band rows: two corpus members with
            the SAME band slice, the SAME accepted representative and
            the SAME text (retries; re-admitted content re-sent under
            fresh ids) are interchangeable for every future probe — a
            collision with either verifies against an identical text
            and resolves to the identical keeper — so one row (the
            smallest id) suffices.  Rows that differ in text or
            representative are NEVER merged: they could verify
            differently.  This bounds the track_dropped band store by
            the DISTINCT (band_sig, rep, text) population instead of
            the raw stream."""
            texts = _read_state(
                spark, os.path.join(state_dir, _TEXTS_SUB), batch_id,
                schema=texts_schema,
            )
            if texts is None:
                return df
            t = texts.select(
                F.col("id").alias("__tid"),
                F.coalesce(F.col("keeper"), F.col("id")).alias("__rep"),
                F.col("text").alias("__txt"),
            ).dropDuplicates(["__tid"])
            j = df.join(t, df["id"] == F.col("__tid"), "left")
            # a band row with no text row (foreign/corrupt store) keeps
            # its own id as the group key — never collapsed
            rep = F.coalesce(F.col("__rep"), F.col("id"))
            return (
                j.groupBy(
                    F.col("band"), F.col("band_sig"),
                    rep.alias("__grp_rep"), F.col("__txt"),
                )
                .agg(F.min("id").alias("id"))
                .select("id", "band", "band_sig")
                .withColumn(
                    "__bucket", _bucket_of(F.col("band"), F.col("band_sig"))
                )
            )

        _compact_state(
            spark, os.path.join(state_dir, _BANDS_SUB), batch_id,
            key_cols=["id", "band"], sort_cols=["band", "band_sig"],
            collapse=_collapse_bands,
        )
        _compact_state(
            spark, os.path.join(state_dir, _TEXTS_SUB), batch_id,
            key_cols=["id"], sort_cols=["id"],
        )
    b = batch_df
    # normalize drifted key/text types to the STORE's pinned types
    # before any state write or corpus join: mixing (say) int32 and
    # int64 files inside one store would break its single-footer
    # inference reads.  Only LOSSLESS widenings cast automatically —
    # a narrowing or un-castable drift (which a cast would silently
    # wrap or NULL out, vanishing whole batches) fails loudly.  The
    # returned survivors then carry the pinned key type.
    for col_name, pinned_f in ((key, texts_schema["id"]),
                               (text, texts_schema["text"])):
        have, want = b.schema[col_name].dataType, pinned_f.dataType
        if have == want:
            continue
        if _is_safe_widening(have, want):
            b = b.withColumn(col_name, F.col(col_name).cast(want))
            continue
        raise TypeError(
            f"batch column {col_name!r} is {have.simpleString()} but the "
            f"near-dup state under {state_dir} is pinned to "
            f"{want.simpleString()}; only lossless widenings apply "
            "automatically — fix the producer or migrate the store"
        )
    b = b.dropDuplicates([key]).localCheckpoint(eager=True)

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
        spark, os.path.join(state_dir, _TEXTS_SUB), batch_id,
        schema=texts_schema,
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
    cluster_rep = None  # keeper_id -> accepted representative, corpus hits
    if corpus_bands is not None and corpus_texts is not None:
        corpus_bands = _pruned(
            corpus_bands, all_bands, _bucket_of(F.col("band"), F.col("band_sig"))
        )
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
            .localCheckpoint(eager=True)
        )
        # the candidate set is tiny (band collisions only), so its id
        # buckets prune the TEXT store scan hard — the store's fat side
        corpus_texts = _pruned(
            corpus_texts, cand, _bucket_of(F.col("__cid"))
        )
        verify = true_jaccard_udf(width)
        # a corpus hit resolves to the matched doc's OWN keeper: a
        # tracked dropped member forwards to its accepted
        # representative.  The pinned reader schema always declares
        # keeper; rows from keeper-less legacy partitions (written
        # before keeper tracking, or with track_dropped=False — both
        # hold accepted docs only) read keeper=NULL and coalesce to
        # the doc's own id, so __ck is never NULL and min() can't
        # pick a dangling pointer.
        rep_col = F.coalesce(F.col("keeper"), F.col("id"))
        dup_hits = (
            cand.join(
                b.select(F.col(key).alias("__nid"), F.col(text).alias("__ta")),
                on="__nid",
            )
            .join(
                corpus_texts.select(
                    F.col("id").alias("__cid"), F.col("text").alias("__tb"),
                    rep_col.alias("__ck"),
                ),
                on="__cid",
            )
            .where(F.round(verify("__ta", "__tb"), 6) >= threshold)
            .select("__nid", "__ck")
        )
        # pin the verify result: cluster_rep feeds TWO actions (the
        # survivors checkpoint's anti-join and, under track_dropped,
        # the texts state write via `mapping`) — without this the
        # dominant per-batch cost (pairwise Jaccard against corpus
        # texts) runs twice.  It is tiny: one row per hit cluster.
        cluster_rep = (
            keepers.join(dup_hits, on=F.col(key) == F.col("__nid"))
            .groupBy("keeper_id")
            .agg(F.min("__ck").alias("__rep"))
            .localCheckpoint(eager=True)
        )
        keep = keep.join(
            cluster_rep.select("keeper_id"), on="keeper_id", how="left_anti"
        )
    survivors = b.join(keep.select(key), on=key).localCheckpoint(eager=True)

    # 3. write state into per-batch partition dirs (overwrite: a
    # retried batch replaces its own half-written state instead of
    # appending a duplicate copy).  track_dropped persists EVERY batch
    # doc's bands + text with a keeper pointer (member→keeper mapping);
    # otherwise only survivors persist (corpus-proportional store).
    if track_dropped:
        mapping = keepers.select(key, "keeper_id")
        if cluster_rep is not None:
            mapping = mapping.join(cluster_rep, on="keeper_id", how="left")
            mapping = mapping.select(
                key, F.coalesce("__rep", "keeper_id").alias("keeper")
            )
        else:
            mapping = mapping.select(
                key, F.col("keeper_id").alias("keeper")
            )
        band_rows = all_bands
        text_rows = (
            b.select(F.col(key).alias("id"), F.col(text).alias("text"))
            .join(
                mapping.select(F.col(key).alias("id"), "keeper"), on="id"
            )
        )
    else:
        band_rows = all_bands.join(
            survivors.select(F.col(key).alias("id")), on="id", how="left_semi"
        )
        text_rows = survivors.select(
            F.col(key).alias("id"), F.col(text).alias("text")
        )
    _write_state_partition(
        band_rows.withColumn(
            "__bucket", _bucket_of(F.col("band"), F.col("band_sig"))
        ),
        os.path.join(state_dir, _BANDS_SUB, f"batch_id={batch_id}"),
        sort_cols=["band", "band_sig"],
    )
    _write_state_partition(
        text_rows.withColumn("__bucket", _bucket_of(F.col("id"))),
        os.path.join(state_dir, _TEXTS_SUB, f"batch_id={batch_id}"),
        sort_cols=["id"],
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
    compact_every: int = 16,
    track_dropped: bool = True,
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
            compact_every=compact_every, track_dropped=track_dropped,
        )
        kept.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={int(batch_id)}")
        )

    return fb
