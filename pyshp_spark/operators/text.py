"""Text-analysis operators for large-scale training-data pipelines.

All hot-path metrics are pure Column expressions (JVM codegen, no
Python); only the rolling-hash fingerprint crosses into an Arrow
pandas UDF.  Each operator has an exact ANSI-SQL mirror used by the
DuckDB oracle (see __spark_entry__.py), so semantics are pinned:

- token_count: non-empty chunks after splitting on ``\\s+``;
- quality metrics: char len, token count, punctuation count, alpha
  ratio, stopword ratio; quality_score = weighted combination;
- lang_id: stopword-hit voting between small EN/ES/FR/DE lists with a
  deterministic tie-break order (en > es > fr > de);
- fingerprint: 64-bit polynomial rolling hash of the normalized text
  (vectorized pandas UDF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

PUNCT_CLASS = "[.,!?;:]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "des", "du", "est"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"],
}
LANG_ORDER = ["en", "es", "fr", "de"]  # tie-break priority


def tokens_expr(text: Column) -> Column:
    """Non-empty whitespace-separated tokens of lower-cased text."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the classic GPT-2-style split shape, restricted to a regex that
# behaves identically in Java (Spark) and RE2 (DuckDB) so the count has
# an exact SQL oracle
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count_expr(text: Column) -> Column:
    """Sub-word-ish token count: one token per letter run / digit run /
    punctuation char.  A cheap, deterministic proxy for BPE token
    budgeting over a 100 TB corpus — pure Column regex, codegen'd."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def bpe_token_count_sql(text: str) -> str:
    return f"len(regexp_extract_all({text}, '{BPE_TOKEN_PATTERN}'))"


def stopword_hits_expr(text: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(
        F.filter(tokens_expr(text), lambda t: F.array_contains(words, t))
    )


def punct_count_expr(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))


def alpha_ratio_expr(text: Column) -> Column:
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    return alpha / F.greatest(F.length(text), F.lit(1))


def with_text_quality(df: DataFrame, text: str = "text") -> DataFrame:
    """Adds n_chars_q, n_tokens, punct_cnt, alpha_ratio, stop_ratio,
    quality_score columns.  quality_score in [0,1], higher = cleaner."""
    t = F.col(text)
    out = (
        df.withColumn("n_chars_q", F.length(t).cast("long"))
        .withColumn("n_tokens", token_count_expr(t).cast("long"))
        .withColumn("punct_cnt", punct_count_expr(t).cast("long"))
        .withColumn("alpha_ratio", F.round(alpha_ratio_expr(t), 6))
        .withColumn(
            "stop_ratio",
            F.round(
                stopword_hits_expr(t, "en")
                / F.greatest(token_count_expr(t), F.lit(1)),
                6,
            ),
        )
    )
    return out.withColumn(
        "quality_score",
        F.round(
            F.least(F.col("alpha_ratio") * 0.5 + F.col("stop_ratio") * 2.0, F.lit(1.0)),
            6,
        ),
    )


def with_lang_id(df: DataFrame, text: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-voting language id with deterministic tie-break."""
    t = F.col(text)
    hits = {lang: stopword_hits_expr(t, lang) for lang in LANG_ORDER}
    best = hits[LANG_ORDER[0]]
    for lang in LANG_ORDER[1:]:
        best = F.greatest(best, hits[lang])
    expr = F.lit("unknown")
    # reverse order so earlier languages win ties
    for lang in reversed(LANG_ORDER):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return df.withColumn(out, expr)


# SQL mirrors (DuckDB dialect) -------------------------------------------

def tokens_sql(text: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({text}), '\\s+'), x -> x <> '')"
    )


def token_count_sql(text: str) -> str:
    return f"len({tokens_sql(text)})"


def stopword_hits_sql(text: str, lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({tokens_sql(text)}, x -> x IN ({inlist})))"


def quality_sql_columns(text: str) -> dict[str, str]:
    tc = token_count_sql(text)
    return {
        "n_chars_q": f"CAST(length({text}) AS BIGINT)",
        "n_tokens": f"CAST({tc} AS BIGINT)",
        "punct_cnt": (
            f"CAST(length({text}) - length(regexp_replace({text}, '{PUNCT_CLASS}', '', 'g')) AS BIGINT)"
        ),
        "alpha_ratio": (
            f"round(length(regexp_replace({text}, '[^A-Za-z]', '', 'g'))"
            f" / greatest(length({text}), 1), 6)"
        ),
        "stop_ratio": f"round({stopword_hits_sql(text, 'en')} / greatest({tc}, 1), 6)",
    }


def lang_id_sql(text: str) -> str:
    h = {lang: stopword_hits_sql(text, lang) for lang in LANG_ORDER}
    best = f"greatest({', '.join(h.values())})"
    expr = "'unknown'"
    for lang in reversed(LANG_ORDER):
        expr = (
            f"CASE WHEN {h[lang]} > 0 AND {h[lang]} = {best} THEN '{lang}' "
            f"ELSE {expr} END"
        )
    return expr


# fingerprint -------------------------------------------------------------

_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint64(texts: pd.Series) -> pd.Series:
    """64-bit polynomial rolling hash over UTF-8 bytes, arithmetic mod
    2**64 (uint64 wrap-around): h = sum((b_i + 1) * B^(n-1-i)).  Fully
    vectorized per document — no per-byte Python loop."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        b = np.frombuffer(("" if t is None else t).encode("utf-8"), dtype=np.uint8)
        n = len(b)
        if n == 0:
            out[i] = _FP_OFFSET
            continue
        powers = np.full(n, _FP_BASE, dtype=np.uint64)
        powers[0] = 1
        powers = np.cumprod(powers)  # B^0 .. B^(n-1), wrapping mod 2^64
        out[i] = np.sum((b.astype(np.uint64) + 1) * powers[::-1], dtype=np.uint64)
    return pd.Series(out.astype(np.int64))


def fingerprint_udf():
    return F.pandas_udf(fingerprint64, LongType())


def with_fingerprint(df: DataFrame, text: str = "text", out: str = "fp64") -> DataFrame:
    return df.withColumn(out, fingerprint_udf()(F.col(text)))


# tf-idf top-k terms ------------------------------------------------------

def topk_terms(
    df: DataFrame,
    k: int = 5,
    doc_id: str = "doc_id",
    text: str = "text",
    broadcast_df: bool = True,
) -> DataFrame:
    """Top-``k`` most *discriminative* terms per document: rank terms by
    tf/df — term frequency in the doc over corpus document frequency
    (classic tf-idf with the monotone-equivalent 1/df idf; the corpus
    size N scales every doc identically so it never changes the ranking
    and is dropped to keep the arithmetic exact).

    The score is pure integer arithmetic — ``(tf * 1_000_000) div df``
    — so ranking is bit-identical across engines; ties break on the
    term's binary string order.  All stages are built-in DataFrame ops:

    * explode + two hash aggregations (one per-(doc, term), one
      per-term document frequency);
    * the df side is vocab-sized, not corpus-sized, so it broadcasts
      (``broadcast_df=False`` for web-scale vocabularies to take the
      shuffled equi-join instead);
    * one window per doc for the top-k.

    At 100 TB: the explode never materializes — it feeds straight into
    the partial (map-side) aggregation; the only corpus-sized shuffle
    keys on (doc, term).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    # null-id rows are excluded outright: with them, the tf-derived df
    # would count a phantom "null document" per term (the old
    # count_distinct silently skipped nulls; this makes it explicit)
    toks = df.where(F.col(doc_id).isNotNull()).select(
        F.col(doc_id), F.explode(tokens_expr(F.col(text))).alias("term")
    )
    tf = toks.groupBy(doc_id, "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf already holds one row per distinct (doc, term), so document
    # frequency is a plain count over it — no second corpus explode, no
    # count_distinct re-dedup of what tf's shuffle just produced
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if broadcast_df:
        dfreq = F.broadcast(dfreq)
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.expr("(tf * 1000000L) div df")
    )
    w = Window.partitionBy(doc_id).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select(doc_id, "term", "tf", "df", "score")
    )


def topk_terms_sql(table: str, k: int = 5, doc_id: str = "doc_id", text: str = "text") -> str:
    """DuckDB mirror of :func:`topk_terms` — same integer score, same
    tie-break."""
    toks = tokens_sql(text)
    return f"""
        WITH toks AS (
            SELECT {doc_id}, unnest({toks}) AS term FROM {table}
            WHERE {doc_id} IS NOT NULL
        ), tf AS (
            SELECT {doc_id}, term, CAST(count(*) AS BIGINT) AS tf
            FROM toks GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, CAST(count(*) AS BIGINT) AS df
            FROM tf GROUP BY 1
        )
        SELECT {doc_id}, term, tf, df, score FROM (
            SELECT tf.{doc_id}, tf.term, tf.tf, dfreq.df,
                   (tf.tf * 1000000) // dfreq.df AS score,
                   row_number() OVER (
                       PARTITION BY tf.{doc_id}
                       ORDER BY (tf.tf * 1000000) // dfreq.df DESC, tf.term ASC
                   ) AS rk
            FROM tf JOIN dfreq USING (term)
        ) WHERE rk <= {k}
    """
