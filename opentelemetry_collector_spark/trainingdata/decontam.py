"""Benchmark decontamination: flag training documents that share
n-grams with an evaluation/benchmark set.

The standard pretraining-hygiene step (GPT-3 App. C / Llama style:
13-gram overlap against every eval benchmark): any training document
containing an n-gram that also appears in the eval set is contaminated
— leaving it in inflates benchmark scores without improving the model.

Scale design (100 TB corpus, benchmark sets of 10^4..10^7 n-grams):

  * the eval n-gram set is DISTINCT'd once on the tiny side and
    broadcast — the corpus side never shuffles its n-grams;
  * the corpus side is scan → project(n-gram array) → explode →
    BroadcastHashJoin → partial count; because every n-gram of a
    document sits in the same input partition, map-side partial
    aggregation collapses the join output to AT MOST ONE ROW PER
    CONTAMINATED DOCUMENT before the only exchange (keyed on doc id);
  * n-grams cross the broadcast as strings here for DuckDB oracle
    parity; at production scale hash them first (``production_hash``)
    so the broadcast holds 8-byte longs — same plan, ~10x smaller.

Reference parity: the reference collector has no decontamination
stage (it is a telemetry pipeline); this operator belongs to the
training-data family the build brief adds on top. Semantics follow
the published n-gram-collision definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col

DEFAULT_DECONTAM_N = 8  # 8..13-token windows are the published range


def eval_ngram_set(
    eval_docs: DataFrame, n: int = DEFAULT_DECONTAM_N, text_col: str = "text"
) -> DataFrame:
    """Distinct n-grams of the evaluation corpus, as a one-column
    frame ``(g)`` ready to broadcast. Documents shorter than ``n``
    tokens contribute their whole text as a single n-gram (same
    fallback as ``shingles_col``), so short benchmark prompts are
    still protected."""
    return (
        eval_docs.select(F.explode(shingles_col(F.col(text_col), n)).alias("g"))
        .distinct()
    )


def contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_DECONTAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination report: for every training document
    that shares at least one n-gram with ``eval_docs``, return
    ``(id, total_ngrams, hit_ngrams, contamination)`` where
    ``contamination = hit_ngrams / total_ngrams`` (distinct n-grams,
    rounded to 6dp for cross-engine float stability). Clean documents
    do not appear — the common case at scale, so the result is small.
    """
    ev = F.broadcast(eval_ngram_set(eval_docs, n, text_col))
    ng = docs.select(
        F.col(id_col), shingles_col(F.col(text_col), n).alias("ngs")
    ).select(
        id_col,
        F.size("ngs").cast("long").alias("total_ngrams"),
        F.explode("ngs").alias("g"),
    )
    return (
        ng.join(ev, "g")
        .groupBy(id_col, "total_ngrams")
        .agg(F.count(F.lit(1)).alias("hit_ngrams"))
        .select(
            id_col,
            "total_ngrams",
            "hit_ngrams",
            F.round(
                F.col("hit_ngrams").cast("double")
                / F.col("total_ngrams").cast("double"),
                6,
            ).alias("contamination"),
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_DECONTAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """The filter form: drop every document with more than ``max_hits``
    eval-overlapping n-grams (default 0 — any collision removes the
    document, the strict published policy). Left-anti join against the
    small contaminated-id set, so the corpus passes through untouched
    except for the drop."""
    bad = contamination(docs, eval_docs, n, id_col, text_col).filter(
        F.col("hit_ngrams") > max_hits
    )
    return docs.join(F.broadcast(bad.select(id_col)), id_col, "left_anti")
