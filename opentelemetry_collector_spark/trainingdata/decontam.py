"""Benchmark decontamination: flag training documents that share
n-grams with an evaluation/benchmark set.

The standard pretraining-hygiene step (GPT-3 App. C / Llama style:
13-gram overlap against every eval benchmark): any training document
containing an n-gram that also appears in the eval set is contaminated
— leaving it in inflates benchmark scores without improving the model.
Eval examples SHORTER than ``n`` tokens are matched by containment:
their whole text is one gram, and the training side additionally
generates grams of exactly those short widths, so a benchmark prompt
embedded verbatim inside a longer training document still collides
(the published policy's substring rule for short examples).

Scale design (100 TB corpus, benchmark sets of 10^4..10^7 n-grams):

  * the eval n-gram set is DISTINCT'd once on the tiny side and
    broadcast — the corpus side never shuffles its n-grams;
  * the corpus side is scan → project(n-gram array) → explode →
    BroadcastHashJoin → partial count; because every n-gram of a
    document sits in the same input partition, map-side partial
    aggregation collapses the join output to AT MOST ONE ROW PER
    CONTAMINATED DOCUMENT before the only exchange (keyed on doc id);
  * the short-width list is collected from the EVAL side only (≤ n−1
    distinct integers from the small-by-contract benchmark frame),
    never from the corpus;
  * n-grams cross the broadcast as strings by default for DuckDB
    oracle parity; ``hash_grams=True`` is the production path — both
    sides hash each gram to a full-width ``xxhash64`` long before the
    join, so the broadcast holds 8-byte longs instead of ~50-byte
    strings (~10× smaller) and the probe compares longs. Full 64 bits,
    NOT the mod-folded ``production_hash``: folding to HASH_MOD
    (~10^9) would birthday-collide at ~10^4.5 grams and every
    collision is a FALSE contamination flag that deletes a clean
    training document; in the 64-bit space 10^9 grams collide with
    p ≈ 0.03 — and a collision costs one extra dropped doc, never a
    missed contamination (hash equality is implied by string
    equality, so recall is exact either way).

Reference parity: the reference collector has no decontamination
stage (it is a telemetry pipeline); this operator belongs to the
training-data family the build brief adds on top. Semantics follow
the published n-gram-collision definition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import overlap_report, shingles_col
from .text import ensure_compute_parallelism, tokens_col

DEFAULT_DECONTAM_N = 8  # 8..13-token windows are the published range


def eval_ngram_set(
    eval_docs: DataFrame, n: int = DEFAULT_DECONTAM_N, text_col: str = "text"
) -> DataFrame:
    """Distinct n-grams of the evaluation corpus, as a one-column
    frame ``(g)`` ready to broadcast. Documents shorter than ``n``
    tokens contribute their whole text as a single gram (same
    fallback as ``shingles_col``); ``contamination`` pairs that with
    matching short-width grams on the training side so short
    benchmark prompts are caught by containment, not just by exact
    whole-document equality."""
    return (
        eval_docs.select(F.explode(shingles_col(F.col(text_col), n)).alias("g"))
        .distinct()
    )


def eval_short_widths(
    eval_docs: DataFrame, n: int, text_col: str = "text"
) -> list[int]:
    """Distinct token widths (< n) present in the eval set — at most
    n−1 integers, collected from the small-by-contract benchmark
    frame (never the corpus). These are the extra gram widths the
    training side must generate for containment matching."""
    rows = (
        eval_docs.select(F.size(tokens_col(F.col(text_col))).alias("w"))
        .filter((F.col("w") > 0) & (F.col("w") < n))
        .distinct()
        .collect()
    )
    return sorted(r["w"] for r in rows)


def _train_grams(col: Column, n: int, short_widths: Sequence[int]) -> Column:
    """Distinct training-side grams: width-n shingles unioned with
    shingles of every eval-present short width, so a short benchmark
    prompt contained in this document appears as one of its grams."""
    grams = shingles_col(col, n)
    for w in sorted(set(short_widths)):
        grams = F.array_union(grams, shingles_col(col, w))
    return grams


def contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_DECONTAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    short_widths: Sequence[int] | str = "auto",
    hash_grams: bool = False,
) -> DataFrame:
    """Per-document contamination report: for every training document
    that shares a gram with ``eval_docs``, return
    ``(id, total_ngrams, hit_ngrams, contamination)`` where
    ``contamination = hit_ngrams / total_ngrams`` over the document's
    distinct grams (rounded to 6dp for cross-engine float stability).
    Clean documents do not appear — the common case at scale, so the
    result is small.

    ``short_widths``: extra training-side gram widths for catching
    eval examples shorter than ``n`` by containment. ``"auto"``
    (default) collects the widths actually present in the eval set
    (one tiny eval-side job); pass an explicit sequence — ``()`` to
    disable — when the eval widths are known, which also skips the
    probe job.

    ``hash_grams``: the production wire format (module docstring) —
    grams cross the broadcast and the join as xxhash64 longs instead
    of strings. Same plan shape, same result on any corpus without a
    64-bit gram collision (``total_ngrams`` is always counted on the
    exact string-distinct gram set, before hashing)."""
    if short_widths == "auto":
        short_widths = eval_short_widths(eval_docs, n, text_col)
    ev_set = eval_ngram_set(eval_docs, n, text_col)
    if hash_grams:
        # hash AFTER the string distinct: distinct-then-hash keeps the
        # eval job identical and the extra distinct below only dedups
        # the (absurdly unlikely) colliding longs on the tiny side
        ev_set = ev_set.select(F.xxhash64("g").alias("g")).distinct()
    ev = F.broadcast(ev_set)
    gram_out = (
        # array_distinct: a within-doc hash collision must not emit the
        # same long twice (each join hit counts once per gram)
        F.explode(F.array_distinct(F.transform(F.col("ngs"), lambda g: F.xxhash64(g))))
        if hash_grams
        else F.explode(F.col("ngs"))
    )
    ng = ensure_compute_parallelism(docs).select(
        F.col(id_col), _train_grams(F.col(text_col), n, short_widths).alias("ngs")
    ).select(
        id_col,
        # total = distinct STRING grams even when hashing: a within-doc
        # hash collision must not change the denominator
        F.size("ngs").cast("long").alias("total_ngrams"),
        gram_out.alias("g"),
    )
    return overlap_report(
        ng, ev, "g", id_col, "total_ngrams", "hit_ngrams", "contamination"
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_DECONTAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits: int = 0,
    short_widths: Sequence[int] | str = "auto",
    hash_grams: bool = False,
) -> DataFrame:
    """The filter form: drop every document with more than ``max_hits``
    eval-overlapping grams (default 0 — any collision removes the
    document, the strict published policy). Left-anti join against the
    contaminated-id set; the join strategy is left to AQE — usually a
    broadcast (few contaminated ids), but it degrades to a shuffle
    anti-join instead of a driver OOM when the eval set overlaps a
    large fraction of the corpus (e.g. eval drawn from the same
    crawl)."""
    bad = contamination(
        docs, eval_docs, n, id_col, text_col, short_widths, hash_grams
    ).filter(F.col("hit_ngrams") > max_hits)
    return docs.join(bad.select(id_col), id_col, "left_anti")
