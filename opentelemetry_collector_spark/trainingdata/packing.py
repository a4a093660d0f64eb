"""Sequence packing: concat-and-chunk construction of fixed-token
training sequences.

Pretraining pipelines do not feed documents to the model one at a
time — they concatenate the tokenized corpus and slice it into
fixed-length sequences (the GPT-2/3 "chunk every N tokens" layout;
every public stack — Megatron's GPT dataset builder, HF
`group_texts`, Dolma's tokenizer shards — ships a variant). This
implements that layout declaratively:

  * documents are ordered DETERMINISTICALLY (by ``order_col``) inside
    each ``part_col`` group — same input ⇒ same chunks, on any
    cluster, any partitioning, any retry;
  * a window cumulative sum assigns each document its token span
    ``[start, end)`` in the group's virtual token stream;
  * chunk ``k`` covers tokens ``[k*budget, (k+1)*budget)``; a document
    overlaps chunks ``floor(start/budget) .. floor((end-1)/budget)``
    and the (doc, chunk) rows carry how many of the doc's tokens land
    in each chunk — documents straddling a boundary are split, exactly
    like the training layout they mirror.

Scale shape: the cumsum window partitions by ``part_col`` (language,
split, date-bucket...), so groups pack independently and in parallel;
the per-group sort is the order the corpus would be written in anyway.
Everything is exact integer arithmetic — no floats anywhere — so an
external engine reproduces the chunk map bit-for-bit.

Reference parity note: no reference counterpart (the collector ships
telemetry, not training batches); training-data extension family
(SURVEY.md north-star table), like trainingdata/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_chunks", "chunk_stats"]


def pack_chunks(
    df: DataFrame,
    budget: int,
    token_col: str | Column = "n_tokens",
    id_col: str = "doc_id",
    part_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """(part?, chunk_id, id, start, end, tokens_in_chunk) — one row per
    (document, chunk) overlap under the concat-and-chunk layout.
    ``start``/``end`` are the document's token offsets in its group's
    virtual stream; ``tokens_in_chunk`` sums to the document's token
    count across its rows. Zero-token documents are dropped (they
    occupy no chunk space)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql.window import Window

    tok = (F.col(token_col) if isinstance(token_col, str) else token_col).cast(
        "long"
    )
    # ROWS frame, not Spark's default RANGE frame: under RANGE, rows tied
    # on the order key all receive the same cumulative `end`, producing
    # overlapping spans. id_col is appended as a tiebreaker so the ordering
    # is total (id_col must be unique per group) and the ROWS cumsum stays
    # deterministic across partitionings/retries.
    w = (
        (Window.partitionBy(part_col) if part_col else Window.partitionBy())
        .orderBy(order_col or id_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = (
        df.select(
            *([part_col] if part_col else []),
            F.col(id_col).alias("id"),
            tok.alias("_tok"),
            F.sum(tok).over(w).alias("end"),
        )
        .filter(F.col("_tok") > 0)
        .withColumn("start", F.col("end") - F.col("_tok"))
    )
    bb = int(budget)
    b = F.lit(bb).cast("long")
    # Integer `div`, not floor(double division): at offsets near 2^45+
    # IEEE rounding can push (k+1)*budget - 1 over the chunk boundary.
    # start/end are nonnegative, so `div` IS floor division here.
    spans = staged.withColumn(
        "chunk_id",
        F.explode(
            F.sequence(
                F.expr(f"start div {bb}"),
                F.expr(f"(end - 1) div {bb}"),
            )
        ),
    )
    in_chunk = F.least(F.col("end"), (F.col("chunk_id") + 1) * b) - F.greatest(
        F.col("start"), F.col("chunk_id") * b
    )
    return spans.select(
        *([part_col] if part_col else []),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "id",
        "start",
        "end",
        in_chunk.alias("tokens_in_chunk"),
    )


def chunk_stats(packed: DataFrame, part_col: str | None = None) -> DataFrame:
    """Per-group packing summary over a ``pack_chunks`` result:
    number of chunks, documents, (doc, chunk) rows, straddling
    documents (split across >1 chunk), and total packed tokens —
    the integers a corpus build manifests."""
    keys = [part_col] if part_col else []
    per_doc = packed.groupBy(*keys, "id").agg(
        F.count(F.lit(1)).alias("_n_chunks_of_doc")
    )
    straddle = per_doc.groupBy(*keys).agg(
        F.sum((F.col("_n_chunks_of_doc") > 1).cast("long")).alias("n_straddlers"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    agg = packed.groupBy(*keys).agg(
        (F.max("chunk_id") + 1).alias("n_chunks"),
        F.count(F.lit(1)).alias("n_doc_chunk_rows"),
        F.sum("tokens_in_chunk").alias("total_tokens"),
    )
    if keys:
        return agg.join(straddle, keys)
    return agg.crossJoin(straddle)
