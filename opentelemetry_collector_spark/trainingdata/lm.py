"""N-gram language-model perplexity scoring and filtering — the
CCNet-style corpus-quality stage (Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data"):
score every document by its perplexity under a reference LM and keep
/ bucket by threshold. CCNet uses a KenLM 5-gram; this is the same
pipeline shape with an add-one-smoothed bigram model, expressed
entirely in Catalyst (no Python in the hot path, no driver-side
model state — the "trained model" is a pair of count DataFrames, so
training scales like any aggregation and scoring like any broadcast
join).

Cross-engine determinism (the driver's DuckDB oracle recomputes the
identical model and scores):

  * counts are exact integers; probabilities are formed as one
    double division per bigram;
  * each per-bigram ``ln`` term is rounded to 12 dp before summing —
    Java's ``Math.log`` and libm's ``log`` are each within 1 ulp of
    the true value, so their disagreement lives at ~1e-16 relative
    and dies at 12 dp, while genuine model differences live many
    orders of magnitude above it;
  * the per-document sum is a SEQUENTIAL fold over the document's
    bigram terms in position order (collect_list → array_sort →
    F.aggregate), never a distributed float SUM whose addition order
    is nondeterministic;
  * vocabulary size and smoothing enter as exact integers via a
    1-row broadcast (no ``collect`` — the model stays a lazy plan).

Scale shape at 10^12 tokens: training is explode → two hash
aggregations (map-side partial); scoring is explode → two broadcast
joins against the (pruned) LM tables → one groupBy(doc) whose
payload is the document's own terms. The LM tables are the only
broadcast state; prune with ``min_count`` to keep them
executor-resident (CCNet's KenLM pruning plays the same role).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import ensure_compute_parallelism, let_col, tokens_col

# add-one (Laplace) smoothing; exposed for the SQL oracle
LM_ALPHA = 1

# default CCNet-style bucket edges on perplexity (head = best); real
# deployments derive these per language from score quantiles — fixed
# defaults keep the driver query deterministic
DEFAULT_BUCKETS = (60.0, 120.0)


def _bigrams_col(col: Column) -> Column:
    """Array of (pos, w1, w2) structs for the document's token
    stream; empty for docs with fewer than 2 tokens.

    The token array is let-bound so tokenization runs once per row —
    an outer-expression reference inside the transform lambda would
    re-split the text at every bigram position (the O(tokens²)
    pattern ``text.let_col`` exists for)."""

    def body(toks: Column) -> Column:
        n = F.size(toks)
        # guard BEFORE building the sequence: F.sequence(1, 0) yields
        # the DESCENDING [1, 0], whose element_at(toks, 0) throws
        # under ANSI
        positions = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            positions,
            lambda i: F.struct(
                i.alias("pos"),
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        )

    return let_col(tokens_col(col), body)


def train_bigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> dict[str, DataFrame]:
    """Train the reference model: exact unigram and bigram counts over
    the reference corpus (lowercased whitespace tokens — the same
    tokenizer every other text operator uses), plus a 1-row stats
    frame carrying vocabulary size.

    Returns lazy DataFrames — nothing is collected; persist or write
    the two count tables on a real warehouse and reuse across scoring
    runs. ``min_count`` prunes rare BIGRAMS from the broadcast table
    (their probability falls back to the unseen-bigram estimate);
    unigram counts are kept exact so the denominator never shifts."""
    ref_docs = ensure_compute_parallelism(ref_docs)
    toks = ref_docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
    unigrams = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    big = ref_docs.select(
        F.explode(_bigrams_col(F.col(text_col))).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    bigrams = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    if min_count > 1:
        bigrams = bigrams.filter(F.col("c12") >= min_count)
    # |V| + 1: one extra slot for the out-of-vocabulary word class
    stats = unigrams.agg((F.count(F.lit(1)) + F.lit(1)).alias("v"))
    return {"unigrams": unigrams, "bigrams": bigrams, "stats": stats}


def perplexity(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document perplexity under the reference bigram model:

        P(w2 | w1) = (c12 + a) / (c1 + a*V)        a = LM_ALPHA
        ppl = exp( -avg over bigrams of ln P )

    Unseen bigram → c12 = 0; unseen context word → c1 = 0 (the OOV
    class), so every document scores. Documents with < 2 tokens carry
    ``n_bigrams = 0`` and NULL perplexity (no evidence either way —
    filter or keep them by policy, not by a fake score).

    Output: (id, n_bigrams, ppl) with ppl rounded to 6 dp."""
    exploded = ensure_compute_parallelism(docs).select(
        F.col(id_col).alias("id"),
        F.explode_outer(_bigrams_col(F.col(text_col))).alias("b"),
    ).select(
        "id", F.col("b.pos").alias("pos"),
        F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"),
    )
    joined = (
        exploded.join(F.broadcast(lm["bigrams"]), ["w1", "w2"], "left")
        .join(
            F.broadcast(lm["unigrams"].withColumnRenamed("w", "w1")),
            "w1",
            "left",
        )
        .crossJoin(F.broadcast(lm["stats"]))
    )
    a = F.lit(LM_ALPHA).cast("double")
    prob = (F.coalesce(F.col("c12"), F.lit(0)).cast("double") + a) / (
        F.coalesce(F.col("c1"), F.lit(0)).cast("double") + a * F.col("v").cast("double")
    )
    # 12-dp per-term rounding: kills the ≤1-ulp Java-vs-libm ln
    # disagreement, six orders of magnitude below any real signal
    term = F.when(
        F.col("pos").isNotNull(), F.round(F.log(prob), 12)
    )
    per_doc = joined.groupBy("id").agg(
        F.count("pos").alias("n_bigrams"),
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), term.alias("t")))
        ).alias("terms"),
    )
    # sequential position-ordered fold — bit-stable across engines,
    # partitionings and retries (a float SUM over shuffled rows is not)
    total = F.aggregate(
        "terms",
        F.lit(0.0),
        lambda acc, s: acc + s["t"],
    )
    ppl = F.when(
        F.col("n_bigrams") > 0,
        F.round(F.exp(-total / F.col("n_bigrams").cast("double")), 6),
    )
    return per_doc.select("id", "n_bigrams", ppl.alias("ppl"))


def perplexity_buckets(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    edges: tuple[float, float] = DEFAULT_BUCKETS,
) -> DataFrame:
    """CCNet's head/middle/tail split: head = fluent (low perplexity),
    tail = noise (high), unscored docs → 'unscored'. Output adds a
    ``bucket`` column to the ``perplexity`` frame."""
    lo, hi = float(edges[0]), float(edges[1])
    if not lo < hi:
        raise ValueError(f"bucket edges must increase, got {edges}")
    scored = perplexity(docs, lm, text_col=text_col, id_col=id_col)
    bucket = (
        F.when(F.col("ppl").isNull(), F.lit("unscored"))
        .when(F.col("ppl") <= lo, F.lit("head"))
        .when(F.col("ppl") <= hi, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.withColumn("bucket", bucket)


def perplexity_filter(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_unscored: bool = False,
) -> DataFrame:
    """Keep documents scoring at or below ``max_ppl`` (the CCNet
    head+middle cut). Joins the surviving ids back to the input, so
    the result carries the original columns."""
    scored = perplexity(docs, lm, text_col=text_col, id_col=id_col)
    cond = F.col("ppl") <= max_ppl
    if keep_unscored:
        cond = cond | F.col("ppl").isNull()
    keep = scored.filter(cond).select(F.col("id").alias(id_col))
    return docs.join(keep, id_col, "left_semi")
