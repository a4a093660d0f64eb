"""Similarity search over an embedding column (`array<float>`):
brute-force cosine top-k (the correctness baseline) and an
LSH-bucketed approximate-nearest-neighbor variant (the scale path).

Scale design: the query vector is a literal folded into the plan (the
degenerate broadcast); brute force is a single scan + TakeOrderedAndProject
(per-partition top-k then a k-row driver merge — no full sort, no
shuffle of the data). The ANN variant prunes the scan to the query's
hyperplane bucket (and optionally its Hamming-1 neighbors) before
scoring — with a bucket-partitioned/bucketed table layout this becomes
partition pruning, reading 1/2^bits of the data."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import HYPERPLANES, _dot


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (sequential-sum dot
    product; rounded to 6dp for stable cross-engine comparison)."""
    return F.round(
        _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))), 6
    )


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: scan → score → TakeOrderedAndProject.
    Deterministic tie-break by id."""
    q = _query_lit(query_vec)
    scored = df.select(
        F.col(id_col),
        cosine_similarity(_as_double(vec_col), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def hyperplane_signature(vec: Column, planes: list[list[float]] | None = None) -> Column:
    """Random-hyperplane sign signature packed into a long: bit p set
    iff dot(vec, plane_p) > 0. Fixed seeded planes (dedup.HYPERPLANES)
    make signatures reproducible across runs and engines."""
    planes = planes if planes is not None else HYPERPLANES
    value = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_lit = F.slice(F.array(*[F.lit(float(x)) for x in plane]), 1, F.size(vec))
        d = _dot(vec, plane_lit)
        value = value + F.when(d > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0))
    return value


def _py_signature(vec: list[float], planes: list[list[float]]) -> int:
    value = 0
    for p, plane in enumerate(planes):
        acc = 0.0
        for x, w in zip(vec, plane):
            acc += float(x) * float(w)
        if acc > 0:
            value += 1 << p
    return value


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    hamming_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane bucket is
    within ``hamming_radius`` bits of the query's bucket. The bucket
    predicate is a literal IN-list → partition-prunable when the table
    is written bucketed/partitioned by signature."""
    q_sig = _py_signature([float(x) for x in query_vec], HYPERPLANES)
    candidates = {q_sig}
    if hamming_radius >= 1:
        for p in range(len(HYPERPLANES)):
            candidates.add(q_sig ^ (1 << p))
    if hamming_radius >= 2:
        for p in range(len(HYPERPLANES)):
            for r in range(p + 1, len(HYPERPLANES)):
                candidates.add(q_sig ^ (1 << p) ^ (1 << r))
    q = _query_lit(query_vec)
    v = _as_double(vec_col)
    scored = (
        df.withColumn("bucket", hyperplane_signature(v))
        .filter(F.col("bucket").isin(*[int(c) for c in sorted(candidates)]))
        .select(F.col(id_col), cosine_similarity(v, q).alias("cosine"))
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)
