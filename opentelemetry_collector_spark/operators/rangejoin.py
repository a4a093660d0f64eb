"""Range (interval) joins: point-in-interval and interval-overlap —
the second temporal-join primitive Spark has no operator for (the
naive ``p.ts BETWEEN i.start AND i.end`` theta-join compiles to
BroadcastNestedLoop/cartesian and is O(|P|·|I|) per key).

Spark-first formulation — bucketed equi-join: quantize the time axis
into fixed-width buckets, explode each interval into the buckets it
covers, and equi-join on (by keys, bucket); an exact predicate then
filters the candidates. The plan is the ordinary shuffled hash/merge
join Catalyst already optimizes (partial aggregation, AQE skew
splitting, broadcast if one side is small) — the bucket column just
makes the range condition equi-joinable.

Pair-uniqueness is structural, not a dropDuplicates shuffle:

  * point-in-interval: a point lives in exactly ONE bucket, so every
    (point, interval) candidate appears exactly once;
  * interval-overlap: both sides explode, so a pair can meet in many
    buckets — it is emitted only in the bucket containing
    ``greatest(l_start, r_start)`` (every overlapping pair has exactly
    one such bucket, and both sides cover it).

Choosing ``bucket_width``: candidate blow-up per interval is
``len/width + 1`` rows of (keys, bucket, payload-struct) through the
exchange, while too-wide buckets put unrelated rows in one bucket.
Width ≈ the median interval length is the standard operating point.
A pathologically long interval (≫ width) is the skew knob — cap it
upstream or raise the width; the explode is a ``sequence()`` so the
blow-up is explicit in the plan, never quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .asof import numeric_axis


def _bucket(axis_col, width: float):
    if not width > 0:
        # fail at call time with a clear message, not mid-task with
        # ANSI DIVIDE_BY_ZERO (width 0) or silently flipped buckets
        # (negative width)
        raise ValueError(f"bucket_width must be > 0, got {width}")
    return F.floor(axis_col / F.lit(float(width))).cast("long")


def _suffixed(
    cols: list[str], taken: set[str], by: list[str], suffix: str
) -> dict[str, str]:
    """Rename plan for the right/interval side: ``by`` keys keep their
    names (they are the equi-join columns and Spark's name-list join
    coalesces them), everything else colliding with the left side gets
    the suffix. Raises when a suffixed name ITSELF collides (with the
    left side or another right column) — a silent duplicate output
    column would surface as AMBIGUOUS_REFERENCE far from the join."""
    out: dict[str, str] = {}
    used = set(taken)
    for c in cols:
        if c in by:
            out[c] = c
            continue
        name = c + suffix if c in taken else c
        if name in used:
            raise ValueError(
                f"range-join output column {name!r} collides after"
                f" suffixing; rename the input column or pass a"
                f" different suffix"
            )
        used.add(name)
        out[c] = name
    return out


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    start: str = "start",
    end: str = "end",
    by: str | list[str] | tuple = (),
    bucket_width: float = 3600.0,
    end_closed: bool = False,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of each point row to every interval row (same ``by``
    keys) whose ``[start, end)`` contains it (``end_closed=True`` for
    ``[start, end]``). Output: points columns + interval columns
    (suffixed on collision). m:n — a point inside k intervals yields
    k rows; unmatched points are dropped (range joins are filters by
    nature; outer-join on the result keys if presence is needed)."""
    by = [by] if isinstance(by, str) else list(by)
    p_axis = numeric_axis(points, on)
    i_axis = numeric_axis(intervals, start)

    p = points.withColumn("_bkt", _bucket(p_axis(F.col(on)), bucket_width))
    iv = (
        intervals.filter(F.col(start).isNotNull() & F.col(end).isNotNull())
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    _bucket(i_axis(F.col(start)), bucket_width),
                    _bucket(i_axis(F.col(end)), bucket_width),
                )
            ),
        )
    )
    taken = set(points.columns)
    ren = _suffixed(list(intervals.columns), taken, by, suffix)
    iv = iv.select(
        "_bkt", *[F.col(c).alias(ren[c]) for c in intervals.columns]
    )
    upper = (
        p_axis(F.col(on)) <= i_axis(F.col(ren[end]))
        if end_closed
        else p_axis(F.col(on)) < i_axis(F.col(ren[end]))
    )
    cond = (p_axis(F.col(on)) >= i_axis(F.col(ren[start]))) & upper
    joined = p.join(iv, ["_bkt"] + [c for c in by], "inner").filter(cond)
    # by-columns were not suffixed on the interval side when used as
    # join keys; drop the helper bucket
    return joined.drop("_bkt")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    by: str | list[str] | tuple = (),
    bucket_width: float = 3600.0,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of interval pairs that OVERLAP (half-open:
    ``l_start < r_end AND r_start < l_end``). Each overlapping pair is
    emitted exactly once — in the bucket containing
    ``greatest(l_start, r_start)`` — so no dedup shuffle follows the
    join."""
    by = [by] if isinstance(by, str) else list(by)
    la = numeric_axis(left, l_start)
    ra = numeric_axis(right, r_start)

    def exploded(df: DataFrame, s: str, e: str, axis) -> DataFrame:
        return df.filter(F.col(s).isNotNull() & F.col(e).isNotNull()).withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    _bucket(axis(F.col(s)), bucket_width),
                    _bucket(axis(F.col(e)), bucket_width),
                )
            ),
        )

    l = exploded(left, l_start, l_end, la)
    taken = set(left.columns)
    ren = _suffixed(list(right.columns), taken, by, suffix)
    r = exploded(right, r_start, r_end, ra).select(
        "_bkt", *[F.col(c).alias(ren[c]) for c in right.columns]
    )
    ls, le = la(F.col(l_start)), la(F.col(l_end))
    rs, re = ra(F.col(ren[r_start])), ra(F.col(ren[r_end]))
    overlap = (ls < re) & (rs < le)
    once = F.col("_bkt") == _bucket(F.greatest(ls, rs), bucket_width)
    return (
        l.join(r, ["_bkt"] + [c for c in by], "inner")
        .filter(overlap & once)
        .drop("_bkt")
    )
