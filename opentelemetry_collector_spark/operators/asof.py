"""As-of (temporal) join: attach to each left row the nearest right
row by a time/ordering column, per key — the classic telemetry /
attribution primitive (pandas ``merge_asof``, DuckDB ``ASOF JOIN``)
that Spark has no built-in operator for.

Spark-first formulation — union + window carry-forward, NOT a range
join: tag both inputs, union them, and run ONE window per key ordered
by the time column where ``last(right_payload, ignorenulls=True)``
carries the most recent right row forward onto every left row. This
is the minimal distributed plan:

  * exactly one shuffle (hash exchange on the ``by`` keys — the same
    exchange any keyed join would need), then a per-partition sort;
  * no range-condition blow-up: a naive ``l.ts >= r.ts`` theta-join is
    O(|L|x|R|) per key and Catalyst executes it as
    BroadcastNestedLoop/cartesian — at 10^12 rows that plan is dead
    on arrival, while this one is O((|L|+|R|) log) per partition;
  * the window frame is running (``rowsBetween(unboundedPreceding,
    currentRow)``), which Spark evaluates streamingly in one pass —
    no per-key buffering of the whole group.

Skew: one hot ``by`` key lands in one window partition. For keys hot
enough to matter, pre-bucket the time axis (two-phase: per-bucket
as-of, then fix the first row of each bucket with the previous
bucket's tail) — the same mitigation as any keyed running-window op.

Ties and determinism: at equal (by, on) the right row sorts BEFORE
the left row, so a boundary match is inclusive (matches DuckDB's
``l.on >= r.on``). If the right side has several rows at the same
(by, on) the LAST one in the sort wins arbitrarily — deduplicate the
right side to one row per (by, on) when deterministic output matters
(the driver query does: max(event_id) per (user_id, ts)). Right rows
with a NULL ``on`` can never be "nearest" and are dropped; left rows
with NULL ``on`` are preserved unmatched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

_DIRECTIONS = ("backward", "forward", "nearest")

_TIME_TYPES = (TimestampType, TimestampNTZType, DateType)


def numeric_axis(df: DataFrame, col_name: str):
    """Column-factory mapping ``col_name``'s type onto a double axis
    for distance/bucket arithmetic: timestamps (incl. TIMESTAMP_NTZ,
    which Spark 4 refuses to cast to DOUBLE directly — parquet scans
    produce NTZ by default) become epoch seconds with microsecond
    precision via the instant cast (session TZ is pinned UTC, so the
    NTZ→instant cast is lossless); numerics cast straight to double."""
    if isinstance(df.schema[col_name].dataType, _TIME_TYPES):
        return lambda c: F.unix_micros(c.cast("timestamp")) / F.lit(1e6)
    return lambda c: c.cast("double")


def _null_of(df: DataFrame, col: Column) -> Column:
    """NULL literal with the exact type ``col`` has in ``df``."""
    dt = df.select(col.alias("_probe")).schema[0].dataType
    return F.lit(None).cast(dt)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | tuple = (),
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the payload columns of
    the nearest right row sharing the ``by`` keys.

    * ``direction='backward'`` (default): latest right with
      ``right.on <= left.on`` (DuckDB ``ASOF JOIN ... ON l.on >= r.on``,
      pandas ``merge_asof`` default);
    * ``'forward'``: earliest right with ``right.on >= left.on``;
    * ``'nearest'``: whichever of the two is closer in time
      (tie → backward, as pandas does).

    ``tolerance`` (seconds for timestamp ``on``, plain difference for
    numeric ``on``): a match farther than this is nulled out.

    Right payload columns that collide with left column names are
    suffixed with ``suffix``. Empty ``by`` is a single global ordering
    — one partition; only for small frames.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    if on in by:
        raise ValueError(f"'on' column {on!r} cannot also be a 'by' key")
    payload = [c for c in right.columns if c not in by]
    if on not in right.columns:
        raise ValueError(f"right side has no {on!r} column")

    rstruct = F.struct(*[F.col(c) for c in payload])
    lstruct = F.struct(*[F.col(c) for c in left.columns])
    lt = left.select(
        *by,
        F.col(on).alias("_on"),
        F.lit(1).alias("_is_left"),
        lstruct.alias("_lrow"),
        _null_of(right, rstruct).alias("_rrow"),
    )
    # NULL by-keys never match (DuckDB ASOF `l.k = r.k` and pandas
    # merge_asof semantics): drop null-keyed right rows so a left row
    # with a NULL key stays unmatched instead of joining the NULL
    # "group" the window partitioning would otherwise form
    right_nonnull = right
    for k in by:
        right_nonnull = right_nonnull.filter(F.col(k).isNotNull())
    rt = right_nonnull.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias("_on"),
        F.lit(0).alias("_is_left"),
        _null_of(left, lstruct).alias("_lrow"),
        rstruct.alias("_rrow"),
    )
    u = lt.unionByName(rt)

    # backward: right-before-left at equal _on makes the boundary
    # inclusive; forward mirrors it (left first, then same-ts right
    # is still inside the following frame)
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col("_on").asc_nulls_first(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col("_on").asc_nulls_first(), F.col("_is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    axis = numeric_axis(left, on)

    def _diff(match: Column) -> Column:
        return axis(F.col("_on")) - axis(match[on])

    def _within(match: Column, signed_diff: Column) -> Column:
        if tolerance is None:
            return match
        return F.when(
            signed_diff.isNotNull() & (F.abs(signed_diff) <= F.lit(tolerance)),
            match,
        )

    if direction == "backward":
        m = F.last("_rrow", ignorenulls=True).over(wb)
        matched = _within(m, _diff(m))
    elif direction == "forward":
        m = F.first("_rrow", ignorenulls=True).over(wf)
        matched = _within(m, _diff(m))
    else:  # nearest
        mb = F.last("_rrow", ignorenulls=True).over(wb)
        mf = F.first("_rrow", ignorenulls=True).over(wf)
        db, df_ = F.abs(_diff(mb)), F.abs(_diff(mf))
        nearest = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(df_ < db, mf)  # tie -> backward
            .otherwise(mb)
        )
        matched = _within(nearest, _diff(nearest))

    # a left row with NULL `on` is never "near" anything (nulls sort
    # first, so the forward frame would otherwise hand it the earliest
    # right row)
    matched = F.when(F.col("_on").isNotNull(), matched)
    out = u.withColumn("_match", matched).filter(F.col("_is_left") == 1)
    left_cols = set(left.columns)
    # suffixing must not itself collide (left already has 'ts_r', or
    # two payload columns map to one name): a duplicate output column
    # surfaces as AMBIGUOUS_REFERENCE far from the join — raise here
    # instead, like pandas merge_asof does
    used = set(left.columns)
    payload_names: dict[str, str] = {}
    for c in payload:
        name = c + suffix if c in left_cols else c
        if name in used:
            raise ValueError(
                f"asof_join output column {name!r} collides after"
                f" suffixing; rename the input column or pass a"
                f" different suffix"
            )
        used.add(name)
        payload_names[c] = name
    projected = [F.col(f"_lrow.{c}").alias(c) for c in left.columns] + [
        F.col("_match")[c].alias(payload_names[c]) for c in payload
    ]
    return out.select(*projected)
