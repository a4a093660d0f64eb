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
enough to matter, use ``asof_join_bucketed`` — the two-phase variant
below that pre-buckets the time axis (per-(key, bucket) as-of, then a
carry join fixing rows whose nearest match sits in an earlier/later
bucket), bounding every window partition to one bucket's rows.

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
    # suffixing must not itself collide (left already has 'ts_r', or
    # two payload columns map to one name): a duplicate output column
    # surfaces as AMBIGUOUS_REFERENCE far from the join — raise here
    # instead, like pandas merge_asof does
    payload_names = _payload_names(left, payload, suffix)
    projected = [F.col(f"_lrow.{c}").alias(c) for c in left.columns] + [
        F.col("_match")[c].alias(payload_names[c]) for c in payload
    ]
    return out.select(*projected)


def _payload_names(
    left: DataFrame, payload: list[str], suffix: str
) -> dict[str, str]:
    """Output-name plan for right payload columns, with the same
    collision rules (and error) as ``asof_join``."""
    left_cols = set(left.columns)
    used = set(left.columns)
    names: dict[str, str] = {}
    for c in payload:
        name = c + suffix if c in left_cols else c
        if name in used:
            raise ValueError(
                f"asof_join output column {name!r} collides after"
                f" suffixing; rename the input column or pass a"
                f" different suffix"
            )
        used.add(name)
        names[c] = name
    return names


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | tuple = (),
    direction: str = "backward",
    bucket_width: float = 3600.0,
    tolerance: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Skew-safe as-of join: identical semantics to ``asof_join`` (same
    directions, tolerance, tie/NULL rules, same output schema), but the
    carry-forward window partitions on ``(by, time-bucket)`` instead of
    ``by`` alone, so one viral key no longer serializes into a single
    executor-killing window partition — every partition holds at most
    one ``bucket_width`` slice of one key.

    Two phases, both ordinary Catalyst plans:

    1. **In-bucket as-of.** Both sides get ``_bkt = floor(axis(on) /
       bucket_width)``; the union+window runs per ``(by, _bkt)``. A
       right row at the same ``on`` as a left row is by construction in
       the same bucket, so boundary-tie semantics are exactly the
       unbucketed operator's.
    2. **Carry fix-up.** A left row whose nearest right row lives in an
       EARLIER bucket (backward) / LATER bucket (forward) has no
       in-bucket match. Per ``(by, bucket)`` the right side collapses
       to its tail (latest row) and head (earliest row) — ONE row per
       non-empty bucket — and a window over these per-bucket summaries,
       partitioned by ``by`` alone, computes each left bucket's
       previous-tail / next-head. That window's partitions hold
       ``#buckets`` rows, not ``#rows`` (time-span / bucket_width —
       the knob that bounds the hot key), and the carry table joins
       back on ``(by, _bkt)`` as a small equi-join AQE can broadcast.

    ``direction='nearest'`` is exact: the global nearest match is
    either the global backward or the global forward candidate, both
    of which phase 1 + phase 2 produce (tie → backward, as pandas).

    Cost vs ``asof_join``: one extra aggregate over the right side and
    one small join — worth it only when a ``by`` key is hot; for
    uniform keys the unbucketed single-window plan is cheaper.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    if not bucket_width > 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    by = [by] if isinstance(by, str) else list(by)
    if on in by:
        raise ValueError(f"'on' column {on!r} cannot also be a 'by' key")
    payload = [c for c in right.columns if c not in by]
    if on not in right.columns:
        raise ValueError(f"right side has no {on!r} column")
    payload_names = _payload_names(left, payload, suffix)

    axis_l = numeric_axis(left, on)
    axis_r = numeric_axis(right, on)
    rstruct = F.struct(*[F.col(c) for c in payload])
    lstruct = F.struct(*[F.col(c) for c in left.columns])

    def bkt(axis_col):
        return F.floor(axis_col / F.lit(float(bucket_width))).cast("long")

    lt = left.select(
        *by,
        F.col(on).alias("_on"),
        bkt(axis_l(F.col(on))).alias("_bkt"),
        F.lit(1).alias("_is_left"),
        lstruct.alias("_lrow"),
        _null_of(right, rstruct).alias("_rrow"),
    )
    right_nonnull = right
    for k in by:
        right_nonnull = right_nonnull.filter(F.col(k).isNotNull())
    right_nonnull = right_nonnull.filter(F.col(on).isNotNull())
    rt = right_nonnull.select(
        *by,
        F.col(on).alias("_on"),
        bkt(axis_r(F.col(on))).alias("_bkt"),
        F.lit(0).alias("_is_left"),
        _null_of(left, lstruct).alias("_lrow"),
        rstruct.alias("_rrow"),
    )
    u = lt.unionByName(rt)

    part = [*by, "_bkt"]
    wb = (
        Window.partitionBy(*part)
        .orderBy(F.col("_on").asc_nulls_first(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*part)
        .orderBy(F.col("_on").asc_nulls_first(), F.col("_is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    need_back = direction in ("backward", "nearest")
    need_fwd = direction in ("forward", "nearest")
    u = u.withColumn(
        "_inb_back",
        F.last("_rrow", ignorenulls=True).over(wb) if need_back else F.lit(None),
    ).withColumn(
        "_inb_fwd",
        F.first("_rrow", ignorenulls=True).over(wf) if need_fwd else F.lit(None),
    )
    lrows = u.filter(F.col("_is_left") == 1)

    # ---- phase 2: per-(by, bucket) right summaries -> carry table ----
    # tail = right row with max _on in the bucket (max_by tie picks an
    # arbitrary equal row — same caveat as the base operator: dedupe
    # the right side per (by, on) for deterministic output); head
    # mirrors with min.
    rsum = rt.groupBy(*by, "_bkt").agg(
        F.max_by("_rrow", F.col("_on")).alias("_tail"),
        F.min_by("_rrow", F.col("_on")).alias("_head"),
    ).withColumn("_tag", F.lit(1))
    lbkt = (
        lt.select(*by, "_bkt").dropDuplicates([*by, "_bkt"])
        .withColumn("_tag", F.lit(0))
        .withColumn("_tail", _null_of(right, rstruct))
        .withColumn("_head", _null_of(right, rstruct))
    )
    marks = lbkt.unionByName(rsum.select(*lbkt.columns))
    # prev-tail: tags ascending puts the left marker BEFORE the same
    # bucket's right summary, so a marker's running frame sees only
    # strictly-earlier buckets' tails (same-bucket rights were already
    # handled in phase 1)
    w_prev = (
        Window.partitionBy(*by)
        .orderBy(F.col("_bkt").asc_nulls_first(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # next-head: tags DESCENDING puts the right summary before the
    # marker, so the marker's following frame sees only strictly-later
    # buckets' heads
    w_next = (
        Window.partitionBy(*by)
        .orderBy(F.col("_bkt").asc_nulls_first(), F.col("_tag").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carry = (
        marks.withColumn("_prev_tail", F.last("_tail", ignorenulls=True).over(w_prev))
        .withColumn("_next_head", F.first("_head", ignorenulls=True).over(w_next))
        .filter(F.col("_tag") == 0)
        # carry's join columns get reserved names: both sides descend
        # from the same source frames, so joining on same-named columns
        # would lean on Spark's fragile self-join lineage
        # disambiguation (it warns 'trivially true equals predicate')
        .select(
            *[F.col(k).alias(f"_carry_{k}") for k in by],
            F.col("_bkt").alias("_carry_bkt"),
            "_prev_tail",
            "_next_head",
        )
    )
    # null-safe on _bkt (and the carry build keeps NULL-on left rows'
    # null bucket as a marker row) so left rows with NULL `on` survive
    # the join; their match is nulled below exactly as the base does
    cond = F.col("_bkt").eqNullSafe(F.col("_carry_bkt"))
    for k in by:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_carry_{k}"))
    joined = lrows.join(carry, cond, "left").drop(
        "_carry_bkt", *[f"_carry_{k}" for k in by]
    )

    back_cand = F.coalesce(F.col("_inb_back"), F.col("_prev_tail"))
    fwd_cand = F.coalesce(F.col("_inb_fwd"), F.col("_next_head"))

    def _diff(match: Column) -> Column:
        return axis_l(F.col("_on")) - axis_l(match[on])

    def _within(match: Column) -> Column:
        if tolerance is None:
            return match
        d = _diff(match)
        return F.when(d.isNotNull() & (F.abs(d) <= F.lit(tolerance)), match)

    if direction == "backward":
        matched = _within(back_cand)
    elif direction == "forward":
        matched = _within(fwd_cand)
    else:
        db, df_ = F.abs(_diff(back_cand)), F.abs(_diff(fwd_cand))
        nearest = (
            F.when(back_cand.isNull(), fwd_cand)
            .when(fwd_cand.isNull(), back_cand)
            .when(df_ < db, fwd_cand)  # tie -> backward
            .otherwise(back_cand)
        )
        matched = _within(nearest)
    matched = F.when(F.col("_on").isNotNull(), matched)

    out = joined.withColumn("_match", matched)
    projected = [F.col(f"_lrow.{c}").alias(c) for c in left.columns] + [
        F.col("_match")[c].alias(payload_names[c]) for c in payload
    ]
    return out.select(*projected)
