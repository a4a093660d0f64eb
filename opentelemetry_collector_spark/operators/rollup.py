"""Hypertable-style rollup cascade: multi-resolution time-bucketed
aggregates (1m → 1h → 1d …) where each coarser level is computed FROM
THE NEXT FINER LEVEL, not from the raw table — the continuous-
aggregate pattern of time-series stores (TimescaleDB hypertables,
Druid rollup segments), which neither Spark nor the reference has as
an operator.

Why cascading matters at 100 TB: the raw table is scanned ONCE (for
the finest level); every coarser level aggregates the previous level's
output, which is smaller by the bucket ratio (a 1h level re-aggregates
60 one-minute rows per key, not 3.6 M raw events). Total work is
O(raw + finest), versus O(raw × levels) for the naive
one-GROUP-BY-per-resolution plan. The finest level is the only child
of the scan, so Catalyst pushes filters/pruning into it as usual, and
every cascaded step is a plain partial-aggregate shuffle on
(keys, coarser bucket).

Only CASCADABLE aggregates are accepted — those with an exact
re-aggregation rule:

  count → sum of child counts       sum → sum of child sums
  min   → min of child mins         max → max of child maxes
  avg   → sum(child sum)/sum(child count)  (derived, never averaged)

Distinct counts cascade through MERGEABLE state instead of a scalar:

  distinct        → exact; the physical column is the distinct key SET
                    (collect_set at the finest level, set-union above),
                    emitted as its size. Exact at every level; the
                    carried state is bounded by the per-(key, bucket)
                    cardinality, so use it when that cardinality is
                    modest (e.g. distinct users per service per hour).
  approx_distinct → Apache DataSketches HLL via Spark-native
                    hll_sketch_agg / hll_union_agg /
                    hll_sketch_estimate: the carried state is a fixed
                    ~KB sketch regardless of cardinality, and sketch
                    union is EXACT (union of HLLs == HLL of the union),
                    so cascading adds no error over a direct sketch of
                    raw — the standard answer at 100 TB where the key
                    set itself no longer fits a row.

Percentiles are cascadable too, but in long format — see
``percentile_rollup`` below: a DDSketch-style log-histogram whose
(…, bin) → count rows re-aggregate with a plain SUM, giving quantiles
with a deterministic ≤ alpha relative-error bound at every level.

Reference parity: the reference's testbed accounts distinct items per
run (testbed/testbed/validator.go:45-50); its processor chain has no
rollup operator at all — this is the hypertable capability a telemetry
store adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .asof import numeric_axis

_CASCADABLE = ("count", "sum", "min", "max", "avg", "distinct", "approx_distinct")

# Bounded FIFO of persisted intermediate levels: one shared
# implementation (functions.keyed_cache) instantiated per subsystem —
# repeated calls on the same input reuse one cached frame instead of
# stacking a new persist per call, with no unbounded growth in a
# long-lived session.
from ..functions.keyed_cache import KeyedFrameCache, plan_key as _plan_key

_LEVEL_CACHE = KeyedFrameCache(max_entries=8)


def _keyed_persist(key: tuple, frame: DataFrame) -> DataFrame:
    return _LEVEL_CACHE.get_or_persist(key, frame)


def clear_level_caches() -> None:
    """Unpersist and drop every cached rollup level — measurement
    harnesses call this between benchmark attempts so a retry redoes
    the same work (blocking, so eviction can't bleed into the next
    timed window)."""
    _LEVEL_CACHE.clear()


def rollup_cascade(
    df: DataFrame,
    ts: str = "ts",
    keys: str | list[str] | tuple = (),
    measures: dict[str, tuple[str, str]] | None = None,
    levels: list[float] = (60.0, 3600.0, 86400.0),
    cache_levels: bool = True,
) -> DataFrame:
    """Multi-resolution rollup. ``measures`` maps output-column name →
    (agg, input-column): e.g. ``{"n": ("count", "*"), "v_sum":
    ("sum", "value"), "v_avg": ("avg", "value")}``. ``levels`` are
    bucket widths in seconds (or plain axis units for numeric ``ts``),
    finest first; each must divide the next so buckets nest exactly.

    Returns one DataFrame: ``level_sec`` (double), ``bucket_start``
    (long, epoch seconds / axis units), the ``keys``, and one column
    per measure. avg is emitted as an exact derived column at every
    level (total sum / total count), never an average of averages.

    ``cache_levels`` persists every non-final level (hypertable
    continuous aggregates are materialized by definition — each level
    is a table the next level reads). Without it the union's branches
    inline the finer levels and Spark re-runs the raw scan + finest
    aggregate once per level (exchange reuse does not currently fire
    across these AQE stages), turning O(raw + finest) into
    O(raw × levels). The persisted frames are aggregates — smaller
    than raw by the bucket ratio — and live in a bounded keyed FIFO
    (repeat calls reuse them; eviction unpersists; harnesses reset
    with ``clear_level_caches``).

    Cache semantics are Spark persist semantics: entries are keyed by
    the input's logical plan, so a repeat call over a table whose
    FILES changed underneath the same plan can serve the previously
    materialized levels (exactly as a bare ``df.persist()`` would).
    After mutating an input table in a long-lived session, call
    ``clear_level_caches()`` or pass ``cache_levels=False``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not measures:
        raise ValueError("measures must name at least one aggregate")
    levels = [float(w) for w in levels]
    if sorted(levels) != levels or len(set(levels)) != len(levels):
        raise ValueError(f"levels must be strictly increasing, got {levels}")
    if any(w != int(w) or w <= 0 for w in levels):
        raise ValueError(f"levels must be positive whole units, got {levels}")
    for fine, coarse in zip(levels, levels[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"each level must divide the next so buckets nest exactly "
                f"({coarse} % {fine} != 0)"
            )
    for name, (agg, _col) in measures.items():
        if agg not in _CASCADABLE:
            raise ValueError(
                f"measure {name!r}: {agg!r} is not cascadable "
                f"(supported: {_CASCADABLE}; percentiles cascade in "
                f"long format — use percentile_rollup)"
            )
        if agg in ("distinct", "approx_distinct") and _col == "*":
            raise ValueError(
                f"measure {name!r}: {agg} needs a concrete column, not '*'"
            )
    if cache_levels and len(levels) - 1 > _LEVEL_CACHE.max_entries:
        # a single cascade must not evict its OWN intermediate levels
        # mid-build — that silently reintroduces the O(raw × levels)
        # recompute the cache exists to prevent
        raise ValueError(
            f"{len(levels)} levels need {len(levels) - 1} cached"
            f" intermediates but the level cache holds"
            f" {_LEVEL_CACHE.max_entries}; use fewer levels or"
            f" cache_levels=False"
        )

    axis = numeric_axis(df, ts)

    # internal physical columns: every avg decomposes into (sum, count),
    # distinct carries the key SET, approx_distinct carries the HLL
    # sketch — mergeable state whose re-aggregation is exact
    _GEN = {
        "avg": ("_{}_sum", "_{}_cnt"),
        "distinct": ("_{}_set",),
        "approx_distinct": ("_{}_hll",),
    }
    phys: dict[str, tuple[str, str]] = {}
    for name, (agg, col) in measures.items():
        if agg in _GEN:
            gens = [t.format(name) for t in _GEN[agg]]
            for gen in gens:
                if gen in measures:
                    # a same-named user measure would be clobbered in
                    # phys (dict-order-dependent WRONG numbers, no
                    # error) — refuse loudly instead
                    raise ValueError(
                        f"measure name {gen!r} collides with the"
                        f" physical column generated for {agg} measure"
                        f" {name!r}; rename one of them"
                    )
            if agg == "avg":
                phys[gens[0]] = ("sum", col)
                phys[gens[1]] = ("count", col)
            elif agg == "distinct":
                phys[gens[0]] = ("set", col)
            else:
                phys[gens[0]] = ("hll", col)
        else:
            phys[name] = (agg, col)

    def base_agg(c: str, agg: str):
        if agg == "count":
            return (
                F.count(F.lit(1)) if c == "*" else F.count(F.col(c))
            ).cast("long")
        if agg == "set":
            # sort_array so the carried state (and anything that reads
            # it) is deterministic regardless of partition order
            return F.sort_array(F.collect_set(F.col(c)))
        if agg == "hll":
            return F.hll_sketch_agg(F.col(c))
        return getattr(F, agg)(F.col(c))

    # re-aggregation of a physical column from the finer level; set
    # union = distinct of the flattened child sets (exact — union of
    # distinct sets IS the distinct set of the union), HLL union is the
    # sketch-level exact merge
    _REAGG = {
        "count": F.sum,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "set": lambda c: F.sort_array(F.array_distinct(F.flatten(F.collect_list(c)))),
        "hll": F.hll_union_agg,
    }

    fine_w = levels[0]
    bucket = (F.floor(axis(F.col(ts)) / F.lit(fine_w)) * F.lit(int(fine_w))).cast(
        "long"
    )
    level = (
        df.groupBy(bucket.alias("bucket_start"), *keys)
        .agg(*[base_agg(c, agg).alias(name) for name, (agg, c) in phys.items()])
        .withColumn("level_sec", F.lit(fine_w))
    )
    out = [level]
    cache_key_base = (
        "rollup", _plan_key(df), ts, tuple(keys),
        tuple((n, a, c) for n, (a, c) in measures.items()), tuple(levels),
    )
    for li, w in enumerate(levels[1:]):
        if cache_levels:
            # materialize the level every coarser branch reads (and
            # the union re-reads) exactly once
            level = _keyed_persist(cache_key_base + (li,), level)
            out[-1] = level
        coarser = (F.floor(F.col("bucket_start") / F.lit(int(w))) * F.lit(int(w))).cast(
            "long"
        )
        def reagg(name: str, agg: str):
            c = _REAGG[agg](F.col(name))
            return (c.cast("long") if agg == "count" else c).alias(name)

        level = (
            level.groupBy(coarser.alias("bucket_start"), *keys)
            .agg(*[reagg(name, agg) for name, (agg, _c) in phys.items()])
            .withColumn("level_sec", F.lit(w))
        )
        out.append(level)

    def public(lv: DataFrame) -> DataFrame:
        cols = [F.col("level_sec"), F.col("bucket_start"), *[F.col(k) for k in keys]]
        for name, (agg, _col) in measures.items():
            if agg == "avg":
                cols.append(
                    (
                        F.col(f"_{name}_sum").cast("double")
                        / F.col(f"_{name}_cnt").cast("double")
                    ).alias(name)
                )
            elif agg == "distinct":
                cols.append(F.size(F.col(f"_{name}_set")).cast("long").alias(name))
            elif agg == "approx_distinct":
                # all-null input groups yield a null/empty sketch —
                # count(distinct) of nothing is 0, not null
                cols.append(
                    F.coalesce(
                        F.hll_sketch_estimate(F.col(f"_{name}_hll")), F.lit(0)
                    ).cast("long").alias(name)
                )
            else:
                cols.append(F.col(name))
        return lv.select(*cols)

    result = public(out[0])
    for lv in out[1:]:
        result = result.unionByName(public(lv))
    return result


def percentile_rollup(
    df: DataFrame,
    ts: str = "ts",
    keys: str | list[str] | tuple = (),
    value: str = "value",
    levels: list[float] = (60.0, 3600.0, 86400.0),
    percentiles: list[float] = (0.5, 0.95, 0.99),
    alpha: float = 0.01,
    names: list[str] | None = None,
    cache_levels: bool = True,
) -> DataFrame:
    """Multi-resolution PERCENTILE rollup with a deterministic
    ≤ ``alpha`` relative-error bound — the cascade-safe answer to the
    measures ``rollup_cascade`` refuses (p50/p95/p99 latency per key
    per hour, the other half of the hypertable story).

    How it cascades exactly: a DDSketch-style log-bucket histogram
    (Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable quantile
    sketch with relative-error guarantees", VLDB 2019) kept in LONG
    format — rows of (level, bucket_start, keys…, bin, cnt). Adding
    ``bin`` to the group keys turns the non-cascadable percentile into
    a plain cascadable SUM: the finest level buckets raw values once
    (one partial-aggregate shuffle, output ≤ #bins per group), every
    coarser level is ``GROUP BY (coarser bucket, keys, bin) SUM(cnt)``
    over the finer one — the exact histogram merge, zero added error
    per level, raw scanned once (same O(raw + finest) shape as
    ``rollup_cascade``, plan-tested).

    Binning: gamma = (1+alpha)/(1-alpha); a value x > 0 lands in bin
    ceil(log_gamma(x)) whose representative 2·gamma^bin/(gamma+1) is
    within alpha·|x| of every value in the bin. Negative values mirror
    into disjoint negative ordinals, zero gets ordinal 0, so ordinal
    order == value order. NULL values are ignored (SQL percentile
    semantics).

    Quantile extraction (pure Catalyst, no UDFs): per (level_sec,
    bucket_start, keys) a running cumsum over bin ordinals picks the
    bin holding the ceil(q·n)-th ordered element — the same
    lower-rank definition as ``numpy.percentile(interpolation=
    'lower')`` — then maps it back to the representative value, so the
    result is within alpha relative error of the exact q-quantile at
    EVERY level (error-bounded in tests/test_rollup.py).

    Returns ``level_sec`` (double), ``bucket_start`` (long), the keys,
    ``n`` (long, non-null count), and one double column per requested
    percentile (named ``names`` or ``p50``-style from the fraction).

    100 TB shape: the only full-data shuffle is the finest-level
    partial aggregate on (keys, bucket, bin); everything above it
    operates on histogram rows, smaller than raw by the per-bin
    collapse, and the extraction window partitions on (level, bucket,
    keys) whose groups hold ≤ #bins rows — no hot-key cliff. Sketch
    state is never wider than one (bin, cnt) row, so there is no
    driver-side or single-row blowup at any cardinality.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    levels = [float(w) for w in levels]
    if sorted(levels) != levels or len(set(levels)) != len(levels):
        raise ValueError(f"levels must be strictly increasing, got {levels}")
    if any(w != int(w) or w <= 0 for w in levels):
        raise ValueError(f"levels must be positive whole units, got {levels}")
    for fine, coarse in zip(levels, levels[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"each level must divide the next so buckets nest exactly "
                f"({coarse} % {fine} != 0)"
            )
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    percentiles = [float(q) for q in percentiles]
    if any(not 0 < q <= 1 for q in percentiles):
        raise ValueError(
            f"percentiles are fractions in (0, 1], got {percentiles}"
        )
    if names is None:
        names = [f"p{q * 100:g}".replace(".", "_") for q in percentiles]
    if len(names) != len(percentiles) or len(set(names)) != len(names):
        raise ValueError("names must be unique and match percentiles 1:1")

    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    ln_g = math.log(gamma)
    # ordinal offset keeping negative-value bins, zero, and
    # positive-value bins in disjoint, order-preserving ranges; any
    # double's log-bin magnitude is ≤ log(DBL_MAX)/ln_g ≈ 710/ln_g,
    # far under 2^40 for any sane alpha
    import sys as _sys

    off = 1 << 40
    if math.log(_sys.float_info.max) / ln_g >= off:
        raise ValueError(f"alpha={alpha} too small for the ordinal range")

    axis = numeric_axis(df, ts)
    v = F.col(value).cast("double")
    logbin = F.ceil(F.log(v) / F.lit(ln_g)).cast("long")
    neg_logbin = F.ceil(F.log(-v) / F.lit(ln_g)).cast("long")
    ordbin = (
        F.when(v > 0, logbin + F.lit(off))
        .when(v == 0, F.lit(0))
        .when(v < 0, -(neg_logbin + F.lit(off)))
    )  # NULL v -> NULL ordbin, dropped by the filter below

    fine_w = levels[0]
    bucket = (F.floor(axis(F.col(ts)) / F.lit(fine_w)) * F.lit(int(fine_w))).cast(
        "long"
    )
    level = (
        df.filter(v.isNotNull())
        .groupBy(bucket.alias("bucket_start"), *keys, ordbin.alias("_bin"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("level_sec", F.lit(fine_w))
    )
    out = [level]
    cache_key_base = (
        "pct-rollup", _plan_key(df), ts, tuple(keys), value,
        tuple(levels), alpha,
    )
    for li, w in enumerate(levels[1:]):
        if cache_levels:
            level = _keyed_persist(cache_key_base + (li,), level)
            out[-1] = level
        coarser = (
            F.floor(F.col("bucket_start") / F.lit(int(w))) * F.lit(int(w))
        ).cast("long")
        level = (
            level.groupBy(coarser.alias("bucket_start"), *keys, "_bin")
            .agg(F.sum("_cnt").alias("_cnt"))
            .withColumn("level_sec", F.lit(w))
        )
        out.append(level)

    hist = out[0]
    for lv in out[1:]:
        hist = hist.unionByName(lv)

    from pyspark.sql.window import Window

    grp = ["level_sec", "bucket_start", *keys]
    w_cum = (
        Window.partitionBy(*grp)
        .orderBy(F.col("_bin").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*grp)
    hist = hist.withColumn("_cum", F.sum("_cnt").over(w_cum)).withColumn(
        "_n", F.sum("_cnt").over(w_all)
    )

    # representative value of an ordinal: midpoint-in-ratio of its
    # log bucket (within alpha of every member by construction)
    rep = F.lit(2.0 * gamma / (gamma + 1.0))

    aggs = [F.max("_n").cast("long").alias("n")]
    for q, name in zip(percentiles, names):
        rank = F.ceil(F.lit(q) * F.col("_n"))
        aggs.append(
            F.min(F.when(F.col("_cum") >= rank, F.col("_bin"))).alias(f"_q_{name}")
        )
    res = hist.groupBy(*grp).agg(*aggs)
    sel = [F.col("level_sec"), F.col("bucket_start"), *[F.col(k) for k in keys], F.col("n")]
    for name in names:
        sel.append(
            F.round(
                F.when(F.col(f"_q_{name}") > 0,
                       rep * F.pow(F.lit(gamma),
                                   (F.col(f"_q_{name}") - F.lit(off) - 1).cast("double")))
                .when(F.col(f"_q_{name}") == 0, F.lit(0.0))
                .otherwise(-rep * F.pow(F.lit(gamma),
                                        (-F.col(f"_q_{name}") - F.lit(off) - 1).cast("double"))),
                9,
            ).alias(name)
        )
    return res.select(*sel)
