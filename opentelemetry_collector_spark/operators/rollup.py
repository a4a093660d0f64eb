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

Non-cascadable measures (distinct counts, percentiles) need sketches
(HLL / KLL) and are out of scope here — the operator raises on them
rather than silently double-counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .asof import numeric_axis

_CASCADABLE = ("count", "sum", "min", "max", "avg")

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
                f"measure {name!r}: {agg!r} is not exactly cascadable "
                f"(supported: {_CASCADABLE}; distinct/percentile need "
                f"sketches)"
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

    # internal physical columns: every avg decomposes into (sum, count)
    # so coarser levels re-aggregate exactly
    phys: dict[str, tuple[str, str]] = {}
    for name, (agg, col) in measures.items():
        if agg == "avg":
            for gen in (f"_{name}_sum", f"_{name}_cnt"):
                if gen in measures:
                    # a same-named user measure would be clobbered in
                    # phys (dict-order-dependent WRONG numbers, no
                    # error) — refuse loudly instead
                    raise ValueError(
                        f"measure name {gen!r} collides with the"
                        f" physical column generated for avg measure"
                        f" {name!r}; rename one of them"
                    )
            phys[f"_{name}_sum"] = ("sum", col)
            phys[f"_{name}_cnt"] = ("count", col)
        else:
            phys[name] = (agg, col)

    def base_agg(c: str, agg: str):
        if agg == "count":
            return (
                F.count(F.lit(1)) if c == "*" else F.count(F.col(c))
            ).cast("long")
        return getattr(F, agg)(F.col(c))

    # re-aggregation of a physical column from the finer level
    _REAGG = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}

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
            else:
                cols.append(F.col(name))
        return lv.select(*cols)

    result = public(out[0])
    for lv in out[1:]:
        result = result.unionByName(public(lv))
    return result
