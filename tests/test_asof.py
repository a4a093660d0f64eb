"""As-of join: semantics vs a brute-force python reference, tie /
tolerance / direction / null edges, and the one-shuffle plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


LEFT = [
    # (id, key, minute)
    (0, "a", 10),
    (1, "a", 20),
    (2, "a", 5),   # before every right row
    (3, "b", 7),
    (4, "c", 9),   # key with no right rows at all
    (5, "a", 15),  # exactly on a right row
]
RIGHT = [
    # (rid, key, minute)
    (100, "a", 8),
    (101, "a", 15),
    (102, "a", 18),
    (103, "b", 7),   # boundary tie with left id=3
    (104, "b", 30),
]


def _brute(direction):
    out = {}
    for lid, k, lm in LEFT:
        cands = []
        for rid, rk, rm in RIGHT:
            if rk != k:
                continue
            if direction == "backward" and rm <= lm:
                cands.append((lm - rm, -rm, rid))
            elif direction == "forward" and rm >= lm:
                cands.append((rm - lm, rm, rid))
            elif direction == "nearest":
                # tie -> backward, i.e. prefer rm <= lm
                cands.append((abs(rm - lm), rm > lm, rid))
        if direction == "backward":
            out[lid] = min(cands)[2] if cands else None
        elif direction == "forward":
            out[lid] = min(cands)[2] if cands else None
        else:
            out[lid] = min(cands)[2] if cands else None
    return out


@pytest.fixture(scope="module")
def frames(spark):
    l = spark.createDataFrame(
        [(i, k, _ts(m)) for i, k, m in LEFT], "id long, key string, ts timestamp"
    )
    r = spark.createDataFrame(
        [(i, k, _ts(m)) for i, k, m in RIGHT], "rid long, key string, ts timestamp"
    )
    return l, r


class TestDirections:
    # slow lane: brute-force direction matrix; the fast lane keeps TestEdges, TestPlanShape and TestBucketed's hot-key equivalence, plus the asof_attribution driver row
    pytestmark = pytest.mark.slow
    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    def test_matches_brute_force(self, frames, direction):
        l, r = frames
        got = {
            row["id"]: row["rid"]
            for row in asof_join(l, r, on="ts", by="key", direction=direction).collect()
        }
        assert got == _brute(direction)

    def test_backward_boundary_inclusive(self, frames):
        l, r = frames
        got = {r_["id"]: r_["rid"] for r_ in asof_join(l, r, on="ts", by="key").collect()}
        assert got[5] == 101  # left ts == right ts matches (>= semantics)
        assert got[3] == 103  # tie on key b

    def test_left_rows_all_preserved(self, frames):
        l, r = frames
        out = asof_join(l, r, on="ts", by="key")
        assert out.count() == len(LEFT)
        assert {row["id"] for row in out.collect()} == {x[0] for x in LEFT}
        # unmatched rows carry NULL payload
        by_id = {row["id"]: row for row in out.collect()}
        assert by_id[4]["rid"] is None and by_id[2]["rid"] is None

    def test_collision_suffix_carries_right_ts(self, frames):
        l, r = frames
        row = {
            r_["id"]: r_ for r_ in asof_join(l, r, on="ts", by="key").collect()
        }[0]
        assert row["ts"] == _ts(10)      # left ts untouched
        assert row["ts_r"] == _ts(8)     # matched right ts suffixed


class TestTolerance:
    def test_tolerance_nulls_far_matches(self, frames):
        l, r = frames
        out = {
            row["id"]: row["rid"]
            for row in asof_join(
                l, r, on="ts", by="key", tolerance=120.0
            ).collect()
        }
        # id=0 at :10 matched :08 (120s gap) -> kept; id=1 at :20
        # matched :18 (120s) -> kept; id=3 tie (0s) kept
        assert out[0] == 100 and out[1] == 102 and out[3] == 103
        # id=5 at :15 matched :15 (0s) kept
        assert out[5] == 101

    def test_tight_tolerance_drops_all_but_exact(self, frames):
        l, r = frames
        out = {
            row["id"]: row["rid"]
            for row in asof_join(l, r, on="ts", by="key", tolerance=1.0).collect()
        }
        assert out == {0: None, 1: None, 2: None, 3: 103, 4: None, 5: 101}

    def test_tolerance_on_timestamp_ntz(self, spark):
        """Parquet scans produce TIMESTAMP_NTZ, which Spark 4 refuses
        to cast to DOUBLE — the tolerance distance must route through
        the instant cast instead (regression: the first implementation
        raised DATATYPE_MISMATCH on any NTZ input with a tolerance)."""
        l = spark.createDataFrame(
            [(0, "a", _ts(10)), (1, "a", _ts(59))],
            "id long, key string, ts timestamp_ntz",
        )
        r = spark.createDataFrame(
            [(100, "a", _ts(8))], "rid long, key string, ts timestamp_ntz"
        )
        got = {
            row["id"]: row["rid"]
            for row in asof_join(
                l, r, on="ts", by="key", tolerance=600.0
            ).collect()
        }
        assert got == {0: 100, 1: None}

    def test_numeric_on_column(self, spark):
        l = spark.createDataFrame([(0, 10.0), (1, 3.0)], "id long, x double")
        r = spark.createDataFrame([(7, 9.5), (8, 1.0)], "rid long, x double")
        got = {
            row["id"]: row["rid"]
            for row in asof_join(l, r, on="x", tolerance=2.0).collect()
        }
        assert got == {0: 7, 1: 8}


class TestEdges:
    def test_suffix_collision_raises(self, spark):
        """left already holds 'ts_r': suffixing right's 'ts' payload
        would DUPLICATE it — must raise at the join (like pandas
        merge_asof), not surface later as AMBIGUOUS_REFERENCE."""
        l = spark.createDataFrame(
            [(0, _ts(10), _ts(11))], "id long, ts timestamp, ts_r timestamp"
        )
        r = spark.createDataFrame(
            [(_ts(9), 1)], "ts timestamp, x long"
        )
        with pytest.raises(ValueError, match="collides after"):
            asof_join(l, r, on="ts")

    def test_null_left_on_never_matches(self, spark, frames):
        _, r = frames
        l = spark.createDataFrame(
            [(0, "a", None), (1, "a", _ts(20))], "id long, key string, ts timestamp"
        )
        for d in ("backward", "forward", "nearest"):
            got = {
                row["id"]: row["rid"]
                for row in asof_join(l, r, on="ts", by="key", direction=d).collect()
            }
            assert got[0] is None, d

    def test_null_by_keys_never_match(self, spark):
        """DuckDB ASOF `l.k = r.k` and pandas merge_asof never match
        NULL keys to each other; the window partitioning must not
        create a joinable NULL group."""
        l = spark.createDataFrame(
            [(0, None, _ts(10)), (1, "a", _ts(10))],
            "id long, key string, ts timestamp",
        )
        r = spark.createDataFrame(
            [(7, None, _ts(5)), (8, "a", _ts(5))],
            "rid long, key string, ts timestamp",
        )
        for d, want in (("backward", 8), ("forward", None), ("nearest", 8)):
            got = {
                row["id"]: row["rid"]
                for row in asof_join(l, r, on="ts", by="key", direction=d).collect()
            }
            assert got[0] is None, d  # NULL key stays unmatched
            assert got[1] == want, d  # non-null key unaffected

    def test_null_right_on_dropped(self, spark):
        l = spark.createDataFrame([(0, "a", _ts(10))], "id long, key string, ts timestamp")
        r = spark.createDataFrame(
            [(9, "a", None)], "rid long, key string, ts timestamp"
        )
        assert asof_join(l, r, on="ts", by="key").collect()[0]["rid"] is None

    def test_empty_by_is_global(self, spark):
        l = spark.createDataFrame([(0, 5), (1, 50)], "id long, t int")
        r = spark.createDataFrame([(7, 4), (8, 40)], "rid long, t int")
        got = {row["id"]: row["rid"] for row in asof_join(l, r, on="t").collect()}
        assert got == {0: 7, 1: 8}

    def test_bad_direction_raises(self, frames):
        l, r = frames
        with pytest.raises(ValueError, match="direction"):
            asof_join(l, r, on="ts", by="key", direction="sideways")

    def test_on_in_by_raises(self, frames):
        l, r = frames
        with pytest.raises(ValueError, match="cannot also be"):
            asof_join(l, r, on="ts", by=["key", "ts"])


class TestPlanShape:
    def test_single_exchange_backward(self, frames):
        """The whole as-of is one hash exchange on the by-keys plus a
        per-partition sort — no nested-loop / cartesian range join."""
        l, r = frames
        plan = asof_join(l, r, on="ts", by="key")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_agreement_with_duckdb_asof(self, spark, frames):
        """Same answer as DuckDB's native ASOF JOIN on a random corpus
        (the engine-neutral definition of the operator)."""
        import random

        import duckdb

        rng = random.Random(7)
        lrows = [
            (i, rng.choice("abcd"), rng.randint(0, 1000)) for i in range(300)
        ]
        # unique (key, t) on the right for determinism
        seen = set()
        rrows = []
        for i in range(200):
            k, t = rng.choice("abcde"), rng.randint(0, 1000)
            if (k, t) not in seen:
                seen.add((k, t))
                rrows.append((1000 + i, k, t))
        l = spark.createDataFrame(lrows, "id long, key string, t long")
        r = spark.createDataFrame(rrows, "rid long, key string, t long")
        got = {
            row["id"]: row["rid"]
            for row in asof_join(l, r, on="t", by="key").collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE l(id BIGINT, key VARCHAR, t BIGINT)")
        con.execute("CREATE TABLE r(rid BIGINT, key VARCHAR, t BIGINT)")
        con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
        con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
        want = dict(
            con.execute(
                "SELECT l.id, r.rid FROM l ASOF LEFT JOIN r "
                "ON l.key = r.key AND l.t >= r.t"
            ).fetchall()
        )
        assert got == want


class TestBucketed:
    """asof_join_bucketed must be OBSERVABLY identical to asof_join —
    every test here is an equivalence check against the unbucketed
    operator (itself brute-force- and DuckDB-verified above) — while
    bounding the hot-key window partition to one bucket's rows."""

    def _assert_equiv(self, l, r, **kw):
        from opentelemetry_collector_spark.operators import (
            asof_join,
            asof_join_bucketed,
        )

        base = asof_join(l, r, **{k: v for k, v in kw.items() if k != "bucket_width"})
        buck = asof_join_bucketed(l, r, **kw)
        assert base.columns == buck.columns
        a = sorted(map(tuple, base.collect()))
        b = sorted(map(tuple, buck.collect()))
        assert a == b, f"bucketed != base for {kw}\nbase={a[:5]}\nbuck={b[:5]}"

    # slow lane: bucketed==base matrix; the fast lane keeps the hot-key equivalence + plan tests
    @pytest.mark.slow
    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    @pytest.mark.parametrize("width", [60.0, 240.0, 1e9])
    def test_fixed_frames_equivalent(self, frames, direction, width):
        # width=60s: every minute its own bucket -> maximal carry
        # traffic; width=1e9: everything in one bucket -> pure phase 1
        l, r = frames
        self._assert_equiv(
            l, r, on="ts", by="key", direction=direction, bucket_width=width
        )

    # slow lane: randomized bucketed==base sweep
    @pytest.mark.slow
    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    def test_randomized_equivalent(self, spark, direction):
        import random

        rng = random.Random(20260819)
        lrows = [
            (i, rng.choice("abcd"), float(rng.randint(0, 1000)))
            for i in range(300)
        ]
        # null-on left rows and empty-bucket stretches
        lrows += [(1000 + i, rng.choice("abcd"), None) for i in range(5)]
        rrows = [
            (i, rng.choice("abcde"), float(rng.randint(0, 1000)))
            for i in range(200)
        ]
        l = spark.createDataFrame(lrows, "id long, key string, t double")
        r = spark.createDataFrame(rrows, "rid long, key string, t double")
        # dedupe right per (key, t) so ties are deterministic (the
        # documented caveat for BOTH operators)
        r = r.groupBy("key", "t").agg(F.max("rid").alias("rid"))
        for width in (37.0, 500.0):
            self._assert_equiv(
                l, r, on="t", by="key", direction=direction,
                bucket_width=width, tolerance=80.0,
            )

    def test_hot_key_partition_bounded(self, spark):
        """One 'viral' key holding ~60% of all rows: phase 1 must split
        it across time buckets — the largest (key, bucket) window group
        stays bounded by the bucket's row budget while the unbucketed
        operator would put ALL hot rows in one window partition."""
        import random

        from opentelemetry_collector_spark.operators import asof_join_bucketed

        rng = random.Random(7)
        n_hot, n_cold = 3000, 2000
        lrows = [(i, "viral", float(rng.randint(0, 10_000))) for i in range(n_hot)]
        lrows += [
            (n_hot + i, f"k{rng.randint(0, 99)}", float(rng.randint(0, 10_000)))
            for i in range(n_cold)
        ]
        rrows = [(i, "viral", float(i * 7 % 10_000)) for i in range(1000)]
        rrows += [(1000 + i, f"k{i % 100}", float(i * 13 % 10_000)) for i in range(500)]
        l = spark.createDataFrame(lrows, "id long, key string, t double")
        r = (
            spark.createDataFrame(rrows, "rid long, key string, t double")
            .groupBy("key", "t").agg(F.max("rid").alias("rid"))
        )
        width = 500.0  # 10k span / 500 = 20 buckets for the hot key
        out = asof_join_bucketed(l, r, on="t", by="key", bucket_width=width)
        # correctness on the skewed input
        from opentelemetry_collector_spark.operators import asof_join

        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, asof_join(l, r, on="t", by="key").collect())
        )
        # the bound: no (key, bucket) group exceeds its own rows-in-
        # bucket budget. Verify against the data itself: max rows any
        # single window partition holds is max over (key, bucket) of
        # left+right rows — with 20 buckets the hot key's worst group
        # must be well under its total row count.
        both = l.select("key", F.floor(F.col("t") / width).alias("b")).unionAll(
            r.select("key", F.floor(F.col("t") / width).alias("b"))
        )
        worst = both.groupBy("key", "b").count().agg(F.max("count")).first()[0]
        hot_total = n_hot + 1000
        assert worst < hot_total / 4, (worst, hot_total)

    def test_window_partitions_by_bucket_in_plan(self, spark):
        """The phase-1 window's partition spec must include the bucket
        column — the literal mechanism that bounds a hot key."""
        from opentelemetry_collector_spark.operators import asof_join_bucketed

        l = spark.createDataFrame([(1, "a", 5.0)], "id long, key string, t double")
        r = spark.createDataFrame([(2, "a", 3.0)], "rid long, key string, t double")
        plan = asof_join_bucketed(
            l, r, on="t", by="key", bucket_width=10.0
        )._jdf.queryExecution().executedPlan().toString()
        win = [ln for ln in plan.splitlines() if "Window" in ln and "_bkt" in ln]
        assert win, plan

    def test_bad_bucket_width_raises(self, frames):
        from opentelemetry_collector_spark.operators import asof_join_bucketed

        l, r = frames
        with pytest.raises(ValueError, match="bucket_width"):
            asof_join_bucketed(l, r, on="ts", by="key", bucket_width=0.0)

    # slow lane: bucketed==base tolerance matrix
    @pytest.mark.slow
    def test_tolerance_and_timestamps(self, frames):
        # timestamp axis + tolerance through the bucketed path
        for direction in ("backward", "forward", "nearest"):
            l, r = frames
            self._assert_equiv(
                l, r, on="ts", by="key", direction=direction,
                bucket_width=300.0, tolerance=240.0,
            )
