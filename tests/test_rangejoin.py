"""Range joins: point-in-interval and interval-overlap vs DuckDB's
inequality joins on random corpora, boundary/uniqueness edges, and the
no-nested-loop plan shape."""

import datetime as dt
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import (
    interval_overlap_join,
    point_in_interval_join,
)


class TestPointInInterval:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rng = random.Random(13)
        pts = [(i, rng.choice("abc"), rng.randint(0, 500)) for i in range(250)]
        ivs = [
            (1000 + i, rng.choice("abcd"), s, s + rng.randint(0, 120))
            for i, s in enumerate(rng.randint(0, 480) for _ in range(80))
        ]
        p = spark.createDataFrame(pts, "pid long, key string, t long")
        iv = spark.createDataFrame(ivs, "iid long, key string, s long, e long")
        return pts, ivs, p, iv

    def _duck(self, pts, ivs, op):
        con = duckdb.connect()
        con.execute("CREATE TABLE p(pid BIGINT, key VARCHAR, t BIGINT)")
        con.execute("CREATE TABLE i(iid BIGINT, key VARCHAR, s BIGINT, e BIGINT)")
        con.executemany("INSERT INTO p VALUES (?,?,?)", pts)
        con.executemany("INSERT INTO i VALUES (?,?,?,?)", ivs)
        return set(
            con.execute(
                f"SELECT pid, iid FROM p JOIN i ON p.key = i.key "
                f"AND p.t >= i.s AND p.t {op} i.e"
            ).fetchall()
        )

    @pytest.mark.parametrize("width", [7.0, 60.0, 1000.0])
    def test_matches_duckdb_any_width(self, corpus, width):
        pts, ivs, p, iv = corpus
        got = {
            (r["pid"], r["iid"])
            for r in point_in_interval_join(
                p, iv, on="t", start="s", end="e", by="key", bucket_width=width
            ).collect()
        }
        assert got == self._duck(pts, ivs, "<")

    def test_end_closed(self, corpus):
        pts, ivs, p, iv = corpus
        got = {
            (r["pid"], r["iid"])
            for r in point_in_interval_join(
                p, iv, on="t", start="s", end="e", by="key",
                bucket_width=50.0, end_closed=True,
            ).collect()
        }
        assert got == self._duck(pts, ivs, "<=")

    def test_no_duplicate_pairs(self, corpus):
        _, _, p, iv = corpus
        rows = point_in_interval_join(
            p, iv, on="t", start="s", end="e", by="key", bucket_width=13.0
        ).select("pid", "iid").collect()
        assert len(rows) == len({(r["pid"], r["iid"]) for r in rows})

    def test_interval_payload_suffixed(self, spark):
        p = spark.createDataFrame([(0, 5, "pt")], "id long, t long, tag string")
        iv = spark.createDataFrame(
            [(9, 0, 10, "iv")], "id long, s long, e long, tag string"
        )
        row = point_in_interval_join(
            p, iv, on="t", start="s", end="e", bucket_width=4.0
        ).collect()[0]
        assert row["id"] == 0 and row["id_r"] == 9
        assert row["tag"] == "pt" and row["tag_r"] == "iv"

    def test_suffix_collision_raises(self, spark):
        """points already hold 'id_r': suffixing the interval side's
        'id' would duplicate it — raise at the join, not later as
        AMBIGUOUS_REFERENCE."""
        p = spark.createDataFrame([(0, 5, 7)], "id long, t long, id_r long")
        iv = spark.createDataFrame([(9, 0, 10)], "id long, s long, e long")
        with pytest.raises(ValueError, match="collides after"):
            point_in_interval_join(p, iv, on="t", start="s", end="e")

    def test_rejects_nonpositive_bucket_width(self, spark):
        """width 0 would hit ANSI DIVIDE_BY_ZERO mid-task; negative
        widths flip bucket signs — both must fail at call time."""
        p = spark.createDataFrame([(0, 5)], "pid long, t long")
        iv = spark.createDataFrame([(9, 0, 10)], "iid long, s long, e long")
        for bad in (0.0, -3.0):
            with pytest.raises(ValueError, match="bucket_width"):
                point_in_interval_join(
                    p, iv, on="t", start="s", end="e", bucket_width=bad
                )

    def test_negative_axis(self, spark):
        p = spark.createDataFrame([(0, -7), (1, -1), (2, 3)], "pid long, t long")
        iv = spark.createDataFrame([(9, -8, 0)], "iid long, s long, e long")
        got = {
            r["pid"]
            for r in point_in_interval_join(
                p, iv, on="t", start="s", end="e", bucket_width=3.0
            ).collect()
        }
        assert got == {0, 1}

    def test_timestamp_ntz_axis(self, spark):
        """The testdata parquet scans produce TIMESTAMP_NTZ — the axis
        helper must bucket it without the NTZ->DOUBLE cast Spark 4
        forbids."""
        base = dt.datetime(2024, 1, 1)
        p = spark.createDataFrame(
            [(0, base + dt.timedelta(minutes=30))], "pid long, ts timestamp_ntz"
        )
        iv = spark.createDataFrame(
            [(9, base, base + dt.timedelta(hours=1))],
            "iid long, s timestamp_ntz, e timestamp_ntz",
        )
        assert dict(p.dtypes)["ts"] == "timestamp_ntz"
        out = point_in_interval_join(
            p, iv, on="ts", start="s", end="e", bucket_width=3600.0
        ).collect()
        assert [(r["pid"], r["iid"]) for r in out] == [(0, 9)]

    def test_plan_no_nested_loop(self, corpus):
        _, _, p, iv = corpus
        plan = (
            point_in_interval_join(
                p, iv, on="t", start="s", end="e", by="key", bucket_width=50.0
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "NestedLoop" not in plan and "Cartesian" not in plan


class TestIntervalOverlap:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rng = random.Random(29)
        mk = lambda n, base: [
            (base + i, rng.choice("ab"), s, s + rng.randint(0, 90))
            for i, s in enumerate(rng.randint(0, 400) for _ in range(n))
        ]
        lrows, rrows = mk(60, 0), mk(60, 1000)
        l = spark.createDataFrame(lrows, "lid long, key string, s long, e long")
        r = spark.createDataFrame(rrows, "rid long, key string, s long, e long")
        return lrows, rrows, l, r

    def _duck(self, lrows, rrows):
        con = duckdb.connect()
        con.execute("CREATE TABLE l(lid BIGINT, key VARCHAR, s BIGINT, e BIGINT)")
        con.execute("CREATE TABLE r(rid BIGINT, key VARCHAR, s BIGINT, e BIGINT)")
        con.executemany("INSERT INTO l VALUES (?,?,?,?)", lrows)
        con.executemany("INSERT INTO r VALUES (?,?,?,?)", rrows)
        return set(
            con.execute(
                "SELECT lid, rid FROM l JOIN r ON l.key = r.key "
                "AND l.s < r.e AND r.s < l.e"
            ).fetchall()
        )

    @pytest.mark.parametrize("width", [11.0, 64.0, 500.0])
    def test_matches_duckdb_any_width(self, corpus, width):
        lrows, rrows, l, r = corpus
        got = [
            (row["lid"], row["rid"])
            for row in interval_overlap_join(
                l, r, l_start="s", l_end="e", r_start="s", r_end="e",
                by="key", bucket_width=width,
            ).collect()
        ]
        # exactly once per pair, and exactly the DuckDB pair set
        assert len(got) == len(set(got))
        assert set(got) == self._duck(lrows, rrows)

    def test_touching_intervals_do_not_overlap(self, spark):
        l = spark.createDataFrame([(0, 0, 10)], "lid long, s long, e long")
        r = spark.createDataFrame([(9, 10, 20)], "rid long, s long, e long")
        assert (
            interval_overlap_join(
                l, r, l_start="s", l_end="e", r_start="s", r_end="e",
                bucket_width=5.0,
            ).count()
            == 0
        )

    def test_point_interval_inside(self, spark):
        # empty-width right interval strictly inside left still overlaps
        l = spark.createDataFrame([(0, 0, 10)], "lid long, s long, e long")
        r = spark.createDataFrame([(9, 5, 5)], "rid long, s long, e long")
        out = interval_overlap_join(
            l, r, l_start="s", l_end="e", r_start="s", r_end="e",
            bucket_width=3.0,
        ).collect()
        assert [(r_["lid"], r_["rid"]) for r_ in out] == [(0, 9)]
