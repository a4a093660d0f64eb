"""Prometheus remote-write wire (sources/prometheus_remote_write.py)
and the snappy block codec beneath it (functions/snappy_block.py).

Reference parity targets:
  exporter/prometheusremotewriteexporter/helper.go:55-81
    (validateMetrics cumulative-only), 174-213 (_total naming),
    254-281 (sanitize incl. digit/underscore prefixes),
    106-172 (sorted label signature);
  google/snappy format_description.txt (block format).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from opentelemetry_collector_spark.functions.snappy_block import (
    compress,
    decompress,
)
from opentelemetry_collector_spark.sources.prometheus_remote_write import (
    metrics_to_remote_write,
    prom_metric_name,
    remote_write_to_samples,
    sanitize,
)

DP_SCHEMA = (
    "name string, data_type string, temporality string, "
    "labels map<string,string>, ts timestamp, int_value long, "
    "double_value double"
)


class TestSnappyBlock:
    CASES = [
        b"",
        b"a",
        b"abcabcabcabcabcabcabc" * 10,
        b"\x00" * 100_000,
        b"hello remote write " * 5000,
    ]

    def test_roundtrip_compressed_and_literal(self):
        rng = random.Random(7)
        cases = self.CASES + [
            bytes(rng.randrange(256) for _ in range(10_000)),
            bytes(rng.randrange(4) for _ in range(70_000)),
        ]
        for c in cases:
            assert decompress(compress(c, True)) == c
            assert decompress(compress(c, False)) == c

    def test_actually_compresses_repetitive_input(self):
        c = compress(b"abcd" * 10_000)
        assert len(c) < 40_000 * 0.1  # copies emitted, not just literals

    def test_handmade_copy_ops_decode(self):
        # literal 'abcd' + copy1(offset 4, len 4) → 'abcdabcd'
        one = bytes([8, (4 - 1) << 2]) + b"abcd" + bytes([0b01, 4])
        assert decompress(one) == b"abcdabcd"
        # overlapping copy2: 'ab' + copy(offset 2, len 6) → 'abababab'
        two = bytes([8, (2 - 1) << 2]) + b"ab" + bytes([((6 - 1) << 2) | 0b10, 2, 0])
        assert decompress(two) == b"abababab"
        # copy4 spelling of the same stream
        four = bytes([8, (2 - 1) << 2]) + b"ab" + bytes(
            [((6 - 1) << 2) | 0b11, 2, 0, 0, 0]
        )
        assert decompress(four) == b"abababab"

    def test_corrupt_streams_rejected(self):
        with pytest.raises(ValueError):
            decompress(bytes([8, (2 - 1) << 2]) + b"ab")  # short of header len
        with pytest.raises(ValueError):  # copy reaching before output start
            decompress(bytes([4, 0b01, 9]))
        with pytest.raises(ValueError):  # offset 0 invalid
            decompress(bytes([8, (4 - 1) << 2]) + b"abcd" + bytes([0b01, 0]))


class TestNaming:
    def test_sanitize_parity(self):
        # helper.go:254-271: non-alphanumeric → _, digit/underscore prefixes
        assert sanitize("a.b-c:d") == "a_b_c_d"  # ':' dies here, unlike exposition
        assert sanitize("0abc") == "key_0abc"
        assert sanitize("_abc") == "key_abc"
        assert sanitize("") == ""

    def test_total_suffix_rules(self):
        # helper.go:174-213
        assert prom_metric_name("events.click", is_counter=True) == "events_click_total"
        assert prom_metric_name("requests_total", is_counter=True) == "requests_total"
        assert prom_metric_name("hits.total", is_counter=True) == "hits_total"
        assert prom_metric_name("temp", is_counter=False) == "temp"
        assert (
            prom_metric_name("events.click", is_counter=True, namespace="ns")
            == "ns_events_click_total"
        )


class TestWire:
    @pytest.fixture(scope="class")
    def dps(self, spark):
        rows = [
            ("events.click", "DoubleSum", "CUMULATIVE", {"m": "click"},
             dt.datetime(2026, 1, 1, 0, 0, 1, 500000), None, 12.5),
            ("events.view", "IntSum", "DELTA", {"m": "view"},
             dt.datetime(2026, 1, 1), 7, None),
            ("requests_total", "IntSum", "CUMULATIVE", {"m": "x"},
             dt.datetime(2026, 1, 1), 5, None),
            ("temp", "DoubleGauge", "UNSPECIFIED", {"m": "y"},
             dt.datetime(2026, 1, 1), None, -3.25),
        ]
        return spark.createDataFrame(rows, DP_SCHEMA)

    def test_roundtrip_rules(self, dps):
        back = {
            r["name"]: r
            for r in remote_write_to_samples(metrics_to_remote_write(dps)).collect()
        }
        # DELTA dropped (validateMetrics), counter naming applied
        assert set(back) == {"events_click_total", "requests_total", "temp"}
        assert back["events_click_total"]["value"] == 12.5
        assert back["events_click_total"]["ts_ms"] == 1767225601500
        assert back["requests_total"]["value"] == 5.0  # int → float64
        assert back["temp"]["value"] == -3.25  # gauge: no _total
        for r in back.values():
            assert r["labels"] and "__name__" not in r["labels"]

    def test_sample_set_invariant_under_partitioning(self, dps):
        a = {
            (r["name"], r["labels"]["m"], r["value"], r["ts_ms"])
            for r in remote_write_to_samples(metrics_to_remote_write(dps)).collect()
        }
        b = {
            (r["name"], r["labels"]["m"], r["value"], r["ts_ms"])
            for r in remote_write_to_samples(
                metrics_to_remote_write(dps.repartition(7))
            ).collect()
        }
        assert a == b

    def test_samples_grouped_into_one_series_per_label_set(self, spark):
        rows = [
            ("c", "DoubleSum", "CUMULATIVE", {"m": "x"},
             dt.datetime(2026, 1, 1, 0, 0, i), None, float(i))
            for i in range(5)
        ]
        df = spark.createDataFrame(rows, DP_SCHEMA).coalesce(1)
        from opentelemetry_collector_spark.functions.snappy_block import decompress
        from opentelemetry_collector_spark.sources.prometheus_remote_write import (
            _read_request,
        )

        [blob] = [r["blob"] for r in metrics_to_remote_write(df).collect()]
        req = _read_request(decompress(bytes(blob)))
        assert len(req) == 1  # one series, five samples
        labels, samples = req[0]
        assert ("__name__", "c_total") in labels
        assert [s[0] for s in samples] == [0.0, 1.0, 2.0, 3.0, 4.0]  # ts order
