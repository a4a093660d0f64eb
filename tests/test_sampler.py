"""Probabilistic-sampler tests — port of probabilisticsampler_test.go:
hash-parity keep set, rate tolerance, and sampling.priority overrides."""

import hashlib

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.mmh3 import (
    BITMASK_HASH_BUCKETS,
    PERCENTAGE_SCALE_FACTOR,
    murmur3_32,
)
from opentelemetry_collector_spark.operators.sampler import ProbabilisticSampler


def golden_keep(conv_id: str, pct: float, seed: int) -> bool:
    tid = hashlib.md5(conv_id.encode()).digest()
    return (murmur3_32(tid, seed) & BITMASK_HASH_BUCKETS) < int(pct * PERCENTAGE_SCALE_FACTOR)


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.createDataFrame(
        [(f"conv-{i}",) for i in range(2000)], "conv_id string"
    ).cache()


class TestHashParity:
    @pytest.mark.parametrize("pct,seed", [(15.0, 22), (50.0, 0), (0.03, 4321)])
    def test_exact_keep_set(self, spark, ids_df, pct, seed):
        sampler = ProbabilisticSampler(pct, hash_seed=seed)
        kept = {r["conv_id"] for r in sampler(ids_df).collect()}
        expected = {f"conv-{i}" for i in range(2000) if golden_keep(f"conv-{i}", pct, seed)}
        assert kept == expected

    def test_zero_percent_drops_all(self, spark, ids_df):
        assert ProbabilisticSampler(0.0, hash_seed=22)(ids_df).count() == 0

    def test_hundred_percent_keeps_all(self, spark, ids_df):
        assert ProbabilisticSampler(100.0, hash_seed=22)(ids_df).count() == 2000

    def test_rate_within_tolerance(self, spark, ids_df):
        # sampling-rate sanity as in the reference test (±~5% absolute here)
        kept = ProbabilisticSampler(33.0, hash_seed=22)(ids_df).count()
        assert abs(kept / 2000 - 0.33) < 0.05


class TestSamplingPriority:
    """probabilisticsampler.go:135-181: 0 ⇒ always drop, >0 ⇒ always
    keep, unparseable/negative ⇒ defer to hash."""

    def _df(self, spark, priority):
        rows = [(f"conv-{i}", {"sampling.priority": priority} if priority is not None else {})
                for i in range(200)]
        return spark.createDataFrame(rows, "conv_id string, attrs map<string,string>")

    def test_priority_zero_always_drops(self, spark):
        df = self._df(spark, "0")
        assert ProbabilisticSampler(100.0, hash_seed=22)(df).count() == 0

    def test_priority_positive_always_keeps(self, spark):
        df = self._df(spark, "2")
        assert ProbabilisticSampler(0.0, hash_seed=22)(df).count() == 200

    def test_priority_double_string(self, spark):
        df = self._df(spark, "0.5")
        assert ProbabilisticSampler(0.0, hash_seed=22)(df).count() == 200

    def test_unparseable_defers_to_hash(self, spark):
        df = self._df(spark, "NaN-ish garbage")
        sampler = ProbabilisticSampler(15.0, hash_seed=22)
        kept = {r["conv_id"] for r in sampler(df).collect()}
        expected = {f"conv-{i}" for i in range(200) if golden_keep(f"conv-{i}", 15.0, 22)}
        assert kept == expected

    def test_absent_attr_defers_to_hash(self, spark):
        df = self._df(spark, None)
        sampler = ProbabilisticSampler(15.0, hash_seed=22)
        kept = {r["conv_id"] for r in sampler(df).collect()}
        expected = {f"conv-{i}" for i in range(200) if golden_keep(f"conv-{i}", 15.0, 22)}
        assert kept == expected
