import pytest

from opentelemetry_collector_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="otelcol_spark_tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    from opentelemetry_collector_spark.datagen import make_transcripts_df

    return make_transcripts_df(spark, n_convs=20, seed=42).cache()


def attrs_df(spark, rows):
    """Build a 1-col DataFrame of attribute maps from python dicts
    (all values stringified canonically) — the unit-test harness shape
    of attributes_log_test.go:34-50."""
    from opentelemetry_collector_spark.operators.attributes import _stringify_literal

    data = [
        ({k: _stringify_literal(v) for k, v in row.items()},) for row in rows
    ]
    return spark.createDataFrame(data, schema="attrs map<string,string>")
