"""The fused (tagged fan-out, single-shuffle) pipeline compilation
must produce exactly the per-sink results of the reference-shaped
multi-action plan."""

from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.pipeline import (
    PipelineConfig,
    aggregate_combined,
    aggregate_combined_tagged,
    parse_stage,
    route_stage,
    route_stage_tagged,
    run_pipeline_fused,
)


class TestFusedEquivalence:
    def test_tagged_routes_match_per_sink_frames(self, spark, tiny_transcripts):
        parsed = parse_stage(tiny_transcripts, engine="jvm")
        routes = PipelineConfig().routes
        tagged = route_stage_tagged(parsed, routes)
        per_sink = route_stage(parsed, routes)
        for sink, df in per_sink.items():
            a = tagged.filter(F.col("sink") == sink).drop("sink")
            assert a.count() == df.count(), sink
            key = ["conv_id", "turn_idx", "text"]
            assert a.select(key).subtract(df.select(key)).count() == 0, sink

    def test_tagged_aggregates_match_per_sink(self, spark, tiny_transcripts):
        parsed = parse_stage(tiny_transcripts, engine="jvm")
        routes = PipelineConfig().routes
        tagged_agg = aggregate_combined_tagged(route_stage_tagged(parsed, routes))
        for sink, df in route_stage(parsed, routes).items():
            want = aggregate_combined(df)
            got = tagged_agg.filter(F.col("sink") == sink).drop("sink")
            assert got.subtract(want).count() == 0, sink
            assert want.subtract(got).count() == 0, sink

    def test_single_exchange_for_all_aggregates(self, spark, tiny_transcripts):
        parsed = parse_stage(tiny_transcripts, engine="jvm")
        agg = aggregate_combined_tagged(route_stage_tagged(parsed, PipelineConfig().routes))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan

    def test_run_pipeline_fused_counts(self, spark, tiny_transcripts):
        res = run_pipeline_fused(spark, tiny_transcripts, PipelineConfig(persist=False))
        n = tiny_transcripts.count()
        per_sink = {
            r["sink"]: r["n"]
            for r in res["routed_tagged"].groupBy("sink").agg(F.count("*").alias("n")).collect()
        }
        assert per_sink["archive"] == n
        assert set(per_sink) == {"errors", "tool_calls", "archive"}
