"""One-off experiment driver: compare hi-leg (4-worker) configurations
to find where the 24-core leg loses throughput vs the 6-core leg.
Variants (each: fresh cluster, warmup + 4 passes, median reported):

  A  persist + repartition(cores*2) + default locality   (round-1 shape)
  B  persist + repartition(cores*4) + locality.wait=60s  (strict local)
  C  no persist: scan parquet every pass + repartition(cores*2)
  D  A + ParallelGC executors + gc logs to /tmp/cluster_logs/gc-*.log
  F  A + enriched persisted DISK_ONLY (heap-flat caching)
  G  B + F combined (strict local, fine partitions, disk cache)

Usage: python tools/hi_leg_experiment.py [n_convs] [variants]
e.g.   python tools/hi_leg_experiment.py 120000 ABC
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from opentelemetry_collector_spark.session import get_spark
from opentelemetry_collector_spark.plans import run_pipeline, PipelineConfig
from opentelemetry_collector_spark.hostacct import busy_secs, tree_cpu_secs

variant = sys.argv[1]
path = sys.argv[2]
worker_pids = [int(p) for p in sys.argv[3].split(",")]
cores = {cores}

conf = {{
    "spark.executor.cores": "6",
    "spark.executor.memory": "12g",
    "spark.cores.max": str(cores),
    "spark.pyspark.python": sys.executable,
    "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    "spark.driver.memory": "8g",
}}
if variant in ("B", "G"):
    conf["spark.locality.wait"] = "60s"
if variant == "D":
    conf["spark.executor.extraJavaOptions"] = (
        "-XX:+UseParallelGC -Xlog:gc:file=/tmp/cluster_logs/gc-%p.log"
    )
spark = get_spark(app_name=f"hi_exp_{{variant}}", cpus=cores,
                  shuffle_partitions=cores * 2,
                  master="spark://127.0.0.1:7077", extra_conf=conf)

mult = 4 if variant in ("B", "G") else 2
if variant != "C":
    frame = spark.read.parquet(path).repartition(cores * mult, "conv_id").persist()
    frame.count()
    def load():
        return frame
else:
    def load():
        return spark.read.parquet(path).repartition(cores * mult, "conv_id")

pipe_conf = PipelineConfig(parse_engine="arrow")
if variant in ("F", "G"):
    pipe_conf = PipelineConfig(parse_engine="arrow", storage_level="DISK_ONLY")

def one_pass():
    res = run_pipeline(spark, load(), pipe_conf)
    for _s, df in res["routed"].items():
        df.write.format("noop").mode("overwrite").save()
    for _s, agg in res["aggregates_combined"].items():
        agg.write.format("noop").mode("overwrite").save()
    res["enriched"].unpersist()

def workers_cpu():
    return sum(tree_cpu_secs(p) for p in worker_pids)

one_pass()
passes = []
for _ in range(4):
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    b0, w0 = busy_secs(cores), workers_cpu()
    t0 = time.time()
    one_pass()
    wall = time.time() - t0
    b1, w1 = busy_secs(cores), workers_cpu()
    passes.append({{"sec": round(wall, 2),
                    "ext_frac": round(max(0.0, (b1-b0)-(w1-w0)) / (cores*wall), 4),
                    "self_util": round((w1-w0)/(cores*wall), 3),
                    "cpu_secs": round(w1-w0, 1)}})
secs = sorted(p["sec"] for p in passes)
print(json.dumps({{"variant": variant, "cores": cores,
                   "median": secs[len(secs)//2], "passes": passes}}))
spark.stop()
"""


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    variants = sys.argv[2] if len(sys.argv) > 2 else "ABC"
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from scaling_bench import ensure_input
    from cluster_bench import Cluster, DRIVER_CORES

    path = ensure_input(n_convs)
    script = DRIVER.format(repo=REPO, cores=24)
    results = []
    for v in variants:
        with Cluster(4) as c:
            out = subprocess.run(
                ["taskset", "-c", DRIVER_CORES, sys.executable, "-c", script,
                 v, path, ",".join(map(str, c.worker_pids))],
                capture_output=True, text=True, timeout=1200,
            )
        if out.returncode != 0:
            print(f"variant {v} FAILED:\n{out.stderr[-2500:]}", file=sys.stderr)
            continue
        res = json.loads(out.stdout.strip().splitlines()[-1])
        results.append(res)
        print(json.dumps(res), flush=True)
        time.sleep(10)
    print(json.dumps({"summary": {r["variant"]: r["median"] for r in results}}))


if __name__ == "__main__":
    main()
