"""Deterministic sf1.0 synthesis from the driver-provided sf0.1 tables.

Round-4 verdict item 4: every headline query finishes in 0.3–2 s at
sf0.1 — too fast to expose plan differences — so the bench carries a
10× leg for the most expensive queries. No external data: sf1 is
derived from /root/testdata/sf0.1 by stacking ``copies`` deterministic
variants of each source table (same generator lineage as TESTDATA.md,
one scale up).

Per-table scaling, chosen so the 10× workload has the SAME organic
shape as the sf0.1 one (a naive 10× duplication would be a different —
and for dedup, quadratically heavier — workload):

- events: copy i shifts ``event_id`` by i·10^7 and ``ts`` by i·32 days,
  so time buckets, session windows and rollup groups scale 10× in
  COUNT rather than depth, exactly like a longer retention window.
- documents: copy i shifts ``doc_id`` by i·10^7 and TOKEN-SHUFFLES the
  text with a per-(doc, copy) seed. A shuffle preserves the token
  multiset (so language-ID / quality / token-count distributions are
  unchanged) but destroys shingle n-grams, so copies are NOT near-dups
  of each other and MinHash/SimHash see a 10× corpus with the sf0.1
  near-dup rate — not a corpus where every doc has 9 planted twins.

Copy 0 is the untouched sf0.1 table. Output layout mirrors the
testdata layout (``<out>/events.parquet`` etc. as parquet dirs), so
every ``queries()`` entry runs against it unmodified. A _SF1_OK marker
records the recipe; regeneration is skipped when it matches.
"""

import json
import os

import pandas as pd

COPIES = 10
_ID_STRIDE = 10_000_000
_MARKER = "_SF1_OK"


def _token_shuffle_udf():
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def shuf(text: pd.Series, seed: pd.Series) -> pd.Series:
        import random

        out = []
        for t, s in zip(text, seed):
            if t is None or s == 0:
                out.append(t)
                continue
            toks = t.split()
            random.Random(int(s)).shuffle(toks)
            out.append(" ".join(toks))
        return pd.Series(out)

    return F.pandas_udf(shuf, T.StringType())


def ensure_sf1(spark, src_dir: str, out_dir: str, copies: int = COPIES) -> str:
    """Build (or reuse) the sf1 directory; returns ``out_dir``."""
    from pyspark.sql import functions as F

    recipe = {"src": os.path.abspath(src_dir), "copies": copies, "v": 2}
    marker = os.path.join(out_dir, _MARKER)
    try:
        with open(marker) as f:
            if json.load(f) == recipe:
                return out_dir
    except (OSError, ValueError):
        pass

    os.makedirs(out_dir, exist_ok=True)

    ev = spark.read.parquet(os.path.join(src_dir, "events.parquet"))
    parts = []
    for i in range(copies):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * _ID_STRIDE)).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {i * 32} DAYS")).alias("ts"),
                "user_id",
                "event_type",
                "value",
                "props",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )

    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    shuf = _token_shuffle_udf()
    parts = []
    for i in range(copies):
        seed = (
            F.lit(0) if i == 0
            else (F.col("doc_id") * F.lit(1013) + F.lit(i)).cast("long")
        )
        t = F.col("text") if i == 0 else shuf(F.col("text"), seed)
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * _ID_STRIDE)).alias("doc_id"),
                t.alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text").cast("long"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(recipe, f)
    os.replace(tmp, marker)
    return out_dir


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from opentelemetry_collector_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    ensure_sf1(get_spark(app_name="make_sf1", cpus=32), src, dst)
    print(dst)
