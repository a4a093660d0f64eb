"""Snapshot-versioned sink warehouse: the exporter layer of the
pipeline (exporter/otlpexporter, exporter/fileexporter in the
reference) re-expressed as table appends with the durability the
reference lacks — its in-memory queued_retry loses in-flight data on
restart (exporter/exporterhelper/queued_retry.go), while every write
here is an atomic snapshot commit that a restarted job detects and
skips.

Design (Iceberg-shaped, parquet-backed):
  * each sink table lives at ``<root>/<sink>/``; every write lands in
    a unique ``snap=<snapshot_id>`` subdirectory (snapshot_id =
    deterministic fingerprint of run_id + sink), so a re-run of the
    same run_id OVERWRITES its own snapshot rather than duplicating
    rows — writes are idempotent at the snapshot level;
  * a commit manifest (JSON, written atomically via rename AFTER the
    data lands) records the snapshot: row count, input fingerprint,
    per-partition lineage. Readers only see committed snapshots; a
    crash mid-write leaves an orphan directory that the next run of
    the same run_id overwrites — never double-counted data;
  * obsreport-style sent-counters are captured from ``df.observe``
    during the SAME action as the write; per-file lineage (file →
    row count + key range) is harvested from the written parquet
    FOOTERS — metadata-only, no second data scan (the manifest-file
    role Iceberg's own manifests play). A commit requires the footer
    row total to equal the observed sent count — a lost or truncated
    file fails the commit instead of under-counting silently;
  * on a real cluster the identical interface binds to Iceberg
    (``writeTo(...).append()`` within its snapshot/commit machinery);
    ``sources.tables.iceberg_available`` gates that path.

At 100 TB the commit manifest stays tiny (per-partition rows, not
per-row), and resume skips whole completed sinks — the expensive
recompute is avoided precisely where it matters.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fingerprint(*parts: str) -> str:
    return hashlib.sha1("\x1f".join(parts).encode()).hexdigest()[:16]


def _json_safe(v):
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def _footer_lineage(path: str, lineage_keys: tuple[str, ...]) -> list[dict]:
    """Per-file lineage from parquet footer metadata: row count plus
    min/max of each lineage key, read without touching data pages.
    String min/max may be writer-truncated bounds (parquet permits
    truncated statistics) — still valid conservative key ranges.
    O(#files) driver-side metadata reads, exactly the cost profile of
    an Iceberg manifest scan."""
    import pyarrow.parquet as pq

    entries = []
    for dirpath, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            full = os.path.join(dirpath, fn)
            md = pq.ParquetFile(full).metadata
            ent: dict = {
                "file": os.path.relpath(full, path),
                "rows": md.num_rows,
            }
            # leaf-column dotted paths (robust to map/struct columns)
            col_idx = {
                md.schema.column(i).path: i for i in range(md.num_columns)
            }
            for k in lineage_keys:
                i = col_idx.get(k)
                if i is None:
                    continue
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(i).statistics
                    if st is None or not st.has_min_max:
                        mins = []
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins:
                    ent[f"min_{k}"] = _json_safe(min(mins))
                    ent[f"max_{k}"] = _json_safe(max(maxs))
            entries.append(ent)
    return entries


@dataclass
class SinkResult:
    sink: str
    path: str
    snapshot_id: str
    rows: int
    skipped: bool = False  # True when resume found a committed snapshot
    lineage: list[dict] = field(default_factory=list)


class Warehouse:
    """Filesystem warehouse with atomic JSON commit manifests."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)

    # -- commit log ---------------------------------------------------------

    def _commit_path(self, snapshot_id: str) -> str:
        return os.path.join(self.root, "_commits", f"{snapshot_id}.json")

    def committed(self, snapshot_id: str) -> dict | None:
        p = self._commit_path(snapshot_id)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def has_run(self, sink: str, run_id: str) -> bool:
        """True when (run_id, sink) already has a committed snapshot."""
        return self.committed(_fingerprint(run_id, sink)) is not None

    def has_stream_runs(self, stream_id: str) -> bool:
        """True when any committed snapshot carries this stream's
        namespaced run_id (``<stream_id>-epoch-N``) — the marker-less
        signal that a resuming checkpoint was ALREADY namespaced, so
        the legacy-epoch migration must not claim it. Metadata-only:
        one scan of the KB-scale commit log."""
        prefix = f"{stream_id}-epoch-"
        commits_dir = os.path.join(self.root, "_commits")
        for fn in os.listdir(commits_dir):
            if not fn.endswith(".json"):
                continue
            try:
                with open(os.path.join(commits_dir, fn)) as f:
                    # str(... or "") tolerates run_id: null and corrupt
                    # non-string manifests — one bad manifest must not
                    # abort stream startup
                    if str(json.load(f).get("run_id") or "").startswith(prefix):
                        return True
            except (OSError, json.JSONDecodeError):
                continue
        return False

    def has_legacy_epochs(self) -> bool:
        """True when any committed snapshot carries an UNSCOPED
        pre-namespacing run_id (exactly ``epoch-N``). Legacy-epoch
        migration is only meaningful when such snapshots exist at all:
        a checkpoint with offsets but no marker and no unscoped
        ``epoch-N`` commits anywhere in the warehouse cannot be
        resuming a pre-namespacing build (there is nothing it could
        double-commit), so it must classify non-legacy. Metadata-only:
        one scan of the KB-scale commit log."""
        import re

        commits_dir = os.path.join(self.root, "_commits")
        pat = re.compile(r"^epoch-\d+$")
        for fn in os.listdir(commits_dir):
            if not fn.endswith(".json"):
                continue
            try:
                with open(os.path.join(commits_dir, fn)) as f:
                    if pat.match(str(json.load(f).get("run_id") or "")):
                        return True
            except (OSError, json.JSONDecodeError):
                continue
        return False

    def _commit(self, manifest: dict) -> None:
        """Write-then-rename so a manifest is either absent or complete
        (the snapshot-commit atomicity Iceberg gives natively)."""
        p = self._commit_path(manifest["snapshot_id"])
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, p)

    # -- writes -------------------------------------------------------------

    def write_sink(
        self,
        sink: str,
        df: DataFrame,
        run_id: str,
        input_fingerprint: str = "",
        lineage_keys: tuple[str, ...] = (),
        partition_layout: bool = False,
    ) -> SinkResult:
        """Write one sink's DataFrame as a committed snapshot.

        Idempotent per (run_id, sink): an existing committed snapshot
        with the same input fingerprint is skipped (resume); a
        mismatched fingerprint (same run_id, different input) raises —
        that is a misuse, not a resume.
        """
        snapshot_id = _fingerprint(run_id, sink)
        prior = self.committed(snapshot_id)
        if prior is not None:
            if input_fingerprint and prior.get("input_fingerprint") not in ("", input_fingerprint):
                raise ValueError(
                    f"run {run_id!r} sink {sink!r} already committed with a "
                    f"different input fingerprint — refusing to resume"
                )
            return SinkResult(
                sink, prior["path"], snapshot_id, prior["rows"],
                skipped=True, lineage=prior.get("lineage", []),
            )

        path = os.path.join(self.root, sink, f"snap={snapshot_id}")
        if os.path.exists(path):  # orphan from a crashed attempt
            shutil.rmtree(path)

        # obsreport "sent" counter captured DURING the write action via
        # df.observe (obsreport_exporter.go:29-44 — the counter rides
        # the export itself, never a second scan).
        from pyspark.sql import Observation

        tagged = df
        if partition_layout:
            # Iceberg-style layout days(ts)/bucket(conv_id): time-range
            # queries prune by day directory, per-conversation lookups
            # prune by bucket — the partition-pruning-friendly layout
            # SURVEY §7 calls out (hive-partitioned parquet here; the
            # identical spec binds to Iceberg partition transforms on a
            # real catalog)
            tagged = tagged.withColumn(
                "_day", F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd")
            ).withColumn(
                "_bucket", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(16)).cast("int")
            )
        obs = Observation(f"sent_{sink}_{snapshot_id}")
        tagged = tagged.observe(obs, F.count(F.lit(1)).alias("sent"))
        writer = tagged.write.mode("overwrite")
        if partition_layout:
            writer = writer.partitionBy("_day", "_bucket")
        writer.parquet(path)
        observed_sent = int(obs.get["sent"])

        # lineage from parquet footers: metadata-only, no re-scan of
        # the data just written (at 100 TB a post-write re-read would
        # double the write path's I/O)
        lineage = _footer_lineage(path, lineage_keys)
        rows = sum(r["rows"] for r in lineage)
        if rows != observed_sent:  # commit-time conservation check
            raise RuntimeError(
                f"sink {sink!r}: observed {observed_sent} rows during write "
                f"but lineage sums to {rows} — refusing to commit"
            )

        self._commit(
            {
                "snapshot_id": snapshot_id,
                "run_id": run_id,
                "sink": sink,
                "path": path,
                "rows": rows,
                "observed_sent": observed_sent,
                "input_fingerprint": input_fingerprint,
                "lineage": lineage,
                "committed_at": time.time(),
            }
        )
        return SinkResult(sink, path, snapshot_id, rows, lineage=lineage)

    def read_sink(self, spark: SparkSession, sink: str) -> DataFrame:
        """Read only committed snapshots of a sink table."""
        commits_dir = os.path.join(self.root, "_commits")
        paths = []
        for fn in sorted(os.listdir(commits_dir)):
            with open(os.path.join(commits_dir, fn)) as f:
                m = json.load(f)
            if m["sink"] == sink:
                paths.append(m["path"])
        if not paths:
            raise FileNotFoundError(f"no committed snapshots for sink {sink!r}")
        # _part_id survives only in pre-footer-lineage snapshots
        return spark.read.parquet(*paths).drop("_part_id", "_day", "_bucket")

    def metrics_table(self, spark: SparkSession) -> DataFrame:
        """obsreport-parity view over the commit log: per-sink sent
        counters (obsreport_exporter.go:29-44)."""
        commits_dir = os.path.join(self.root, "_commits")
        rows = []
        for fn in sorted(os.listdir(commits_dir)):
            with open(os.path.join(commits_dir, fn)) as f:
                m = json.load(f)
            rows.append((m["run_id"], m["sink"], m["rows"], len(m.get("lineage", []))))
        return spark.createDataFrame(
            rows, "run_id string, sink string, sent bigint, n_partitions int"
        )


def run_and_write(
    spark: SparkSession,
    transcripts: DataFrame,
    warehouse: Warehouse,
    run_id: str,
    config=None,
    input_fingerprint: str = "",
    concurrent: bool = True,
) -> dict[str, SinkResult]:
    """Execute the full pipeline and commit every routed sink +
    per-sink aggregate to the warehouse, skipping sinks already
    committed for this run_id (idempotent resume after a crash).

    Sink writes are independent Spark jobs over independent warehouse
    paths (each commit is its own atomic rename under a per-sink
    name), so they are submitted concurrently by default
    (plans.pipeline.materialize_concurrent) — the scheduler fills one
    job's stage-barrier idle with another's tasks, which matters more
    the larger the cluster. ``concurrent=False`` restores sequential
    submission."""
    from ..plans.pipeline import PipelineConfig, materialize_concurrent, run_pipeline

    config = config or PipelineConfig()
    res = run_pipeline(spark, transcripts, config)

    def write(sink: str, df: DataFrame, **kw):
        return lambda: warehouse.write_sink(
            sink, df, run_id, input_fingerprint, **kw
        )

    actions = {
        sink: write(sink, df, lineage_keys=("conv_id", "ts"))
        for sink, df in res["routed"].items()
    }
    actions.update(
        {
            f"{sink}_agg": write(f"{sink}_agg", agg_df)
            for sink, agg_df in res["aggregates_combined"].items()
        }
    )
    try:
        if concurrent:
            results = materialize_concurrent(actions)
        else:
            results = {name: fn() for name, fn in actions.items()}
    finally:
        if config.persist:
            res["enriched"].unpersist()
    return results
