"""hostmetrics scraper source: /proc-format snapshot text → the
receiver's metric datapoints (sources/hostmetrics.py; reference
receiver/hostmetricsreceiver/internal/scraper/*)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.hostmetrics import (
    COUNTER_COLS,
    render_snapshots,
    scrape_snapshots,
)


def _counters(spark, values: dict):
    """One-row counter frame; unlisted counters default to 0."""
    row = {
        c: values.get(c, 0.0 if c.startswith("load") else 0)
        for c in COUNTER_COLS
    }
    row["host_id"] = "h0"
    row["ts"] = 0
    df = spark.createDataFrame(
        [tuple(row[c] for c in ("host_id", "ts", *COUNTER_COLS))],
        schema="host_id string, ts bigint, "
        + ", ".join(
            f"{c} double" if c.startswith("load") else f"{c} bigint"
            for c in COUNTER_COLS
        ),
    )
    return df


def _dp_map(dps):
    out = {}
    for r in dps.collect():
        key = (r["name"], r["labels"])
        assert key not in out, f"duplicate datapoint {key}"
        out[key] = r
    return out


def test_roundtrip_exact_values(spark):
    vals = {
        "cpu0_user": 123, "cpu0_iowait": 45, "cpu1_steal": 7,
        "mem_total_kb": 1000, "mem_free_kb": 100, "buffers_kb": 50,
        "cached_kb": 200, "sreclaim_kb": 30, "sunreclaim_kb": 10,
        "swap_total_kb": 500, "swap_free_kb": 300, "swap_cached_kb": 20,
        "load1": 1.23, "load5": 0.05, "load15": 12.5,
        "d_sectors_read": 100, "d_ms_io": 2500, "d_ms_reading": 75,
        "d_io_in_progress": 3, "d_writes_merged": 9,
        "n_rx_bytes": 1111, "n_tx_drop": 4,
        "tcp_established": 2, "tcp_listen": 1, "tcp_time_wait": 0,
        "vm_pswpin": 7, "vm_pgpgout": 11,
        "vm_pgfault": 900, "vm_pgmajfault": 40,
        "procs_running": 5, "procs_blocked": 2, "processes_created": 4242,
        "fs_total_b": 1000_000, "fs_free_b": 400_000, "fs_avail_b": 350_000,
        "inodes_total": 90, "inodes_free": 60,
    }
    snaps = render_snapshots(_counters(spark, vals))
    m = _dp_map(scrape_snapshots(snaps))

    # cpu: jiffies/USER_HZ, reference state names (interrupt/wait)
    assert m[("system.cpu.time", "cpu=cpu0,state=user")]["double_value"] == 1.23
    assert m[("system.cpu.time", "cpu=cpu0,state=wait")]["double_value"] == 0.45
    assert m[("system.cpu.time", "cpu=cpu1,state=steal")]["double_value"] == 0.07
    cpu_dp = m[("system.cpu.time", "cpu=cpu0,state=idle")]
    assert (cpu_dp["data_type"], cpu_dp["monotonic"], cpu_dp["unit"],
            cpu_dp["temporality"]) == ("DoubleSum", 1, "s", "CUMULATIVE")

    # memory: gopsutil cached = Cached + SReclaimable, used = the rest
    assert m[("system.memory.usage", "state=cached")]["int_value"] == 230 * 1024
    assert (
        m[("system.memory.usage", "state=used")]["int_value"]
        == (1000 - 100 - 50 - 230) * 1024
    )
    assert m[("system.memory.usage", "state=slab_unreclaimable")][
        "int_value"] == 10 * 1024

    # load gauges survive the %.2f wire exactly
    load = m[("system.cpu.load_average.1m", "")]
    assert load["double_value"] == 1.23
    assert (load["data_type"], load["monotonic"], load["temporality"]) == (
        "DoubleGauge", 0, "UNSPECIFIED")
    assert m[("system.cpu.load_average.15m", "")]["double_value"] == 12.5

    # disk: sectors×512, ms/1e3, merged/pending passthrough
    assert m[("system.disk.io", "device=sda,direction=read")][
        "int_value"] == 100 * 512
    assert m[("system.disk.io_time", "device=sda")]["double_value"] == 2.5
    assert m[("system.disk.operation_time", "device=sda,direction=read")][
        "double_value"] == 0.075
    assert m[("system.disk.pending_operations", "device=sda")]["int_value"] == 3
    assert m[("system.disk.merged", "device=sda,direction=write")][
        "int_value"] == 9

    # network counters by direction
    assert m[("system.network.io", "device=eth0,direction=receive")][
        "int_value"] == 1111
    assert m[("system.network.dropped", "device=eth0,direction=transmit")][
        "int_value"] == 4

    # tcp connection counts by mapped state; zero-count state absent
    assert m[("system.network.connections",
              "protocol=tcp,state=ESTABLISHED")]["int_value"] == 2
    assert m[("system.network.connections",
              "protocol=tcp,state=LISTEN")]["int_value"] == 1
    assert ("system.network.connections",
            "protocol=tcp,state=TIME_WAIT") not in m

    # paging: swap states from meminfo; ops ×4096; faults split
    assert m[("system.paging.usage", "state=used")][
        "int_value"] == (500 - 300 - 20) * 1024
    assert m[("system.paging.operations",
              "direction=page_in,type=major")]["int_value"] == 7 * 4096
    assert m[("system.paging.operations",
              "direction=page_out,type=minor")]["int_value"] == 11 * 4096
    assert m[("system.paging.faults", "type=major")]["int_value"] == 40
    assert m[("system.paging.faults", "type=minor")]["int_value"] == 860

    # processes
    assert m[("system.processes.count", "status=running")]["int_value"] == 5
    assert m[("system.processes.count", "status=blocked")]["int_value"] == 2
    created = m[("system.processes.created", "")]
    assert (created["int_value"], created["monotonic"]) == (4242, 1)

    # filesystem: statfs semantics (used = total - kernel free,
    # free = avail, reserved = kernel free - avail), 5-label set
    fs = "device=/dev/sda1,mode=rw,mountpoint=/,state={},type=ext4"
    assert m[("system.filesystem.usage", fs.format("used"))][
        "int_value"] == 600_000
    assert m[("system.filesystem.usage", fs.format("free"))][
        "int_value"] == 350_000
    assert m[("system.filesystem.usage", fs.format("reserved"))][
        "int_value"] == 50_000
    assert m[("system.filesystem.inodes.usage", fs.format("used"))][
        "int_value"] == 30


def test_parser_is_layout_generic(spark):
    """The query renders a fixed topology but the parser handles any
    cpu/device/interface/mount count — and skips the aggregate
    ``cpu `` line exactly like percpu=true (cpu_scraper.go:63)."""
    proc_stat = "\n".join([
        "cpu  60 0 0 0 0 0 0 0",
        "cpu0 10 0 0 0 0 0 0 0",
        "cpu1 20 0 0 0 0 0 0 0",
        "cpu2 30 0 0 0 0 0 0 0",
        "processes 1",
        "procs_running 1",
        "procs_blocked 0",
    ])
    diskstats = "\n".join([
        "   8       0 sda 1 0 10 0 2 0 20 0 0 0 0",
        "   8      16 sdb 3 0 30 0 4 0 40 0 0 0 0",
    ])
    statfs = "\n".join([
        "/dev/sda1 / ext4 rw,relatime 100 40 35 10 6",
        "/dev/sdb1 /data xfs ro 200 80 70 20 12",
        "tmpfs /tmp tmpfs noexec 50 20 15 5 3",
    ])
    snaps = spark.createDataFrame(
        [("h0", 0, proc_stat, diskstats, statfs)],
        schema="host_id string, ts bigint, proc_stat string, "
        "diskstats string, statfs string",
    )
    m = _dp_map(scrape_snapshots(snaps))
    cpus = {k[1] for k in m if k[0] == "system.cpu.time"}
    assert len(cpus) == 24  # 3 cpus × 8 states, no aggregate line
    assert m[("system.cpu.time", "cpu=cpu2,state=user")]["double_value"] == 0.3
    assert m[("system.disk.io", "device=sdb,direction=write")][
        "int_value"] == 40 * 512
    # getMountMode: ro honored, anything else unknown
    assert m[("system.filesystem.usage",
              "device=/dev/sdb1,mode=ro,mountpoint=/data,state=used,type=xfs")][
        "int_value"] == 120
    assert m[("system.filesystem.inodes.usage",
              "device=tmpfs,mode=unknown,mountpoint=/tmp,state=free,type=tmpfs")][
        "int_value"] == 3


def test_section_enablement(spark):
    """Missing section columns = scraper disabled (receiver config
    semantics); a frame with no sections at all is an error."""
    snaps = spark.createDataFrame(
        [("h0", 0, "MemTotal:     100 kB\nMemFree:      40 kB\n"
          "Buffers:      5 kB\nCached:       10 kB\nSReclaimable: 2 kB\n"
          "SUnreclaim:   1 kB\nSwapTotal:    8 kB\nSwapFree:     6 kB\n"
          "SwapCached:   1 kB")],
        schema="host_id string, ts bigint, meminfo string",
    )
    names = {r["name"] for r in scrape_snapshots(snaps).collect()}
    assert names == {"system.memory.usage", "system.paging.usage"}

    with pytest.raises(ValueError, match="no snapshot sections"):
        scrape_snapshots(
            spark.createDataFrame([("h0", 0)], "host_id string, ts bigint")
        )


def test_no_python_in_row_path(spark):
    """Everything is Catalyst expression work: the scrape plan must
    contain no Python/Arrow eval nodes, and its only exchange is the
    tiny connections count."""
    snaps = render_snapshots(_counters(spark, {"tcp_established": 1}))
    plan = scrape_snapshots(snaps)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
    assert plan.count("Exchange") <= 2  # connections groupBy (partial+final)
