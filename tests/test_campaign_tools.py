"""Unit tests for the campaign assembler's pure grading functions —
no SparkSession needed."""

import importlib.util
import json
import math
import os

_SPEC = importlib.util.spec_from_file_location(
    "assemble_cluster_campaign",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "assemble_cluster_campaign.py",
    ),
)
acc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(acc)


def _leg(passes):
    return {"passes": passes, "cpus": 4}


def _p(sec, util, ext=0.0, host=0.0, **extra):
    d = {"sec": sec, "ext_frac": ext, "host_ext_frac": host, "self_util": util}
    d.update(extra)
    return d


class TestCpuFloor:
    def test_reconstructs_from_util_for_legacy_records(self):
        leg = _leg([_p(10, 0.9)] * 2 + [_p(100, 0.950), _p(100, 0.900)])
        # min over steady: 100 * 4 * 0.900 = 360.0
        assert acc.cpu_floor(leg, 4) == 360.0

    def test_prefers_exact_self_cpu_secs(self):
        # exact field present and deliberately inconsistent with the
        # rounded util so the preference is observable
        leg = _leg(
            [_p(10, 0.9)] * 2
            + [_p(100, 0.950, self_cpu_secs=333.33)]
        )
        assert acc.cpu_floor(leg, 4) == 333.3

    def test_all_dead_worker_passes_yield_none_not_nan(self):
        """A leg whose every steady pass lost its worker tree (negative
        self_util) must produce JSON-serializable null, not a bare NaN
        literal that breaks strict parsers."""
        leg = _leg([_p(10, 0.9)] * 2 + [_p(1117, -0.044), _p(900, 0.0)])
        floor = acc.cpu_floor(leg, 4)
        assert floor is None
        assert "NaN" not in json.dumps({"cpu_floor": floor})

    def test_never_nan(self):
        leg = _leg([_p(10, 0.9)] * 2 + [_p(50, 0.8)])
        v = acc.cpu_floor(leg, 4)
        assert v is not None and not math.isnan(v)


class TestGradeRun:
    def _run(self):
        lo = {
            "passes": [_p(40, 0.9)] * 2 + [_p(40, 0.93)] * 4,
            "cpus": 4,
            "rows": 1000,
        }
        hi = {
            "passes": [_p(12, 0.9)] * 2 + [_p(11, 0.93)] * 4,
            "cpus": 16,
            "rows": 1000,
        }
        return {"low": lo, "high": hi}

    def test_efficiency_and_estimator(self):
        g = acc.grade_run(self._run())
        assert g["estimator"] == "median_clean"
        # (1000/11) / (4 * 1000/40) = 40 / (4*11)
        assert abs(g["scaling_efficiency"] - 40 / 44) < 1e-3
        assert g["cpu_floor"] == [
            round(40 * 4 * 0.93, 1),
            round(11 * 16 * 0.93, 1),
        ]

    def test_grade_run_serializes(self):
        g = acc.grade_run(self._run())
        json.loads(json.dumps(g))
