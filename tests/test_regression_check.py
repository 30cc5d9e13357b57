"""Unit tests for the chipday throughput-regression gate
(benchmarks/regression_check.py — VERDICT r2 next-steps #9)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "regression_check.py")


def _write(dirpath, fname, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(fresh, base, min_rows=0):
    env = dict(os.environ, AO_REG_MIN_ROWS=str(min_rows))
    out = subprocess.run(
        [sys.executable, SCRIPT, str(fresh), str(base)],
        capture_output=True, text=True, env=env,
    )
    return out.returncode, json.loads(out.stdout)


def test_thin_baseline_fails(tmp_path):
    """A half-empty baseline (few overlapping rows) must FAIL the gate
    rather than vacuously pass (VERDICT r4 weak #7: rows_compared=2)."""
    base, fresh = tmp_path / "chipday_a", tmp_path / "chipday_b"
    _write(base, "serving.json", [{"config": "slots", "tok_s_e2e": 100.0}])
    _write(fresh, "serving.json", [{"config": "slots", "tok_s_e2e": 100.0}])
    code, rep = _run(fresh, base, min_rows=25)
    assert code == 1 and rep["thin_baseline"] is True
    code, rep = _run(fresh, base, min_rows=1)
    assert code == 0 and rep["thin_baseline"] is False


def test_pass_within_tolerance(tmp_path):
    base, fresh = tmp_path / "chipday_a", tmp_path / "chipday_b"
    _write(base, "serving.json", [{"config": "slots", "tok_s_e2e": 100.0}])
    _write(fresh, "serving.json", [{"config": "slots", "tok_s_e2e": 95.0}])
    code, rep = _run(fresh, base)
    assert code == 0 and rep["regression_check"] == "pass"
    assert rep["rows_compared"] == 1


def test_fail_on_throughput_drop(tmp_path):
    base, fresh = tmp_path / "chipday_a", tmp_path / "chipday_b"
    _write(base, "serving.json", [{"config": "slots", "tok_s_e2e": 100.0}])
    _write(fresh, "serving.json", [{"config": "slots", "tok_s_e2e": 70.0}])
    code, rep = _run(fresh, base)
    assert code == 1 and rep["regression_check"] == "fail"
    assert rep["failures"][0]["row"] == {"config": "slots"}


def test_lower_is_better_metrics(tmp_path):
    base, fresh = tmp_path / "chipday_a", tmp_path / "chipday_b"
    rows_b = [{"scheme": "int4", "m": 8, "k": 4096, "n": 4096, "us": 12.8}]
    rows_f = [{"scheme": "int4", "m": 8, "k": 4096, "n": 4096, "us": 20.0}]
    _write(base, "gemm_sol.json", rows_b)
    _write(fresh, "gemm_sol.json", rows_f)
    code, rep = _run(fresh, base)
    assert code == 1 and rep["failures"][0]["metric"] == "us"
    # faster is never a failure
    _write(fresh, "gemm_sol.json", rows_b)
    _write(base, "gemm_sol.json", rows_f)
    code, rep = _run(fresh, base)
    assert code == 0


def test_new_rows_and_missing_files_skip(tmp_path):
    base, fresh = tmp_path / "chipday_a", tmp_path / "chipday_b"
    _write(base, "serving.json", [{"config": "slots", "tok_s_e2e": 100.0}])
    # fresh adds a new config (no baseline) and lacks spec_bench entirely
    _write(fresh, "serving.json", [{"config": "paged", "tok_s_e2e": 1.0}])
    _write(fresh, "spec_bench.json", [{"config": "spec", "tok_s": 1.0}])
    code, rep = _run(fresh, base)
    assert code == 0 and rep["rows_compared"] == 0


def test_malformed_lines_ignored(tmp_path):
    base, fresh = tmp_path / "chipday_a", tmp_path / "chipday_b"
    os.makedirs(base)
    with open(os.path.join(base, "serving.json"), "w") as f:
        f.write("# comment line\n{bad json\n")
        f.write(json.dumps({"config": "slots", "tok_s_e2e": 100.0}) + "\n")
    _write(fresh, "serving.json", [{"config": "slots", "tok_s_e2e": 99.0}])
    code, rep = _run(fresh, base)
    assert code == 0 and rep["rows_compared"] == 1
