"""The driver parses bench.py's LAST stdout line as the bench artifact
(bounded tail capture). r8 lost a whole round's comparison when the
single output line outgrew that tail — this pins the two-line contract:
final line parseable JSON carrying the frozen keys, detail line first
(r9 verdict #7)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FROZEN_KEYS = {"metric", "value", "unit", "queries", "exec", "build_value",
               "exec_value", "cold_value", "runs", "sf"}


def test_bench_emits_parseable_final_json_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    r = subprocess.run(
        [sys.executable, "bench.py", "--runs", "1", "--tier", "headline"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) >= 2, "detail line + summary line expected"
    summary = json.loads(lines[-1])  # the driver's tail-parse target
    assert FROZEN_KEYS <= set(summary), sorted(FROZEN_KEYS - set(summary))
    assert summary["unit"] == "sec" and summary["runs"] == 1
    assert isinstance(summary["queries"], dict) and len(summary["queries"]) >= 19
    assert set(summary["exec"]) == set(summary["queries"])
    assert abs(sum(summary["queries"].values()) - summary["value"]) < 0.05
    # the summary line must stay bounded so the driver's tail capture
    # can never truncate it again (r8 failure mode)
    assert len(lines[-1]) < 1900, len(lines[-1])
    detail = json.loads(lines[-2])
    assert "extended" in detail and "build" in detail
