"""The ray-job-submit entrypoint (jobs/run_flagship.py) runs standalone in
its own process/session and resumes: the restart story of the north rule."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(out_dir: str, *flags: str) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_flagship.py"),
         "--sf-dir", SF, "--out-dir", out_dir, *flags],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, RAY_ADDRESS="local"),
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads([l for l in p.stdout.splitlines() if l.startswith("{")][-1])


def test_job_entry_flagship_and_resume(tmp_path):
    out = _run(str(tmp_path / "flag"), "--uniform")
    assert out["rows_written"] > 0 and out["config"]["profile"] == "uniform"
    # resumable: first run writes every shard, resubmit skips them all
    r1 = _run(str(tmp_path / "res"), "--resumable")
    r2 = _run(str(tmp_path / "res"), "--resumable")
    assert r2["rows_written"] == r1["rows_written"] > 0
    assert r2["wall_sec"] < r1["wall_sec"]
