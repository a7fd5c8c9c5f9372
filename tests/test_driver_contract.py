"""The driver-session seam, guarded continuously: the grading driver
hands us a VANILLA SparkSession (no engine configs), which once broke
the streaming source when the testdata's timestamp physical type
changed between rounds. The in-process pytest session is the tuned
one (getOrCreate returns it), so this test runs the driver simulator
in a fresh subprocess — a true vanilla JVM — over a seam-sensitive
subset: an events file-stream query (parquet-type probing +
configure_for_oracle), a parquet-scan query, and the flagship."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUBSET = "pricing_summary,streaming_tumbling,tumbling_window"


def test_vanilla_session_driver_subset():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "driver_sim.py"),
         "sf0.001", "--only", SUBSET],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=REPO,
    )
    tail = (proc.stdout or "")[-2000:] + (proc.stderr or "")[-1000:]
    assert proc.returncode == 0, tail
    assert "0 failures" in proc.stdout, tail
