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


def test_rotation_order_is_function_of_committed_state(monkeypatch):
    """Entry-point query ordering must be reproducible from repository
    contents alone: derived from the committed ROTATION_STATE.json
    (never from whatever CORRECTNESS artifacts happen to sit in the
    working dir), never-seen names first, SPARK_GRAFT_ROUND as the
    explicit override."""
    import json

    sys.path.insert(0, REPO)
    try:
        from __spark_entry__ import _rotation_order
    finally:
        sys.path.remove(REPO)

    with open(os.path.join(REPO, "ROTATION_STATE.json")) as f:
        state = json.load(f)
    seen = set(state["seen"])
    assert seen and isinstance(state["round"], int)

    names = sorted(seen)[:5] + ["__never_a", "__never_b"]
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    order = _rotation_order(names)
    # same inputs -> same order, and unseen names lead
    assert order == _rotation_order(list(reversed(names)))
    assert set(order[:2]) == {"__never_a", "__never_b"}

    # SPARK_GRAFT_ROUND must actually re-key the within-group order:
    # pin the exact contract (group by seen-ness, md5("{round}:{name}")
    # within each group) rather than just set equality, and require
    # that at least one nearby round realizes a DIFFERENT permutation
    # (md5 collisions making ten consecutive rounds identical on 7
    # names would be astronomically unlikely — a constant-order bug is
    # what this catches).
    import hashlib

    def expected(round_key: int) -> list[str]:
        def h(n: str) -> str:
            return hashlib.md5(f"{round_key}:{n}".encode()).hexdigest()

        unseen = sorted((n for n in names if n not in seen), key=h)
        in_seen = sorted((n for n in names if n in seen), key=h)
        return unseen + in_seen

    orders = set()
    for r in range(state["round"] + 1, state["round"] + 11):
        monkeypatch.setenv("SPARK_GRAFT_ROUND", str(r))
        order_r = _rotation_order(names)
        assert order_r == expected(r)
        assert set(order_r[:2]) == {"__never_a", "__never_b"}
        orders.add(tuple(order_r))
    assert len(orders) > 1, "round key never changed the ordering"
