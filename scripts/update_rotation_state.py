#!/usr/bin/env python
"""Regenerate the committed ROTATION_STATE.json from the committed
CORRECTNESS_r*.json artifacts.

Run once per round (after the driver writes CORRECTNESS_r{N}.json) and
commit the result; ``__spark_entry__._rotation_order`` reads ONLY this
state file, so query ordering is reproducible from repository contents
alone — no dependence on which artifacts happen to sit next to the
entry file at import time.
"""

from __future__ import annotations

import glob
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    seen: set[str] = set()
    arts = sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")))
    for path in arts:
        with open(path) as f:
            doc = json.load(f)
        if isinstance(doc, dict):
            seen.update(doc.keys())
    state = {"round": len(arts) + 1, "seen": sorted(seen)}
    out = os.path.join(HERE, "ROTATION_STATE.json")
    with open(out, "w") as f:
        json.dump(state, f, indent=1)
        f.write("\n")
    print(f"ROTATION_STATE.json: round={state['round']} "
          f"seen={len(state['seen'])} (from {len(arts)} artifacts)")


if __name__ == "__main__":
    main()
