"""Parse a Spark rolling event log (zstd) into per-probe stage metrics.

Usage: python scripts/parse_bench_events.py /tmp/spark-events/<appdir> [label-substr]

Maps every job whose ``spark.job.description`` starts with ``bench:`` to
its stages, then aggregates task metrics per stage: wall (first launch →
last finish), executor run/CPU time, JVM GC time, memory/disk spill,
shuffle read/write bytes, input bytes, task count. Built for diagnosing
why a labeled probe's wall inflates mid-bench (guide §1.3: label jobs,
then read the event log instead of guessing).
"""
from __future__ import annotations

import glob
import io
import json
import os
import sys
from collections import defaultdict


def _lines(appdir: str):
    try:
        import zstandard
    except ImportError:
        zstandard = None
    for f in sorted(glob.glob(os.path.join(appdir, "events_*"))):
        if f.endswith(".zstd"):
            if zstandard is not None:
                with open(f, "rb") as fh:
                    reader = zstandard.ZstdDecompressor(
                        max_window_size=2**31).stream_reader(fh)
                    for line in io.TextIOWrapper(reader, encoding="utf-8"):
                        yield line
            else:  # fall back to the zstd CLI
                import subprocess
                p = subprocess.Popen(
                    ["zstd", "-dc", "--long=31", f],
                    stdout=subprocess.PIPE, text=True)
                assert p.stdout is not None
                yield from p.stdout
                p.wait()
        else:
            with open(f, encoding="utf-8") as fh:
                yield from fh


def main() -> None:
    appdir = sys.argv[1]
    want = sys.argv[2] if len(sys.argv) > 2 else ""

    job_label: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    # per stage: aggregates
    agg: dict[int, dict[str, float]] = defaultdict(lambda: defaultdict(float))
    stage_name: dict[int, str] = {}
    stage_span: dict[int, list[float]] = {}

    for raw in _lines(appdir):
        try:
            ev = json.loads(raw)
        except json.JSONDecodeError:
            continue
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            desc = props.get("spark.job.description", "")
            jid = ev["Job ID"]
            job_label[jid] = desc
            for sid in ev.get("Stage IDs", []):
                stage_job[sid] = jid
        elif et == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            stage_name[si["Stage ID"]] = si.get("Stage Name", "")
        elif et == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            jid = stage_job.get(sid)
            lbl = job_label.get(jid, "") if jid is not None else ""
            if not lbl.startswith("bench:") or want not in lbl:
                continue
            ti = ev.get("Task Info") or {}
            tm = ev.get("Task Metrics") or {}
            a = agg[sid]
            a["tasks"] += 1
            a["run_ms"] += tm.get("Executor Run Time", 0)
            a["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
            a["gc_ms"] += tm.get("JVM GC Time", 0)
            a["deser_ms"] += tm.get("Executor Deserialize Time", 0)
            a["result_ser_ms"] += tm.get("Result Serialization Time", 0)
            a["mem_spill"] += tm.get("Memory Bytes Spilled", 0)
            a["disk_spill"] += tm.get("Disk Bytes Spilled", 0)
            a["peak_exec_mem"] = max(
                a["peak_exec_mem"], tm.get("Peak Execution Memory", 0))
            im = tm.get("Input Metrics") or {}
            a["input_b"] += im.get("Bytes Read", 0)
            srm = tm.get("Shuffle Read Metrics") or {}
            a["sh_read_b"] += (srm.get("Local Bytes Read", 0)
                               + srm.get("Remote Bytes Read", 0))
            a["sh_fetch_wait_ms"] += srm.get("Fetch Wait Time", 0)
            swm = tm.get("Shuffle Write Metrics") or {}
            a["sh_write_b"] += swm.get("Shuffle Bytes Written", 0)
            a["sh_write_ms"] += swm.get("Shuffle Write Time", 0) / 1e6
            lt = ti.get("Launch Time", 0)
            ft = ti.get("Finish Time", 0)
            span = stage_span.setdefault(sid, [float("inf"), 0.0])
            span[0] = min(span[0], lt)
            span[1] = max(span[1], ft)

    by_job: dict[int, list[int]] = defaultdict(list)
    for sid in agg:
        by_job[stage_job[sid]].append(sid)

    for jid in sorted(by_job):
        print(f"\n== job {jid}  {job_label.get(jid, '')}")
        for sid in sorted(by_job[jid]):
            a = agg[sid]
            sp = stage_span.get(sid, [0, 0])
            wall = (sp[1] - sp[0]) / 1e3 if sp[1] else 0.0
            print(
                f"  stage {sid:5d} [{stage_name.get(sid, '')[:48]:48s}] "
                f"tasks={int(a['tasks']):4d} wall={wall:7.2f}s "
                f"run={a['run_ms'] / 1e3:7.1f}s cpu={a['cpu_ms'] / 1e3:7.1f}s "
                f"gc={a['gc_ms'] / 1e3:6.1f}s "
                f"memSpill={a['mem_spill'] / 2**20:8.1f}M "
                f"dskSpill={a['disk_spill'] / 2**20:8.1f}M "
                f"in={a['input_b'] / 2**20:8.1f}M "
                f"shR={a['sh_read_b'] / 2**20:8.1f}M "
                f"shW={a['sh_write_b'] / 2**20:8.1f}M "
                f"fetchWait={a['sh_fetch_wait_ms'] / 1e3:5.1f}s"
            )


if __name__ == "__main__":
    main()
