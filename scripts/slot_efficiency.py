"""Per-stage parallel-slot efficiency from a Spark event log.

Automates the evidence behind BASELINE.md's per-stage efficiency claim:
for every completed stage,

    efficiency = sum(task run times) / (stage wall-clock * slots used)

where slots used = min(stage task count, executor cores). Values near
1.0 mean the stage keeps its slots busy end-to-end — the property that
transfers to a multi-executor cluster, where each executor owns its
memory bus (unlike this single box, whose aggregate bandwidth saturates
beyond ~8 concurrent string-heavy workers).

Usage:
    python scripts/slot_efficiency.py run [--n-pages 10000] [--cores 8]
        # runs scripts/ingest_job.py with event logging into a temp dir,
        # then analyzes the produced log
    python scripts/slot_efficiency.py analyze <event-log-file> [cores]

Output: one JSON line with per-stage rows (name, wall, task-sum,
efficiency) for stages above a minimum wall-clock, plus the
task-time-weighted mean efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

MIN_STAGE_WALL_MS = 200  # ignore trivial stages: their launch overhead
                         # dominates and says nothing about the plan


def _event_lines(path: str):
    """Yield event-log lines from a single file, a .gz file, or a Spark
    eventlog_v2 rolling-log DIRECTORY (events_* parts in order)."""
    if os.path.isdir(path):
        parts = sorted(f for f in os.listdir(path) if f.startswith("events_"))
        for p in parts:
            yield from _event_lines(os.path.join(path, p))
        return
    opener = open
    if path.endswith(".gz"):
        import gzip
        opener = gzip.open
    with opener(path, "rt") as f:
        yield from f


def analyze(path: str, cores: int) -> dict:
    stages: dict[tuple, dict] = {}
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            if si.get("Failure Reason"):
                continue
            key = (si["Stage ID"], si["Stage Attempt ID"])
            sub, com = si.get("Submission Time"), si.get("Completion Time")
            if sub is None or com is None:
                continue
            st = stages.setdefault(key, {"task_ms": 0, "n_tasks": 0})
            st.update({
                "name": si.get("Stage Name", "").split("\n")[0][:80],
                "wall_ms": com - sub,
                "planned_tasks": si.get("Number of Tasks", 0),
            })
        elif kind == "SparkListenerTaskEnd":
            key = (ev["Stage ID"], ev["Stage Attempt ID"])
            tm = (ev.get("Task Metrics") or {}).get("Executor Run Time")
            if tm is None:
                continue
            st = stages.setdefault(key, {"task_ms": 0, "n_tasks": 0})
            st["task_ms"] += tm
            st["n_tasks"] += 1

    rows = []
    for (sid, _), st in sorted(stages.items()):
        wall = st.get("wall_ms")
        if not wall or wall < MIN_STAGE_WALL_MS or not st["n_tasks"]:
            continue
        slots = min(st["n_tasks"], cores)
        eff = st["task_ms"] / (wall * slots)
        rows.append({
            "stage": sid,
            "name": st.get("name", "?"),
            "tasks": st["n_tasks"],
            "wall_ms": wall,
            "task_ms": st["task_ms"],
            "efficiency": round(min(eff, 1.0), 3),
        })
    total_task = sum(r["task_ms"] for r in rows) or 1
    weighted = sum(r["efficiency"] * r["task_ms"] for r in rows) / total_task
    return {
        "cores": cores,
        "stages": rows,
        "weighted_mean_efficiency": round(weighted, 3),
    }


def run_and_analyze(n_pages: int, cores: int) -> dict:
    log_dir = tempfile.mkdtemp(prefix="spark_events_")
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "scripts/ingest_job.py",
         "--master", f"local[{cores}]", "--n-pages", str(n_pages),
         "--paras", "50", "--skip-store", "--repeat", "1",
         "--event-log-dir", log_dir],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1800)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError("ingest_job failed")
    logs = [os.path.join(log_dir, f) for f in os.listdir(log_dir)
            if not f.startswith(".")]
    if not logs:
        raise RuntimeError(f"no event log produced under {log_dir}")
    return analyze(max(logs, key=os.path.getmtime), cores)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "analyze":
        cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        res = analyze(sys.argv[2], cores)
    else:
        n_pages = 10000
        cores = 8
        args = sys.argv[2:] if sys.argv[1:2] == ["run"] else sys.argv[1:]
        it = iter(args)
        for a in it:
            if a == "--n-pages":
                n_pages = int(next(it))
            elif a == "--cores":
                cores = int(next(it))
        res = run_and_analyze(n_pages, cores)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
