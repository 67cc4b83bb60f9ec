"""Per-stage parallel-slot efficiency from a Spark event log.

Automates the evidence behind BASELINE.md's per-stage efficiency claim:
for every completed stage,

    efficiency = sum(successful task run times) / (stage wall * slots)

where slots used = min(stage task count, executor cores). Values near
1.0 mean the stage keeps its slots busy end-to-end — the property that
transfers to a multi-executor cluster, where each executor owns its
memory bus (unlike this single box, whose aggregate bandwidth saturates
beyond ~8 concurrent string-heavy workers).

Accounting rules:
- only SUCCESSFUL task attempts count (a retried task would otherwise
  double-bill its stage and inflate efficiency);
- warm-up stages (ingest_job tags them with job group 'warmup') are
  excluded — cold-start JIT says nothing about the steady-state plan;
- efficiency is reported RAW; anything > 1.02 is flagged as an
  accounting anomaly instead of being clamped into looking perfect.

Usage:
    python scripts/slot_efficiency.py run [--n-pages N] [--cores C]
    python scripts/slot_efficiency.py analyze LOG_PATH [--cores C]

Output: one JSON line with per-stage rows (name, wall, task-sum,
efficiency) for stages above a minimum wall-clock, plus the
task-time-weighted mean efficiency.
"""

from __future__ import annotations

import argparse
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
    warmup_stage_ids: set[int] = set()
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            group = (ev.get("Properties") or {}).get("spark.jobGroup.id")
            if group == "warmup":
                for si in ev.get("Stage Infos") or []:
                    warmup_stage_ids.add(si["Stage ID"])
                warmup_stage_ids.update(ev.get("Stage IDs") or [])
        elif kind == "SparkListenerStageCompleted":
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
            })
        elif kind == "SparkListenerTaskEnd":
            reason = (ev.get("Task End Reason") or {}).get("Reason")
            if reason != "Success":
                continue  # failed/killed attempts would double-bill
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
        if sid in warmup_stage_ids:
            continue
        slots = min(st["n_tasks"], cores)
        eff = st["task_ms"] / (wall * slots)
        row = {
            "stage": sid,
            "name": st.get("name", "?"),
            "tasks": st["n_tasks"],
            "wall_ms": wall,
            "task_ms": st["task_ms"],
            "efficiency": round(eff, 3),
        }
        if eff > 1.02:
            row["anomaly"] = "task time exceeds wall*slots — check accounting"
        rows.append(row)
    total_task = sum(r["task_ms"] for r in rows) or 1
    weighted = sum(r["efficiency"] * r["task_ms"] for r in rows) / total_task
    return {
        "cores": cores,
        "excluded_warmup_stages": len(warmup_stage_ids),
        "stages": rows,
        "weighted_mean_efficiency": round(weighted, 3),
    }


def run_and_analyze(n_pages: int, cores: int) -> dict:
    log_dir = tempfile.mkdtemp(prefix="spark_events_")
    out = subprocess.run(
        [sys.executable, "scripts/ingest_job.py",
         "--master", f"local[{cores}]", "--n-pages", str(n_pages),
         "--paras", "50", "--skip-store", "--repeat", "1",
         "--event-log-dir", log_dir],
        capture_output=True, text=True,
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
    ap = argparse.ArgumentParser(prog="slot_efficiency")
    sub = ap.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run ingest_job with event logging, "
                                      "then analyze the produced log")
    runp.add_argument("--n-pages", type=int, default=10000)
    runp.add_argument("--cores", type=int, default=8)
    anap = sub.add_parser("analyze", help="analyze an existing event log")
    anap.add_argument("log_path")
    anap.add_argument("--cores", type=int, default=8)
    ns = ap.parse_args()
    if ns.cmd == "analyze":
        res = analyze(ns.log_path, ns.cores)
    else:
        res = run_and_analyze(ns.n_pages, ns.cores)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
