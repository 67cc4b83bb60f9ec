"""Two-cluster-size scaling evidence (north rule, sandbox adaptation).

Runs scripts/ingest_job.py at local[8] and local[32] on IDENTICAL input
in separate processes (fresh JVM each), reports throughput at both and
scaling efficiency = (docs_per_sec@32 / docs_per_sec@8) / 4.
"""

from __future__ import annotations

import json
import subprocess
import sys

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 20000


def run(master: str) -> dict:
    out = subprocess.run(
        [sys.executable, "scripts/ingest_job.py", "--master", master,
         "--n-pages", str(N_PAGES), "--skip-store"],
        capture_output=True, text=True, cwd="/root/repo", timeout=3600)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    r8 = run("local[8]")
    r32 = run("local[32]")
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    print(json.dumps({
        "n_pages": N_PAGES,
        "local8": {"wall_sec": r8["wall_sec"], "docs_per_sec": r8["docs_per_sec"]},
        "local32": {"wall_sec": r32["wall_sec"], "docs_per_sec": r32["docs_per_sec"]},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }, indent=1))


if __name__ == "__main__":
    main()
