#!/usr/bin/env python
"""Paired A/B of two revisions' bench.py on the same corpus (VERDICT
r04 #2: attribute the sf0.1 headline delta to load vs code).

Alternates load-gated runs of the baseline revision (a git worktree,
default r3 HEAD 756715f) and the current working tree, three pairs,
alternating within-pair order so slow ambient drift cancels.  Each run
is a fresh subprocess with a fresh index build (bench.py contract).
Writes every run's JSON plus a best/median summary to
``BENCH/AB_r05.json``.

Usage: python scripts/ab_bench.py [baseline_rev]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def wait_quiet(thresh: float = 1.5, max_wait: int = 600) -> bool:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if _load1() < thresh:
            return True
        time.sleep(10)
    return False


def ensure_worktree(rev: str) -> str:
    wt = os.path.join(REPO, "_idx_cache", f"wt_{rev}")
    if not os.path.exists(os.path.join(wt, "bench.py")):
        subprocess.run(["git", "worktree", "add", "--detach", wt, rev],
                       cwd=REPO, check=True, capture_output=True)
    return wt


def run_once(bench_dir: str, tag: str, cpus: int = 32) -> dict:
    gated = wait_quiet()
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.1"
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_FRESH_BUILD"] = "1"
    out = subprocess.run([sys.executable,
                          os.path.join(bench_dir, "bench.py")],
                         capture_output=True, text=True, env=env,
                         cwd=bench_dir, timeout=900)
    for line in out.stdout.splitlines():
        if line.strip().startswith("{"):
            r = json.loads(line)
            r["tag"] = tag
            r["load_gate_passed"] = gated
            return r
    raise RuntimeError(f"{tag}: no JSON\n{out.stderr[-2000:]}")


def main() -> None:
    rev = sys.argv[1] if len(sys.argv) > 1 else "756715f"
    wt = ensure_worktree(rev)
    pairs = int(os.environ.get("MDQ_AB_PAIRS", "3"))
    runs: list[dict] = []
    for i in range(pairs):
        order = [(wt, f"r3_{rev}"), (REPO, "r5_head")]
        if i % 2:
            order.reverse()
        for d, tag in order:
            r = run_once(d, tag)
            runs.append(r)
            print(json.dumps({"tag": tag, "value": r["value"],
                              "build": r["build"]["wall_sec"],
                              "replay_qps":
                                  r["batch_replay"]["queries_per_sec"],
                              "load_before": r["loadavg_before"]}),
                  flush=True)

    def side(tag_prefix):
        return [r for r in runs if r["tag"].startswith(tag_prefix)]

    summary = {}
    for name, rs in (("r3", side("r3")), ("r5", side("r5"))):
        vals = [r["value"] for r in rs]
        builds = [r["build"]["wall_sec"] for r in rs]
        qps = [r["batch_replay"]["queries_per_sec"] for r in rs]
        summary[name] = {
            "best_wall": min(vals), "median_wall": statistics.median(vals),
            "best_build": min(builds),
            "median_build": statistics.median(builds),
            "best_replay_qps": max(qps),
            "median_replay_qps": statistics.median(qps),
        }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "AB_r05.json"), "w") as f:
        json.dump({"summary": summary, "runs": runs}, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
