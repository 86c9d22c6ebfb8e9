"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8 from N
to 4N executors; sandbox proxy per BASELINE.md = same kernel, same input,
local[8] vs local[32]).

Runs the frontier-round kernel in TWO SEPARATE PROCESSES (a JVM cannot
change its master mid-life) and writes BENCH.md with throughput at both
levels and efficiency = (thr@32 / thr@8) / 4.

Usage: python scripts/bench_scaling.py [n_urls] [n_small] [n_big]

Levels default to 8 and 32. A second supported pairing is 4→16: on ONE
box, 32 threads saturate the shared memory-bandwidth domain — a penalty a
real N→4N *executor* fleet does not pay (every node brings its own
memory controllers) — so the unsaturated 4→16 pair isolates the JOB's
serial fraction from the box's bandwidth ceiling. Report both.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys
sys.path.insert(0, {repo!r})
from bench import make_spark
from crawler_spark.benchmarks import frontier_round_kernel
spark = make_spark({cpus})
# warm-up (JIT, python worker fork pool), then measured runs; best-of.
# n_hosts scales with n_urls (1 host per 500 frontier URLs — bigger crawls
# touch more hosts) so the politeness cap admits ~the same FRACTION of the
# frontier at every input size: with hosts fixed, budget*hosts pins the
# scheduled set and the fetch+parse stage stops growing with n_urls,
# silently changing the workload mix between sizes. The measured quantity
# is scheduling+fetch+parse throughput, not deferral.
n_hosts = max({n_urls} // 500, 1000)
frontier_round_kernel(spark, n_urls={n_urls} // 10, n_hosts=n_hosts // 10)
frontier_round_kernel(spark, n_urls={n_urls}, n_hosts=n_hosts)
runs = [frontier_round_kernel(spark, n_urls={n_urls}, n_hosts=n_hosts) for _ in range({n_runs})]
best = min(runs, key=lambda r: r["round_wall_sec"])
print("KERNEL_RESULT " + json.dumps(best))
spark.stop()
"""


# Long rounds (>= 10M URLs) amortize process noise within a single run, so
# fewer measured runs/attempts suffice; override for quick looks.
N_RUNS = int(os.environ.get("SCALE_RUNS", "4"))
N_ATTEMPTS = int(os.environ.get("SCALE_ATTEMPTS", "2"))


def run_at(cpus: int, n_urls: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    # Pin the process tree to exactly `cpus` hardware threads: without this
    # the local[8] JVM still spreads GC/shuffle/netty threads and Python
    # workers over all 32 cores, and the "small cluster" silently gets the
    # big cluster's hardware — efficiency numbers would be meaningless.
    cmd = ["taskset", "-c", f"0-{cpus - 1}"] if os.path.exists("/usr/bin/taskset") else []
    out = subprocess.run(
        [*cmd, sys.executable, "-c", RUNNER.format(repo=REPO, cpus=cpus, n_urls=n_urls, n_runs=N_RUNS)],
        env=env,
        capture_output=True,
        text=True,
        timeout=int(os.environ.get("SCALE_LEG_TIMEOUT", "7200")),
    )
    for line in out.stdout.splitlines():
        if line.startswith("KERNEL_RESULT "):
            return json.loads(line[len("KERNEL_RESULT "):])
    raise RuntimeError(f"no result at cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> int:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    assert n_big == 4 * n_small, "north rule compares N to 4N"
    # two interleaved process-level repetitions per leg, best-of: wall-time
    # variance on this shared VM spans whole processes (host scheduling,
    # turbo), not just tasks, so best-of within one JVM is not enough
    best: dict[int, dict] = {}
    for attempt in range(N_ATTEMPTS):
        for cpus in (n_small, n_big):
            r = run_at(cpus, n_urls)
            print(f"local[{cpus}] try{attempt} ", json.dumps(r), flush=True)
            if cpus not in best or r["round_wall_sec"] < best[cpus]["round_wall_sec"]:
                best[cpus] = r
    r8, r32 = best[n_small], best[n_big]
    print(f"local[{n_small}] ", json.dumps(r8), flush=True)
    print(f"local[{n_big}]", json.dumps(r32), flush=True)
    thr8, thr32 = r8["urls_in_per_sec"], r32["urls_in_per_sec"]
    eff = (thr32 / thr8) / 4.0
    report = {
        "n_urls": n_urls,
        "levels": [n_small, n_big],
        f"local{n_small}": r8,
        f"local{n_big}": r32,
        "throughput_ratio": round(thr32 / thr8, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))
    # 8→32 keeps the historical filename; other pairings get suffixed ones.
    name = os.environ.get("SCALE_OUT") or (
        "BENCH_scaling.json"
        if (n_small, n_big) == (8, 32)
        else f"BENCH_scaling_{n_small}_{n_big}.json"
    )
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {name} (BENCH.md is authored from these JSONs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
