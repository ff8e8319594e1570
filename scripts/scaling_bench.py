"""Scaling-efficiency evidence runner (north_rule: throughput scaling
efficiency >= 0.8 from N to 4N parallelism, evidenced at local[8] vs
local[32] — no real cluster in the sandbox).

Method: interleaved best-of-R runs of bench.py at each parallelism on a
tmpfs scratch (the sandbox's shared /dev/vda disk otherwise caps both
configurations at the same I/O ceiling and the host shows heavy
noisy-neighbor variance — interleaving + best-of mitigates it).

efficiency = (throughput_4N / throughput_N) / 4

Writes BENCH/scaling_r{round}.json and regenerates BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, expand: int, sf_dir: str, scratch: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_EXPAND=str(expand),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_SCRATCH=scratch,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=4200,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    """Two modes:

    strong (default): same input (SCALING_EXPAND) at 8 and 32 cores;
      efficiency = (thr_32 / thr_8) / 4.
    weak (SCALING_MODE=weak): input scaled with cores (expand at 8,
      expand*4 at 32); ideal is equal wall time, i.e. thr_32(4D) ==
      4*thr_8(D), so the efficiency formula is the same throughput
      ratio: thr_32(4D) / (4 * thr_8(D)).

    Interleaved repeats, best-of per config (host noisy-neighbor
    variance on this sandbox is ±2x run-to-run on identical commands).
    """
    mode = os.environ.get("SCALING_MODE", "strong")
    expand = int(os.environ.get("SCALING_EXPAND", "160"))
    repeats = int(os.environ.get("SCALING_REPEATS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", "/dev/shm/qs_scaling")
    os.makedirs(scratch, exist_ok=True)
    configs = (
        [(8, expand), (32, expand)]
        if mode == "strong"
        else [(8, expand), (32, expand * 4)]
    )
    runs: list[dict] = []
    for r in range(repeats):
        for cpus, exp in configs:
            t0 = time.time()
            res = run_bench(cpus, exp, sf_dir, scratch)
            res["repeat"] = r
            runs.append(res)
            print(
                f"run {r} cpus={cpus} expand={exp}: {res['value']}s "
                f"{res['triples_per_sec']} tps (wall {time.time()-t0:.0f}s)",
                flush=True,
            )
    best = {}
    for cpus, exp in configs:
        cand = [x for x in runs if x["cpus"] == cpus]
        best[cpus] = max(cand, key=lambda x: x["triples_per_sec"])
    eff = (best[32]["triples_per_sec"] / best[8]["triples_per_sec"]) / 4.0
    summary = {
        "mode": mode,
        "expand": expand,
        "sf_dir": sf_dir,
        "runs": runs,
        "best_n8": best[8],
        "best_n32": best[32],
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", f"scaling_{mode}_latest.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"mode": mode,
                      "scaling_efficiency": summary["scaling_efficiency_8_to_32"],
                      "n8_tps": best[8]["triples_per_sec"],
                      "n32_tps": best[32]["triples_per_sec"]}))


if __name__ == "__main__":
    main()
