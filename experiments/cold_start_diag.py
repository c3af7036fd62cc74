"""Cold-start attribution (round-5 item 5; VERDICT r4 weak #4).

BENCH_r04 recorded compile_plus_first_s = 710 s under driver conditions
while round-3 sessions saw ~50-95 s for the same program. Candidate
causes: (a) the persistent compilation cache missing under driver
conditions, (b) remote-compile-service queueing (the round-3 variance
finding), (c) the cache being EMPTY at round start (this machine's
~/.cache does not survive between rounds — verified empty at round-5
start after round 4 ran dozens of TPU jobs).

This harness runs the headline bench program in fresh subprocesses and
separates the hypotheses:

  * N runs with the persistent cache ON (default dir, warmed by the
    parent run): if compile_plus_first_s is consistently small, the cache
    works; any large outlier with an unchanged cache is service/tunnel
    queueing, not a miss.
  * 1 run with LFBM5D_NO_COMPILE_CACHE=1: the true cold compile cost.
  * cache-hit/miss counts from JAX's compilation-cache logger
    (JAX_DEBUG_LOG_MODULES=jax._src.compilation_cache) on one cached run.

Usage: python experiments/cold_start_diag.py [--warm-runs 3] [--quick]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(env_extra: dict, tag: str, quick: bool) -> dict:
    env = dict(os.environ, **env_extra)
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--runs", "1"]
    if quick:
        cmd.append("--quick")
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=REPO, timeout=3600)
    wall = time.time() - t0
    out = {}
    for line in p.stdout.splitlines():
        if line.startswith("{"):
            out = json.loads(line)
    hits = len(re.findall(r"cache hit", p.stderr, re.I))
    misses = len(re.findall(r"cache miss|not found in.*cache|miss for",
                            p.stderr, re.I))
    row = {
        "tag": tag,
        "process_wall_s": round(wall, 1),
        "compile_plus_first_s": out.get("compile_plus_first_s"),
        "value": out.get("value"),
        "cache_log_hits": hits,
        "cache_log_misses": misses,
        "rc": p.returncode,
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm-runs", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    cache_dir = os.path.expanduser("~/.cache/lfbm5d_tpu/xla_cache")
    n_entries = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    print(f"persistent cache: {cache_dir} ({n_entries} entries)", flush=True)

    rows = []
    rows.append(run_bench(
        {"JAX_DEBUG_LOG_MODULES": "jax._src.compilation_cache"},
        "warm+logged", args.quick,
    ))
    for i in range(args.warm_runs - 1):
        rows.append(run_bench({}, f"warm{i + 2}", args.quick))
    rows.append(run_bench(
        {"LFBM5D_NO_COMPILE_CACHE": "1"}, "nocache", args.quick
    ))

    warm = [r["compile_plus_first_s"] for r in rows[:-1]
            if r["compile_plus_first_s"]]
    cold = rows[-1]["compile_plus_first_s"]
    print(f"\nwarm-cache compile+first: {warm}  (cache entries {n_entries})")
    print(f"no-cache   compile+first: {cold}")


if __name__ == "__main__":
    main()
