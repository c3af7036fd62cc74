"""Config-5 streaming throughput on the real chip (VERDICT r2 item 7).

Measures, in ONE session (same-session numbers are the only comparable kind
on this machine):
  1. single-LF rate through run_bm5d (the denominator of the multi-chip
     projection),
  2. denoise_batch with mesh=None at B in {1,2,4,8} (host loop of per-LF
     jit calls — the single-chip streaming form),
  3. denoise_batch over a 1-device mesh at the same B (host-chunked
     shard_map, one LF per device per call) — isolates the shard_map
     dispatch overhead that the multi-chip path pays per chunk.

Usage: python experiments/streaming_bench.py [--batches 1 2 4 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_probe = None


def sync(x):
    """Scalar-fetch fence (bench.py protocol): np.asarray(x) here would
    ship the WHOLE output through the axon tunnel (264 MB per flagship LF
    — it dwarfed the 1.5 s matched-preset compute when this harness was
    first run at 9x9 scale; 5x5 outputs were small enough to hide it)."""
    import jax

    global _probe
    if _probe is None:
        _probe = jax.jit(lambda v: v.reshape(-1)[0])
    jax.block_until_ready(x)
    float(_probe(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--shape", type=int, nargs=3, default=[5, 192, 256])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--preset", default="fast",
                    help="named preset from config.PRESETS")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from lfbm5d_tpu.utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from lfbm5d_tpu.config import DenoiseParams, StepParams
    from lfbm5d_tpu.lf import synthetic_lf
    from lfbm5d_tpu.lf.noise import add_noise_np
    from lfbm5d_tpu.pipeline import run_bm5d
    from lfbm5d_tpu.pipeline.streaming import denoise_batch

    a, h, w = args.shape
    if args.preset == "fast":
        step = dict(n_sim=8, n_search=8, n_disp=2, k=8, p=6)
        params = DenoiseParams(
            sigma=25.0,
            ht=StepParams(tau_match=2500.0, **step),
            wiener=StepParams(tau_match=400.0, **step),
            chunk=128,
        )
    else:
        from lfbm5d_tpu.config import preset_denoise_params

        params = preset_denoise_params(args.preset, 25.0, chunk=128)
    mpix = a * a * h * w / 1e6
    bmax = max(args.batches)
    rng_lfs = []
    for i in range(bmax):
        clean = synthetic_lf(a, a, h, w, channels=3, disp_bg=1, disp_fg=2,
                             seed=i)
        rng_lfs.append(add_noise_np(clean, 25.0, seed=100 + i))
    lfs = jnp.asarray(np.stack(rng_lfs), jnp.float32)
    jax.block_until_ready(lfs)

    # 1. single-LF baseline
    _, f = run_bm5d(lfs[0], params, engine="pallas")
    sync(f)
    ts = []
    for _ in range(args.runs):
        t0 = time.time()
        _, f = run_bm5d(lfs[0], params, engine="pallas")
        sync(f)
        ts.append(time.time() - t0)
    single = min(ts)
    print(json.dumps({"case": "single_lf", "s_per_lf": round(single, 3),
                      "mpix_s_chip": round(mpix / single, 3)}), flush=True)

    # 2. host-loop streaming (mesh=None)
    for b in args.batches:
        _, f = denoise_batch(lfs[:b], params, engine="pallas")
        sync(f)
        ts = []
        for _ in range(args.runs):
            t0 = time.time()
            _, f = denoise_batch(lfs[:b], params, engine="pallas")
            sync(f)
            ts.append(time.time() - t0)
        dt = min(ts) / b
        print(json.dumps({"case": f"host_loop_B{b}",
                          "s_per_lf": round(dt, 3),
                          "mpix_s_chip": round(mpix / dt, 3),
                          "overhead_vs_single_pct":
                          round(100 * (dt / single - 1), 1)}), flush=True)

    # 3. shard_map over a 1-device mesh (per-chunk dispatch overhead)
    mesh = Mesh(np.array(jax.devices()[:1]), ("b",))
    for b in args.batches:
        _, f = denoise_batch(lfs[:b], params, mesh=mesh, engine="pallas")
        sync(f)
        ts = []
        for _ in range(args.runs):
            t0 = time.time()
            _, f = denoise_batch(lfs[:b], params, mesh=mesh, engine="pallas")
            sync(f)
            ts.append(time.time() - t0)
        dt = min(ts) / b
        print(json.dumps({"case": f"shard_map_mesh1_B{b}",
                          "s_per_lf": round(dt, 3),
                          "mpix_s_chip": round(mpix / dt, 3),
                          "overhead_vs_single_pct":
                          round(100 * (dt / single - 1), 1)}), flush=True)


if __name__ == "__main__":
    main()
