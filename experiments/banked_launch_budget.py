"""Per-op device profile of the 17x17 launched-banked path (round-4 item 4).

The round-3 launch-cost fit at 17x17x128x128 was 0.78 s FIXED per launch +
0.055 s/ref; this probe attributes the fixed term by profiling a full
run_bm5d pass at a banked preset and printing the per-op self-time table
(utils/profiling.py aggregation).

Usage: python experiments/banked_launch_budget.py [--preset robust]
         [--a 17] [--hw 128 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfbm5d_tpu.utils.cache import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lfbm5d_tpu.config import preset_denoise_params  # noqa: E402
from lfbm5d_tpu.lf import synthetic_lf  # noqa: E402
from lfbm5d_tpu.lf.noise import add_noise_np  # noqa: E402
from lfbm5d_tpu.pipeline import run_bm5d  # noqa: E402
from lfbm5d_tpu.utils.profiling import print_top  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="robust")
    ap.add_argument("--a", type=int, default=17)
    ap.add_argument("--hw", type=int, nargs=2, default=[128, 128])
    ap.add_argument("--sigma", type=float, default=25.0)
    ap.add_argument("--top", type=int, default=14)
    args = ap.parse_args()
    h, w = args.hw

    clean = synthetic_lf(args.a, args.a, h, w, channels=3,
                         disp_bg=1, disp_fg=2, seed=0)
    noisy = add_noise_np(clean, args.sigma, seed=100)
    lf = jnp.asarray(noisy, jnp.float32)
    params = preset_denoise_params(args.preset, args.sigma, chunk=128)
    probe = jax.jit(lambda v: v.reshape(-1)[0])

    t0 = time.time()
    _, final = run_bm5d(lf, params, engine="pallas")
    float(probe(final))
    print(f"compile+first {time.time() - t0:.1f}s", flush=True)

    trace_dir = f"/tmp/banked_launch_{args.preset}_{args.a}"
    with jax.profiler.trace(trace_dir):
        t0 = time.time()
        _, final = run_bm5d(lf, params, engine="pallas")
        float(probe(final))
        print(f"wall {time.time() - t0:.2f}s", flush=True)
    print_top(trace_dir, top_n=args.top)


if __name__ == "__main__":
    main()
