"""Measure the per-lane mux's share of the fused kernel's device time.

The mux helpers live in kernels/mux.py and are imported by kernels/fused.py
at module scope, so monkeypatching the fused module's bindings swaps the
per-lane selects for static slices (wrong values, identical memory traffic
and loop structure minus the vselects). Running the matched flagship config
under the profiler with and without the patch isolates the vselect cost —
the number that decides whether further mux micro-architecture (doff
bucketing, int8 muxing) can reach the round-4 target (>= 25 Mpix/s).

Workload comparability: flat classification runs on the NOISY input in both
steps, so live-chunk counts (and therefore kernel launch shapes/counts) are
unchanged by the patch; only the select instructions differ.

Usage: python experiments/mux_ablation.py [full|nomux|noplace|noselect]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def patch(variant):
    import lfbm5d_tpu.kernels.fused as F

    if variant == "full":
        return
    if variant in ("nomux", "noselect"):
        def sel(sup, d, k, nsel, sent):
            return sup[0:k, 0:k, :]
        F._mux_select = sel
    if variant in ("nomux", "noplace"):
        def plc(patch_, dy, dx, k, sk, nsel):
            return jnp.pad(
                patch_, ((0, sk - k), (0, sk - k), (0, 0))
            )
        F._mux_place = plc


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    patch(variant)

    from lfbm5d_tpu.utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from lfbm5d_tpu.config import preset_denoise_params
    from lfbm5d_tpu.lf.noise import add_noise_np
    from lfbm5d_tpu.lf.synth import synthetic_lf
    from lfbm5d_tpu.pipeline.denoise import run_bm5d
    from lfbm5d_tpu.utils.profiling import print_top

    clean = synthetic_lf(9, 9, 434, 625, channels=3, seed=0)
    noisy = add_noise_np(clean, 25.0, seed=1)
    params = preset_denoise_params("matched", 25.0, chunk=128)

    out = run_bm5d(noisy, params)  # compile + warm
    jax.block_until_ready(out)

    trace_dir = f"/tmp/mux_ablation_{variant}"
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        out = run_bm5d(noisy, params)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
    print(f"variant={variant} wall={dt:.3f}s")
    print_top(trace_dir, top_n=6)


if __name__ == "__main__":
    main()
