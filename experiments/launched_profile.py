"""Per-op device profile of the launched flagship default step (round 3).

Builds the HT launched step at 9x9x434x625 reference-default parameters,
warms one launch (compile), then profiles two launches and prints the
per-op self-time table. Used to (re-)attribute the 229 s/LF vs 115-130 s
floor gap after the direct-doff sampler landed with no end-to-end change.

Run: [LFBM5D_DOFF_MODE=take|direct] python experiments/launched_profile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lfbm5d_tpu.config import StepParams
    from lfbm5d_tpu.lf import synthetic_lf
    from lfbm5d_tpu.lf.noise import add_noise_np
    from lfbm5d_tpu.pipeline.denoise import (
        _flat_pad, _launched_step_jit, _sigma_channels,
    )

    mode = os.environ.get("LFBM5D_DOFF_MODE", "(default=direct)")
    sp = StepParams(tau_match=2500.0, n_sim=16, n_search=16, n_disp=2,
                    k=8, p=3)
    a_h = a_w = 9
    h, w, c = 434, 625, 3
    clean = synthetic_lf(a_h, a_w, h, w, channels=3, disp_bg=1, disp_fg=2,
                         seed=0)
    noisy = add_noise_np(clean, 25.0, seed=1)
    xp = _flat_pad(jnp.asarray(noisy, jnp.float32), sp.pad)
    sig = _sigma_channels(25.0, "opp", c, "float32")
    jax.block_until_ready(xp)

    raw, prep, fn = _launched_step_jit(
        sp, 2.7, a_h, a_w, h, w, c, False, "float32", None
    )
    prepared = prep(xp, xp)
    num = jnp.zeros(raw.acc_shape, raw.acc_dtype)
    den = jnp.zeros(raw.acc_shape, raw.acc_dtype)
    print(f"mode={mode} blocks={raw.n_blocks}", flush=True)
    t0 = time.time()
    num, den = fn(prepared, sig, num, den, jnp.int32(0))
    jax.block_until_ready((num, den))
    _ = float(num[0, 0, 0, 0])
    print(f"compile+first launch: {time.time() - t0:.1f}s", flush=True)

    trace_dir = "/tmp/launched_trace"
    times = []
    jax.profiler.start_trace(trace_dir)
    for b in (1, 2):
        t0 = time.time()
        num, den = fn(prepared, sig, num, den, jnp.int32(b))
        jax.block_until_ready((num, den))
        _ = float(num[0, 0, 0, 0])
        times.append(time.time() - t0)
    jax.profiler.stop_trace()
    print(f"launches: {[round(t, 2) for t in times]} s", flush=True)

    from lfbm5d_tpu.utils.profiling import print_top

    print_top(trace_dir, 16)


if __name__ == "__main__":
    main()
