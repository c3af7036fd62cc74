"""Bisect the banked-fused scale fault (VERDICT r2 item 4, round-3 leftover).

Status going in (docs/DESIGN_NOTES.md "Banked-fused"): through per-step jit
programs the banked-fused kernel PASSES at 17x17x48x64 RGB default (1.4M
slots) but CRASHES the TPU worker at 17x17x128x128 RGB default (7.8M slots).
The fault is scale-dependent inside the kernel configuration — suspects are
VMEM accounting of the bank-looped chain temporaries (grows with sc) and the
per-call grid extent (grows with tiles_per_call via the lax.scan ranges).

This probe runs ONE step (HT by default, --wiener for step 2) of the exact
crashing configuration through build_kernel_step(fused=True) with the
suspect knobs exposed:

  python experiments/banked_scale_probe.py --hw 128 128 [--sc 16]
      [--rows 2 --cols 1] [--wiener] [--soak N]

Each invocation is one freshly compiled program — run different knob values
in separate processes so a fault never takes later cases down with it.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=[128, 128])
    ap.add_argument("--a", type=int, default=17)
    ap.add_argument("--c", type=int, default=3)
    ap.add_argument("--sc", type=int, default=64)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--cols", type=int, default=24)
    ap.add_argument("--wiener", action="store_true")
    ap.add_argument("--launched", action="store_true",
                    help="run as bounded per-ref-block launches "
                    "(launch_blocks=1) instead of one program — the fault "
                    "hypothesis is launch DURATION, not the kernel")
    ap.add_argument("--soak", type=int, default=1,
                    help="extra timed runs after the compile run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lfbm5d_tpu.config import StepParams
    from lfbm5d_tpu.lf import synthetic_lf
    from lfbm5d_tpu.lf.noise import add_noise_np
    from lfbm5d_tpu.pipeline.denoise import _flat_pad, _sigma_channels
    from lfbm5d_tpu.pipeline.engine import build_kernel_step

    h, w = args.hw
    a = args.a
    c = args.c
    sp = StepParams(tau_match=400.0 if args.wiener else 2500.0,
                    n_sim=16, n_search=16, n_disp=2, k=8, p=3)
    print(f"case: {a}x{a}x{h}x{w} c={c} wiener={args.wiener} "
          f"sc={args.sc} rows={args.rows} cols={args.cols}", flush=True)

    clean = synthetic_lf(a, a, h, w, channels=c, disp_bg=1, disp_fg=2, seed=0)
    noisy = add_noise_np(clean, 25.0, seed=1)
    x = jnp.asarray(noisy, jnp.float32)
    xp = _flat_pad(x, sp.pad)
    sig = _sigma_channels(25.0, "opp", c, "float32")
    jax.block_until_ready(xp)

    step = build_kernel_step(
        sp, 2.7, a, a, h, w, c, args.wiener, "float32",
        interpret=jax.default_backend() != "tpu",
        rows_per_tile=args.rows, cols_per_tile=args.cols, sc=args.sc,
        fused=True, launch_blocks=1 if args.launched else None,
    )

    def run_once():
        if args.launched:
            prep = jax.jit(step.prepare) if args.wiener else jax.jit(
                lambda n_, m_: step.prepare(n_, m_, None)
            )
            raw = jax.jit(step)
            prepared = prep(xp, xp, xp) if args.wiener else prep(xp, xp)
            num = jnp.zeros(step.acc_shape, step.acc_dtype)
            den = jnp.zeros(step.acc_shape, step.acc_dtype)
            for b0 in range(step.n_blocks):
                num, den = raw(prepared, sig, num, den, jnp.int32(b0))
            return step.finalize(num, den)
        fn = jax.jit(step) if args.wiener else jax.jit(
            lambda n_, m_, s_: step(n_, m_, s_, None)
        )
        if args.wiener:
            return fn(xp, xp, sig, xp)
        return fn(xp, xp, sig)

    if args.launched:
        print(f"launched: {step.n_blocks} blocks", flush=True)
    t0 = time.time()
    num, den = run_once()
    jax.block_until_ready((num, den))
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(args.soak):
        t0 = time.time()
        num, den = run_once()
        jax.block_until_ready((num, den))
        times.append(time.time() - t0)
    print(f"PASS  run(s): {[round(t, 2) for t in times]}  "
          f"den[mid]={float(den[0, sp.pad + h // 2, sp.pad + w // 2, 0]):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
