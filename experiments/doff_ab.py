"""A/B: doff sampling mode at default-parameter scale (round-3 item 5).

The launched profile (BASELINE.md) put the angular-table row-gather at 40%
of default-parameter device time (3.44 s of each 8.57 s launch). This
script measures run_bm5d end-to-end at the 9x9x224x320 reference-default
config with LFBM5D_DOFF_MODE=take (the XLA row-gather) vs =direct (the
band-DMA sample_doff kernel), fresh process per arm:

  LFBM5D_DOFF_MODE=take   python experiments/doff_ab.py
  LFBM5D_DOFF_MODE=direct python experiments/doff_ab.py
  python experiments/doff_ab.py --full   # 9x9x434x625 (one arm per run)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="9x9x434x625")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--preset", default="default",
                    choices=["default", "matched", "fast"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lfbm5d_tpu.config import DenoiseParams, StepParams
    from lfbm5d_tpu.lf import psnr, synthetic_lf
    from lfbm5d_tpu.lf.noise import add_noise_np
    from lfbm5d_tpu.pipeline import run_bm5d

    mode = os.environ.get("LFBM5D_DOFF_MODE", "(default=direct)")
    h, w = (434, 625) if args.full else (224, 320)
    step = dict(n_sim=16, n_search=16, n_disp=2, k=8, p=3)
    if args.preset == "matched":
        step = dict(n_sim=16, n_search=16, n_disp=2, k=8, p=4, p_ang=2)
    elif args.preset == "fast":
        step = dict(n_sim=8, n_search=8, n_disp=2, k=8, p=6)
    params = DenoiseParams(
        sigma=25.0,
        ht=StepParams(tau_match=2500.0, **step),
        wiener=StepParams(tau_match=400.0, **step),
    )
    clean = synthetic_lf(9, 9, h, w, channels=3, disp_bg=1, disp_fg=2, seed=0)
    noisy = add_noise_np(clean, 25.0, seed=1)
    dev = jnp.asarray(noisy, jnp.float32)
    jax.block_until_ready(dev)
    print(f"mode={mode} shape=9x9x{h}x{w} preset={args.preset}", flush=True)

    t0 = time.time()
    basic, final = run_bm5d(dev, params)
    jax.block_until_ready(final)
    _ = float(final[0, 0, 0, 0, 0])
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)

    times = []
    for _ in range(args.runs):
        t0 = time.time()
        basic, final = run_bm5d(dev, params)
        jax.block_until_ready(final)
        _ = float(final[0, 0, 0, 0, 0])
        times.append(time.time() - t0)
        print(f"run: {times[-1]:.2f}s", flush=True)

    p_final = psnr(np.clip(np.asarray(final), 0, 255), clean)
    mpix = 81 * h * w / 1e6
    best = min(times)
    print(f"RESULT mode={mode} preset={args.preset} {best:.2f} s/LF "
          f"{mpix / best:.3f} Mpix/s PSNR {p_final:.3f} dB "
          f"runs={[round(t, 2) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
