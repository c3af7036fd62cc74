"""Config-5 (17x17 HCI-class) preset measurement through run_bm5d.

The round-3 knee sweeps tuned `matched`/`robust` on the 9x9 flagship; this
probe measures what they buy on the >128-SAI banked grid, where the slot
counts change the execution tier entirely:

  default: 7.8M slots/step  -> launched banked (108.9 s/LF round-3 anchor)
  robust:  2.18M slots/step -> launched banked (just over the 2M bound)
  matched: 51.2k slots/step -> ONE banked-fused program

Run each preset in its OWN process (a fault must not take later cases
down):

  python experiments/banked_preset_probe.py --preset default --runs 1
  python experiments/banked_preset_probe.py --preset matched
  python experiments/banked_preset_probe.py --preset robust

Content is pinned (same generator/seeds across invocations) so the PSNR
deltas are exact; "default" is the quality anchor.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="matched",
                    help="default | matched | robust (config.PRESETS)")
    ap.add_argument("--a", type=int, default=17)
    ap.add_argument("--hw", type=int, nargs=2, default=[128, 128])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sigma", type=float, default=25.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lfbm5d_tpu.config import preset_denoise_params
    from lfbm5d_tpu.lf import psnr, psnr_device, synthetic_lf
    from lfbm5d_tpu.lf.noise import add_noise_np
    from lfbm5d_tpu.pipeline import run_bm5d
    from lfbm5d_tpu.pipeline.denoise import _step_slots

    h, w = args.hw
    params = preset_denoise_params(args.preset, args.sigma, chunk=128)
    slots = _step_slots(params.ht, args.a, args.a, h, w)

    clean = synthetic_lf(args.a, args.a, h, w, channels=3,
                         disp_bg=1, disp_fg=2, seed=0)
    noisy = add_noise_np(clean, args.sigma, seed=100)
    lf = jnp.asarray(noisy, jnp.float32)
    jax.block_until_ready(lf)
    probe = jax.jit(lambda v: v.reshape(-1)[0])

    t0 = time.time()
    _, final = run_bm5d(lf, params, engine="pallas")
    jax.block_until_ready(final)
    float(probe(final))
    compile_first = time.time() - t0

    ts = []
    for _ in range(args.runs):
        t0 = time.time()
        _, final = run_bm5d(lf, params, engine="pallas")
        jax.block_until_ready(final)
        float(probe(final))
        ts.append(time.time() - t0)

    mpix = args.a * args.a * h * w / 1e6
    print(json.dumps({
        "preset": args.preset, "shape": [args.a, args.a, h, w, 3],
        "slots_per_step": int(slots),
        "s_per_lf": round(min(ts), 3), "samples": [round(t, 3) for t in ts],
        "mpix_s": round(mpix / min(ts), 4),
        "compile_first_s": round(compile_first, 1),
        "psnr_db": round(psnr_device(final, clean), 3),
        "psnr_noisy_db": round(psnr(np.clip(noisy, 0, 255), clean), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
