"""Slot-count mechanisms, candidates 2+3 (round-5 item 1).

Candidate 1 (cross-step BM reuse) measured quality-dead (-0.31 dB,
experiments/bm_reuse_probe.py). The remaining slot-count levers probed
here, all on the matched-preset base at the flagship bench LF:

  * GRADED REDUNDANCY DIET — the flat fallback (flat_tau=1.3) already
    skips fully-redundant 5D groups in both steps; `flat_tau` is a
    PER-STEP field, so a graded diet falls out of the existing machinery:
    raise the WIENER step's threshold only. Moderately-redundant positions
    then still get the HT 5D treatment (a good basic estimate) but skip
    the Wiener group; their final pixels take the pilot-guided 2D
    empirical-Wiener fallback of the angular mean (ops/flat.py, pilot =
    basic). Variants: wiener flat_tau in {1.6, 2.0, 3.0}, and both-step
    raises for comparison.

  * N-DIET — n_sim=4: halves slot count outright. The round-3 knee sweep
    measured N4n16p8d1A3 within budget (-0.008) at 224x320 but never
    measured the N4 x A4 cell, and none of the N4 rows were run at the
    flagship shape. n_sim=2 included as the falloff control.

Budget: within 0.05 dB of the reference-default anchor 28.416 dB
(BASELINE.md flagship table; matched preset = 28.417).

Usage: python experiments/slot_diet_probe.py [--small] [--variants ...]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from lfbm5d_tpu.utils.cache import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from lfbm5d_tpu.config import preset_denoise_params  # noqa: E402
from lfbm5d_tpu.lf.metrics import psnr_device  # noqa: E402
from lfbm5d_tpu.lf.noise import add_noise_np  # noqa: E402
from lfbm5d_tpu.lf.synth import synthetic_lf  # noqa: E402
from lfbm5d_tpu.pipeline import run_bm5d  # noqa: E402
from lfbm5d_tpu.utils.timing import device_fence  # noqa: E402

# (ht overrides, wiener overrides)
VARIANTS = {
    "anchor": ({}, {}),
    "wft1.6": ({}, dict(flat_tau=1.6)),
    "wft2.0": ({}, dict(flat_tau=2.0)),
    "wft3.0": ({}, dict(flat_tau=3.0)),
    "bft1.6": (dict(flat_tau=1.6), dict(flat_tau=1.6)),
    "bft2.0": (dict(flat_tau=2.0), dict(flat_tau=2.0)),
    "N4": (dict(n_sim=4), dict(n_sim=4)),
    "N4wft2": (dict(n_sim=4), dict(n_sim=4, flat_tau=2.0)),
    "N2": (dict(n_sim=2), dict(n_sim=2)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--disp", type=float, nargs=2, default=[1, 2])
    args = ap.parse_args()
    h, w = (192, 256) if args.small else (434, 625)
    mpix = 81 * h * w / 1e6

    # synthetic_lf sizes its canvas from the disparities; keep whole-number
    # CLI values int so the canvas dims stay int
    disp = [int(d) if float(d).is_integer() else d for d in args.disp]
    clean = synthetic_lf(9, 9, h, w, 3, disp_bg=disp[0],
                         disp_fg=disp[1], seed=args.seed)
    noisy = add_noise_np(clean, 25.0, seed=args.seed + 1)
    clean_d = jax.device_put(clean.astype(np.float32))
    noisy_d = jax.device_put(noisy.astype(np.float32))

    for name in args.variants:
        ht_over, wn_over = VARIANTS[name]
        params = preset_denoise_params("matched", 25.0, chunk=128)
        params = params.replace(
            ht=params.ht.replace(**ht_over),
            wiener=params.wiener.replace(**wn_over),
        )
        t0 = time.time()
        _, final = run_bm5d(noisy_d, params, engine="auto")
        device_fence(final)
        compile_s = time.time() - t0
        times = []
        for _ in range(args.runs):
            t0 = time.time()
            _, final = run_bm5d(noisy_d, params, engine="auto")
            device_fence(final)
            times.append(time.time() - t0)
        q = float(psnr_device(jax.numpy.clip(final, 0, 255), clean_d))
        dt = min(times)
        print(
            f"{name:8s}: {q:.3f} dB  {dt:.3f} s/LF ({mpix/dt:.2f} Mpix/s)  "
            f"compile+first {compile_s:.1f}s "
            f"runs={[round(t, 3) for t in times]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
