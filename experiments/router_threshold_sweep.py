"""Router threshold sensitivity sweep (round-5 item 6; VERDICT r4 weak #3).

The adaptive router sends weak_fraction >= 0.66 to `robust`; 0.66 was
placed in the measured gap between the weak-texture family (0.688-0.757)
and the other five (0.536-0.635) without a sensitivity analysis. This
sweep measures, per (family x seed) case at the flagship shape:

    probe weak_fraction, matched PSNR, robust PSNR

(one run each — PSNR is deterministic per content+params), then evaluates
every threshold t in [0.55, 0.75]: the routed PSNR per case is matched's
if wf < t else robust's, and the regret per case is
best(matched, robust) - routed. A threshold is GOOD when max-regret over
all cases is ~0, i.e. it separates every case onto its better preset.

It also fills the occl3 reference-default anchor (VERDICT r4 weak #2) —
the one family the round-4 matrix left without a default column — so the
+-0.05 dB budget statement is checkable on all six families (the other
five anchors are the round-4 recorded values; PSNR is deterministic per
content+params, BASELINE.md).

Usage: python experiments/router_threshold_sweep.py [--small]
         [--seeds 0 1 2] [--default-anchor-families occl3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfbm5d_tpu.utils.cache import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lfbm5d_tpu.config import preset_denoise_params  # noqa: E402
from lfbm5d_tpu.lf.metrics import psnr_device  # noqa: E402
from lfbm5d_tpu.lf.noise import add_noise_np  # noqa: E402
from lfbm5d_tpu.pipeline import run_bm5d  # noqa: E402
from lfbm5d_tpu.pipeline.adaptive import content_stats  # noqa: E402
from experiments.content_family import make_lf  # noqa: E402

FAMILIES = ["two-plane", "low-disp", "occl3", "occl-grad", "static-min",
            "static-flat"]
# round-4 recorded reference-default anchors at seed 0 (BASELINE.md round-4
# matrix; PSNR is deterministic per content+params)
DEFAULT_ANCHORS_SEED0 = {
    "two-plane": 28.416, "low-disp": 30.800, "occl-grad": 29.733,
    "static-min": 29.666, "static-flat": 30.407,
}


def run_psnr(noisy_d, clean_d, preset: str) -> float:
    params = preset_denoise_params(preset, 25.0)
    _, final = run_bm5d(noisy_d, params, engine="auto")
    return float(psnr_device(jnp.clip(final, 0, 255), clean_d))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--families", nargs="*", default=FAMILIES)
    ap.add_argument("--default-anchor-families", nargs="*",
                    default=["occl3"])
    args = ap.parse_args()
    h, w = (192, 256) if args.small else (434, 625)

    cases = []
    for family in args.families:
        for seed in args.seeds:
            clean = make_lf(family, h, w, seed)
            noisy = add_noise_np(clean, 25.0, seed=seed + 100)
            clean_d = jax.device_put(clean.astype(np.float32))
            noisy_d = jax.device_put(noisy.astype(np.float32))
            wf = content_stats(noisy, 25.0)["weak_fraction"]
            qm = run_psnr(noisy_d, clean_d, "matched")
            qr = run_psnr(noisy_d, clean_d, "robust")
            row = dict(family=family, seed=seed, weak_fraction=round(wf, 4),
                       matched=round(qm, 3), robust=round(qr, 3))
            if seed == 0 and family in args.default_anchor_families:
                row["default"] = round(run_psnr(noisy_d, clean_d, "default"), 3)
            elif seed == 0 and family in DEFAULT_ANCHORS_SEED0:
                row["default"] = DEFAULT_ANCHORS_SEED0[family]
            cases.append(row)
            print(json.dumps(row), flush=True)

    print("\nthreshold sensitivity (regret vs best-of-two, dB):")
    for t100 in range(55, 76):
        t = t100 / 100.0
        regrets = []
        for c in cases:
            routed = c["matched"] if c["weak_fraction"] < t else c["robust"]
            regrets.append(max(c["matched"], c["robust"]) - routed)
        n_wrong = sum(1 for r in regrets if r > 0.05)
        print(f"  t={t:.2f}  max_regret={max(regrets):.3f} "
              f"mean={np.mean(regrets):.4f}  cases>0.05: {n_wrong}/"
              f"{len(regrets)}", flush=True)


if __name__ == "__main__":
    main()
