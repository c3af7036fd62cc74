"""On-TPU kernel smoke check (VERDICT round-1 hygiene item).

The pytest suite runs every Pallas kernel in INTERPRET mode on CPU, which
cannot catch Mosaic compile regressions or compiled-vs-interpret divergence
(round-2 example: a transposed angular matrix that every 2x2-grid CPU test
missed). This script runs ON THE CHIP in a few minutes and exits nonzero on
any failure:

  1. fused group kernel: compiled == interpret, bit-exact, 4 shape cases
  2. BM kernel vs the XLA displacement scan: candidate maps equal up to
     quantization-boundary flips (< 1e-4 of positions)
  3. end-to-end run_bm5d: Pallas engine vs XLA engine PSNR within 0.05 dB,
     both beating the noisy input

Usage: python experiments/tpu_smoke.py
"""

import os
import sys

# Invoked as a script, sys.path gets THIS directory, not the repo root;
# both the package and the sibling probe imports need the root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FAILED = []


def check(name, ok, detail=""):
    print(f"{'OK  ' if ok else 'FAIL'} {name} {detail}")
    if not ok:
        FAILED.append(name)


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("ERROR: not on TPU; this smoke check must run on the chip")
        return 2

    # --- 1. fused kernel compiled vs interpret ---
    from experiments.fused_kernel_probe import probe

    for case in (
        dict(n_tiles=2, planes=2, refs=2, cpt=2),
        dict(n_tiles=2, planes=2, refs=2, cpt=2, wiener=True),
        dict(n_tiles=1, planes=1, refs=1, cpt=1, nd=2),
        dict(n_tiles=1, planes=1, refs=1, cpt=1, use_sd=True),
    ):
        try:
            check(f"fused {case}", probe(**case))
        except Exception as e:
            check(f"fused {case}", False, f"{type(e).__name__}: {e}")

    # --- 2. BM kernel vs XLA scan ---
    from lfbm5d_tpu.kernels.bm import cross_argmin_all_kernel
    from lfbm5d_tpu.ops.distances import cross_argmin

    rng = np.random.default_rng(0)
    hp, wp, k, nd, a = 220, 300, 8, 2, 5
    planes = jnp.asarray(rng.random((a, hp, wp)) * 255, jnp.float32)
    wq = -(-(wp + 2 * nd) // 128) * 128
    ref_ext = jnp.pad(planes[2], ((0, 2 * nd), (0, wq - wp)))
    others_ext = jnp.pad(planes, ((0, 0), (nd, nd), (nd, wq - wp - nd)))
    outk = np.asarray(cross_argmin_all_kernel(ref_ext, others_ext, k, nd))
    v0, v1 = hp - k + 1, wp - k + 1
    worst = 0.0
    for ai in range(a):
        ref_map = np.asarray(cross_argmin(planes[2], planes[ai], k, nd))
        worst = max(worst, float((ref_map != outk[ai, :v0, :v1]).mean()))
    check("bm kernel vs xla scan", worst < 1e-4,
          f"worst mismatch fraction {worst:.2e}")

    # --- 2b. self-BM kernel vs XLA scan (round-3: banded-matmul box sums;
    # values agree up to +-1 quantization unit from MXU summation order,
    # and the matmuls MUST run at HIGHEST precision — default single-pass
    # bf16 truncation of the [0,255]^2-scale energies measured ~0.4%
    # relative error, hundreds of quant units) ---
    from lfbm5d_tpu.kernels.bm import self_distances_kernel
    from lfbm5d_tpu.lf.pad import ind_initialize
    from lfbm5d_tpu.ops.distances import self_distances

    hs, ws, ks, ns, ps = 96, 128, 8, 8, 4
    pad_s = ns + 2
    plane_s = jnp.asarray(
        rng.random((hs + 2 * pad_s, ws + 2 * pad_s)) * 255, jnp.float32
    )
    ys_s = ind_initialize(hs, ks, ps) + pad_s
    xs_s = ind_initialize(ws, ks, ps) + pad_s
    ref_d = np.asarray(self_distances(plane_s, ys_s, xs_s, ks, ns))
    got_d = np.asarray(self_distances_kernel(
        plane_s, tuple(int(v) for v in ys_s), tuple(int(v) for v in xs_s),
        ks, ns,
    ))
    neq = float((ref_d != got_d).mean())
    maxd = int(np.abs(ref_d.astype(np.int64) - got_d.astype(np.int64)).max())
    check("self-bm kernel vs xla scan", neq < 1e-2 and maxd <= 1,
          f"mismatch frac {neq:.2e}, max |dq| {maxd}")

    # --- 3. end-to-end engine agreement on-chip ---
    from lfbm5d_tpu.config import DenoiseParams, StepParams
    from lfbm5d_tpu.lf import psnr, synthetic_lf
    from lfbm5d_tpu.lf.noise import add_noise_np
    from lfbm5d_tpu.pipeline import run_bm5d

    tiny = dict(n_sim=8, n_search=4, n_disp=1, k=8, p=3)
    p = DenoiseParams(
        sigma=25.0,
        ht=StepParams(tau_match=2500.0, **tiny),
        wiener=StepParams(tau_match=400.0, **tiny),
        chunk=64,
    )
    clean = synthetic_lf(3, 3, 48, 64, channels=3, seed=0)
    noisy = add_noise_np(clean, 25.0, seed=1)
    p_noisy = psnr(np.clip(noisy, 0, 255), clean)
    psnrs = {}
    for eng in ("pallas", "xla"):
        _, final = run_bm5d(noisy, p, engine=eng)
        psnrs[eng] = psnr(np.clip(np.asarray(final), 0, 255), clean)
    check(
        "engines e2e psnr",
        abs(psnrs["pallas"] - psnrs["xla"]) < 0.05
        and psnrs["pallas"] > p_noisy + 3.0,
        f"pallas {psnrs['pallas']:.3f} xla {psnrs['xla']:.3f} "
        f"noisy {p_noisy:.2f}",
    )

    # --- 4. banked-fused engine on a >128-SAI grid (the round-2 crash
    # case: 12x12x48x64 through run_bm5d faulted the worker when the two
    # steps were composed into one program; the per-step-jit routing must
    # hold on-chip) ---
    tiny_b = dict(n_sim=4, n_search=2, n_disp=1, k=8, p=4)
    pb = DenoiseParams(
        sigma=25.0,
        ht=StepParams(tau_match=2500.0, **tiny_b),
        wiener=StepParams(tau_match=400.0, **tiny_b),
        chunk=64,
    )
    clean_b = synthetic_lf(12, 12, 48, 64, channels=1, seed=2)
    noisy_b = add_noise_np(clean_b, 25.0, seed=3)
    try:
        _, fin_b = run_bm5d(noisy_b, pb, engine="pallas")
        ps_b = psnr(np.clip(np.asarray(fin_b), 0, 255), clean_b)
        ps_n = psnr(np.clip(noisy_b, 0, 255), clean_b)
        check("banked-fused 12x12 e2e", ps_b > ps_n + 3.0,
              f"psnr {ps_n:.2f} -> {ps_b:.2f}")
    except Exception as e:
        check("banked-fused 12x12 e2e", False, f"{type(e).__name__}: {e}")

    # --- 5. direct doff sampler compiled == take reference (round-3: the
    # band-slab DMA kernel is the compiled default for BM-map sampling;
    # CPU tests only see it in interpret mode) ---
    from lfbm5d_tpu.kernels.gather import sample_doff

    n_tiles_s, refs_s, cpt_s, sc_s, l_s = 4, 3, 2, 64, 128
    bh_s, bw_s, th_s, tw_s = 32, 48, 96, 128
    tabs = jnp.asarray(
        rng.integers(0, 25, (refs_s, th_s, tw_s, l_s)), jnp.int32
    )
    # x-origins must be sublane-aligned (sample_doff contract: the slab
    # DMA slices the tiled TW axis; engine.py guarantees this at build)
    orig = np.stack(
        [rng.integers(0, th_s - bh_s, n_tiles_s),
         rng.integers(0, (tw_s - bw_s) // 8, n_tiles_s) * 8], axis=1
    ).astype(np.int32)
    qy = orig[:, None, 0, None, None] + rng.integers(
        0, bh_s, (n_tiles_s, refs_s, cpt_s, sc_s)
    )
    qx = orig[:, None, 1, None, None] + rng.integers(
        0, bw_s, (n_tiles_s, refs_s, cpt_s, sc_s)
    )
    qyx = jnp.asarray(
        (qy * 2048 + qx).reshape(n_tiles_s * refs_s, cpt_s, sc_s), jnp.int32
    )
    rsai = jnp.asarray([1, 7, 100], jnp.int32)
    try:
        got = np.asarray(sample_doff(
            tabs, qyx, jnp.asarray(orig), rsai, bh=bh_s, bw=bw_s, c_ang=12,
        )).reshape(n_tiles_s, refs_s, cpt_s, sc_s, l_s)
        want = np.asarray(tabs)[
            np.arange(refs_s)[None, :, None, None], qy, qx
        ]
        for r in range(refs_s):
            want[:, r, ..., int(rsai[r])] = 12
        check("direct doff sampler compiled", np.array_equal(got, want),
              f"mismatch rows {int((got != want).any(-1).sum())}")
    except Exception as e:
        check("direct doff sampler compiled", False,
              f"{type(e).__name__}: {e}")

    print("SMOKE:", "PASS" if not FAILED else f"FAIL ({FAILED})")
    return 0 if not FAILED else 1


if __name__ == "__main__":
    sys.exit(main())
