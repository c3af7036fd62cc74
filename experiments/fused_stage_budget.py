"""Per-stage device-time budget of the fused group kernel at the matched
flagship launch shape.

The mux ablation (experiments/mux_ablation.py) showed the per-lane select
chains are only ~15% of the fused kernel (0.757 -> 0.644 s); this probe
attributes the rest. It builds ONE launch-sized workload in the kernel's
exact calling convention — the shapes captured from a traced matched-preset
flagship run (16 tiles x 3 planes, bands [72,120,128], refs=5, cpt=5,
sc=64, n_sim=8, haar stack, a_live=81) — and times the kernel with
individual stages stubbed out via kernels.fused._ABLATE:

    full    everything
    ext     extract fori_loop skipped (load+mux+scratch store)
    load    superpatch loads at static (0,0) (isolates dynamic-slice cost)
    k2      2D spatial matmuls skipped
    k4      angular matmuls skipped
    stack   stack butterflies skipped
    shrink  elementwise shrink/weight math skipped (fwd chains kept live)
    agg     aggregation fori_loop skipped (place mux + RMW)

Each variant is numerically wrong; only the TIME deltas matter. HT and
Wiener workloads run in the same jit so one compile covers both.

Usage: python experiments/fused_stage_budget.py [variant ...]
  (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfbm5d_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import lfbm5d_tpu.kernels.fused as F
from lfbm5d_tpu.transforms import matrices as tm

# captured launch shape (matched preset, 9x9x434x625, chunk=128)
N_TILES, PLANES, REFS, CPT, SC = 16, 3, 5, 5, 64
BH, BW, L, K, ND, N_SIM, A_LIVE = 72, 120, 128, 8, 1, 8, 81
REPS = 10


def build_inputs(wiener, seed=0):
    rng = np.random.default_rng(seed)
    sk = K + 2 * ND
    sent = (2 * ND + 1) ** 2
    n_meta = N_TILES * REFS
    gpc = SC // N_SIM

    bands_n = rng.standard_normal(
        (N_TILES * PLANES, BH, BW, L)).astype(np.float32) * 50
    bands_n[..., A_LIVE:] = 0.0
    bands_b = (rng.standard_normal(
        (N_TILES * PLANES, BH, BW, L)).astype(np.float32) * 50
        if wiener else None)
    sy = rng.integers(0, BH - sk + 1, (n_meta, CPT, SC)).astype(np.int32)
    sx = rng.integers(0, BW - sk + 1, (n_meta, CPT, SC)).astype(np.int32)
    lvl = rng.integers(0, 4, (n_meta, CPT, gpc)).astype(np.int32)
    doff = rng.integers(0, sent, (n_meta, CPT, SC, L)).astype(np.int32)
    nlc = np.full((n_meta,), CPT, np.int32)  # all chunks live
    sig = np.asarray([25.0, 12.0, 12.0], np.float32)

    f2 = np.asarray(tm.dct_matrix(K))
    k2f = np.kron(f2, f2).astype(np.float32)
    a2 = np.asarray(tm.dct_matrix(9))
    f4 = np.zeros((L, L), np.float32)
    f4[:A_LIVE, :A_LIVE] = np.kron(a2, a2)
    stf, sti = (np.asarray(x, np.float32)
                for x in tm.stack_matrices("haar", N_SIM))
    kai = np.asarray(tm.kaiser_window(K), np.float32).reshape(K, K, 1)

    return dict(
        bands_n=jnp.asarray(bands_n),
        bands_b=None if bands_b is None else jnp.asarray(bands_b),
        syx=jnp.asarray(sy * 2048 + sx), lvl=jnp.asarray(lvl),
        sig=jnp.asarray(sig), doff=jnp.asarray(doff),
        nlc=jnp.asarray(nlc),
        mats=[jnp.asarray(x) for x in
              (k2f, k2f.T, f4, f4.T, stf, sti, kai)],
        kw=dict(bh=BH, bw=BW, k=K, nd=ND, n_sim=N_SIM,
                lambda_3d=(0.0 if wiener else 2.7), wiener=wiener,
                use_sd=False, a_live=A_LIVE, planes=PLANES, refs=REFS,
                stack_mode="haar"),
    )


def main():
    variants = sys.argv[1:] or [
        "full", "ext", "load", "agg", "k2", "k4", "stack", "shrink"]
    ht = build_inputs(False)
    wn = build_inputs(True)

    kw_ht, kw_wn = ht.pop("kw"), wn.pop("kw")

    for variant in variants:
        F._ABLATE = frozenset() if variant == "full" else frozenset([variant])

        @jax.jit
        def run(ht, wn):
            o1 = F.fused_group_step(
                ht["bands_n"], None, ht["syx"], ht["lvl"],
                ht["sig"], ht["doff"], *ht["mats"],
                nlc=ht["nlc"], **kw_ht)
            o2 = F.fused_group_step(
                wn["bands_n"], wn["bands_b"], wn["syx"],
                wn["lvl"], wn["sig"], wn["doff"], *wn["mats"],
                nlc=wn["nlc"], **kw_wn)
            return o1[0][0, 0, 0, 0] + o2[0][0, 0, 0, 0]

        # NB: under the axon remote platform block_until_ready returns
        # immediately; only materializing a value forces device sync
        # (measured: 0.04 ms "runs" vs 54 ms real). float() each rep.
        t0 = time.perf_counter()
        float(run(ht, wn))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(REPS):
                r = run(ht, wn)
            float(r)
            times.append((time.perf_counter() - t0) / REPS)
        print(f"variant={variant:7s} per-launch-pair={min(times)*1000:7.2f} ms"
              f"  (compile {compile_s:.0f}s)", flush=True)
        F._ABLATE = frozenset()


if __name__ == "__main__":
    main()
