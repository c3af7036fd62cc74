"""Bisect compiled-vs-interpret divergence of kernels/fused.py on TPU.

Builds small random inputs in the kernel's exact calling convention and
compares pl.pallas_call(interpret=True) (pure JAX ops, trusted — CPU tests
prove it oracle-exact) against the Mosaic-compiled kernel on the chip.
Flags: vary wiener / refs / planes / tiles / chunks / sentinel density.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from lfbm5d_tpu.kernels.fused import fused_group_step
from lfbm5d_tpu.transforms import matrices as tm


def probe(n_tiles=2, planes=2, refs=2, cpt=2, sc=16, n_sim=8, k=8, nd=1,
          l=128, bh=40, bw=48, wiener=False, use_sd=False, seed=0,
          sent_frac=0.2, a_live=9):
    rng = np.random.default_rng(seed)
    nsel = 2 * nd + 1
    sent = nsel * nsel
    sk = k + 2 * nd
    gpc = sc // n_sim
    n_meta = n_tiles * refs
    dt = jnp.float32

    bands_n = rng.standard_normal((n_tiles * planes, bh, bw, l)) * 50
    bands_n[..., a_live:] = 0.0
    bands_b = rng.standard_normal((n_tiles * planes, bh, bw, l)) * 50
    bands_b[..., a_live:] = 0.0
    sy = rng.integers(0, bh - sk + 1, (n_meta, cpt, sc)).astype(np.int32)
    sx = rng.integers(0, bw - sk + 1, (n_meta, cpt, sc)).astype(np.int32)
    lvl = rng.integers(0, int(np.log2(n_sim)) + 1,
                       (n_meta, cpt, gpc)).astype(np.int32)
    doff = rng.integers(0, sent, (n_meta, cpt, sc, l)).astype(np.int32)
    msk = rng.random((n_meta, cpt, sc)) >= sent_frac
    doff = np.where(msk[..., None], doff, sent).astype(np.int32)
    sig = np.asarray([25.0, 12.0, 7.0][:planes], np.float32)

    f2 = tm.dct_matrix(k)
    k2f = np.kron(f2, f2)
    f4 = np.zeros((l, l))
    a4 = tm.dct_matrix(a_live)
    f4[:a_live, :a_live] = np.kron(a4[:3, :3], a4[:3, :3]) if a_live == 9 else a4
    stf, sti = tm.stack_matrices("haar", n_sim)
    kai = np.asarray(tm.kaiser_window(k)).reshape(k, k, 1)

    args = [jnp.asarray(x, dt) for x in (bands_n, bands_b)]
    meta = [jnp.asarray(sy * 2048 + sx), jnp.asarray(lvl),
            jnp.asarray(sig), jnp.asarray(doff)]
    mats = [jnp.asarray(x, dt) for x in
            (k2f, k2f.T, f4, f4.T, stf, sti, kai)]
    kw = dict(bh=bh, bw=bw, k=k, nd=nd, n_sim=n_sim, lambda_3d=2.7,
              wiener=wiener, use_sd=use_sd, a_live=a_live, planes=planes,
              refs=refs)

    def run(interp):
        num, den = fused_group_step(
            args[0], args[1] if wiener else None, *meta, *mats,
            interpret=interp, **kw)
        return np.asarray(num), np.asarray(den)

    ni, di = run(True)
    nc, dc = run(False)
    en = np.abs(ni - nc).max()
    ed = np.abs(di - dc).max()
    tag = f"tiles={n_tiles} planes={planes} refs={refs} cpt={cpt} " \
          f"wiener={wiener} sd={use_sd} nd={nd}"
    ok = en < 1e-2 and ed < 1e-2
    print(f"{'OK  ' if ok else 'FAIL'} {tag}: num {en:.3e} den {ed:.3e}")
    return ok


if __name__ == "__main__":
    cases = [
        dict(n_tiles=1, planes=1, refs=1, cpt=1),
        dict(n_tiles=1, planes=1, refs=1, cpt=2),
        dict(n_tiles=1, planes=1, refs=2, cpt=1),
        dict(n_tiles=1, planes=2, refs=1, cpt=1),
        dict(n_tiles=2, planes=1, refs=1, cpt=1),
        dict(n_tiles=2, planes=2, refs=2, cpt=2),
        dict(n_tiles=1, planes=1, refs=1, cpt=1, wiener=True),
        dict(n_tiles=2, planes=2, refs=2, cpt=2, wiener=True),
        dict(n_tiles=1, planes=1, refs=1, cpt=1, use_sd=True),
        dict(n_tiles=1, planes=1, refs=1, cpt=1, nd=2),
        dict(n_tiles=1, planes=1, refs=1, cpt=1, sent_frac=0.0),
        dict(n_tiles=1, planes=1, refs=1, cpt=1, sent_frac=1.0),
    ]
    sel = [int(s) for s in sys.argv[1:]]
    for i, c in enumerate(cases):
        if sel and i not in sel:
            continue
        try:
            probe(**c)
        except Exception as e:
            print(f"ERR  case {i} {c}: {type(e).__name__}: "
                  + str(e).split(chr(10))[0][:200])
