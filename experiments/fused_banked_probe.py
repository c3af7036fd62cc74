"""De-risk the round-3 fused-banked design (>128-SAI grids, SURVEY §5.7).

The fused kernel needs the WHOLE angular axis for its in-kernel 4D matmul,
but Mosaic caps usable lane width at 128, so 17x17 grids (289 SAIs) run the
slower two-kernel banked path today. The planned fused-banked kernel keeps
banks as separate 128-lane slabs inside ONE program:

  P1: does a bank-looped angular matmul compile and match?
      spec_out[bo] = sum_bi dot(spec[bi], K4[bi, bo])   (banks^2 matmuls of
      [*, 128] x [128, 128], all VMEM-resident)
  P2: does a kernel with MULTIPLE band inputs (one per bank) compile —
      per-slot dynamic superpatch slices from each bank ref, three scratch
      writes?

Run on the chip: python experiments/fused_banked_probe.py
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BANKS, GPN, L = 3, 32, 128  # 3 banks ~ 17x17; GPN = gpc*N rows per pixel blk
P = 64


def probe_bank_matmul():
    rng = np.random.default_rng(0)
    spec = [jnp.asarray(rng.standard_normal((GPN, P, L)), jnp.float32)
            for _ in range(BANKS)]
    k4 = rng.standard_normal((BANKS * L, BANKS * L))
    k4_blocks = [[jnp.asarray(k4[bi * L:(bi + 1) * L, bo * L:(bo + 1) * L],
                              jnp.float32) for bo in range(BANKS)]
                 for bi in range(BANKS)]

    def kernel(*refs):
        s_refs = refs[:BANKS]
        m_refs = refs[BANKS:BANKS + BANKS * BANKS]
        o_refs = refs[BANKS + BANKS * BANKS:]
        for bo in range(BANKS):
            acc = jnp.zeros((GPN, P, L), jnp.float32)
            for bi in range(BANKS):
                m = m_refs[bi * BANKS + bo][...]
                acc = acc + jax.lax.dot_general(
                    s_refs[bi][...], m, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_refs[bo][...] = acc

    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((GPN, P, L), jnp.float32)
                   for _ in range(BANKS)],
    )(*spec, *[k4_blocks[bi][bo] for bi in range(BANKS)
               for bo in range(BANKS)])
    full = jnp.concatenate([s for s in spec], axis=2)  # [GPN, P, BANKS*L]
    ref = jnp.einsum("gpL,LM->gpM", full, jnp.asarray(k4, jnp.float32))
    err = max(float(jnp.abs(outs[bo] - ref[..., bo * L:(bo + 1) * L]).max())
              for bo in range(BANKS))
    print(f"P1 bank-looped 4D matmul: maxerr {err:.2e} "
          f"{'OK' if err < 1e-3 else 'FAIL'}")


def probe_multi_band_extract(k=8, nd=2, sc=8, bh=48, bw=64):
    rng = np.random.default_rng(1)
    sk = k + 2 * nd
    nsel = 2 * nd + 1
    bands = [jnp.asarray(rng.standard_normal((1, bh, bw, L)), jnp.float32)
             for _ in range(BANKS)]
    sy = jnp.asarray(rng.integers(0, bh - sk + 1, (1, 1, sc)), jnp.int32)
    sx = jnp.asarray(rng.integers(0, bw - sk + 1, (1, 1, sc)), jnp.int32)
    # banks as their own axis: a [sc, BANKS*L] row with a lane-range slice
    # at dynamic s fails ("dynamic load with unaligned indices")
    doff = jnp.asarray(
        rng.integers(0, nsel * nsel, (1, sc, BANKS, L)), jnp.int32)

    def kernel(sy_ref, sx_ref, *refs):
        band_refs = refs[:BANKS]
        doff_ref = refs[BANKS]
        out_refs = refs[BANKS + 1:]

        def body(s, _):
            y = sy_ref[0, 0, s]
            x = sx_ref[0, 0, s]
            for b in range(BANKS):
                sup = band_refs[b][0, pl.ds(y, sk), pl.ds(x, sk), :]
                d = doff_ref[0, s, b, :]
                dy = (d // nsel)[None, None, :]
                dx = (d - (d // nsel) * nsel)[None, None, :]
                acc = jnp.zeros((k, sk, L), jnp.float32)
                for m in range(nsel):
                    acc = jnp.where(dy == m, sup[m:m + k, :, :], acc)
                patch = jnp.zeros((k, k, L), jnp.float32)
                for m in range(nsel):
                    patch = jnp.where(dx == m, acc[:, m:m + k, :], patch)
                out_refs[b][pl.ds(s * k * k, k * k), :] = \
                    patch.reshape(k * k, L)
            return 0

        jax.lax.fori_loop(0, sc, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, 1),
        in_specs=[pl.BlockSpec((1, bh, bw, L), lambda i, j, *_: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
                  for _ in range(BANKS)]
        + [pl.BlockSpec((1, sc, BANKS, L), lambda i, j, *_: (0, 0, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((sc * k * k, L), lambda i, j, *_: (0, 0),
                                memory_space=pltpu.VMEM)
                   for _ in range(BANKS)],
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((sc * k * k, L), jnp.float32)
                   for _ in range(BANKS)],
    )(sy, sx, *bands, doff)

    # numpy reference
    worst = 0.0
    for b in range(BANKS):
        bnp = np.asarray(bands[b])[0]
        got = np.asarray(outs[b])
        for s in range(sc):
            y, x = int(sy[0, 0, s]), int(sx[0, 0, s])
            for lane in range(L):
                d = int(doff[0, s, b, lane])
                dy, dx = d // nsel, d % nsel
                ref_patch = bnp[y + dy:y + dy + k, x + dx:x + dx + k, lane]
                worst = max(worst, float(np.abs(
                    got[s * k * k:(s + 1) * k * k, lane].reshape(k, k)
                    - ref_patch).max()))
    print(f"P2 multi-band extract: maxerr {worst:.2e} "
          f"{'OK' if worst < 1e-6 else 'FAIL'}")


if __name__ == "__main__":
    for fn in (probe_bank_matmul, probe_multi_band_extract):
        try:
            fn()
        except Exception as e:
            print(f"{fn.__name__}: FAIL {type(e).__name__}: "
                  + str(e).split(chr(10))[0][:250])


def probe_full_wrapper(n_tiles=1, planes=1, refs=1, cpt=1, sc=8, n_sim=4,
                       k=8, nd=1, bh=40, bw=48, wiener=False, seed=0,
                       a_live=144, banks=None):
    """P3: the REAL fused_group_step_banked at small shapes, compiled vs
    interpret (the engine-level fault isolator: the 12x12 engine run
    crashes the worker; find the smallest faulting configuration)."""
    import numpy as np

    from lfbm5d_tpu.kernels.fused import fused_group_step_banked
    from lfbm5d_tpu.transforms import matrices as tm

    rng = np.random.default_rng(seed)
    banks = banks or BANKS
    nsel = 2 * nd + 1
    sent = nsel * nsel
    gpc = sc // n_sim
    n_meta = n_tiles * refs
    sk = k + 2 * nd

    bands_n = [jnp.asarray(rng.standard_normal(
        (n_tiles * planes, bh, bw, L)) * 50, jnp.float32)
        for _ in range(banks)]
    bands_b = [jnp.asarray(rng.standard_normal(
        (n_tiles * planes, bh, bw, L)) * 50, jnp.float32)
        for _ in range(banks)]
    sy = rng.integers(0, bh - sk + 1, (n_meta, cpt, sc))
    sx = rng.integers(0, bw - sk + 1, (n_meta, cpt, sc))
    syx = jnp.asarray(sy * 2048 + sx, jnp.int32)
    lvl = jnp.asarray(rng.integers(0, int(np.log2(n_sim)) + 1,
                                   (n_meta, cpt, gpc)), jnp.int32)
    doff = rng.integers(0, sent, (n_meta, cpt, sc, banks, L))
    msk = rng.random((n_meta, cpt, sc)) >= 0.2
    doff = jnp.asarray(np.where(msk[..., None, None], doff, sent), jnp.int32)
    sig = jnp.asarray([25.0] * planes, jnp.float32)
    f2 = tm.dct_matrix(k)
    k2f = jnp.asarray(np.kron(f2, f2), jnp.float32)
    a_pad = banks * L
    k4 = np.zeros((a_pad, a_pad))
    k4[:a_live, :a_live] = np.eye(a_live) + 0.01 * rng.standard_normal(
        (a_live, a_live))
    k4f = jnp.asarray(k4, jnp.float32)
    stf, sti = tm.stack_matrices("haar", n_sim)
    kai = jnp.asarray(np.asarray(tm.kaiser_window(k)).reshape(k, k, 1),
                      jnp.float32)
    kw = dict(bh=bh, bw=bw, k=k, nd=nd, n_sim=n_sim, lambda_3d=2.7,
              wiener=wiener, use_sd=False, a_live=a_live, planes=planes,
              refs=refs)

    def run(interp):
        nb_, db_ = fused_group_step_banked(
            bands_n, bands_b if wiener else None, syx, lvl, sig, doff,
            k2f, jnp.asarray(np.kron(f2, f2).T, jnp.float32),
            k4f, jnp.asarray(k4.T, jnp.float32),
            jnp.asarray(stf, jnp.float32), jnp.asarray(sti, jnp.float32),
            kai, interpret=interp, **kw)
        return [np.asarray(x) for x in nb_], [np.asarray(x) for x in db_]

    ni, di = run(True)
    nc, dc = run(False)
    err = max(float(np.abs(ni[b] - nc[b]).max()) for b in range(banks))
    errd = max(float(np.abs(di[b] - dc[b]).max()) for b in range(banks))
    tag = f"tiles={n_tiles} planes={planes} refs={refs} cpt={cpt} " \
          f"wiener={wiener}"
    ok = err < 1e-2 and errd < 1e-2
    print(f"P3 {'OK  ' if ok else 'FAIL'} {tag}: num {err:.2e} den {errd:.2e}",
          flush=True)
