"""Fully fused group kernel: extract -> 5D transform -> shrink -> inverse ->
weighted aggregation in ONE Pallas program.

Round-1 device traces showed the unfused pipeline spending ~40% of runtime on
XLA glue around the two kernels: 181k micro-fusions, group-tensor copies, and
a per-batch pad_maximum — all artifacts of materializing the 5D group tensors
in HBM between the extract kernel, the XLA transform chain, and the
accumulate kernel (docs/DESIGN_NOTES.md "Where the full-scale time goes").
This kernel keeps the whole group life cycle in VMEM:

  per (tile, plane, ref) x slot-chunk program:
    extract   — superpatch mux (kernels/extract.py design) into VMEM scratch
    transform — the probed in-kernel matmul chain (experiments/
                fused_chain_probe.py): kron 2D [64,64], angular kron [L,L]
                with L=128 (multi-free-dim dot_general minors must be
                128-multiples on this Mosaic build), per-group stack [N,N]
                selected from the power-of-two table by SMEM `lvl` scalars
    shrink    — HT / Wiener in float32 (bf16 comparisons unsupported), group
                weights via keepdims-reductions + ones-matmul lane smear
                (rank-1 reductions / dims-1 minor broadcasts crash Mosaic)
    inverse   — mirrored matmul chain
    aggregate — weighted rows written back to scratch, then the race-free
                sequential-grid RMW placement of kernels/accumulate.py into
                per-tile num/den band accumulators

Group tensors never touch HBM; per-step HBM traffic collapses to bands in +
bands out. Reference parity: the arithmetic is op-for-op the engine's XLA
group stage (pipeline/engine.py), itself oracle-exact; SURVEY.md §2.10 is the
binding spec.

Masked slots (stack padding beyond 2**lvl, dummy refs, tile padding) arrive
with their per-lane disparity index set to the SENTINEL nsel*nsel: the
extract mux then selects nothing (zero patch) and the in-kernel mask vector
is simply (doff < nsel*nsel) — no separate mask input. This is numerically
identical to the unfused path because the zero-padded stack matrices already
annihilate masked slots' data (transforms/matrices.py stack_matrices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lfbm5d_tpu.kernels.mux import mux_dydx as _mux_dydx
from lfbm5d_tpu.kernels.mux import mux_place as _mux_place
from lfbm5d_tpu.kernels.mux import mux_select as _mux_select

# Experiment-only stage ablation (experiments/fused_stage_budget.py): names
# of kernel stages to STUB OUT when building the kernel, to attribute device
# time per stage. Numerically wrong when non-empty — never set in production.
_ABLATE: frozenset = frozenset()


def _shrink_dtypes(dt):
    """(matmul accumulation dtype, shrink/weight math dtype) for group dtype."""
    if dt == jnp.float64:
        return jnp.float64, jnp.float64
    return jnp.float32, jnp.float32


_SQRT_HALF = 0.7071067811865476


def _stack_butterfly_fwd(x, lvls, mode, acc_dt, cdt):
    """Forward stack transform as lvl-gated butterflies (axis 1 of
    [GPC, N, P, L]).

    Haar and Hadamard are butterfly transforms; the matmul form pads their
    contraction dim (N=8/16) to the MXU's 128, making the stack matmul cost
    as much as the dense angular matmul for 16x fewer true FLOPs. Butterflies
    run the same transform as O(N log N) VPU adds. Stage j (block size 2**j)
    applies to a group iff its lvl >= j, reproducing stack_matrices' padded
    per-power-of-two semantics exactly: slots beyond 2**lvl arrive as exact
    zeros (sentinel-masked extraction), so skipped/untouched rows match the
    zero rows/columns of the padded matrices.
    """
    gpc, n, p, l = x.shape
    c = jnp.asarray(_SQRT_HALF, acc_dt)
    # per-group blocks with scalar-predicate selects: a vector gate
    # ([GPC] bool -> [GPC,1,1,1]) is an unsupported Mosaic shape cast;
    # scalar where over [N, P, L] blocks is the kernel's proven idiom.
    xs = [x[g].astype(acc_dt) for g in range(gpc)]
    for j in range(n.bit_length() - 1, 0, -1):
        m = 1 << j
        for g in range(gpc):
            xg = xs[g]
            if mode == "haar":
                # recursion: y = [H_{m/2} @ pair_sums, pair_diffs]
                head = xg[:m].reshape(m // 2, 2, p, l)
                a, b = head[:, 0], head[:, 1]
                new_head = jnp.concatenate([(a + b) * c, (a - b) * c], axis=0)
                x2 = (
                    jnp.concatenate([new_head, xg[m:]], axis=0)
                    if m < n else new_head
                )
            else:  # hadamard: y = [(top+bot), (top-bot)] / sqrt(2) per block
                blk = xg.reshape(n // m, m, p, l)
                a, b = blk[:, : m // 2], blk[:, m // 2 :]
                x2 = jnp.concatenate(
                    [(a + b) * c, (a - b) * c], axis=1
                ).reshape(n, p, l)
            xs[g] = jnp.where(lvls[g] >= j, x2, xg)
    return jnp.stack(xs).astype(cdt)


def _stack_butterfly_inv(x, lvls, mode, acc_dt, cdt):
    """Inverse (transpose) of _stack_butterfly_fwd. Hadamard is symmetric
    (H^-1 == H); Haar runs the reversed stage order with interleaving."""
    gpc, n, p, l = x.shape
    if mode == "hadamard":
        return _stack_butterfly_fwd(x, lvls, mode, acc_dt, cdt)
    c = jnp.asarray(_SQRT_HALF, acc_dt)
    xs = [x[g].astype(acc_dt) for g in range(gpc)]
    for j in range(1, n.bit_length()):
        m = 1 << j
        for g in range(gpc):
            xg = xs[g]
            s, d = xg[: m // 2], xg[m // 2 : m]
            inter = jnp.stack(
                [(s + d) * c, (s - d) * c], axis=1
            ).reshape(m, p, l)
            x2 = jnp.concatenate([inter, xg[m:]], axis=0) if m < n else inter
            xs[g] = jnp.where(lvls[g] >= j, x2, xg)
    return jnp.stack(xs).astype(cdt)


def _out_dtype(dt):
    """Band accumulator dtype: bf16 groups still accumulate in f32 (hundreds
    of RMW adds per pixel would lose ~3 significant bits per doubling in
    bf16; the num/den ratio does not cancel accumulation error)."""
    return jnp.float32 if jnp.dtype(dt) == jnp.bfloat16 else jnp.dtype(dt)


def _k2_pack(kk: int, n_sim: int) -> int:
    """Patches packed per spatial matmul (block-diagonal K2 batching).

    A bare [kk, kk] contraction (kk=64 for k=8) uses at most a quarter of
    the 128x128 MXU tile Mosaic pads it to. Packing `pack` patches
    block-diagonally into one dense [pack*kk, pack*kk] matrix fills the
    tile: same useful MACs, `pack`x the nominal throughput, bit-identical
    results (off-block products are exact zeros).

    MEASURED DEAD END (round 4, experiments/fused_stage_budget.py): at the
    matched launch shape pack=2 regressed the full kernel 54.1 -> 79.0 ms
    per launch-pair and cost a 494 s Mosaic compile — the [128, GPC, N/2,
    128] intermediate's layout path is far worse than the 4x MXU padding
    it saves; the f32 chain (3-pass bf16x3) is not MXU-throughput-bound at
    these shapes. Forced to 1; the packed code path is kept (it is the
    identity at pack=1 and documents the experiment).
    """
    return 1


def _make_kernel(k: int, nd: int, sc: int, l: int, n_sim: int, depth: int,
                 planes: int, refs: int, lambda_3d: float, wiener: bool,
                 use_sd: bool, a_live: int, dt, cdt,
                 stack_mode: str = "matmul", chunk_skip: bool = False):
    """dt: mux/scratch dtype (f32/f64); cdt: transform-chain dtype — bf16
    runs the matmuls at MXU bf16 rate with f32 accumulation while the
    extract/aggregate muxes stay in dt (full-bf16 muxing measured 1.75x
    SLOWER end-to-end: cast-produced bf16 stays unpacked in vregs)."""
    kk = k * k
    pack = _k2_pack(kk, n_sim)
    n2 = n_sim // pack
    pkk = pack * kk
    sk = k + 2 * nd
    nsel = 2 * nd + 1
    sent = nsel * nsel  # sentinel disparity index for masked slots
    gpc = sc // n_sim
    acc_dt, wdt = _shrink_dtypes(jnp.dtype(cdt))

    def kernel(*refs_args):
        nlc_ref = None
        if chunk_skip:
            nlc_ref, refs_args = refs_args[0], refs_args[1:]
        if wiener:
            (syx_ref, lvl_ref, sig_ref,
             band_n_ref, band_b_ref, doff_ref,
             k2f_ref, k2i_ref, k4f_ref, k4i_ref, stf_ref, sti_ref, kai_ref,
             num_ref, den_ref, scr_ref, scrb_ref) = refs_args
        else:
            (syx_ref, lvl_ref, sig_ref,
             band_n_ref, doff_ref,
             k2f_ref, k2i_ref, k4f_ref, k4i_ref, stf_ref, sti_ref, kai_ref,
             num_ref, den_ref, scr_ref, scrb_ref) = refs_args
            band_b_ref = None

        def slot_pos(s):
            """Unpack the slot's superpatch origin (y*2048 + x in SMEM —
            halves the scalar-prefetch footprint, which bounds tiles/call)."""
            v = syx_ref[i_meta, j, s]
            y = v // 2048
            return y, v - y * 2048

        ip = pl.program_id(0)  # grid dim0 ordered (tile, plane, ref)
        j = pl.program_id(1)
        i_meta = (ip // (refs * planes)) * refs + ip % refs  # (tile, ref)
        p_idx = (ip // refs) % planes

        # band output blocks are revisited across refs and chunks
        @pl.when((ip % refs == 0) & (j == 0))
        def _():
            num_ref[...] = jnp.zeros_like(num_ref)
            den_ref[...] = jnp.zeros_like(den_ref)

        def work():
            _work_body(syx_ref, lvl_ref, sig_ref, band_n_ref, band_b_ref,
                       doff_ref, k2f_ref, k2i_ref, k4f_ref, k4i_ref,
                       stf_ref, sti_ref, kai_ref, num_ref, den_ref,
                       scr_ref, scrb_ref, i_meta, j, p_idx, slot_pos)

        if chunk_skip:
            # flat-region chunk skipping: the engine compacts live groups to
            # the front chunks of each (tile, ref) and prefetches the live
            # chunk count; fully-dead chunks (all slots sentinel, exact-zero
            # contributions) skip the whole body. The zero-init above stays
            # unconditional.
            pl.when(j < nlc_ref[i_meta])(work)
        else:
            work()

    def _work_body(syx_ref, lvl_ref, sig_ref, band_n_ref, band_b_ref,
                   doff_ref, k2f_ref, k2i_ref, k4f_ref, k4i_ref, stf_ref,
                   sti_ref, kai_ref, num_ref, den_ref, scr_ref, scrb_ref,
                   i_meta, j, p_idx, slot_pos):
        # ---- extract: superpatch mux into scratch (kernels/extract.py) ----
        # Bands may arrive WIDER than the group dtype (bf16 mode keeps them
        # f32: Mosaic cannot do unaligned dynamic sublane slices on
        # (16,128)-tiled bf16 arrays — "index in dimension 2 must be a
        # multiple of 8" — so the dynamic superpatch load stays f32 and the
        # cast happens right after; the mux then runs at bf16 width).
        def extract_one(band_ref, out_ref, s):
            y, x = slot_pos(s)
            if "load" in _ABLATE:  # static-origin load (time attribution)
                y = x = 0
            sup = band_ref[0, pl.ds(y, sk), pl.ds(x, sk), :].astype(dt)
            d = doff_ref[0, s, :]  # [L]; sentinel rows select nothing -> 0
            patch = _mux_select(sup, d, k, nsel, sent)
            out_ref[pl.ds(s * kk, kk), :] = patch.reshape(kk, l)

        def ext_body(s, _):
            extract_one(band_n_ref, scr_ref, s)
            if wiener:
                extract_one(band_b_ref, scrb_ref, s)
            return 0

        if "ext" not in _ABLATE:
            jax.lax.fori_loop(0, sc, ext_body, 0)

        # ---- per-group stack matrices from SMEM lvl scalars ----
        def sel(tab_ref, lv):
            m = jnp.zeros((n_sim, n_sim), cdt)
            for d_ in range(depth):
                m = jnp.where(lv == d_, tab_ref[d_], m)
            return m

        lvls = [lvl_ref[i_meta, j, g] for g in range(gpc)]
        if stack_mode == "matmul":
            m5f = jnp.stack([sel(stf_ref, lv) for lv in lvls])  # [GPC, N, N]
            m5i = jnp.stack([sel(sti_ref, lv) for lv in lvls])

        # ---- transform chain (probed in experiments/fused_chain_probe.py;
        # op order matches transforms.flat.forward_flat/inverse_flat) ----
        def dg(a, b, dims):
            r = jax.lax.dot_general(a, b, dims,
                                    preferred_element_type=acc_dt)
            return r.astype(cdt)

        def stack_fwd(spec):
            if "stack" in _ABLATE:
                return spec
            if stack_mode == "matmul":
                return dg(m5f, spec, (((2,), (1,)), ((0,), (0,))))
            return _stack_butterfly_fwd(spec, lvls, stack_mode, acc_dt, cdt)

        def stack_inv(spec):
            if "stack" in _ABLATE:
                return spec
            if stack_mode == "matmul":
                return dg(m5i, spec, (((2,), (1,)), ((0,), (0,))))
            return _stack_butterfly_inv(spec, lvls, stack_mode, acc_dt, cdt)

        def fwd(g4):
            if "k2" in _ABLATE:
                # [GPC, N, P, L] stays put: no k2 matmul, no layout swap
                spec = g4
                if "k4" not in _ABLATE:
                    spec = dg(spec, k4f_ref[...], (((3,), (0,)), ((), ())))
                return stack_fwd(spec)
            # pack-reshape is a row-major no-op: n = n2*pack + b maps the
            # packed row b*kk + p straight back by the inverse reshape
            g4p = g4.reshape(gpc, n2, pkk, l)
            spec = dg(k2f_ref[...], g4p, (((1,), (2,)), ((), ())))
            if "k4" not in _ABLATE:
                spec = dg(spec, k4f_ref[...], (((3,), (0,)), ((), ())))
            spec = jnp.transpose(spec, (1, 2, 0, 3))  # [GPC, N2, PKK, L]
            if "xtr" in _ABLATE:
                # marginal-cost probe: one extra transpose round trip
                spec = jnp.transpose(jnp.transpose(spec, (2, 0, 1, 3)),
                                     (1, 2, 0, 3))
            return stack_fwd(spec.reshape(gpc, n_sim, kk, l))

        def inv(spec):
            est = stack_inv(spec)
            if "k4" not in _ABLATE:
                est = dg(est, k4i_ref[...], (((3,), (0,)), ((), ())))
            if "k2" in _ABLATE:
                return est  # already [GPC, N, P, L]
            estp = est.reshape(gpc, n2, pkk, l)
            est = dg(k2i_ref[...], estp, (((1,), (2,)), ((), ())))
            est = jnp.transpose(est, (1, 2, 0, 3))  # [GPC, N2, PKK, L]
            return est.reshape(gpc, n_sim, kk, l)

        def smear(x_l):
            """[GPC, 1, 1, L] per-lane partial sums -> lane-uniform totals."""
            ones_l = jnp.ones((l, l), wdt)
            return jax.lax.dot_general(
                x_l, ones_l, (((3,), (0,)), ((), ())),
                preferred_element_type=wdt)

        g_n = scr_ref[...].reshape(gpc, n_sim, kk, l).astype(cdt)
        sig = sig_ref[p_idx].astype(wdt)

        if "shrink" in _ABLATE:
            # skip the elementwise shrink/weight math only; keep both fwd
            # chains live (0*spec_b defeats DCE without measurable cost)
            filt = fwd(g_n)
            if wiener:
                g_b = scrb_ref[...].reshape(gpc, n_sim, kk, l).astype(cdt)
                filt = filt + fwd(g_b) * jnp.asarray(0.0, cdt)
            wgt = jnp.ones((gpc, 1, 1, l), wdt)
        elif wiener:
            g_b = scrb_ref[...].reshape(gpc, n_sim, kk, l).astype(cdt)
            spec_n = fwd(g_n).astype(wdt)
            spec_b = fwd(g_b).astype(wdt)
            b2 = spec_b * spec_b
            wien = b2 / (b2 + sig * sig)
            filt = (spec_n * wien).astype(cdt)
            ws_l = jnp.sum(wien * wien, axis=(1, 2), keepdims=True)
            wsum = smear(ws_l)  # [GPC, 1, 1, L]
            wgt = jnp.where(
                wsum > 0,
                1.0 / (sig * sig * jnp.maximum(wsum, 1e-30)),
                jnp.asarray(1.0, wdt),
            )
        else:
            thr = (lambda_3d * sig).astype(wdt)
            spec = fwd(g_n).astype(wdt)
            keep = (jnp.abs(spec) >= thr).astype(wdt)
            filt = (spec * keep).astype(cdt)
            nnz = smear(jnp.sum(keep, axis=(1, 2), keepdims=True))
            wgt = jnp.where(
                nnz > 0,
                1.0 / (sig * sig * jnp.maximum(nnz, 1.0)),
                jnp.asarray(1.0, wdt),
            )

        est = inv(filt).astype(dt)  # back to the mux dtype for aggregation

        if use_sd:
            # SD aggregation weights (SURVEY.md §2.9 useSD): per-group sample
            # variance of the estimate over its 2**lvl * A * k^2 live values
            # (masked slots and dead lanes contribute exact zeros).
            ef = est.astype(wdt)
            s1 = smear(jnp.sum(ef, axis=(1, 2), keepdims=True))
            s2 = smear(jnp.sum(ef * ef, axis=(1, 2), keepdims=True))
            cnt = jnp.stack([
                jnp.full((1, 1, l), 1.0, wdt) * jnp.asarray(
                    float(a_live * kk), wdt
                ) * jnp.exp2(lv.astype(wdt))
                for lv in lvls
            ])  # [GPC, 1, 1, L]
            mean = s1 / cnt
            var = s2 / cnt - mean * mean
            wgt = jnp.where(
                var > 0, 1.0 / jnp.maximum(var, 1e-30), jnp.asarray(1.0, wdt)
            )

        # ---- weighted rows back to scratch: num = est * wgt * mask * kaiser.
        # The den side is DEFERRED: den = sum_slots wgt*mask * kaiser placed
        # at the slot's per-lane offset == conv(W, kaiser) where W scatters
        # just the per-slot weight scalar at the patch origin. The kernel
        # therefore emits W in the den band (a (2nd+1)^2 one-hot RMW per slot
        # instead of a k x k placed-patch mux + RMW — ~40% of the aggregation
        # VPU work) and the engine applies ONE separable Kaiser conv to the
        # global den accumulator at finalize (engine._finalize_acc).
        d_all = doff_ref[0, :, :]  # [sc, L]
        mskv = (d_all < sent).astype(wdt).reshape(gpc, n_sim, 1, l)
        wm = (wgt * mskv).astype(dt)  # [GPC, N, 1, L]
        kai_b = jnp.broadcast_to(kai_ref[...], (k, k, l)).reshape(1, 1, kk, l)
        scr_ref[...] = (est * wm * kai_b).reshape(sc * kk, l)
        # per-slot weight rows [sc, L] reuse the head of the second scratch:
        # in Wiener mode the basic group it held has already been consumed
        # by fwd(g_b).
        scrb_ref[pl.ds(0, sc), :] = wm.reshape(sc, l)

        # ---- aggregation: per-lane placement + race-free RMW ----
        out_dt = _out_dtype(dt)

        iy_oh = jax.lax.broadcasted_iota(jnp.int32, (nsel, nsel, l), 0)
        ix_oh = jax.lax.broadcasted_iota(jnp.int32, (nsel, nsel, l), 1)

        def agg_body(s, _):
            y, x = slot_pos(s)
            d = doff_ref[0, s, :]
            # sentinel -> clamped offsets placing mask-zeroed values
            dy, dx = _mux_dydx(d, nsel, sent)
            pn = scr_ref[pl.ds(s * kk, kk), :].reshape(k, k, l)
            sup_n = _mux_place(pn, dy, dx, k, sk, nsel).astype(out_dt)
            cur_n = num_ref[0, pl.ds(y, sk), pl.ds(x, sk), :]
            num_ref[0, pl.ds(y, sk), pl.ds(x, sk), :] = cur_n + sup_n
            # deferred den: scatter the slot's weight scalar through a
            # (2nd+1)^2 one-hot at the per-lane placement offset; masked
            # slots carry weight 0 so the sentinel clamp is invisible.
            w_row = scrb_ref[pl.ds(s, 1), :]  # [1, L]
            sup_w = jnp.where(
                (iy_oh == dy) & (ix_oh == dx), w_row.reshape(1, 1, l), 0
            ).astype(out_dt)
            cur_d = den_ref[0, pl.ds(y, nsel), pl.ds(x, nsel), :]
            den_ref[0, pl.ds(y, nsel), pl.ds(x, nsel), :] = cur_d + sup_w
            return 0

        if "agg" not in _ABLATE:
            jax.lax.fori_loop(0, sc, agg_body, 0)

    return kernel


def fused_group_step(
    bands_n, bands_b, syx, lvl, sig, doff,
    k2f, k2i, k4f, k4i, stf, sti, kaiser,
    *, bh: int, bw: int, k: int, nd: int, n_sim: int,
    lambda_3d: float, wiener: bool, use_sd: bool, a_live: int,
    planes: int, refs: int, interpret: bool = False,
    stack_mode: str = "matmul", nlc=None,
):
    """One fused group-stage pass over all tiles of a ref-block.

    nlc: optional [n_tiles*refs] int32 LIVE CHUNK counts (flat-region
    compaction): the engine orders live groups first within each (tile,
    ref); chunks >= nlc[i_meta] are fully sentinel-masked and the kernel
    skips their body entirely (their contributions are exact zeros).

    stack_mode: 'matmul' applies the stf/sti stack tables by batched matmul;
    'haar' / 'hadamard' run the stack transform as lvl-gated in-kernel
    butterflies instead (same results up to float reassociation) — the
    matmul form pads the N=8/16 contraction to the MXU's 128 and costs as
    much as the dense angular matmul (~1/3 of the chain's padded FLOPs).

    bands_n/bands_b: [n_tiles*planes, bh, bw, L] noisy / basic pixel slabs,
      SAIs on lanes (L=128 compiled; any width in interpret mode). bands_b
      is required iff wiener.
    syx: [n_tiles*refs, n_chunks, Sc] int32 packed superpatch origins
      (y * 2048 + x, band-relative; SMEM scalar prefetch).
    lvl:   [n_tiles*refs, n_chunks, Sc//n_sim] int32 per-group stack levels.
    sig:   [planes] float per-channel sigma (SMEM).
    doff:  [n_tiles*refs, n_chunks, Sc, L] int32 per-lane disparity indices;
      masked slots carry the sentinel (2nd+1)**2 on every lane.
    k2f/k2i: [k*k, k*k]; k4f/k4i: [L, L]; stf/sti: [depth, N, N] stack
      tables; kaiser: [k, k, 1]. All in the group dtype.
    Returns (num_bands, den_bands): [n_tiles*planes, bh, bw, L], accumulated
    across the full refs x chunks grid (race-free sequential RMW). The den
    band holds the DEFERRED weight field W (per-slot weight scalars at the
    placed patch origins, pre-Kaiser): the true denominator is the separable
    Kaiser convolution of W, applied once to the global accumulator by
    engine._finalize_acc.
    """
    # The in-kernel angular matmul contracts the MATRIX'S LEADING axis
    # (out[..., q] = sum_L spec[..., L] * M[L, q]) — the only probed-safe
    # dot_general form — while transforms.flat's einsum "QL,bnpL->bnpQ"
    # contracts the trailing axis. Transpose here so callers pass the same
    # matrices as forward_flat/inverse_flat. (Caught on TPU: angular DCTs
    # are not symmetric for grids > 2x2.)
    k4f = k4f.T
    k4i = k4i.T

    nb, bh_, bw_, l = bands_n.shape
    n_meta, n_chunks, sc = syx.shape
    n_tiles = nb // planes
    assert nb == n_tiles * planes and n_meta == n_tiles * refs
    assert sc % n_sim == 0
    depth = stf.shape[0]
    dt = bands_n.dtype  # mux/scratch dtype (f32, or f64 in interpret tests)
    cdt = k2f.dtype  # transform-chain dtype (bf16 in 'pallas_bf16' mode)
    nb2 = n_tiles * planes * refs
    kk = k * k

    # block-diagonal K2 packing (see _k2_pack): widen the spatial matrices
    # once on the host; the kernel's pack-reshapes are row-major no-ops
    pack = _k2_pack(kk, n_sim)
    if pack > 1:
        eye_p = jnp.eye(pack, dtype=k2f.dtype)
        k2f = jnp.kron(eye_p, k2f)
        k2i = jnp.kron(eye_p, k2i)

    chunk_skip = nlc is not None
    kernel = _make_kernel(
        k, nd, sc, l, n_sim, depth, planes, refs, lambda_3d, wiener, use_sd,
        a_live, dt, cdt, stack_mode, chunk_skip,
    )

    def _band_idx(i, j, *_):
        return (i // refs, 0, 0, 0)

    def _doff_idx(i, j, *_):
        return (((i // (refs * planes)) * refs + i % refs) * n_chunks + j,
                0, 0)

    band_spec = pl.BlockSpec((1, bh, bw, l), _band_idx,
                             memory_space=pltpu.VMEM)
    in_specs = [band_spec]
    if wiener:
        in_specs.append(band_spec)
    in_specs.append(
        pl.BlockSpec((1, sc, l), _doff_idx, memory_space=pltpu.VMEM)
    )

    def const_spec(shape):
        rank = len(shape)
        return pl.BlockSpec(
            shape, lambda i, j, *_: (0,) * rank, memory_space=pltpu.VMEM
        )

    in_specs += [
        const_spec((pack * kk, pack * kk)), const_spec((pack * kk, pack * kk)),
        const_spec((l, l)), const_spec((l, l)),
        const_spec((depth, n_sim, n_sim)), const_spec((depth, n_sim, n_sim)),
        const_spec((k, k, 1)),
    ]

    out_spec = pl.BlockSpec((1, bh, bw, l), lambda i, j, *_: (i // refs, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    # two scratches always: [noisy group -> weighted num rows] and
    # [basic group (wiener) -> den rows]
    scratch = [pltpu.VMEM((sc * kk, l), dt), pltpu.VMEM((sc * kk, l), dt)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4 if chunk_skip else 3,
        grid=(nb2, n_chunks),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        scratch_shapes=scratch,
    )

    args = ([nlc] if chunk_skip else []) + [syx, lvl, sig, bands_n]
    if wiener:
        args.append(bands_b)
    args += [
        doff.reshape(n_meta * n_chunks, sc, l),
        k2f, k2i, k4f, k4i, stf, sti, kaiser,
    ]

    out_dt = _out_dtype(dt)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * planes, bh, bw, l), out_dt),
            jax.ShapeDtypeStruct((n_tiles * planes, bh, bw, l), out_dt),
        ],
        interpret=interpret,
    )(*args)


def _make_banked_kernel(k: int, nd: int, sc: int, l: int, n_sim: int,
                        depth: int, planes: int, refs: int, banks: int,
                        lambda_3d: float, wiener: bool, use_sd: bool,
                        a_live: int, dt, cdt, stack_mode: str = "matmul"):
    """Banked fused kernel for angular grids spanning several 128-lane banks
    (probed in experiments/fused_banked_probe.py): per-bank band refs and
    scratches, a bank-looped angular matmul (banks^2 [*,L]x[L,L] products),
    cross-bank weight reductions, per-bank aggregation."""
    kk = k * k
    sk = k + 2 * nd
    nsel = 2 * nd + 1
    sent = nsel * nsel
    gpc = sc // n_sim
    acc_dt, wdt = _shrink_dtypes(jnp.dtype(cdt))
    nb_band = banks * (2 if wiener else 1)

    def kernel(*refs_args):
        i0 = 0
        syx_ref, lvl_ref, sig_ref = refs_args[i0:i0 + 3]; i0 += 3
        band_n_refs = refs_args[i0:i0 + banks]; i0 += banks
        if wiener:
            band_b_refs = refs_args[i0:i0 + banks]; i0 += banks
        doff_ref = refs_args[i0]; i0 += 1
        k2f_ref, k2i_ref = refs_args[i0:i0 + 2]; i0 += 2
        k4f_blk = refs_args[i0:i0 + banks * banks]; i0 += banks * banks
        k4i_blk = refs_args[i0:i0 + banks * banks]; i0 += banks * banks
        stf_ref, sti_ref, kai_ref = refs_args[i0:i0 + 3]; i0 += 3
        num_refs = refs_args[i0:i0 + banks]; i0 += banks
        den_refs = refs_args[i0:i0 + banks]; i0 += banks
        scr_refs = refs_args[i0:i0 + banks]; i0 += banks
        scrb_refs = refs_args[i0:i0 + banks]; i0 += banks

        ip = pl.program_id(0)  # (tile, plane, ref)
        j = pl.program_id(1)
        i_meta = (ip // (refs * planes)) * refs + ip % refs
        p_idx = (ip // refs) % planes

        @pl.when((ip % refs == 0) & (j == 0))
        def _():
            for b in range(banks):
                num_refs[b][...] = jnp.zeros_like(num_refs[b])
                den_refs[b][...] = jnp.zeros_like(den_refs[b])

        def slot_pos(s):
            v = syx_ref[i_meta, j, s]
            y = v // 2048
            return y, v - y * 2048

        def extract_one(band_ref, out_ref, s, b):
            y, x = slot_pos(s)
            sup = band_ref[0, pl.ds(y, sk), pl.ds(x, sk), :].astype(dt)
            d = doff_ref[0, b * sc + s, :]
            patch = _mux_select(sup, d, k, nsel, sent)
            out_ref[pl.ds(s * kk, kk), :] = patch.reshape(kk, l)

        def ext_body(s, _):
            for b in range(banks):
                extract_one(band_n_refs[b], scr_refs[b], s, b)
                if wiener:
                    extract_one(band_b_refs[b], scrb_refs[b], s, b)
            return 0

        jax.lax.fori_loop(0, sc, ext_body, 0)

        def sel(tab_ref, lv):
            m = jnp.zeros((n_sim, n_sim), cdt)
            for d_ in range(depth):
                m = jnp.where(lv == d_, tab_ref[d_], m)
            return m

        lvls = [lvl_ref[i_meta, j, g] for g in range(gpc)]
        if stack_mode == "matmul":
            m5f = jnp.stack([sel(stf_ref, lv) for lv in lvls])
            m5i = jnp.stack([sel(sti_ref, lv) for lv in lvls])

        def dg(a_, b_, dims):
            r = jax.lax.dot_general(a_, b_, dims,
                                    preferred_element_type=acc_dt)
            return r.astype(cdt)

        def stack_fwd(sp_):
            if stack_mode == "matmul":
                return dg(m5f, sp_, (((2,), (1,)), ((0,), (0,))))
            return _stack_butterfly_fwd(sp_, lvls, stack_mode, acc_dt, cdt)

        def stack_inv(sp_):
            if stack_mode == "matmul":
                return dg(m5i, sp_, (((2,), (1,)), ((0,), (0,))))
            return _stack_butterfly_inv(sp_, lvls, stack_mode, acc_dt, cdt)

        def fwd(g_list):
            s2 = [dg(k2f_ref[...], g, (((1,), (2,)), ((), ())))
                  for g in g_list]  # per bank [P, gpc, N, L]
            s4 = []
            for bo in range(banks):
                acc = dg(s2[0], k4f_blk[0 * banks + bo][...],
                         (((3,), (0,)), ((), ())))
                for bi in range(1, banks):
                    acc = acc + dg(s2[bi], k4f_blk[bi * banks + bo][...],
                                   (((3,), (0,)), ((), ())))
                s4.append(acc)
            out = []
            for bo in range(banks):
                sp_ = jnp.transpose(s4[bo], (1, 2, 0, 3))  # [gpc, N, P, L]
                out.append(stack_fwd(sp_))
            return out

        def inv(spec_list):
            s5 = [stack_inv(sp_) for sp_ in spec_list]  # [gpc, N, P, L]
            out = []
            for bo in range(banks):
                acc = dg(s5[0], k4i_blk[0 * banks + bo][...],
                         (((3,), (0,)), ((), ())))
                for bi in range(1, banks):
                    acc = acc + dg(s5[bi], k4i_blk[bi * banks + bo][...],
                                   (((3,), (0,)), ((), ())))
                est = dg(k2i_ref[...], acc, (((1,), (2,)), ((), ())))
                out.append(jnp.transpose(est, (1, 2, 0, 3)))
            return out

        def smear(x_l):
            ones_l = jnp.ones((l, l), wdt)
            return jax.lax.dot_general(
                x_l, ones_l, (((3,), (0,)), ((), ())),
                preferred_element_type=wdt)

        g_n = [scr_refs[b][...].reshape(gpc, n_sim, kk, l).astype(cdt)
               for b in range(banks)]
        sig = sig_ref[p_idx].astype(wdt)

        if wiener:
            g_b = [scrb_refs[b][...].reshape(gpc, n_sim, kk, l).astype(cdt)
                   for b in range(banks)]
            spec_n = [s.astype(wdt) for s in fwd(g_n)]
            spec_b = [s.astype(wdt) for s in fwd(g_b)]
            filt, ws_l = [], None
            for b in range(banks):
                b2 = spec_b[b] * spec_b[b]
                wien = b2 / (b2 + sig * sig)
                filt.append((spec_n[b] * wien).astype(cdt))
                part = jnp.sum(wien * wien, axis=(1, 2), keepdims=True)
                ws_l = part if ws_l is None else ws_l + part
            wsum = smear(ws_l)
            wgt = jnp.where(
                wsum > 0, 1.0 / (sig * sig * jnp.maximum(wsum, 1e-30)),
                jnp.asarray(1.0, wdt),
            )
        else:
            thr = (lambda_3d * sig).astype(wdt)
            spec = [s.astype(wdt) for s in fwd(g_n)]
            filt, nnz_l = [], None
            for b in range(banks):
                keep = (jnp.abs(spec[b]) >= thr).astype(wdt)
                filt.append((spec[b] * keep).astype(cdt))
                part = jnp.sum(keep, axis=(1, 2), keepdims=True)
                nnz_l = part if nnz_l is None else nnz_l + part
            nnz = smear(nnz_l)
            wgt = jnp.where(
                nnz > 0, 1.0 / (sig * sig * jnp.maximum(nnz, 1.0)),
                jnp.asarray(1.0, wdt),
            )

        est = [e.astype(dt) for e in inv(filt)]

        if use_sd:
            s1_l = s2_l = None
            for b in range(banks):
                ef = est[b].astype(wdt)
                p1 = jnp.sum(ef, axis=(1, 2), keepdims=True)
                p2 = jnp.sum(ef * ef, axis=(1, 2), keepdims=True)
                s1_l = p1 if s1_l is None else s1_l + p1
                s2_l = p2 if s2_l is None else s2_l + p2
            s1 = smear(s1_l)
            s2 = smear(s2_l)
            cnt = jnp.stack([
                jnp.full((1, 1, l), 1.0, wdt) * jnp.asarray(
                    float(a_live * kk), wdt
                ) * jnp.exp2(lv.astype(wdt))
                for lv in lvls
            ])
            mean = s1 / cnt
            var = s2 / cnt - mean * mean
            wgt = jnp.where(
                var > 0, 1.0 / jnp.maximum(var, 1e-30), jnp.asarray(1.0, wdt)
            )

        d0 = doff_ref[0, :sc, :]  # bank-0 rows; masks are slot-uniform
        mskv = (d0 < sent).astype(wdt).reshape(gpc, n_sim, 1, l)
        wm = (wgt * mskv).astype(dt)
        kai_b = jnp.broadcast_to(kai_ref[...], (k, k, l)).reshape(1, 1, kk, l)
        for b in range(banks):
            scr_refs[b][...] = (est[b] * wm * kai_b).reshape(sc * kk, l)
        # deferred den (see fused_group_step): per-slot weight rows only;
        # the Kaiser spread is one separable conv at finalize. Weights are
        # slot-uniform across banks, so one copy in scratch 0 serves all.
        scrb_refs[0][pl.ds(0, sc), :] = wm.reshape(sc, l)

        out_dt = _out_dtype(dt)

        iy_oh = jax.lax.broadcasted_iota(jnp.int32, (nsel, nsel, l), 0)
        ix_oh = jax.lax.broadcasted_iota(jnp.int32, (nsel, nsel, l), 1)

        def agg_body(s, _):
            y, x = slot_pos(s)
            w_row = scrb_refs[0][pl.ds(s, 1), :].reshape(1, 1, l)
            for b in range(banks):
                d = doff_ref[0, b * sc + s, :]
                dy, dx = _mux_dydx(d, nsel, sent)
                pn = scr_refs[b][pl.ds(s * kk, kk), :].reshape(k, k, l)
                sup_n = _mux_place(pn, dy, dx, k, sk, nsel).astype(out_dt)
                cur_n = num_refs[b][0, pl.ds(y, sk), pl.ds(x, sk), :]
                num_refs[b][0, pl.ds(y, sk), pl.ds(x, sk), :] = cur_n + sup_n
                sup_w = jnp.where(
                    (iy_oh == dy) & (ix_oh == dx), w_row, 0
                ).astype(out_dt)
                cur_d = den_refs[b][0, pl.ds(y, nsel), pl.ds(x, nsel), :]
                den_refs[b][0, pl.ds(y, nsel), pl.ds(x, nsel), :] = cur_d + sup_w
            return 0

        jax.lax.fori_loop(0, sc, agg_body, 0)

    return kernel


def fused_group_step_banked(
    bands_n, bands_b, syx, lvl, sig, doff,
    k2f, k2i, k4f, k4i, stf, sti, kaiser,
    *, bh: int, bw: int, k: int, nd: int, n_sim: int,
    lambda_3d: float, wiener: bool, use_sd: bool, a_live: int,
    planes: int, refs: int, interpret: bool = False,
    stack_mode: str = "matmul",
):
    """Banked fused pass: like fused_group_step for angular grids spanning
    `banks = len(bands_n)` 128-lane banks.

    bands_n/bands_b: LISTS of per-bank [n_tiles*planes, bh, bw, L] slabs.
    doff: [n_tiles*refs, n_chunks, Sc, banks, L] (sentinel rows sentinel in
    EVERY bank). k4f/k4i: the FULL [banks*L, banks*L] angular matrices in
    forward_flat orientation (blocks are transposed internally). Returns
    (num_bands, den_bands): LISTS of per-bank [n_tiles*planes, bh, bw, L];
    den bands hold the DEFERRED weight field W (see fused_group_step) —
    finalize applies the separable Kaiser conv.
    """
    banks = len(bands_n)
    nb, bh_, bw_, l = bands_n[0].shape
    n_meta, n_chunks, sc, banks_d, l_d = doff.shape
    assert banks_d == banks and l_d == l
    # kernel-side layout: bank-major rows [banks*sc, L] so every in-kernel
    # read is the proven single-bank row pattern (a per-slot [s, b, :] read
    # from a 4D block faulted the TPU worker in compiled mode)
    doff = jnp.moveaxis(doff, 3, 2)  # [n_meta, cpt, banks, sc, L]
    n_tiles = nb // planes
    assert nb == n_tiles * planes and n_meta == n_tiles * refs
    assert sc % n_sim == 0
    depth = stf.shape[0]
    dt = bands_n[0].dtype
    cdt = k2f.dtype
    nb2 = n_tiles * planes * refs
    kk = k * k

    # blocks of the TRANSPOSED matrices (the in-kernel dot contracts the
    # matrix's leading axis; see fused_group_step)
    k4f_t = k4f.T
    k4i_t = k4i.T
    k4f_blocks = [k4f_t[bi * l:(bi + 1) * l, bo * l:(bo + 1) * l]
                  for bi in range(banks) for bo in range(banks)]
    k4i_blocks = [k4i_t[bi * l:(bi + 1) * l, bo * l:(bo + 1) * l]
                  for bi in range(banks) for bo in range(banks)]

    kernel = _make_banked_kernel(
        k, nd, sc, l, n_sim, depth, planes, refs, banks, lambda_3d, wiener,
        use_sd, a_live, dt, cdt, stack_mode,
    )

    def _band_idx(i, j, *_):
        return (i // refs, 0, 0, 0)

    def _doff_idx(i, j, *_):
        return (((i // (refs * planes)) * refs + i % refs) * n_chunks + j,
                0, 0)

    band_spec = pl.BlockSpec((1, bh, bw, l), _band_idx,
                             memory_space=pltpu.VMEM)

    def const_spec(shape):
        rank = len(shape)
        return pl.BlockSpec(
            shape, lambda i, j, *_: (0,) * rank, memory_space=pltpu.VMEM
        )

    in_specs = [band_spec] * (banks * (2 if wiener else 1))
    in_specs.append(
        pl.BlockSpec((1, banks * sc, l), _doff_idx, memory_space=pltpu.VMEM)
    )
    in_specs += [const_spec((kk, kk))] * 2
    in_specs += [const_spec((l, l))] * (2 * banks * banks)
    in_specs += [const_spec((depth, n_sim, n_sim))] * 2
    in_specs += [const_spec((k, k, 1))]

    out_spec = pl.BlockSpec((1, bh, bw, l), lambda i, j, *_: (i // refs, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((sc * kk, l), dt) for _ in range(2 * banks)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb2, n_chunks),
        in_specs=in_specs,
        out_specs=[out_spec] * (2 * banks),
        scratch_shapes=scratch,
    )

    args = [syx, lvl, sig] + list(bands_n)
    if wiener:
        args += list(bands_b)
    args += [doff.reshape(n_meta * n_chunks, banks * sc, l)]
    args += [k2f, k2i] + k4f_blocks + k4i_blocks + [stf, sti, kaiser]

    out_dt = _out_dtype(dt)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        out_shape=[jax.ShapeDtypeStruct((n_tiles * planes, bh, bw, l), out_dt)
                   for _ in range(2 * banks)],
        interpret=interpret,
    )(*args)
    return list(outs[:banks]), list(outs[banks:])
