"""Two-step HT -> Wiener LFBM5D pipeline, dense and jitted (reference run_bm5d).

Design stance (SURVEY.md §7): the C++ reference is patch-at-a-time and
branch-heavy; this pipeline is grid-at-a-time and dense. One jitted function
per step processes every reference patch of every reference SAI:

  lax.scan over reference SAIs
    -> displacement-stacked self-BM distances at the whole reference grid
    -> stable masked top-N + power-of-two truncation (ops.match)
    -> lax.scan over SAIs: dense disparity-argmin maps, gathered at the
       similar-patch positions (ops.distances.cross_argmin)
    -> lax.fori_loop over fixed-size reference-patch chunks:
         one big gather builds the [chunk, N, aH, aW, k, k, C] 5D group
         -> separable transform (einsum/MXU) -> HT or Wiener shrinkage
         -> inverse transform -> Kaiser*weight scatter-add into the
         per-SAI numerator/denominator accumulators.

Every shape is static; variable group sizes are realized by per-group
zero-padded stack matrices and masked aggregation weights, never by dynamic
shapes. The "checkpoint" contract of the reference (basic LF written to disk
between the two steps, SURVEY.md §5.4) lives in the CLI driver; here the basic
estimate is simply the HT step's output array.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from lfbm5d_tpu.config import DenoiseParams, StepParams
from lfbm5d_tpu.lf.color import channel_sigma_scales, rgb_to_space, space_to_rgb
from lfbm5d_tpu.lf.pad import ind_initialize, pad_lf, ref_sai_grid
from lfbm5d_tpu.ops.distances import (
    center_index,
    cross_argmin,
    displacements,
    self_distances,
)
from lfbm5d_tpu.ops.flat import fallback_shrink_2d, flat_ref_mask
from lfbm5d_tpu.ops.match import select_similar
from lfbm5d_tpu.ops.shrinkage import ht_shrink, sd_weight, wiener_shrink
from lfbm5d_tpu.transforms import matrices as tm
from lfbm5d_tpu.transforms.apply import GroupTransforms, forward_5d, inverse_5d


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@lru_cache(maxsize=None)
def _build_step(
    sp: StepParams,
    lambda_3d: float,
    a_h: int,
    a_w: int,
    h: int,
    w: int,
    c: int,
    chunk: int,
    wiener: bool,
    dtype: str = "float32",
):
    """Build one filtering step for a fixed geometry and parameter block.

    Returns the raw (unjitted, composable) fn(noisy_p, match_p, sigma_c,
    basic_p) -> (num, den), operating on flattened-SAI padded arrays
    [A, Hp, Wp, C]. Use `_build_step_jit` for a standalone jitted version.
    """
    k, n, nd, n_sim, pad = sp.k, sp.n_search, sp.n_disp, sp.n_sim, sp.pad
    a = a_h * a_w
    ys = ind_initialize(h, k, sp.p) + pad
    xs = ind_initialize(w, k, sp.p) + pad
    t = len(ys) * len(xs)
    chunk = min(chunk, t)
    n_chunks = _cdiv(t, chunk)
    t_pad = n_chunks * chunk

    dt = jnp.dtype(dtype)
    pos_y = jnp.asarray(np.repeat(ys, len(xs)).astype(np.int32))
    pos_x = jnp.asarray(np.tile(xs, len(ys)).astype(np.int32))
    disp_self = jnp.asarray(displacements(n))
    disp_ang = jnp.asarray(displacements(nd))
    c_ang = center_index(nd)
    kaiser = jnp.asarray(tm.kaiser_window(k), dtype=dt)
    gt = GroupTransforms.build(sp, a_h, a_w, dtype=dt)
    ku = jnp.arange(k)[:, None]
    kv = jnp.arange(k)[None, :]
    a_b = jnp.arange(a)[None, None, :, None, None]

    def step(noisy_p, match_p, sigma_c, basic_p):
        match0 = match_p[..., 0]  # [A, Hp, Wp]
        fmask = None
        if sp.flat_tau > 0:
            # angular-redundancy mask (ops/flat.py): redundant positions
            # build no group; den==0 pixels take the angular-mean fallback
            # at finalize. Computed on the NOISY LF in both steps (the
            # basic estimate's residual noise is far below sigma, which
            # breaks the threshold's anchor — see ops/flat.py).
            fmask = flat_ref_mask(noisy_p[..., 0], ys, xs, k, sp.flat_tau,
                                  sigma_c[0])

        def ref_pass(carry, r):
            num, den = carry
            ref0 = match0[r]
            d_self = self_distances(ref0, ys, xs, k, n)  # [T, Ds]
            order, lvl, mask = select_similar(d_self, n, sp.tau_match, n_sim)
            if sp.flat_tau > 0:
                mask = mask & ~fmask[:, None]
            off = disp_self[order]  # [T, N, 2]
            sim_y = pos_y[:, None] + off[..., 0]
            sim_x = pos_x[:, None] + off[..., 1]

            def per_a(_, ai):
                bidx = cross_argmin(ref0, match0[ai], k, nd)
                return _, bidx[sim_y, sim_x]  # [T, N]

            _, ang = lax.scan(per_a, 0, jnp.arange(a))  # [A, T, N]
            # the reference SAI's angular match is the similar patch itself
            ang = jnp.where((jnp.arange(a) == r)[:, None, None], c_ang, ang)
            ang = jnp.transpose(ang, (1, 2, 0))  # [T, N, A]

            pt = t_pad - t
            if pt:
                sim_y = jnp.pad(sim_y, ((0, pt), (0, 0)), constant_values=pad)
                sim_x = jnp.pad(sim_x, ((0, pt), (0, 0)), constant_values=pad)
                lvl_p = jnp.pad(lvl, (0, pt))
                mask_p = jnp.pad(mask, ((0, pt), (0, 0)))  # False: zero weight
                ang = jnp.pad(
                    ang, ((0, pt), (0, 0), (0, 0)), constant_values=c_ang
                )
            else:
                lvl_p, mask_p = lvl, mask

            def chunk_body(i, nd_acc):
                num, den = nd_acc
                s0 = i * chunk
                cy = lax.dynamic_slice_in_dim(sim_y, s0, chunk, 0)
                cx = lax.dynamic_slice_in_dim(sim_x, s0, chunk, 0)
                clvl = lax.dynamic_slice_in_dim(lvl_p, s0, chunk, 0)
                cmask = lax.dynamic_slice_in_dim(mask_p, s0, chunk, 0)
                cang = lax.dynamic_slice_in_dim(ang, s0, chunk, 0)
                aoff = disp_ang[cang]  # [Tc, N, A, 2]
                ay = cy[:, :, None] + aoff[..., 0]
                ax = cx[:, :, None] + aoff[..., 1]
                yy = ay[..., None, None] + ku  # [Tc, N, A, k, 1]
                xx = ax[..., None, None] + kv  # [Tc, N, A, 1, k]

                grp = noisy_p[a_b, yy, xx]  # [Tc, N, A, k, k, C]
                g = grp.reshape(chunk, n_sim, a_h, a_w, k, k, c)
                spec = forward_5d(g, clvl, gt)
                if wiener:
                    gb = basic_p[a_b, yy, xx].reshape(
                        chunk, n_sim, a_h, a_w, k, k, c
                    )
                    spec_b = forward_5d(gb, clvl, gt)
                    filt, wgt = wiener_shrink(spec, spec_b, sigma_c)
                else:
                    filt, wgt = ht_shrink(spec, sigma_c, lambda_3d)
                est = inverse_5d(filt, clvl, gt)
                if sp.use_sd:
                    wgt = sd_weight(est, clvl, a, k)
                est = est.reshape(chunk, n_sim, a, k, k, c)

                wfull = (
                    wgt[:, None, None, None, None, :]
                    * cmask[:, :, None, None, None, None]
                    * kaiser[None, None, None, :, :, None]
                )  # [Tc, N, 1, k, k, C]
                num = num.at[a_b, yy, xx].add(est * wfull)
                den = den.at[a_b, yy, xx].add(
                    jnp.broadcast_to(wfull, est.shape)
                )
                return num, den

            num, den = lax.fori_loop(0, n_chunks, chunk_body, (num, den))
            return (num, den), None

        init = (jnp.zeros_like(noisy_p), jnp.zeros_like(noisy_p))
        (num, den), _ = lax.scan(
            ref_pass, init, jnp.asarray(ref_sai_grid(a_h, a_w, sp.p_ang))
        )
        return num, den

    return step


def _resolve_engine(engine: str, a: int = 0) -> str:
    """'auto' -> the Pallas kernel engine on TPU, the XLA path elsewhere.

    'pallas_bf16' runs the kernel engine's group path in bfloat16 (BM and
    accumulation stay f32; fused engine only, so angular grids <= 128 SAIs).

    Angular grids beyond 128 SAIs (e.g. 17x17 HCI) widen the kernel
    engine's lane axis past one vector register; the kernels handle this
    (Mosaic masks the trailing vregs), so no fallback is needed.
    """
    del a
    if engine == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return engine


@lru_cache(maxsize=None)
def _raw_step(
    sp, lambda_3d, a_h, a_w, h, w, c, chunk, wiener, dtype, engine
):
    engine = _resolve_engine(engine, a_h * a_w)
    if engine.startswith("pallas"):
        from lfbm5d_tpu.pipeline.engine import build_kernel_step

        return build_kernel_step(
            sp, lambda_3d, a_h, a_w, h, w, c, wiener, dtype,
            interpret=jax.default_backend() != "tpu",
            group_dtype="bfloat16" if engine == "pallas_bf16" else None,
        )
    return _build_step(sp, lambda_3d, a_h, a_w, h, w, c, chunk, wiener, dtype)


@lru_cache(maxsize=None)
def _build_step_jit(*key):
    step = _raw_step(*key)
    wiener = key[8]
    if wiener:
        return jax.jit(step)
    return jax.jit(lambda np_, mp_, sc_: step(np_, mp_, sc_, None))


def _finalize(num, den, pad: int, a_h: int, a_w: int, h: int, w: int, c: int,
              fb=None):
    est = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
    est = est.reshape(a_h, a_w, *est.shape[1:])
    est = est[:, :, pad : pad + h, pad : pad + w, :]
    if fb is not None:
        # flat-region fallback (StepParams.flat_tau): pixels no group
        # covered take the per-SAI 2D estimate
        deni = den.reshape(a_h, a_w, *den.shape[1:])
        deni = deni[:, :, pad : pad + h, pad : pad + w, :]
        est = jnp.where(deni > 0, est, fb)
    return est


def _flat_fallback(x, sigma_c, sp: StepParams, lambda_3d: float, dt,
                   pilot=None):
    """Per-SAI 2D fallback estimate for flat_tau > 0 steps (None if off).

    x: [aH, aW, H, W, C] color-transformed LF; pilot: basic estimate for
    the Wiener form. See ops/flat.py for the spec.
    """
    if sp.flat_tau <= 0:
        return None
    f2, i2 = tm.transform_pair(sp.tau_2d, sp.k)
    return fallback_shrink_2d(
        x, sigma_c.astype(dt), jnp.asarray(f2, dt), jnp.asarray(i2, dt),
        lambda_3d, pilot,
    )


def _flat_pad(x, pad: int):
    """[aH, aW, H, W, C] -> padded, flattened to [A, Hp, Wp, C]."""
    xp = pad_lf(x, pad)
    return xp.reshape(-1, *xp.shape[2:])


def _sigma_channels(sigma: float, color_space: str, c: int, dtype: str):
    scales = channel_sigma_scales(color_space)[:c] if c == 3 else np.ones((c,))
    return jnp.asarray(sigma * scales, dtype=jnp.dtype(dtype))


def ht_step(x, sigma: float, sp: StepParams, lambda_3d: float = 2.7,
            color_space: str = "rgb", chunk: int = 256, dtype: str = "float32",
            engine: str = "xla"):
    """HT step on an already-color-transformed LF [aH,aW,H,W,C] -> basic."""
    a_h, a_w, h, w, c = x.shape
    x = jnp.asarray(x, jnp.dtype(dtype))
    fn = _build_step_jit(
        sp, lambda_3d, a_h, a_w, h, w, c, chunk, False, dtype, engine
    )
    xp = _flat_pad(x, sp.pad)
    sigma_c = _sigma_channels(sigma, color_space, c, dtype)
    num, den = fn(xp, xp, sigma_c)
    fb = _flat_fallback(x, sigma_c, sp, lambda_3d, jnp.dtype(dtype))
    return _finalize(num, den, sp.pad, a_h, a_w, h, w, c, fb)


def wiener_step(x, basic, sigma: float, sp: StepParams,
                color_space: str = "rgb", chunk: int = 256,
                dtype: str = "float32", engine: str = "xla"):
    """Wiener step: BM on `basic`, shrinkage of `x` guided by `basic`."""
    a_h, a_w, h, w, c = x.shape
    x = jnp.asarray(x, jnp.dtype(dtype))
    basic = jnp.asarray(basic, jnp.dtype(dtype))
    fn = _build_step_jit(
        sp, 0.0, a_h, a_w, h, w, c, chunk, True, dtype, engine
    )
    xp = _flat_pad(x, sp.pad)
    bp = _flat_pad(basic, sp.pad)
    sigma_c = _sigma_channels(sigma, color_space, c, dtype)
    mp = xp if sp.bm_source == "noisy" else bp
    num, den = fn(xp, mp, sigma_c, bp)
    fb = _flat_fallback(x, sigma_c, sp, 0.0, jnp.dtype(dtype), pilot=basic)
    return _finalize(num, den, sp.pad, a_h, a_w, h, w, c, fb)


@lru_cache(maxsize=None)
def build_denoise_fn(
    params: DenoiseParams,
    a_h: int,
    a_w: int,
    h: int,
    w: int,
    c: int,
    dtype: str = "float32",
    engine: str = "xla",
):
    """Compose the FULL per-LF pipeline (color -> HT -> Wiener -> inverse
    color) into one raw jittable function fn(lf, sigma_c) -> (basic, final).

    This single function is what jit/vmap/shard_map consume: one compilation
    covers the whole two-step pipeline, and the streaming path maps it over a
    batch of light fields (SURVEY.md §5.8).
    """
    dt = jnp.dtype(dtype)
    ht_raw = _raw_step(
        params.ht, params.lambda_3d, a_h, a_w, h, w, c, params.chunk, False,
        dtype, engine,
    )
    wn_raw = _raw_step(
        params.wiener, 0.0, a_h, a_w, h, w, c, params.chunk, True, dtype,
        engine,
    )
    use_color = c == 3 and params.color_space != "rgb"
    if use_color:
        from lfbm5d_tpu.lf.color import color_matrix

        m = np.asarray(color_matrix(params.color_space))
        mf = jnp.asarray(m, dt)
        mi = jnp.asarray(np.linalg.inv(m), dt)

    def fn(lf, sigma_c):
        x = jnp.asarray(lf, dt)
        if use_color:
            x = x @ mf.T
        xp = _flat_pad(x, params.ht.pad)
        num, den = ht_raw(xp, xp, sigma_c, None)
        fb = _flat_fallback(x, sigma_c, params.ht, params.lambda_3d, dt)
        basic = _finalize(num, den, params.ht.pad, a_h, a_w, h, w, c, fb)
        xp2 = _flat_pad(x, params.wiener.pad)
        bp = _flat_pad(basic, params.wiener.pad)
        mp = xp2 if params.wiener.bm_source == "noisy" else bp
        num, den = wn_raw(xp2, mp, sigma_c, bp)
        fb = _flat_fallback(x, sigma_c, params.wiener, 0.0, dt, pilot=basic)
        final = _finalize(num, den, params.wiener.pad, a_h, a_w, h, w, c, fb)
        if use_color:
            basic = basic @ mi.T
            final = final @ mi.T
        return basic, final

    return fn


@lru_cache(maxsize=None)
def _build_denoise_jit(params, a_h, a_w, h, w, c, dtype, engine):
    return jax.jit(build_denoise_fn(params, a_h, a_w, h, w, c, dtype, engine))


# Ref-slot count above which a step runs as MULTIPLE device launches (one
# ref-block each, device-resident accumulators). Single programs running
# more than ~1 minute on this TPU fault with UNAVAILABLE: a full-size
# default-parameter step (~38M slots) always did, and a 9x9 flagship
# p_ang=2 step (~11.8M slots, ~35 s/step) faulted in round 3 — so the
# bound sits just above the proven-stable fast-preset 9x9 (~4.9M slots,
# ~12 s/step). Bounded launches also bound peak transients.
_LAUNCH_SLOT_LIMIT = 6_000_000
# Banked (>128-SAI) grids: slot bound for the SINGLE-program two-kernel
# path. A 17x17x128x128 default single program (7.8M slots, ~2 min) faults
# the device at runtime — re-confirmed late round 3 in BOTH doff modes
# after the band-origin alignment fix, so this is the device's program-
# duration bound, not a kernel bug (round-2's recorded 35 s single-program
# run no longer reproduces on current infra). Bigger banked grids run as
# bounded launches with hoisted per-step tables (engine.py `prepare`).
_BANKED_SLOT_LIMIT = int(
    __import__("os").environ.get("LFBM5D_BANKED_SLOT_LIMIT", 2_000_000)
)


def _step_slots(sp: StepParams, a_h, a_w, h, w) -> int:
    ys = ind_initialize(h, sp.k, sp.p)
    xs = ind_initialize(w, sp.k, sp.p)
    n_refs = len(ref_sai_grid(a_h, a_w, sp.p_ang))
    return len(ys) * len(xs) * n_refs * sp.n_sim


def execution_tier(params: DenoiseParams, a_h, a_w, h, w, engine) -> str:
    """'single' | 'banked_fused' | 'launched' — the slot/scale routing
    run_bm5d applies (and pipeline.streaming mirrors per LF for heavy
    batches). Tiering only applies to the compiled kernel engine: on other
    backends single programs neither fault nor hit the duration bound.
    LFBM5D_ROUTE_ON_CPU=1 applies it to the interpret engine too, so CPU
    mesh tests can exercise the exact tiered execution paths real 17x17
    streaming uses (tests/test_streaming.py)."""
    eng = _resolve_engine(engine, a_h * a_w)
    on_dev = eng.startswith("pallas") and (
        jax.default_backend() == "tpu"
        or __import__("os").environ.get("LFBM5D_ROUTE_ON_CPU") == "1"
    )
    if not on_dev:
        return "single"
    a = a_h * a_w
    banked = a > 128
    max_slots = max(
        _step_slots(params.ht, a_h, a_w, h, w),
        _step_slots(params.wiener, a_h, a_w, h, w),
    )
    if banked and a <= 384 and max_slots <= 2_000_000:
        return "banked_fused"
    if max_slots > (_BANKED_SLOT_LIMIT if banked else _LAUNCH_SLOT_LIMIT):
        return "launched"
    return "single"


@lru_cache(maxsize=None)
def _launched_step_jit(sp, lambda_3d, a_h, a_w, h, w, c, wiener, dtype,
                       group_dtype):
    from lfbm5d_tpu.pipeline.engine import build_kernel_step

    a = a_h * a_w
    fused = None
    if a > 128:
        group_dtype = None  # bf16 chain is fused-only; banked grids run f32
        # launched BANKED grids take the banked-FUSED kernel: at 17x17x
        # 128x128 it measured 48.8 s (HT) / 65.7 s (Wiener) per step vs
        # ~113-127 s/step for launched two-kernel (whose lane-join
        # transposes are 40% of launch time) — see DESIGN_NOTES round-3
        # late session. Grids beyond 3 banks keep the two-kernel path.
        fused = True if a <= 384 else False
    raw = build_kernel_step(
        sp, lambda_3d, a_h, a_w, h, w, c, wiener, dtype,
        interpret=jax.default_backend() != "tpu",
        group_dtype=group_dtype, launch_blocks=1, fused=fused,
    )
    if wiener:
        prep = jax.jit(raw.prepare)
    else:
        prep = jax.jit(lambda np_, mp: raw.prepare(np_, mp, None))
    fn = jax.jit(raw)
    return raw, prep, fn


def _run_step_launched(sp, lambda_3d, wiener, xp, mp, sigma_c, bp,
                       a_h, a_w, h, w, c, dtype, group_dtype):
    raw, prep, fn = _launched_step_jit(
        sp, lambda_3d, a_h, a_w, h, w, c, wiener, dtype, group_dtype
    )
    # per-STEP constants (tables, BM planes, band batches) computed once;
    # every launch reuses them (they were rebuilt per launch before —
    # dominating launch time on banked grids, ~5% on the flagship default)
    prepared = prep(xp, mp, bp) if wiener else prep(xp, mp)
    num = jnp.zeros(raw.acc_shape, raw.acc_dtype)
    den = jnp.zeros(raw.acc_shape, raw.acc_dtype)
    for b0 in range(raw.n_blocks):
        num, den = fn(prepared, sigma_c, num, den, jnp.int32(b0))
    return raw.finalize(num, den)


def _run_bm5d_launched(lf, params: DenoiseParams, dtype, group_dtype,
                       sigma_c=None):
    """Two-step pipeline as many bounded device launches (big configs)."""
    dt = jnp.dtype(dtype)
    a_h, a_w, h, w, c = lf.shape
    x = jnp.asarray(lf, dt)
    use_color = c == 3 and params.color_space != "rgb"
    if use_color:
        from lfbm5d_tpu.lf.color import color_matrix

        m = np.asarray(color_matrix(params.color_space))
        mi = jnp.asarray(np.linalg.inv(m), dt)
        x = x @ jnp.asarray(m, dt).T
    if sigma_c is None:
        sigma_c = _sigma_channels(params.sigma, params.color_space, c, dtype)

    xp = _flat_pad(x, params.ht.pad)
    num, den = _run_step_launched(
        params.ht, params.lambda_3d, False, xp, xp, sigma_c, None,
        a_h, a_w, h, w, c, dtype, group_dtype,
    )
    fb = _flat_fallback(x, sigma_c, params.ht, params.lambda_3d, dt)
    basic = _finalize(num, den, params.ht.pad, a_h, a_w, h, w, c, fb)
    xp2 = _flat_pad(x, params.wiener.pad)
    bp = _flat_pad(basic, params.wiener.pad)
    mp = xp2 if params.wiener.bm_source == "noisy" else bp
    num, den = _run_step_launched(
        params.wiener, 0.0, True, xp2, mp, sigma_c, bp,
        a_h, a_w, h, w, c, dtype, group_dtype,
    )
    fb = _flat_fallback(x, sigma_c, params.wiener, 0.0, dt, pilot=basic)
    final = _finalize(num, den, params.wiener.pad, a_h, a_w, h, w, c, fb)
    if use_color:
        basic = basic @ mi.T
        final = final @ mi.T
    return basic, final


@lru_cache(maxsize=None)
def _banked_fused_step_jit(sp, lambda_3d, a_h, a_w, h, w, c, wiener, dtype):
    from lfbm5d_tpu.pipeline.engine import build_kernel_step

    raw = build_kernel_step(
        sp, lambda_3d, a_h, a_w, h, w, c, wiener, dtype,
        interpret=jax.default_backend() != "tpu", fused=True,
    )
    if wiener:
        return jax.jit(raw)
    return jax.jit(lambda np_, mp_, sc_: raw(np_, mp_, sc_, None))


def _run_bm5d_banked_fused(lf, params: DenoiseParams, dtype, sigma_c=None):
    """Two-step pipeline for >128-SAI grids through the BANKED-FUSED kernel.

    Deliberately structured as SEPARATE per-step jit programs with the
    color/pad/finalize glue dispatched eagerly between them: the round-2
    bisect matrix (docs/DESIGN_NOTES.md) showed the banked-fused kernel is
    exact and stable in hand-built per-step programs (17x17x128x128 at
    0.178 Mpix/s), while the same steps composed into one program by
    build_denoise_fn compile to schedules that fault the TPU worker.
    """
    dt = jnp.dtype(dtype)
    a_h, a_w, h, w, c = lf.shape
    x = jnp.asarray(lf, dt)
    use_color = c == 3 and params.color_space != "rgb"
    if use_color:
        from lfbm5d_tpu.lf.color import color_matrix

        m = np.asarray(color_matrix(params.color_space))
        mi = jnp.asarray(np.linalg.inv(m), dt)
        x = x @ jnp.asarray(m, dt).T
    if sigma_c is None:
        sigma_c = _sigma_channels(params.sigma, params.color_space, c, dtype)

    ht = _banked_fused_step_jit(
        params.ht, params.lambda_3d, a_h, a_w, h, w, c, False, dtype
    )
    wn = _banked_fused_step_jit(
        params.wiener, 0.0, a_h, a_w, h, w, c, True, dtype
    )
    xp = _flat_pad(x, params.ht.pad)
    num, den = ht(xp, xp, sigma_c)
    fb = _flat_fallback(x, sigma_c, params.ht, params.lambda_3d, dt)
    basic = _finalize(num, den, params.ht.pad, a_h, a_w, h, w, c, fb)
    xp2 = _flat_pad(x, params.wiener.pad)
    bp = _flat_pad(basic, params.wiener.pad)
    mp = xp2 if params.wiener.bm_source == "noisy" else bp
    num, den = wn(xp2, mp, sigma_c, bp)
    fb = _flat_fallback(x, sigma_c, params.wiener, 0.0, dt, pilot=basic)
    final = _finalize(num, den, params.wiener.pad, a_h, a_w, h, w, c, fb)
    if use_color:
        basic = basic @ mi.T
        final = final @ mi.T
    return basic, final


def run_bm5d(noisy_lf, params: DenoiseParams, dtype: str = "float32",
             engine: str = "auto", sigma_c=None):
    """Full two-step pipeline. noisy_lf: [aH,aW,H,W,C] RGB/gray in [0,255].

    Returns (basic, final) jnp arrays in the input color space. engine:
    'auto' (Pallas kernels on TPU, XLA elsewhere), 'pallas', or 'xla'.

    sigma_c optionally overrides the per-channel noise stds as a TRACED
    array (shape [C]); params.sigma is then ignored at runtime and the jit
    caches key only on params — this is how run_sr sweeps its sigma
    schedule through ONE compilation per geometry while still inheriting
    this function's launched/banked execution routing.
    """
    # device arrays pass through as-is (np.asarray would round-trip them
    # back to the host — seconds through the axon tunnel at 9x9 scale)
    if isinstance(noisy_lf, jax.Array):
        lf = noisy_lf.astype(jnp.dtype(dtype))
    else:
        lf = jnp.asarray(np.asarray(noisy_lf), jnp.dtype(dtype))
    a_h, a_w, h, w, c = lf.shape
    eng = _resolve_engine(engine, a_h * a_w)
    tier = execution_tier(params, a_h, a_w, h, w, engine)
    if tier == "banked_fused":
        # small banked grids: per-step jit programs through the banked-FUSED
        # kernel (proven on-chip by tpu_smoke case 4 at 12x12x48x64). At
        # 17x17x128x128 RGB (7.8M slots, 3 banks) this form STILL faults the
        # worker (round-3 measurement, docs/DESIGN_NOTES.md), so bigger
        # banked configs take the round-2-proven two-kernel path below.
        return _run_bm5d_banked_fused(lf, params, dtype, sigma_c)
    if tier == "launched":
        return _run_bm5d_launched(
            lf, params, dtype,
            "bfloat16" if eng == "pallas_bf16" else None, sigma_c,
        )
    fn = _build_denoise_jit(params, a_h, a_w, h, w, c, dtype, eng)
    if sigma_c is None:
        sigma_c = _sigma_channels(params.sigma, params.color_space, c, dtype)
    return fn(lf, sigma_c)
