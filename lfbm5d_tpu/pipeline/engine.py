"""Kernel-backed filtering engine: the TPU-native group path.

Same contract as pipeline.denoise._build_step (one HT or Wiener pass over all
reference SAIs, returning padded numerator/denominator accumulators), but the
group build / transform / shrinkage / aggregation stage runs on the Pallas
kernels and the flat MXU transform layout instead of XLA gathers/scatters:

  per reference SAI (lax.scan):
    block matching via ops.distances (displacement-stacked maps — already
      MXU/VPU-friendly, reused unchanged)
    per spatial tile (lax.fori_loop, static q_ref bucketing):
      kernels.extract.extract_groups   — group rows from A-on-lanes bands
      transforms.flat forward/inverse  — kron matmuls, [*, 128] shapes
      ops.shrinkage (flat axes)        — HT / Wiener / SD weights
      kernels.accumulate               — race-free banded scatter-add
      dense band add into the global A-on-lanes accumulators

Tiles bucket REFERENCE patches (static grid => static shapes, no sorting);
every slot's similar-patch superpatch lies within the tile band of height
(tile extent + 2(n_search+n_disp) + k + 2*n_disp), padded to sublane
multiples. Per-tile slot tables are compile-time constants.

The result is bit-identical to the XLA path (same BM decisions by the
quantized-distance spec, same arithmetic order per group) up to float
reassociation in the transforms.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from lfbm5d_tpu.config import StepParams
from lfbm5d_tpu.kernels.accumulate import accumulate_groups
from lfbm5d_tpu.kernels.extract import extract_groups
from lfbm5d_tpu.lf.pad import ind_initialize
from lfbm5d_tpu.ops.distances import (
    center_index,
    cross_argmin,
    displacements,
    self_distances,
)
from lfbm5d_tpu.ops.match import select_similar
from lfbm5d_tpu.transforms import matrices as tm
from lfbm5d_tpu.transforms.flat import FlatTransforms, forward_flat, inverse_flat

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@lru_cache(maxsize=None)
def build_kernel_step(
    sp: StepParams,
    lambda_3d: float,
    a_h: int,
    a_w: int,
    h: int,
    w: int,
    c: int,
    wiener: bool,
    dtype: str = "float32",
    interpret: bool = False,
    rows_per_tile: int = 4,
    cols_per_tile: int = 24,
    sc: int = 64,
):
    """Returns raw fn(noisy_p, match_p, sigma_c, basic_p) -> (num, den).

    num/den are returned in the SAI-flattened layout [A, Hp, Wp, C] (matching
    pipeline.denoise._build_step) so _finalize applies unchanged.
    """
    k, n, nd, n_sim, pad = sp.k, sp.n_search, sp.n_disp, sp.n_sim, sp.pad
    a = a_h * a_w
    if a > _LANES:
        raise ValueError(f"angular grid {a} exceeds lane budget {_LANES}")
    if sc % n_sim:
        sc = n_sim * max(1, sc // n_sim)
    hp, wp = h + 2 * pad, w + 2 * pad
    sk = k + 2 * nd
    c_ang = center_index(nd)
    dt = jnp.dtype(dtype)

    ys = ind_initialize(h, k, sp.p) + pad
    xs = ind_initialize(w, k, sp.p) + pad
    t_count = len(ys) * len(xs)

    # --- static tiling of the reference grid, sized to the VMEM budget:
    # the band block (tile extent + 2(n+nd) + k + 2nd each way) must leave
    # room for the streaming idx/out blocks and their double buffers.
    halo = 2 * (n + nd) + k + 2 * nd
    band_budget = 3_500_000  # bytes

    def band_bytes(r, cc):
        bhh = _round_up((r - 1) * sp.p + halo, 8)
        bww = _round_up((cc - 1) * sp.p + halo, 8)
        return bhh * bww * _LANES * 4

    while cols_per_tile > 1 and band_bytes(rows_per_tile, cols_per_tile) > band_budget:
        cols_per_tile -= 1
    while rows_per_tile > 1 and band_bytes(rows_per_tile, cols_per_tile) > band_budget:
        rows_per_tile -= 1
    rows_per_tile = min(rows_per_tile, len(ys))
    cols_per_tile = min(cols_per_tile, len(xs))

    n_ty = _cdiv(len(ys), rows_per_tile)
    n_tx = _cdiv(len(xs), cols_per_tile)
    n_tiles = n_ty * n_tx
    tt = rows_per_tile * cols_per_tile  # groups per tile (padded)
    gpc = sc // n_sim  # groups per chunk
    cpt = _cdiv(tt, gpc)  # chunks per tile
    tt_pad = cpt * gpc

    span_y = (rows_per_tile - 1) * sp.p + halo
    span_x = (cols_per_tile - 1) * sp.p + halo
    bh = _round_up(span_y, 8)
    bw = _round_up(span_x, 8)

    tile_oy = np.zeros(n_tiles, np.int32)
    tile_ox = np.zeros(n_tiles, np.int32)
    tile_groups = np.full((n_tiles, tt_pad), t_count, np.int32)  # pad -> T
    for tyi in range(n_ty):
        for txi in range(n_tx):
            ti = tyi * n_tx + txi
            ry = range(tyi * rows_per_tile, min((tyi + 1) * rows_per_tile, len(ys)))
            rx = range(txi * cols_per_tile, min((txi + 1) * cols_per_tile, len(xs)))
            tile_oy[ti] = ys[ry.start] - (n + nd)
            tile_ox[ti] = xs[rx.start] - (n + nd)
            g = [iy * len(xs) + ix for iy in ry for ix in rx]
            tile_groups[ti, : len(g)] = g

    # extra bottom/right zero margin so every band slice is in-bounds
    hp2 = int(max(tile_oy.max() + bh, hp))
    wp2 = int(max(tile_ox.max() + bw, wp))

    pos_y = jnp.asarray(np.repeat(ys, len(xs)).astype(np.int32))
    pos_x = jnp.asarray(np.tile(xs, len(ys)).astype(np.int32))
    disp_self = jnp.asarray(displacements(n))
    tile_oy_c = jnp.asarray(tile_oy)
    tile_ox_c = jnp.asarray(tile_ox)
    tile_groups_c = jnp.asarray(tile_groups)  # [nT, tt_pad]
    # slot tables per tile: (group-major, n-minor), chunked
    slot_n_c = jnp.asarray(
        np.tile(np.arange(n_sim, dtype=np.int32), tt_pad).reshape(cpt, sc)
    )
    kaiser_flat = jnp.asarray(tm.kaiser_window(k).reshape(-1), dtype=dt)  # [64]
    ft = FlatTransforms.build(sp, a_h, a_w, _LANES, dtype=dt)
    n_planes = (2 if wiener else 1) * c  # extract planes per tile

    def to_table(xp):
        """[A, Hp, Wp, C] -> A-on-lanes tables [C, Hp2, Wp2, L]."""
        t = jnp.transpose(xp, (3, 1, 2, 0)).astype(dt)
        return jnp.pad(
            t, ((0, 0), (0, hp2 - hp), (0, wp2 - wp), (0, _LANES - a))
        )

    def step(noisy_p, match_p, sigma_c, basic_p):
        match0 = match_p[..., 0]
        tab = to_table(noisy_p)
        tab_b = to_table(basic_p) if wiener else None
        sigma_c = sigma_c.astype(dt)

        num0 = jnp.zeros((c, hp2, wp2, _LANES), dt)
        den0 = jnp.zeros((c, hp2, wp2, _LANES), dt)

        def ref_pass(carry, r):
            num, den = carry
            ref0 = match0[r]
            d_self = self_distances(ref0, ys, xs, k, n)
            order, lvl, mask = select_similar(d_self, n, sp.tau_match, n_sim)
            off = disp_self[order]
            sim_y = pos_y[:, None] + off[..., 0]
            sim_x = pos_x[:, None] + off[..., 1]

            def per_a(_, ai):
                bidx = cross_argmin(ref0, match0[ai], k, nd)
                return _, bidx[sim_y, sim_x]

            _, ang = lax.scan(per_a, 0, jnp.arange(a))
            ang = jnp.where((jnp.arange(a) == r)[:, None, None], c_ang, ang)
            ang = jnp.transpose(ang, (1, 2, 0))  # [T, N, A]

            # dummy slot at index T for tile padding
            sim_y_p = jnp.concatenate([sim_y, jnp.full((1, n_sim), pad, jnp.int32)])
            sim_x_p = jnp.concatenate([sim_x, jnp.full((1, n_sim), pad, jnp.int32)])
            lvl_p = jnp.concatenate([lvl, jnp.zeros((1,), lvl.dtype)])
            mask_p = jnp.concatenate([mask, jnp.zeros((1, n_sim), bool)])
            ang_p = jnp.concatenate(
                [ang, jnp.full((1, n_sim, a), c_ang, ang.dtype)]
            )

            def tile_body(ti, carry2):
                num, den = carry2
                oy = tile_oy_c[ti]
                ox = tile_ox_c[ti]
                groups = tile_groups_c[ti]  # [tt_pad] group ids (T = dummy)
                st = groups.reshape(cpt, gpc)  # chunk-major groups
                st_full = jnp.repeat(st, n_sim, axis=1)  # [cpt, sc]
                sn = slot_n_c  # [cpt, sc]

                qy = sim_y_p[st_full, sn]
                qx = sim_x_p[st_full, sn]
                sy = jnp.clip(qy - nd - oy, 0, bh - sk)
                sx = jnp.clip(qx - nd - ox, 0, bw - sk)
                doff = ang_p[st_full, sn, :]  # [cpt, sc, A]
                doff = jnp.pad(
                    doff, ((0, 0), (0, 0), (0, _LANES - a)),
                    constant_values=c_ang,
                )

                bands = lax.dynamic_slice(
                    tab, (jnp.int32(0), oy, ox, jnp.int32(0)), (c, bh, bw, _LANES)
                )
                if wiener:
                    bands_b = lax.dynamic_slice(
                        tab_b, (jnp.int32(0), oy, ox, jnp.int32(0)), (c, bh, bw, _LANES)
                    )
                    bands = jnp.concatenate([bands, bands_b], axis=0)

                def bc(x):
                    return jnp.broadcast_to(x, (n_planes,) + x.shape)

                grp = extract_groups(
                    bands, bc(sy), bc(sx), bc(doff), k, nd, interpret=interpret
                )  # [n_planes, cpt, sc*64, L]
                grp = grp.reshape(n_planes, tt_pad, n_sim, k * k, _LANES)

                glvl = lvl_p[groups]  # [tt_pad]
                lvl_b = jnp.tile(glvl, c)  # [c*tt_pad]
                spec = forward_flat(
                    grp[:c].reshape(c * tt_pad, n_sim, k * k, _LANES), lvl_b, ft
                )
                sig_b = jnp.repeat(sigma_c, tt_pad)[:, None, None, None]
                if wiener:
                    spec_b = forward_flat(
                        grp[c:].reshape(c * tt_pad, n_sim, k * k, _LANES),
                        lvl_b, ft,
                    )
                    b2 = spec_b**2
                    wien = b2 / (b2 + sig_b**2)
                    filt = spec * wien
                    wsum = jnp.sum(wien**2, axis=(1, 2, 3))
                    wgt = jnp.where(
                        wsum > 0,
                        1.0 / (sig_b[:, 0, 0, 0] ** 2 * jnp.maximum(wsum, 1e-30)),
                        1.0,
                    )
                else:
                    thr = lambda_3d * sig_b
                    keep = jnp.abs(spec) >= thr
                    filt = spec * keep
                    nnz = jnp.sum(keep, axis=(1, 2, 3)).astype(dt)
                    wgt = jnp.where(
                        nnz > 0,
                        1.0 / (sig_b[:, 0, 0, 0] ** 2 * jnp.maximum(nnz, 1.0)),
                        1.0,
                    )
                est = inverse_flat(filt, lvl_b, ft)
                est = est.reshape(c, tt_pad, n_sim, k * k, _LANES)
                if sp.use_sd:
                    cnt = ((1 << glvl) * a * k * k).astype(dt)[None, :, None]
                    s1 = jnp.sum(est, axis=(2, 3, 4))
                    s2 = jnp.sum(est**2, axis=(2, 3, 4))
                    mean = s1 / cnt
                    var = s2 / cnt - mean**2
                    wgt = jnp.where(
                        var > 0, 1.0 / jnp.maximum(var, 1e-30), 1.0
                    ).reshape(c * tt_pad)

                wgt = wgt.reshape(c, tt_pad)
                smask = mask_p[groups].astype(dt)  # [tt_pad, N]
                wk = (
                    wgt[:, :, None, None]
                    * smask[None, :, :, None]
                    * kaiser_flat[None, None, None, :]
                )  # [c, tt_pad, N, 64]
                num_vals = est * wk[..., None]
                den_vals = jnp.broadcast_to(wk[..., None], est.shape)
                vals = jnp.concatenate([num_vals, den_vals], axis=0)
                vals = vals.reshape(2 * c, cpt, sc * k * k, _LANES)

                def bc2(x):
                    return jnp.broadcast_to(x, (2 * c,) + x.shape)

                bands_out = accumulate_groups(
                    vals, bc2(sy), bc2(sx), bc2(doff), bh, bw, k, nd,
                    interpret=interpret,
                )  # [2c, bh, bw, L]

                cur_n = lax.dynamic_slice(num, (jnp.int32(0), oy, ox, jnp.int32(0)), (c, bh, bw, _LANES))
                num = lax.dynamic_update_slice(
                    num, cur_n + bands_out[:c], (jnp.int32(0), oy, ox, jnp.int32(0))
                )
                cur_d = lax.dynamic_slice(den, (jnp.int32(0), oy, ox, jnp.int32(0)), (c, bh, bw, _LANES))
                den = lax.dynamic_update_slice(
                    den, cur_d + bands_out[c:], (jnp.int32(0), oy, ox, jnp.int32(0))
                )
                return num, den

            num, den = lax.fori_loop(0, n_tiles, tile_body, (num, den))
            return (num, den), None

        (num, den), _ = lax.scan(ref_pass, (num0, den0), jnp.arange(a))
        # back to the [A, Hp, Wp, C] contract
        num = jnp.transpose(num[:, :hp, :wp, :a], (3, 1, 2, 0))
        den = jnp.transpose(den[:, :hp, :wp, :a], (3, 1, 2, 0))
        return num, den

    return step
