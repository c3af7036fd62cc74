"""Probe which matmul/reshape forms Mosaic compiles in-kernel (round 2).

The fused group kernel needs, inside one Pallas program:
  A. rank-3 "matmul with leading batch-ish dims": [S, P, L] contract L with
     [L, L]  (angular transform)
  B. batched dot_general: [G, N, N] x [G, N, P*L?]-style stack transform
  C. per-slot spatial [64, 64] transform — batched or looped
  D. dynamic sublane slice at lvl*N (N=16) offsets from a matrix table
Each probe runs separately so one failure doesn't mask the others.
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128
S = 16  # slots
P = 64  # pixels


def run(name, fn):
    try:
        out = fn()
        out = jax.block_until_ready(out)
        print(f"{name}: OK", np.asarray(out).ravel()[:2])
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


def probe_rank3_dot():
    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...]  # [S, P, L]
        w = w_ref[...]  # [L, L]
        o_ref[...] = jax.lax.dot_general(
            x, w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    x = jnp.ones((S, P, L), jnp.float32)
    w = jnp.ones((L, L), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, P, L), jnp.float32),
    )(x, w)


def probe_batched_dot():
    G, N = 4, 16

    def kernel(m_ref, x_ref, o_ref):
        m = m_ref[...]  # [G, N, N]
        x = x_ref[...]  # [G, N, L]
        o_ref[...] = jax.lax.dot_general(
            m, x, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    m = jnp.ones((G, N, N), jnp.float32)
    x = jnp.ones((G, N, L), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, N, L), jnp.float32),
    )(m, x)


def probe_batched_dot_rank4():
    G, N = 4, 16

    def kernel(m_ref, x_ref, o_ref):
        m = m_ref[...]  # [G, N, N]
        x = x_ref[...]  # [G, N, P, L]
        o_ref[...] = jax.lax.dot_general(
            m, x, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    m = jnp.ones((G, N, N), jnp.float32)
    x = jnp.ones((G, N, P, L), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, N, P, L), jnp.float32),
    )(m, x)


def probe_spatial_loop():
    # per-slot [64,64] @ [64, L] inside a fori loop over a scratch buffer
    def kernel(x_ref, w_ref, o_ref):
        def body(s, _):
            o_ref[s] = jax.lax.dot_general(
                w_ref[...], x_ref[s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0
        jax.lax.fori_loop(0, S, body, 0)

    x = jnp.ones((S, P, L), jnp.float32)
    w = jnp.ones((P, P), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, P, L), jnp.float32),
    )(x, w)


def probe_rank3_dot_mid():
    # contract the MIDDLE axis: spatial transform without batching:
    # out[s,p,L] = sum_q w[p,q] x[s,q,L]  == dot_general(w, x) rank-3 rhs
    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...]  # [S, P, L]
        w = w_ref[...]  # [P, P]
        o = jax.lax.dot_general(
            w, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [P, S, L]
        o_ref[...] = o

    x = jnp.ones((S, P, L), jnp.float32)
    w = jnp.ones((P, P), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, S, L), jnp.float32),
    )(x, w)


def probe_dyn_sublane_matrix():
    D, N = 5, 16

    def kernel(lvl_ref, t_ref, o_ref):
        lv = lvl_ref[0]
        o_ref[...] = t_ref[pl.ds(lv * N, N), :]

    t = jnp.arange(D * N * 128, dtype=jnp.float32).reshape(D * N, 128)
    lvl = jnp.asarray([3], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((D * N, 128), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N, 128), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
    )(lvl, t)


def probe_transpose_sublane():
    # [S, P, L] -> [P, S, L] in-kernel transpose of non-minor dims
    def kernel(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...], (1, 0, 2))

    x = jnp.ones((S, P, L), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, S, L), jnp.float32),
    )(x)


def probe_bf16_mux():
    # the extract mux in bf16: dynamic slice + where-selects on bf16 data
    k, nd = 8, 2
    sk = k + 2 * nd
    nsel = 2 * nd + 1

    def kernel(band_ref, d_ref, o_ref):
        sup = band_ref[pl.ds(4, sk), pl.ds(4, sk), :]
        d = d_ref[0, :]
        dy = (d // nsel)[None, None, :]
        dx = (d - (d // nsel) * nsel)[None, None, :]
        acc = jnp.zeros((k, sk, L), dtype=sup.dtype)
        for m in range(nsel):
            acc = jnp.where(dy == m, sup[m:m + k, :, :], acc)
        patch = jnp.zeros((k, k, L), dtype=sup.dtype)
        for m in range(nsel):
            patch = jnp.where(dx == m, acc[:, m:m + k, :], patch)
        o_ref[...] = patch.reshape(k * k, L)

    band = jnp.ones((32, 32, L), jnp.bfloat16)
    d = jnp.zeros((8, L), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k * k, L), jnp.bfloat16),
    )(band, d)


if __name__ == "__main__":
    which = sys.argv[1:] or [
        "rank3_dot", "batched_dot", "batched_dot_rank4", "spatial_loop",
        "rank3_dot_mid", "dyn_sublane_matrix", "transpose_sublane",
        "bf16_mux",
    ]
    for name in which:
        run(name, globals()[f"probe_{name}"])
