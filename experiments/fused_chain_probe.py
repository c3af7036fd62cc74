"""Probe the COMPLETE fused group-compute chain in one Pallas program.

Exact shapes of the planned kernels/fused.py: sc=64 slots = gpc=4 groups of
N=16, L=88 lanes (9x9 grid padded), k=8. Chain: stack fwd (batched dot) ->
spatial fwd (rank-4 contraction) -> angular fwd (minor-dim matmul) -> HT
shrink + nnz reduction + weight broadcast -> angular inv -> spatial inv ->
stack inv (mixed-batch dot or transpose fallback). Checks numerics against
the same chain in plain XLA.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N, GPC, K = 16, 4, 8
P = K * K
SC = GPC * N
L = 128  # in-kernel matmul lanes are always 128 (MXU pads anyway; the
# multi-free-dim dot_general forms hard-fail at non-128 minors)


def chain(g4, m4f, m4i, k2f, k2i, k4f, k4i, maskr, thr, stage=99):
    """Same op ORDER as transforms.flat forward_flat/inverse_flat (2D, 4D,
    5D forward; 5D, 4D, 2D inverse) so the fused kernel is numerically
    bit-comparable with the XLA engine. Layouts: [GPC, N, P, L] native,
    [P, GPC, N, L] between the 2D and 5D stages (one transpose each way)."""
    dt = g4.dtype
    spec = jax.lax.dot_general(
        k2f, g4, (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)  # [P, GPC, N, L] 2D
    if stage <= 1:
        return spec
    spec = jax.lax.dot_general(
        spec, k4f, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)  # [P, GPC, N, L] 4D
    if stage <= 2:
        return spec
    spec = jnp.transpose(spec, (1, 2, 0, 3))            # [GPC, N, P, L]
    if stage <= 3:
        return spec
    spec = jax.lax.dot_general(
        m4f, spec, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt)  # [GPC, N, P, L] 5D
    if stage <= 4:
        return spec
    # bf16 comparisons hard-fail this Mosaic build: shrink in f32 always
    # (elementwise, cheap; the bf16 win is the matmuls and the mux)
    spec_f = spec.astype(jnp.float32)
    keep = (jnp.abs(spec_f) >= thr).astype(jnp.float32)
    filt = (spec_f * keep).astype(dt)
    # Reductions must stay rank-4 and lane-resident: a [GPC] rank-1 result
    # (and its re-broadcast) relayouts lanes<->sublanes, which SIGABRTs the
    # Mosaic compiler. Reduce to [GPC,1,1,L] and smear the cross-lane total
    # back across lanes with a ones[L,L] matmul (free on the MXU).
    ones_l = jnp.ones((L, L), jnp.float32)
    nnz_l = jnp.sum(keep, axis=(1, 2), keepdims=True)
    nnz = jax.lax.dot_general(
        nnz_l, ones_l, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [GPC, 1, 1, L]
    wgt = jnp.where(nnz > 0, 1.0 / jnp.maximum(nnz, 1.0), 1.0)
    wgt = wgt.astype(dt)                                # [GPC, 1, 1, L]
    if stage <= 5:
        return filt * wgt
    est = jax.lax.dot_general(
        m4i, filt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt)  # [GPC, N, P, L] 5Di
    if stage <= 6:
        return est
    est = jax.lax.dot_general(
        est, k4i, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)  # [GPC, N, P, L] 4Di
    if stage <= 7:
        return est
    est = jax.lax.dot_general(
        k2i, est, (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)  # [P, GPC, N, L] 2Di
    if stage <= 8:
        return est
    est = jnp.transpose(est, (1, 2, 0, 3))              # [GPC, N, P, L]
    return est * wgt * maskr


def probe(dtype, stage=99):
    rng = np.random.default_rng(0)
    g4 = jnp.asarray(rng.standard_normal((GPC, N, P, L)), dtype)
    m = rng.standard_normal((GPC, N, N))
    m4f = jnp.asarray(m, dtype)
    m4i = jnp.asarray(np.transpose(m, (0, 2, 1)), dtype)
    k2 = rng.standard_normal((P, P))
    k2f = jnp.asarray(k2, dtype)
    k2i = jnp.asarray(k2.T, dtype)
    k4 = rng.standard_normal((L, L))
    k4f = jnp.asarray(k4, dtype)
    k4i = jnp.asarray(k4.T, dtype)
    maskr = jnp.asarray(
        np.broadcast_to(
            (rng.random((GPC, N, 1, 1)) > 0.3).astype(np.float32),
            (GPC, N, 1, L)), dtype)  # lane-resident mask, as the real kernel
    # ships it ([SC, L] block reshaped) — dims-1-minor bf16 broadcasts crash
    thr = 2.0  # static python float -> kernel-embedded constant

    def kernel(g_ref, mf_ref, mi_ref, k2f_ref, k2i_ref, k4f_ref, k4i_ref,
               mk_ref, o_ref):
        o_ref[...] = chain(
            g_ref[...], mf_ref[...], mi_ref[...], k2f_ref[...], k2i_ref[...],
            k4f_ref[...], k4i_ref[...], mk_ref[...], thr, stage)

    ref = chain(g4.astype(jnp.float32), m4f.astype(jnp.float32),
                m4i.astype(jnp.float32), k2f.astype(jnp.float32),
                k2i.astype(jnp.float32), k4f.astype(jnp.float32),
                k4i.astype(jnp.float32), maskr.astype(jnp.float32), thr,
                stage)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(ref.shape, dtype),
    )(g4, m4f, m4i, k2f, k2i, k4f, k4i, maskr)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    rel = err / max(float(jnp.max(jnp.abs(ref))), 1e-30)
    print(f"chain[{dtype}][stage={stage}]: OK maxerr={err:.3e} rel={rel:.3e}")


if __name__ == "__main__":
    dts = [d for d in sys.argv[1:] if not d.isdigit()] or [
        "float32", "bfloat16"]
    stages = [int(s) for s in sys.argv[1:] if s.isdigit()] or [99]
    for dt in dts:
        for st in stages:
            try:
                probe(jnp.dtype(dt), st)
            except Exception as e:
                print(f"chain[{dt}][stage={st}]: FAIL {type(e).__name__}: "
                      + str(e).split(chr(10))[0][:300])
