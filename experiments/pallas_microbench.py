"""Microbenchmarks for Pallas patch-extraction strategies on TPU.

Measures the per-patch cost of candidate designs for the fused group kernel
(gather -> transform -> shrink -> inverse -> aggregate). Run on the real chip:

    python experiments/pallas_microbench.py

Findings feed the design of lfbm5d_tpu/kernels/.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import functools


def timeit(name, fn, *args, inner=1, static=(3,)):
    fn_j = jax.jit(fn, static_argnums=static)
    out = fn_j(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn_j(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.2f} ms  ({best/inner*1e9:.0f} ns/unit)")
    return out


# ---------------------------------------------------------------- strategy A
# per-slot dynamic slice from a VMEM-resident plane, fori over slots
def extract_A(plane, ys, xs, S, k=8):
    def kernel(ys_ref, xs_ref, plane_ref, out_ref):
        def body(i, _):
            y = ys_ref[i]
            x = xs_ref[i]
            out_ref[i, :, :] = plane_ref[pl.ds(y, k), pl.ds(x, k)]
            return 0

        jax.lax.fori_loop(0, S, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, k, k), jnp.float32),
        grid_spec=grid_spec,
    )(ys, xs, plane)


# ---------------------------------------------------------------- strategy B
# A-stacked layout: planes [H, W, A(lanes)]; per (t) one dynamic superpatch
# slice [k+2nd, k+2nd, A] serving all A SAIs at once (angular mux done later)
def extract_B(planes_hwa, ys, xs, S, k=8, nd=2):
    sk = k + 2 * nd
    a = planes_hwa.shape[-1]

    def kernel(ys_ref, xs_ref, plane_ref, out_ref):
        def body(i, _):
            y = ys_ref[i]
            x = xs_ref[i]
            out_ref[i] = plane_ref[pl.ds(y, sk), pl.ds(x, sk), :]
            return 0

        jax.lax.fori_loop(0, S, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, sk, sk, a), jnp.float32),
        grid_spec=grid_spec,
    )(ys, xs, planes_hwa)


# ---------------------------------------------------------------- strategy C
# like A but writes flattened rows [S, 64] (tests the 8x8 -> 64 relayout cost)
def extract_C(plane, ys, xs, S, k=8):
    def kernel(ys_ref, xs_ref, plane_ref, out_ref):
        def body(i, _):
            y = ys_ref[i]
            x = xs_ref[i]
            p = plane_ref[pl.ds(y, k), pl.ds(x, k)]
            out_ref[i, :] = p.reshape(k * k)
            return 0

        jax.lax.fori_loop(0, S, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, k * k), jnp.float32),
        grid_spec=grid_spec,
    )(ys, xs, plane)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    h, w = 160, 256
    k, nd = 8, 2
    S = 4096
    plane = jnp.asarray(rng.random((h, w)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, h - k - 2 * nd, S), jnp.int32)
    xs = jnp.asarray(rng.integers(0, w - k - 2 * nd, S), jnp.int32)

    out = timeit("A: per-slot 8x8 slice [S,8,8]", extract_A, plane, ys, xs, S,
                 inner=S)
    # correctness spot-check
    o = np.asarray(out)
    pn = np.asarray(plane)
    i = 17
    np.testing.assert_allclose(
        o[i], pn[int(ys[i]) : int(ys[i]) + k, int(xs[i]) : int(xs[i]) + k]
    )

    timeit("C: per-slot 8x8 -> row64 [S,64]", extract_C, plane, ys, xs, S,
           inner=S)

    a = 81
    planes_hwa = jnp.asarray(rng.random((h, w, a)), jnp.float32)
    out = timeit(
        "B: per-slot superpatch [S,12,12,81]", extract_B, planes_hwa, ys, xs,
        S, k, nd, inner=S * a, static=(3, 4, 5),
    )
    o = np.asarray(out)
    pn = np.asarray(planes_hwa)
    np.testing.assert_allclose(
        o[i], pn[int(ys[i]) : int(ys[i]) + 12, int(xs[i]) : int(xs[i]) + 12]
    )


if __name__ == "__main__":
    main()
