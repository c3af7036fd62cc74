"""Probe: Pallas pipelined-DMA row gather vs XLA take (round-3 item).

The angular-table row-gather (474k rows of [1, W] from a ~350k-row HBM
table) is 40% of default-parameter device time; XLA's gather runs it at
~0.3 GB/s (measured: 490 ms/ref in-pipeline, 5.6 s cold in a microbench).
Per-row DMA latency is the bottleneck XLA does not pipeline. This kernel
issues row DMAs HBM->HBM with a rotating semaphore window so many are in
flight at once.

Run on chip: python experiments/gather_kernel_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # W must be the full 128-lane tile: Mosaic rejects [1, 88] slices of an
    # HBM memref ("slice shape along dimension 1 must be aligned to tiling")
    V, W = 459 * 757, 128
    S = 29601 * 16
    table = jnp.asarray(rng.integers(0, 25, (V, W)), jnp.int32)
    # semi-sorted indices like the real pipeline (tile-ordered positions)
    base = np.sort(rng.integers(0, V - 40, S)).astype(np.int32)
    idx = jnp.asarray(base + rng.integers(0, 33, S).astype(np.int32))
    jax.block_until_ready((table, idx))

    from lfbm5d_tpu.kernels.gather import gather_rows

    gather = jax.jit(gather_rows)
    t0 = time.time()
    out = gather(table, idx)
    jax.block_until_ready(out)
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)

    # verify ON DEVICE (a host-side check pulls ~400 MB through the tunnel)
    ref = jnp.take(table, idx, axis=0)
    mism = int(jnp.sum(jnp.any(out != ref, axis=1)))
    print(f"correct: {mism == 0} (mismatching rows: {mism})", flush=True)

    for name, fn in [("pallas dma gather", gather),
                     ("xla take", jax.jit(lambda t, f: jnp.take(t, f, axis=0)))]:
        best = 1e9
        o = fn(table, idx)
        jax.block_until_ready(o)
        for _ in range(3):
            t0 = time.time()
            o = fn(table, idx)
            jax.block_until_ready(o)
            _ = np.asarray(o).ravel()[0]
            best = min(best, time.time() - t0)
        gb = S * W * 4 * 2 / 1e9
        print(f"{name}: {best * 1e3:.1f} ms  ({gb / best:.1f} GB/s eff)",
              flush=True)


if __name__ == "__main__":
    main()
