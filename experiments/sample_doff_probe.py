"""On-chip probe: sample_doff throughput at flagship-like sizes.

The flagship default launched run measured UNCHANGED (230.3 vs 229.4 s/LF)
after switching BM-map sampling from the XLA traced gather to sample_doff —
either the profile misattributed the 3.44 s/launch, or the sampler's
per-slot loop costs the same as the gather it replaced. This isolates the
kernel: tables/qyx shaped like one flagship default launch
(n_tiles*r_batch metas, cpt*sc slots each).

Run: python experiments/sample_doff_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lfbm5d_tpu.kernels.gather import sample_doff

    rng = np.random.default_rng(0)
    # flagship default geometry: T=143*207 refs, tt=96/tile -> ~310 tiles,
    # r_batch=7, cpt=24, sc=64, bands 64x120, table 440x768x128
    n_tiles, refs, cpt, sc, l = 310, 7, 24, 64, 128
    bh, bw, th, tw = 64, 120, 440, 768
    tabs = jnp.asarray(rng.integers(0, 25, (refs, th, tw, l)), jnp.int32)
    orig = np.stack(
        [rng.integers(0, th - bh, n_tiles),
         rng.integers(0, tw - bw, n_tiles)], axis=1
    ).astype(np.int32)
    qy = orig[:, None, 0, None, None] + rng.integers(
        0, bh, (n_tiles, refs, cpt, sc)
    )
    qx = orig[:, None, 1, None, None] + rng.integers(
        0, bw, (n_tiles, refs, cpt, sc)
    )
    qyx = jnp.asarray(
        (qy * 2048 + qx).reshape(n_tiles * refs, cpt, sc), jnp.int32
    )
    rsai = jnp.asarray(rng.integers(0, 81, refs), jnp.int32)
    origd = jnp.asarray(orig)
    jax.block_until_ready((tabs, qyx))

    slots = n_tiles * refs * cpt * sc
    fn = jax.jit(lambda t, q, o, r: sample_doff(
        t, q, o, r, bh=bh, bw=bw, c_ang=12
    ))
    t0 = time.time()
    out = fn(tabs, qyx, origd, rsai)
    jax.block_until_ready(out)
    _ = np.asarray(out[0, 0, 0, 0])
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)

    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(tabs, qyx, origd, rsai)
        jax.block_until_ready(out)
        _ = np.asarray(out[0, 0, 0, 0])
        best = min(best, time.time() - t0)
    ns = best * 1e9 / slots
    gb = slots * l * 4 / 1e9
    print(f"sample_doff: {best*1e3:.1f} ms for {slots/1e6:.2f}M slots "
          f"({ns:.0f} ns/slot, {gb/best:.1f} GB/s out)", flush=True)

    # compare: the XLA traced gather this replaced (one ref's worth, x refs)
    tab2 = tabs[0].reshape(-1, l)
    fp = jnp.asarray(
        (qy[:, 0] * tw + qx[:, 0]).reshape(-1), jnp.int32
    )
    g = jax.jit(lambda t, f: jnp.take(t, f, axis=0))
    o = g(tab2, fp)
    jax.block_until_ready(o)
    best_g = 1e9
    for _ in range(3):
        t0 = time.time()
        o = g(tab2, fp)
        jax.block_until_ready(o)
        _ = np.asarray(o[0, 0])
        best_g = min(best_g, time.time() - t0)
    print(f"xla take (1 ref, {len(fp)/1e6:.2f}M rows): {best_g*1e3:.1f} ms "
          f"-> x{refs} refs = {best_g*refs*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
