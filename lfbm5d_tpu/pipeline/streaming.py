"""Batched multi-LF streaming throughput (driver config 5).

Shards a batch of light fields over the device mesh: each device runs the
full two-step pipeline on its sub-batch (vmap over the local shard inside
shard_map). No cross-chip communication is needed inside a light field
(SURVEY.md §5.8) — collectives appear only if a reduction over the batch is
requested by the caller.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lfbm5d_tpu.config import DenoiseParams
from lfbm5d_tpu.pipeline.denoise import (
    _sigma_channels,
    build_denoise_fn,
    execution_tier,
    run_bm5d,
)


@lru_cache(maxsize=None)
def _jit_per_lf(fn):
    """Cache jit wrappers across denoise_batch calls: a fresh jax.jit(fn)
    per call re-TRACES on its first use (~0.5-1 s), which measured as a
    +23-45%% per-LF overhead in the round-3 streaming bench."""
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _jit_vmapped(fn):
    return jax.jit(jax.vmap(fn, in_axes=(0, None)))


@lru_cache(maxsize=None)
def _jit_one_per_device(fn, mesh, axis):
    def one_per_device(shard, sigma_c):
        basic, final = fn(shard[0], sigma_c)
        return basic[None], final[None]

    return jax.jit(shard_map(
        one_per_device, mesh=mesh, in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis)), check_vma=False,
    ))


@lru_cache(maxsize=None)
def _jit_sharded_vmap(fn, mesh, axis):
    # check_vma=False: the per-LF pipeline uses no collectives, and its
    # scan carries are initialized replicated (vma tracking rejects them).
    return jax.jit(shard_map(
        jax.vmap(fn, in_axes=(0, None)),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    ))


def _run_with_retry(call, args, retries: int, on_fail: str, fallback):
    """Driver-level failure isolation (SURVEY.md §5.3): retry a per-LF (or
    per-chunk) device call, then degrade per `on_fail`.

    'raise' re-raises; 'identity' substitutes `fallback()` (the noisy
    input as both basic and final — the batch survives, the bad LF is
    reported). Returns (result, n_attempts, error_or_None)."""
    err = None
    for attempt in range(retries + 1):
        try:
            return call(*args), attempt + 1, None
        except Exception as e:  # XlaRuntimeError etc. — device faults
            err = e
    if on_fail == "identity":
        return fallback(), retries + 1, err
    raise err


def denoise_batch(
    lfs,
    params: DenoiseParams,
    mesh: Mesh | None = None,
    dtype: str = "float32",
    engine: str = "xla",
    retries: int = 0,
    on_fail: str = "raise",
    return_report: bool = False,
):
    """Denoise a batch of LFs [B, aH, aW, H, W, C].

    With a mesh, the batch axis is sharded over the mesh's single axis
    (B must be divisible by the axis size). Returns (basic, final) batches.

    Engine batching: the XLA path vmaps over the local shard. The Pallas
    kernel engine is a per-LF grid program (not vmap-batchable), and
    wrapping it in lax.map degrades the per-LF body ~2.8x (measured:
    6.2 s/LF scanned vs 2.2 s/LF dispatched at 5x5x192x256) — so the
    kernel engine streams as a HOST loop over batch chunks, each chunk one
    shard_map call running ONE LF per device. Whole LFs stay embarrassingly
    parallel over the mesh with zero collectives inside an LF
    (SURVEY.md §5.8); per-chunk dispatch overhead is milliseconds.

    Failure isolation (SURVEY.md §5.3): with retries > 0 and/or
    on_fail='identity', a faulted device call is retried and then — instead
    of poisoning the whole batch — replaced by the identity estimate (the
    noisy input) for its LF (host-loop paths) or its mesh-sized chunk (the
    sharded chunk path; that is the call granularity). The vmapped XLA
    paths run the whole batch as ONE program, so isolation there is
    retry-only. With return_report=True, also returns a list of
    {index, attempts, error} entries for degraded LFs/chunks.
    """
    # device arrays pass through as-is: np.asarray(lfs) here round-tripped
    # the WHOLE batch device->host->device on every call (measured 17 s/LF
    # through the axon tunnel at flagship scale — it was the entire
    # "streaming overhead" of the round-3 accounting, see BASELINE.md)
    if isinstance(lfs, jax.Array):
        lfs = lfs.astype(jnp.dtype(dtype))
    else:
        lfs = jnp.asarray(np.asarray(lfs), jnp.dtype(dtype))
    b, a_h, a_w, h, w, c = lfs.shape
    sigma_c = _sigma_channels(params.sigma, params.color_space, c, dtype)

    kernel_engine = engine.startswith("pallas") or (
        engine == "auto" and jax.default_backend() == "tpu"
    )

    report: list[dict] = []

    def _pack(pair):
        return (pair, report) if return_report else pair

    # HEAVY execution tiers (banked-fused per-step programs / launched
    # multi-dispatch execution): these cannot run as the single jitted
    # program build_denoise_fn composes — at 17x17 scale that program
    # faults the device (BASELINE.md round-3) — so they route PER LF
    # through run_bm5d, which applies the proven slot tiering. With a
    # mesh, LFs round-robin over its devices: committed inputs pin each
    # LF's whole launch sequence to its device, async dispatch overlaps
    # the devices, and there is still zero cross-chip traffic inside an
    # LF (SURVEY.md §5.8). Outputs are restacked on the default device.
    tier = execution_tier(params, a_h, a_w, h, w, engine)
    if kernel_engine and tier != "single":
        devices = list(mesh.devices.flat) if mesh is not None else [None]
        outs = []
        for i in range(b):
            dev = devices[i % len(devices)]
            lf_i = jax.device_put(lfs[i], dev) if dev is not None else lfs[i]
            out, attempts, err = _run_with_retry(
                lambda x: run_bm5d(x, params, dtype=dtype, engine=engine,
                                   sigma_c=sigma_c),
                (lf_i,), retries, on_fail,
                lambda i=i: (lfs[i], lfs[i]),
            )
            if err is not None:
                report.append(
                    {"index": i, "attempts": attempts, "error": repr(err)}
                )
            outs.append(out)
        d0 = jax.devices()[0]
        return _pack((
            jnp.stack([jax.device_put(o[0], d0) for o in outs]),
            jnp.stack([jax.device_put(o[1], d0) for o in outs]),
        ))

    fn = build_denoise_fn(params, a_h, a_w, h, w, c, dtype, engine)

    if mesh is None:
        if kernel_engine:
            jfn = _jit_per_lf(fn)
            outs = []
            for i in range(b):
                out, attempts, err = _run_with_retry(
                    jfn, (lfs[i], sigma_c), retries, on_fail,
                    lambda i=i: (lfs[i], lfs[i]),
                )
                if err is not None:
                    report.append(
                        {"index": i, "attempts": attempts, "error": repr(err)}
                    )
                outs.append(out)
            return _pack((
                jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]),
            ))
        out, attempts, err = _run_with_retry(
            _jit_vmapped(fn), (lfs, sigma_c), retries, on_fail,
            lambda: (lfs, lfs),
        )
        if err is not None:
            report.append(
                {"index": None, "attempts": attempts, "error": repr(err)}
            )
        return _pack(out)

    (axis,) = mesh.axis_names
    if b % mesh.size:
        raise ValueError(f"batch {b} not divisible by mesh size {mesh.size}")

    if kernel_engine:
        # one LF per device per call; host loop over B / mesh.size chunks
        sharded_one = _jit_one_per_device(fn, mesh, axis)
        outs = []
        for j in range(0, b, mesh.size):
            chunk = jax.device_put(
                lfs[j : j + mesh.size], NamedSharding(mesh, P(axis))
            )
            out, attempts, err = _run_with_retry(
                sharded_one, (chunk, sigma_c), retries, on_fail,
                lambda j=j: (lfs[j : j + mesh.size], lfs[j : j + mesh.size]),
            )
            if err is not None:
                report.append(
                    {"index": j, "attempts": attempts, "error": repr(err)}
                )
            outs.append(out)
        return _pack((
            jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]),
        ))

    lfs = jax.device_put(lfs, NamedSharding(mesh, P(axis)))
    out, attempts, err = _run_with_retry(
        _jit_sharded_vmap(fn, mesh, axis), (lfs, sigma_c), retries, on_fail,
        lambda: (lfs, lfs),
    )
    if err is not None:
        report.append(
            {"index": None, "attempts": attempts, "error": repr(err)}
        )
    return _pack(out)
