"""Benchmark harness: north-star metric on real TPU hardware.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mpix/s", "vs_baseline": N, ...}

Default config IS the headline BASELINE.json metric: a 9x9 light field at
EPFL-Lytro resolution (434x625 RGB), sigma=25 AWGN, full two-step HT+Wiener
in OPP color space, at the `matched` preset — the fastest preset measured
at-or-above reference-default PSNR on this LF (BASELINE.md round-3 knee
sweeps; "Mpix/s at matched PSNR" is the north-star definition,
BASELINE.json:2/:5). Rounds 1-2 defaulted to a 5x5x192x256 fast-preset
PROXY because the flagship compile took ~8 min then; round-3 kernel work
cut the matched-preset flagship compile to ~50 s, so the official number
now measures the real config. `--proxy` reproduces the r01/r02 continuity
config exactly (5x5, fast preset) and rebases vs_baseline against the
round-1 recorded 0.495 Mpix/s.

No LF datasets exist on this machine (SURVEY.md §0), so the LF is synthetic
with genuine disparity structure; PSNR against the clean LF is reported
alongside throughput, and the matched preset's PSNR on this LF equals the
reference-default-parameter PSNR (28.418 vs 28.416 dB, BASELINE.md).

Measurement protocol (round-3, VERDICT weak #1): the first run is
warm-up/compile and is never counted; the timed loop then takes --runs
samples (default 3) and reports min plus every sample and the spread, so a
single slow sample cannot silently regress the recorded number (this
machine's tunnel shows up to 2.2x cross-session variance on some configs;
see BASELINE.md).

Usage: python bench.py [--quick|--proxy] [--preset default|fast|matched|robust]
                       [--runs N]
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="(now the default) headline config: 9x9 x 434x625 "
                    "RGB at the matched preset")
    ap.add_argument("--proxy", action="store_true",
                    help="rounds-1/2 continuity config: 5x5 x 192x256 at "
                    "the fast preset (unless --preset overrides); "
                    "vs_baseline rebases to the round-1 recorded value")
    ap.add_argument("--quick", action="store_true",
                    help="small LF (3x3x96x128) smoke test")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--preset", default=None,
                    choices=["default", "fast", "matched", "robust",
                             "adaptive", "adaptive-region"],
                    help="'default' = reference-default parameters; 'fast' = "
                    "throughput preset (N=8, p=6, smaller search windows); "
                    "'matched' = fastest preset measured at-or-above "
                    "reference-default PSNR on the bench LF (the headline "
                    "default); 'robust' = within 0.05 dB of default on "
                    "every tested content class (BASELINE.md knee sweeps); "
                    "'adaptive' = content probe routes matched/robust per "
                    "LF — the probe runs INSIDE the timed loop, so this row "
                    "is the honest across-content number (VERDICT r3)")
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "pallas", "pallas_bf16", "xla"])
    ap.add_argument("--sigma", type=float, default=25.0)
    ap.add_argument("--family", default="two-plane",
                    choices=["two-plane", "low-disp", "occl3", "occl-grad",
                             "static-min", "static-flat"],
                    help="bench LF content family (lf/synth.py; default = "
                    "the historical two-plane bench LF). 'occl-grad' is the "
                    "weak-texture class the adaptive router sends to robust "
                    "— '--preset adaptive --family occl-grad' is the "
                    "official ROUTED-content row (VERDICT r4 item 4)")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="dump a jax.profiler trace of the measured runs "
                    "to DIR (SURVEY.md §5.1)")
    args = ap.parse_args()

    import jax

    from lfbm5d_tpu.utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from lfbm5d_tpu.config import preset_denoise_params
    from lfbm5d_tpu.lf import psnr, psnr_device, synthetic_lf
    from lfbm5d_tpu.lf.noise import add_noise_np
    from lfbm5d_tpu.pipeline import run_bm5d

    if args.quick:
        a_h = a_w = 3
        h, w = 96, 128
    elif args.proxy:
        a_h = a_w = 5
        h, w = 192, 256
    else:
        a_h = a_w = 9
        h, w = 434, 625
        args.full = True

    if args.preset is None:
        # headline default = matched preset; the proxy's continuity config
        # is the fast preset it was recorded with in rounds 1/2
        args.preset = "fast" if (args.proxy or args.quick) else "matched"
    adaptive = args.preset in ("adaptive", "adaptive-region")
    if not adaptive:
        params = preset_denoise_params(args.preset, args.sigma, chunk=128)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    t0 = time.time()
    if args.family == "two-plane":
        clean = synthetic_lf(a_h, a_w, h, w, channels=3, disp_bg=1,
                             disp_fg=2, seed=0)
    else:
        # same family definitions as experiments/content_family.py (the
        # round-4 validation matrix) at the bench shape, seed 0
        from lfbm5d_tpu.lf.synth import synthetic_lf_multi

        fam = {
            "low-disp": lambda: synthetic_lf(
                a_h, a_w, h, w, 3, disp_bg=0, disp_fg=1, seed=0),
            "occl3": lambda: synthetic_lf_multi(
                a_h, a_w, h, w, 3, disps=(0.5, 1.5, 3.0), seed=0,
                blob_frac=0.3),
            "occl-grad": lambda: synthetic_lf_multi(
                a_h, a_w, h, w, 3, disps=(0.5, 1.5, 3.0), seed=0,
                blob_frac=0.3, texture_grad=0.7),
            "static-min": lambda: synthetic_lf(
                a_h, a_w, h, w, 3, disp_bg=0, disp_fg=2, seed=0),
            "static-flat": lambda: synthetic_lf_multi(
                a_h, a_w, h, w, 3, disps=(0.0, 2.0), seed=0,
                blob_frac=0.25, flat_frac=0.4),
        }
        clean = fam[args.family]()
    noisy = add_noise_np(clean, args.sigma, seed=1)
    print(f"synth LF {clean.shape} in {time.time()-t0:.1f}s", file=sys.stderr)

    # Input residency: the north-star metric times the denoise compute, not
    # host->device transfer (the axon tunnel moves this 9x9 LF in seconds);
    # ship the input to HBM once before the timed loop.
    import jax.numpy as jnp

    noisy_dev = jnp.asarray(noisy, jnp.float32)
    jax.block_until_ready(noisy_dev)

    # Sync fence: one pre-compiled single-module probe (a scalar fetch
    # round-trips the stream; block_until_ready alone has been observed not
    # to block through the axon tunnel). Naive final[0,0,0,0,0] dispatches
    # THREE modules (dynamic_slice, squeeze, convert) at ~25-35 ms tunnel
    # round-trip each — measurement overhead, not denoise cost.
    probe = jax.jit(lambda x: x.reshape(-1)[0])

    selected = None
    if adaptive:
        # content probe (host, two SAIs) re-runs INSIDE the timed loop —
        # the adaptive row's cost includes choosing the preset. The probe
        # reads the host copy of the noisy LF (a 3 MB/s-download tunnel
        # makes device->host the wrong direction; real drivers also hold
        # the LF on the host, where it was loaded).
        from lfbm5d_tpu.pipeline.adaptive import (
            denoise_region_adaptive,
            select_preset,
        )

        if args.preset == "adaptive-region":
            # probe + (possibly) region compositing inside the timed loop:
            # the official routed-content row once the content localizes a
            # weak region (VERDICT r4 item 4 / round-4 item 2c)
            def run_once():
                basic, final, info = denoise_region_adaptive(
                    noisy_dev, args.sigma, engine=args.engine
                )
                return info["mode"], (basic, final)
        else:
            def run_once():
                name, _ = select_preset(noisy, args.sigma)
                p = preset_denoise_params(name, args.sigma, chunk=128)
                return name, run_bm5d(noisy_dev, p, engine=args.engine)

        t0 = time.time()
        selected, (basic, final) = run_once()
        jax.block_until_ready(final)
        compile_and_first = time.time() - t0
        float(probe(final))
        print(f"adaptive probe selected preset: {selected}", file=sys.stderr)
    else:
        def run_once():
            return args.preset, run_bm5d(noisy_dev, params,
                                         engine=args.engine)

        # warmup / compile
        t0 = time.time()
        basic, final = run_bm5d(noisy_dev, params, engine=args.engine)
        jax.block_until_ready(final)
        compile_and_first = time.time() - t0
        float(probe(final))  # compile the probe outside the timed loop
    print(f"compile+first run: {compile_and_first:.1f}s", file=sys.stderr)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    times = []
    for _ in range(args.runs):
        t0 = time.time()
        selected, (basic, final) = run_once()
        float(probe(final))
        times.append(time.time() - t0)
    dt = min(times)
    spread = (max(times) - min(times)) / min(times)
    if args.profile:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile}", file=sys.stderr)
        try:
            from lfbm5d_tpu.utils.profiling import print_top

            print_top(args.profile, 12, file=sys.stderr)
        except Exception as e:  # xprof optional
            print(f"(trace aggregation unavailable: {e})", file=sys.stderr)

    mpix = a_h * a_w * h * w / 1e6
    value = mpix / dt
    p_noisy = psnr(np.clip(noisy, 0, 255), clean)
    # PSNR reductions on-device: np.asarray(final) would pull 264 MB
    # through the ~3 MB/s tunnel download (~85 s per array at 9x9 scale)
    p_final = psnr_device(final, clean)
    p_basic = psnr_device(basic, clean)

    # metric labels the ACTUAL measured configuration
    if args.full:
        tag = "9x9 EPFL-scale headline config, north star >= 50 Mpix/s"
    elif args.proxy:
        tag = "rounds-1/2 continuity proxy for the 9x9 headline"
    else:
        tag = "quick smoke config"
    # vs_baseline divides by the 50 Mpix/s north-star target ONLY for the
    # config it is defined on (the 9x9 EPFL shape); the 5x5 proxy is rebased
    # against its own recorded round-1 driver value (BENCH_r01.json:
    # 0.495 Mpix/s, fast preset) so the ratio tracks progress on the
    # identical config instead of mixing configs (VERDICT weak #8).
    if args.full and args.family == "two-plane":
        vs_b = round(value / 50.0, 4)
        vs_ref = "50 Mpix/s north-star target"
    elif args.full:
        vs_b, vs_ref = None, (
            "no recorded baseline for this content family (routed-content "
            "row; see BASELINE.md content matrix)"
        )
    elif args.proxy and args.preset == "fast":
        vs_b = round(value / 0.495, 4)
        vs_ref = "round-1 recorded proxy value 0.495 Mpix/s (BENCH_r01.json)"
    else:
        vs_b, vs_ref = None, "no recorded baseline for this configuration"
    fam_tag = "" if args.family == "two-plane" else f" family={args.family},"
    result = {
        "metric": (
            f"Mpix/s denoised, two-step HT+Wiener, "
            f"{a_h}x{a_w}x{h}x{w} RGB synthetic LF,{fam_tag} "
            f"sigma={args.sigma:g}, preset={args.preset} ({tag})"
        ),
        "value": round(value, 3),
        "unit": "Mpix/s",
        "vs_baseline": vs_b,
        "vs_baseline_ref": vs_ref,
        "seconds_per_lf": round(dt, 3),
        "run_seconds": [round(t, 3) for t in times],
        "spread_frac": round(spread, 3),
        "compile_plus_first_s": round(compile_and_first, 1),
        "mpix": round(mpix, 2),
        "psnr_noisy_db": round(p_noisy, 2),
        "psnr_basic_db": round(p_basic, 2),
        "psnr_final_db": round(p_final, 2),
        "preset": args.preset,
        "family": args.family,
        "shape": [a_h, a_w, h, w, 3],
        "quick": bool(args.quick),
    }
    if adaptive:
        result["adaptive_selected"] = selected
    print(json.dumps(result))


if __name__ == "__main__":
    main()
