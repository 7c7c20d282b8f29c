"""Capture a device trace of the flagship forward and print top HLO ops.

Usage:
    python scripts_tpu/profile_forward.py [--iters 3] [--out /tmp/pasco_trace]

Parses the captured ``.xplane.pb`` with xprof's converter and prints the
self-time leaderboard — the measurement loop behind PERF.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pasco_tpu.utils.cache import jax_cache_dir as _jax_cache_dir


def capture(out_dir: str, iters: int) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", _jax_cache_dir()
    ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import entry

    forward, (variables, inp) = entry()

    def reduced(variables, inp):
        o = forward(variables, inp)
        leaves = [
            x.astype(jnp.float32).sum()
            for x in jax.tree_util.tree_leaves(o)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
        ]
        return sum(leaves)

    fn = jax.jit(reduced)
    np.asarray(fn(variables, inp))  # compile + warm
    jax.profiler.start_trace(out_dir)
    for _ in range(iters):
        np.asarray(fn(variables, inp))
    jax.profiler.stop_trace()


def report(out_dir: str, top: int, iters: int = 3) -> None:
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane.pb found under", out_dir)
        return
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    rows = rows[0]["rows"] if isinstance(rows, list) else rows["rows"]
    ops = []
    for r in rows:
        c = [x.get("v") for x in r["c"]]
        if c[1] != "Device":
            continue
        # (type, name, occurrences, total_self_us, measured_bw)
        ops.append((c[2], c[3], int(c[4] or 0), float(c[7]), float(c[15])))
    ops.sort(key=lambda o: -o[3])
    total = sum(o[3] for o in ops)
    print(f"total device self time: {total / 1000 / iters:.1f} ms/iter")

    buckets: dict = {}
    for typ, name, occ, t, bw in ops:
        if typ == "pallas_call":
            key = "pallas"
        elif typ in ("conv_general_dilated", "dot_general"):
            key = "conv/dot"
        elif "gather" in typ:
            key = "gather"
        elif "scatter" in typ:
            key = "scatter"
        elif typ == "IDLE":
            key = "idle"
        else:
            key = "other"
        buckets[key] = buckets.get(key, 0.0) + t
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:10s} {v / 1000 / iters:7.2f} ms/iter")
    print()
    print(f"{'ms/iter':>8s}  {'#':>4s}  {'GB/s':>5s}  op")
    for typ, name, occ, t, bw in ops[:top]:
        print(f"{t / 1000 / iters:8.2f}  {occ:4d}  {bw:5.0f}  {name[:100]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="/tmp/pasco_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()
    if not args.report_only:
        capture(args.out, args.iters)
    report(args.out, args.top, args.iters)
