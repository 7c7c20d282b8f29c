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


def capture(out_dir: str, iters: int) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/pasco_jax_cache"),
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


def report(out_dir: str, top: int) -> None:
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane.pb found under", out_dir)
        return
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {"tqx": "out:csv;"}
    )
    if isinstance(data, bytes):
        data = data.decode()
    lines = data.splitlines()
    print(lines[0])
    for ln in lines[1 : top + 1]:
        print(ln)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="/tmp/pasco_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()
    if not args.report_only:
        capture(args.out, args.iters)
    report(args.out, args.top)
