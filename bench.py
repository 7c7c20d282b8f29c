"""Benchmark: flagship model (PaSCo-single, SemanticKITTI config) on one chip.

Measures end-to-end jitted forward throughput (scans/sec) over synthetic
SemanticKITTI-sized scans drawn with the reference's eval-protocol
augmentation (``eval.py:56`` runs validation with ``data_aug=True``:
random rotation up to +-30deg + small translation per scan) — the same
quantity the reference reports as "inference time" (0.703 s/scan on a
V100-32G for PaSCo-single, reference README.md:411; timed region
``net_panoptic_sparse.py:228-250``).

Each scan dispatches to the smallest pre-compiled working-box program
covering its bbox (``pasco_tpu/inference/dispatch.py``) — mirroring the
reference, whose sparse tensors span each scan's actual extent instead of
a fixed union box.  Default protocol: pipelined throughput (scans
dispatched back-to-back, fetched at the end — steady-state serving;
see the protocol note at the measurement site).  Reported value =
scans / wall-second.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup over the reference V100 number.

Env knobs: BENCH_SCANS (default 6), BENCH_ITERS per scan (default 4),
BENCH_PER_SCAN=1 switches to the strict per-scan-latency protocol
(host fetch per sample, tunnel RTT included), BENCH_BATCH>1 switches
to the vmapped batched-throughput measurement, BENCH_FIXED_BOX=1
disables adaptive dispatch (old protocol), BENCH_TRAINED_CKPT=path
loads trained weights (realistic decoder keep-set sparsity; see
scripts_tpu/make_bench_ckpt.py).

``python bench.py --compile-only`` is the ON-CHIP COMPILE GATE: it
lowers + compiles every dispatch candidate (and, with BENCH_INFERS=3,
the ensemble config) on the real TPU without running them, so a kernel
that only ever met the Pallas interpreter cannot ship again (the round-2
failure mode: Mosaic rejected a kernel the interpreter accepted).  Run it
before every snapshot; it is warm-cache fast (~a minute) once the
programs are in the persistent compile cache.
"""

from __future__ import annotations

import json
import os

import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pasco_tpu.utils.cache import jax_cache_dir as _jax_cache_dir

BASELINE_SCAN_SEC = 0.703  # reference PaSCo-single inference time on V100
BASELINE_SCAN_SEC_N3 = 1.193  # reference PaSCo (n_infers=3), README.md:449


def _load_bench_ckpt(path: str, like):
    """Load a scripts_tpu/make_bench_ckpt.py npz into the ``like`` variable
    tree (same structure; leaves cast to ``like``'s dtypes).  Lets the
    bench run TRAINED weights: random init keeps ~every decoder voxel
    ((C-1)/C of cells pass ``argmax != 0``) while trained completion heads
    prune toward true occupancy — the regime the tile-skipping kernels
    are built for.  The default protocol (no env var) stays random-init."""
    import jax.numpy as jnp
    import numpy as np

    data = np.load(path)
    nested: dict = {}
    for k in data.files:
        parts = k.split("/")
        d = nested
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = data[k]

    def fill(like_node, new_node):
        if hasattr(like_node, "items"):
            return {k: fill(v, new_node[k]) for k, v in like_node.items()}
        return jnp.asarray(new_node, like_node.dtype)

    return fill(like, nested)


def _reduced(forward):
    import jax
    import jax.numpy as jnp

    def fn(variables, inp):
        o = forward(variables, inp)
        leaves = [
            x.astype(jnp.float32).sum()
            for x in jax.tree_util.tree_leaves(o)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
        ]
        return sum(leaves)

    return fn


def compile_only():
    """On-chip compile gate: lower + compile every dispatch candidate for
    n_infers in {1, 3} (the reference's two headline configs) without
    executing.  Exits nonzero on the first Mosaic/XLA rejection."""
    import dataclasses

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", _jax_cache_dir()),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from __graft_entry__ import _synthetic_model_input
    from pasco_tpu.core.config import PaSCoConfig
    from pasco_tpu.data.semantic_kitti.params import CLASS_FREQUENCIES
    from pasco_tpu.inference.dispatch import AdaptiveForward
    from pasco_tpu.models.unet import build_net
    from pasco_tpu.training.step import labelweights_for

    infers = [
        int(v)
        for v in os.environ.get("BENCH_COMPILE_INFERS", "1,3").split(",")
    ]
    n_done = 0
    for ni in infers:
        cfg = PaSCoConfig()
        if ni != 1:
            cfg = cfg.replace(
                model=dataclasses.replace(cfg.model, n_infers=ni)
            )
        lw = labelweights_for(cfg, CLASS_FREQUENCIES)
        inp, _, _ = _synthetic_model_input(cfg, n_points=2048)
        net0 = build_net(cfg)
        variables = jax.eval_shape(
            lambda i: net0.init(
                {"params": jax.random.PRNGKey(0)}, i, lw, train=False
            ),
            inp,
        )
        adaptive = AdaptiveForward(cfg, lw)
        for cand in adaptive.cands:
            t0 = time.perf_counter()
            fn = adaptive.fn_for(cand)
            fn.lower(variables, inp).compile()
            n_done += 1
            print(
                f"compiled n_infers={ni} box={cand} "
                f"in {time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
    print(
        json.dumps(
            {
                "metric": "compile_gate_programs",
                "value": n_done,
                "unit": "programs",
                "vs_baseline": 1.0,
            }
        )
    )


def main():
    import jax

    # Persistent compile cache: the axon TPU backend compiles sort/scatter
    # primitives at ~5-20 s each, so the first full-model compile is tens of
    # minutes; the cache makes every later run start in seconds.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", _jax_cache_dir()
    ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import dataclasses

    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_model_input, entry
    from pasco_tpu.core.config import PaSCoConfig
    from pasco_tpu.data.semantic_kitti.collate import collate
    from pasco_tpu.data.semantic_kitti.dataset import process_scene
    from pasco_tpu.data.semantic_kitti.params import CLASS_FREQUENCIES
    from pasco_tpu.data.synthetic import make_scene
    from pasco_tpu.data.transform_utils import generate_random_transformation
    from pasco_tpu.inference.dispatch import AdaptiveForward
    from pasco_tpu.training.step import labelweights_for, scene_to_model_input

    forward, (variables, inp0) = entry()
    trained = os.environ.get("BENCH_TRAINED_CKPT")
    if trained:
        variables = _load_bench_ckpt(trained, variables)

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    n_iters = int(os.environ.get("BENCH_ITERS", "4"))

    if batch > 1:
        # Batched throughput: vmap B independent scans per dispatch.  The
        # scalar-prefetch Pallas kernels batch through their custom_vmap
        # rules (ops/pallas_batch.py) — one kernel call per element inside
        # ONE jit program (a TPU core executes ops sequentially anyway;
        # batching amortises dispatch overhead and batches the XLA graph
        # between kernels).  BENCH_BATCH_PALLAS=0 re-measures the old
        # XLA-formulation fallback for comparison.
        from pasco_tpu.models.unet import build_net

        cfg = PaSCoConfig()
        if os.environ.get("BENCH_BATCH_PALLAS", "1") == "0":
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, pallas_conv="off")
            )
        net = build_net(cfg)
        lw = labelweights_for(cfg, CLASS_FREQUENCIES)

        def fwd(variables, inp):
            return net.apply(variables, inp, lw, train=False)

        # B DISTINCT scans (same full working box -> same static shapes).
        inps = [inp0] + [
            _synthetic_model_input(cfg, seed=100 + k)[0]
            for k in range(batch - 1)
        ]
        binp = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *inps
        )
        rfn = jax.jit(jax.vmap(_reduced(fwd), in_axes=(None, 0)))
        jax.block_until_ready(rfn(variables, binp))  # compile
        np.asarray(rfn(variables, binp))             # warm + full sync
        samples = []
        for _ in range(max(n_iters, 6)):
            t0 = time.perf_counter()
            np.asarray(rfn(variables, binp))
            samples.append((time.perf_counter() - t0) / batch)
        dt = sorted(samples)[len(samples) // 2]
        scans_per_sec = 1.0 / dt
    else:
        cfg = PaSCoConfig()
        # BENCH_INFERS=3 measures the ensemble-scale flagship (the
        # reference's headline PaSCo config, README.md:428-459: each subnet
        # sees a differently-augmented copy of the scan).
        n_infers = int(os.environ.get("BENCH_INFERS", "1"))
        if trained and n_infers != 1:
            raise SystemExit(
                "BENCH_TRAINED_CKPT is trained at n_infers=1; "
                "unset it for BENCH_INFERS != 1"
            )
        if n_infers != 1:
            cfg = cfg.replace(
                model=dataclasses.replace(cfg.model, n_infers=n_infers)
            )
        lw = labelweights_for(cfg, CLASS_FREQUENCIES)
        fixed = os.environ.get("BENCH_FIXED_BOX", "0") == "1"
        if fixed:
            cfg = cfg.replace(
                scene=dataclasses.replace(cfg.scene, box_candidates=())
            )
        if n_infers != 1:
            from __graft_entry__ import _synthetic_model_input
            from pasco_tpu.models.unet import build_net

            net0 = build_net(cfg)
            inp_init, _, _ = _synthetic_model_input(cfg)
            variables = jax.jit(
                lambda i: net0.init(
                    {"params": jax.random.PRNGKey(0)}, i, lw, train=False
                )
            )(inp_init)
        adaptive = AdaptiveForward(cfg, lw)
        rfns = {
            cand: jax.jit(_reduced(adaptive.fn_for(cand)))
            for cand in adaptive.cands
        }

        # Scans drawn with the eval augmentation distribution (+-30deg
        # rotation, 0.2 m translation — scripts_tpu/eval.py defaults).
        n_scans = int(os.environ.get("BENCH_SCANS", "6"))
        rng = np.random.RandomState(0)
        scans = []
        for k in range(n_scans):
            scene = make_scene(
                rng,
                scene_size=cfg.scene.scene_size,
                n_points=min(cfg.capacity.num_points, 120000),
                point_feat_dim=cfg.model.in_channels - 6,
            )
            T = generate_random_transformation(
                rng, max_angle=30.0, scale_range=0.0,
                max_translation=(0.2, 0.2, 0.1),
            )
            subs = [process_scene(scene, T, rng)]
            for _ in range(n_infers - 1):
                Ti = generate_random_transformation(
                    rng, max_angle=30.0, scale_range=0.0,
                    max_translation=(0.2, 0.2, 0.1),
                )
                subs.append(process_scene(scene, Ti, rng))
            col = collate(subs, cfg, rng=rng)
            scans.append(scene_to_model_input(col))

        # Warm every candidate program that will be dispatched.
        per_scan = [adaptive.box_for(s) for s in scans]
        for cand in sorted(set(per_scan)):
            s = scans[per_scan.index(cand)]
            jax.block_until_ready(rfns[cand](variables, s))

        if os.environ.get("BENCH_PER_SCAN", "0") != "1":
            # DEFAULT: pipelined throughput — dispatch every scan
            # back-to-back and fetch once at the end.  This is the
            # steady-state serving rate, and it is the quantity the
            # reference's "inference time" actually reflects: its eval
            # loop overlaps the next scan's dataloading with GPU compute
            # and pays a local-PCIe sync, while this sandbox's per-scan
            # host fetch crosses a network tunnel to the remote TPU
            # (~40 ms RTT measured — none of it device work).  The
            # stricter per-scan-latency protocol (each sample fetched to
            # host before the next is dispatched, tunnel RTT included)
            # stays available under BENCH_PER_SCAN=1 and is reported
            # alongside in PERF.md.
            reps = max(n_iters, 2)
            outs = [rfns[c](variables, s) for s, c in zip(scans, per_scan)]
            np.asarray(sum(outs))  # warm + sync
            t0 = time.perf_counter()
            outs = []
            for _ in range(reps):
                outs.extend(
                    rfns[c](variables, s) for s, c in zip(scans, per_scan)
                )
            np.asarray(sum(outs))
            dt = (time.perf_counter() - t0) / (reps * len(scans))
            scans_per_sec = 1.0 / dt
        else:
            # Per-scan latency: each sample fetches a scalar reduction of
            # the outputs to the host (block_until_ready does not reliably
            # wait for remote execution on this backend) before the next
            # scan is dispatched.
            lat = []
            for s, cand in zip(scans, per_scan):
                rfn = rfns[cand]
                samples = []
                for _ in range(n_iters):
                    t0 = time.perf_counter()
                    np.asarray(rfn(variables, s))
                    samples.append(time.perf_counter() - t0)
                lat.append(sorted(samples)[len(samples) // 2])
            scans_per_sec = 1.0 / float(np.mean(lat))

    ni = int(os.environ.get("BENCH_INFERS", "1"))
    base = BASELINE_SCAN_SEC_N3 if ni == 3 else BASELINE_SCAN_SEC
    name = "inference_scans_per_sec" + ("" if ni == 1 else f"_n{ni}")
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(scans_per_sec, 3),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec * base, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--compile-only" in sys.argv:
        compile_only()
    else:
        main()
