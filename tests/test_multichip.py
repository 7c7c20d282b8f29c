"""Multi-chip (virtual 8-device CPU mesh) sharding tests."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles

import jax


@pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 virtual devices"
)
def test_dryrun_multichip_4():
    import sys, os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4)


def test_mesh_helpers():
    from pasco_tpu.parallel.mesh import make_mesh, replicate_to_mesh

    mesh = make_mesh(min(2, len(jax.devices())))
    x = replicate_to_mesh({"a": np.ones((4, 4))}, mesh)
    assert np.allclose(np.asarray(x["a"]), 1.0)


@pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 virtual devices"
)
def test_dp_update_matches_single_device():
    """DP over 4 copies of ONE scene with shared rng == the single-device
    train step: pmean of identical gradients is the gradient, so the
    updated parameters must agree to float tolerance (the scaling assert
    — cross-replica BN reduces to per-scene BN for identical scenes)."""
    from functools import partial

    import jax.numpy as jnp

    from pasco_tpu.core.config import tiny_config
    from pasco_tpu.data.semantic_kitti.collate import collate
    from pasco_tpu.data.semantic_kitti.dataset import process_scene
    from pasco_tpu.data.synthetic import make_scene
    from pasco_tpu.models.unet import build_net
    from pasco_tpu.parallel.mesh import (
        dp_train_step, make_mesh, replicate_to_mesh, shard_batch_to_mesh,
        stack_scenes)
    from pasco_tpu.training.step import (
        class_weight_vector, create_train_state, labelweights_for,
        scene_to_model_input, targets_to_device, train_step)

    cfg = tiny_config(n_infers=1)
    net = build_net(cfg)
    freqs = {s: np.ones(cfg.model.n_classes) for s in (1, 2, 4)}
    lw = labelweights_for(cfg, freqs)
    cw = jnp.asarray(
        class_weight_vector(cfg.model.n_classes, cfg.loss.no_object_weight)
    )
    rng = np.random.RandomState(0)
    scene = collate(
        [
            process_scene(
                make_scene(
                    rng, scene_size=cfg.scene.scene_size, n_points=1200,
                    point_feat_dim=cfg.model.in_channels - 6, n_things=3,
                ),
                None, rng,
            )
        ],
        cfg, max_targets=32,
    )

    state, tx = create_train_state(
        net, cfg, scene_to_model_input(scene), lw, jax.random.PRNGKey(0)
    )

    # single-device reference update
    key = jax.random.PRNGKey(7)
    ref_state, ref_logs = jax.jit(
        partial(
            train_step, net=net, tx=tx, labelweights=lw, class_weight=cw,
            cfg=cfg,
        )
    )(state, scene_to_model_input(scene),
      targets_to_device(scene.targets), key)

    # DP over 4 identical scenes, shared rng
    mesh = make_mesh(4)
    inp, tgt = stack_scenes([scene] * 4)
    inp = shard_batch_to_mesh(inp, mesh)
    tgt = shard_batch_to_mesh(tgt, mesh)
    dstate = replicate_to_mesh(state, mesh)
    dp_state, dp_logs = jax.jit(
        partial(
            dp_train_step, mesh=mesh, net=net, tx=tx, labelweights=lw,
            class_weight=cw, cfg=cfg, fold_axis_rng=False,
        )
    )(dstate, inp, tgt, key)

    # The single-device step splits its key differently from dp's device
    # path only through fold_in(state.step) — both fold step 0.  Compare
    # losses and updated params.
    np.testing.assert_allclose(
        float(dp_logs["total_loss"]), float(ref_logs["total_loss"]),
        rtol=2e-4,
    )
    ref_flat, _ = jax.flatten_util.ravel_pytree(ref_state.params)
    dp_flat, _ = jax.flatten_util.ravel_pytree(dp_state.params)
    np.testing.assert_allclose(
        np.asarray(dp_flat), np.asarray(ref_flat), rtol=2e-3, atol=2e-5,
    )


@pytest.mark.parametrize("n_devices", [2, 4])
def test_flagship_width_dp_step(n_devices):
    """One DP step at FULL flagship layer widths (f=64, 384-dim/100-query
    transformer, 3 res blocks per stage, aux criterion levels ON) on a
    2- and a 4-device mesh.  The driver dryrun shrinks conv
    widths/blocks/aux to fit its budget (core/config.py:dryrun_config);
    this test keeps every width at the released values and shrinks only
    the BOX (32x32x8) and capacities, so width-dependent sharding rules
    (per-layer replication layouts, collective shapes at real channel
    counts) are exercised somewhere.  f32 compute: XLA:CPU emulates bf16
    per-op (the dryrun's documented ladder); sharding rules are
    dtype-independent."""
    if len(jax.devices()) < n_devices:
        pytest.skip(f"needs >= {n_devices} virtual devices")
    import dataclasses
    from functools import partial

    import jax.numpy as jnp

    from pasco_tpu.core.config import (
        CapacityConfig, PaSCoConfig, SceneConfig)
    from pasco_tpu.data.semantic_kitti.collate import collate
    from pasco_tpu.data.semantic_kitti.dataset import process_scene
    from pasco_tpu.data.synthetic import make_scene
    from pasco_tpu.models.unet import build_net
    from pasco_tpu.parallel.mesh import (
        dp_train_step, make_mesh, replicate_to_mesh, shard_batch_to_mesh,
        stack_scenes)
    from pasco_tpu.training.step import (
        class_weight_vector, create_train_state, labelweights_for,
        scene_to_model_input)

    base = PaSCoConfig()
    cfg = base.replace(
        model=dataclasses.replace(
            base.model,
            in_channels=8,                # point-feature dim only
            encoder_dropouts=(0.0,) * 6,
            compute_dtype="float32",
        ),
        scene=SceneConfig(
            scene_size=(32, 32, 8),
            box_extent=(32, 32, 8),
            box_candidates=(),
            train_box_extent=None,
        ),
        capacity=CapacityConfig(
            num_points=2048,
            enc_s1=2048, enc_s2=1024, enc_s4=256, enc_s8=64,
            bottleneck=64, ups_s4=256,
            dec_s4=256, dec_s2=1024, dec_s1=2048,
            panop_s4=128, panop_s2=256, panop_s1=512,
        ),
    )
    assert cfg.model.f == 64 and cfg.model.transformer.hidden_dim == 384
    assert cfg.model.transformer.num_queries == 100
    assert cfg.loss.include_aux
    net = build_net(cfg)
    freqs = {s: np.ones(cfg.model.n_classes) for s in (1, 2, 4)}
    lw = labelweights_for(cfg, freqs)
    cw = jnp.asarray(
        class_weight_vector(cfg.model.n_classes, cfg.loss.no_object_weight)
    )
    rng = np.random.RandomState(0)
    scenes = [
        collate(
            [
                process_scene(
                    make_scene(
                        rng, scene_size=cfg.scene.scene_size, n_points=800,
                        point_feat_dim=cfg.model.in_channels - 6,
                        n_things=3,
                    ),
                    None, rng,
                )
            ],
            cfg, max_targets=16,
        )
        for _ in range(n_devices)
    ]
    state, tx = create_train_state(
        net, cfg, scene_to_model_input(scenes[0]), lw, jax.random.PRNGKey(0)
    )
    mesh = make_mesh(n_devices)
    inp, tgt = stack_scenes(scenes)
    inp = shard_batch_to_mesh(inp, mesh)
    tgt = shard_batch_to_mesh(tgt, mesh)
    dstate = replicate_to_mesh(state, mesh)
    dp_state, logs = jax.jit(
        partial(
            dp_train_step, mesh=mesh, net=net, tx=tx, labelweights=lw,
            class_weight=cw, cfg=cfg,
        )
    )(dstate, inp, tgt, jax.random.PRNGKey(3))
    assert np.isfinite(float(logs["total_loss"]))
    flat, _ = jax.flatten_util.ravel_pytree(dp_state.params)
    assert bool(jnp.all(jnp.isfinite(flat)))


@pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 virtual devices"
)
def test_sharded_eval_metric_sync():
    """Sharded EVAL forward with cross-replica metric reduction
    (parallel/mesh.py:dp_eval_step) — the TPU-native equivalent of the
    reference's ``sync_dist=True`` validation metric all-reduce
    (``net_panoptic_sparse.py:182``).  The psum-reduced per-class
    (tp, fp, fn) over a 4-device mesh must equal the SUM of per-scene
    counts computed unsharded."""
    from functools import partial

    import jax.numpy as jnp

    from pasco_tpu.core.config import tiny_config
    from pasco_tpu.data.semantic_kitti.collate import collate
    from pasco_tpu.data.semantic_kitti.dataset import process_scene
    from pasco_tpu.data.synthetic import make_scene
    from pasco_tpu.models.unet import build_net
    from pasco_tpu.parallel.mesh import (
        dp_eval_step, make_mesh, replicate_to_mesh,
        shard_batch_to_mesh, ssc_counts_from_output, stack_scenes)
    from pasco_tpu.training.step import (
        create_train_state, labelweights_for, scene_to_model_input,
        targets_to_device)

    cfg = tiny_config(n_infers=1)
    net = build_net(cfg)
    freqs = {s: np.ones(cfg.model.n_classes) for s in (1, 2, 4)}
    lw = labelweights_for(cfg, freqs)
    C = cfg.model.n_classes
    rng = np.random.RandomState(1)
    scenes = [
        collate(
            [
                process_scene(
                    make_scene(
                        rng, scene_size=cfg.scene.scene_size,
                        n_points=900 + 50 * k,
                        point_feat_dim=cfg.model.in_channels - 6,
                        n_things=2,
                    ),
                    None, rng,
                )
            ],
            cfg, max_targets=16,
        )
        for k in range(4)
    ]
    state, _ = create_train_state(
        net, cfg, scene_to_model_input(scenes[0]), lw, jax.random.PRNGKey(0)
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # Unsharded reference: per-scene forward + counts, summed on host.
    fwd = jax.jit(
        lambda v, i: net.apply(v, i, lw, train=False)
    )
    counts = jax.jit(
        lambda o, t, m: ssc_counts_from_output(o, t, m, C)
    )
    ref = np.zeros((3, C), np.int64)
    for s in scenes:
        inp = scene_to_model_input(s)
        out = fwd(variables, inp)
        tp, fp, fn = counts(out, targets_to_device(s.targets),
                            inp.subnet_min[0])
        ref += np.stack([np.asarray(tp), np.asarray(fp), np.asarray(fn)])

    mesh = make_mesh(4)
    inp, tgt = stack_scenes(scenes)
    inp = shard_batch_to_mesh(inp, mesh)
    tgt = shard_batch_to_mesh(tgt, mesh)
    v_repl = replicate_to_mesh(variables, mesh)
    tp, fp, fn = jax.jit(
        partial(dp_eval_step, mesh=mesh, net=net, labelweights=lw,
                n_classes=C)
    )(v_repl, inp, tgt)
    got = np.stack([np.asarray(tp), np.asarray(fp), np.asarray(fn)])
    np.testing.assert_array_equal(got, ref)
    assert ref.sum() > 0          # the scenes produced real predictions
