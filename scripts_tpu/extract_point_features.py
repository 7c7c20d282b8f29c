"""WaffleIron point-feature extraction CLI.

Counterpart of ``WaffleIron_mod/extract_point_features.py`` (reference):
run the (JAX) WaffleIron segmenter with ``num_votes`` test-time-augmented
passes per scan, average the softmax votes, and pickle
``{embedding, coords, vote}`` per scan — the format
``KittiDataset.load_file`` consumes (``kitti_dataset.py:290-303``).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--output_root", required=True)
    p.add_argument("--sequences", nargs="*", default=["08"])
    p.add_argument("--num_votes", type=int, default=10)
    p.add_argument("--max_points", type=int, default=131072)
    p.add_argument("--checkpoint", default=None,
                   help="npz of converted WaffleIron weights (optional)")
    p.add_argument("--frame_interval", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pasco_tpu.data.semantic_kitti import io_data
    from pasco_tpu.data.transform_utils import generate_random_transformation, transform_xyz
    from pasco_tpu.models.waffleiron import (
        Segmenter,
        grid_cell_indices,
        knn_indices,
    )

    net = Segmenter(n_classes=19, in_channels=5)
    P = args.max_points

    def prep(xyz, intensity, rng=None):
        if rng is not None:
            T = generate_random_transformation(rng, max_angle=180, flip=True)
            xyz = transform_xyz(xyz, T)
        n = min(len(xyz), P)
        feats = np.zeros((P, 5), np.float32)
        feats[:n, 0] = intensity[:n, 0]
        feats[:n, 1:4] = xyz[:n]
        feats[:n, 4] = np.linalg.norm(xyz[:n], axis=1)
        mask = np.zeros((P,), bool)
        mask[:n] = True
        nbrs = np.zeros((16, P), np.int32)
        nbrs[:, :n] = knn_indices(xyz[:n], 16)
        cells = np.zeros((3, P), np.int32)
        cells[:, :n] = grid_cell_indices(xyz[:n])
        return feats, nbrs, cells, mask, n

    variables = None
    fwd = jax.jit(
        lambda v, f, nb, ce, ma: net.apply(v, f, nb, ce, ma, train=False)
    )

    rng = np.random.RandomState(0)
    for seq in args.sequences:
        vel = os.path.join(
            args.dataset_root, "dataset", "sequences", seq, "velodyne"
        )
        if not os.path.isdir(vel):
            continue
        out_dir = os.path.join(
            args.output_root, "waffleiron_v2", "sequences", seq, "seg_feats_tta"
        )
        os.makedirs(out_dir, exist_ok=True)
        frames = sorted(f[:-4] for f in os.listdir(vel) if f.endswith(".bin"))
        for frame in frames[:: args.frame_interval]:
            pc = io_data.read_pointcloud(os.path.join(vel, f"{frame}.bin"))
            xyz, intensity = pc[:, :3].astype(np.float64), pc[:, 3:4]
            embeddings, votes = [], None
            for v in range(args.num_votes):
                feats, nbrs, cells, mask, n = prep(
                    xyz, intensity, rng if v > 0 else None
                )
                if variables is None:
                    variables = net.init(
                        {"params": jax.random.PRNGKey(0)},
                        jnp.asarray(feats), jnp.asarray(nbrs),
                        jnp.asarray(cells), jnp.asarray(mask),
                    )
                    if args.checkpoint:
                        loaded = dict(np.load(args.checkpoint, allow_pickle=True))
                        variables = loaded.get("variables", variables)
                logits, tokens = fwd(
                    variables, jnp.asarray(feats), jnp.asarray(nbrs),
                    jnp.asarray(cells), jnp.asarray(mask),
                )
                prob = np.asarray(jax.nn.softmax(logits, axis=-1))[:n]
                votes = prob if votes is None else votes + prob
                embeddings.append(np.asarray(tokens)[:n].T)
            out = {
                "embedding": np.stack(embeddings),      # [votes, C, N]
                "coords": np.concatenate(
                    [xyz[: len(votes)], intensity[: len(votes)]], axis=1
                ),
                "vote": votes / args.num_votes,
            }
            with open(os.path.join(out_dir, f"{frame}.pkl"), "wb") as f:
                pickle.dump(out, f)
            print(f"{seq}/{frame}: {len(votes)} points")


if __name__ == "__main__":
    main()
