"""Does the convex self-sup objective teach PART structure?

Root-cause probe for the flat few-shot lift (STATUS.md round 3): the
pretrain convex loss reaches its floor within ~1 epoch and flatlines, so
the question is whether the optimized embedding clusters align with
ground-truth parts any better than a random encoder's.

For each encoder variant (random init, a checkpoint via --ckpt), embeds
held-out synthetic shapes, clusters with the pipeline's own mean shift
(recipe settings), and reports NMI(mean-shift labels, true part labels)
plus cluster counts.  If pretrained NMI does not beat random while both
sit at the same loss floor, the objective is satisfied by ANY
spatially-coherent clustering of these primitive-union shapes — fitting
ellipsoids to pieces of an ellipsoid union succeeds regardless of
whether the pieces are the true parts — and the lift mechanism has
nothing to push on at this data difficulty.

Usage:
  python tools/probe_embedding.py --data /tmp/lift8 --n 16
  python tools/probe_embedding.py --data /tmp/lift8 --n 16 \
      --ckpt /tmp/lift8/pretrain/s786_e15/<run>/checkpoints/best_model
"""

import argparse
import os
import os.path as osp
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/lift8")
    ap.add_argument("--ckpt", default="",
                    help="checkpoint dir to probe (default: random init)")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--npoint", type=int, default=2048)
    ap.add_argument("--split", default="test")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--quantile", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=786)
    ap.add_argument("--space", default="embedding",
                    choices=["embedding", "feat"],
                    help="cluster the selfsup embedding head or the "
                         "128-d pre-head feat (calibration: feat of a "
                         "supervised model is part-discriminative)")
    args = ap.parse_args()

    from sklearn.metrics import normalized_mutual_info_score

    from prifit_tpu.clustering.mean_shift import cluster_batch
    from prifit_tpu.data.shapenet import PartNormalDataset
    from prifit_tpu.models import get_module
    from prifit_tpu.train.checkpoint import _raw_restore

    ds = PartNormalDataset(osp.join(args.data, "shapenet"),
                           npoints=args.npoint, split=args.split,
                           normal_channel=False)
    idxs = np.linspace(0, len(ds) - 1, args.n).astype(int)

    mod = get_module("pointnet2_part_seg_msg")
    model = mod.get_model(num_parts=50)
    rng = np.random.default_rng(0)
    pts0 = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    cls0 = jnp.zeros((2, 16), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(args.seed),
                            "sampling": jax.random.PRNGKey(1),
                            "dropout": jax.random.PRNGKey(2)},
                           pts0, cls0, train=True, embed=True)
    variables = dict(variables)
    if args.ckpt:
        from prifit_tpu.train.checkpoint import _merge_trees
        restored = _raw_restore(*osp.split(args.ckpt.rstrip("/")))
        # merge: e.g. a supervised checkpoint has no extra_conv_emb
        # (untrained head probes the backbone through a random proj)
        variables["params"], _, _ = _merge_trees(
            jax.device_get(variables["params"]), restored["params"])
        variables["batch_stats"], _, _ = _merge_trees(
            jax.device_get(variables["batch_stats"]),
            restored["batch_stats"])

    @jax.jit
    def embed(pts, cls):
        out = model.apply(variables, pts, cls, train=False, embed=True)
        return out.embedding if args.space == "embedding" else out.feat

    nmis, counts = [], []
    for s in range(0, len(idxs), args.batch):
        chunk = idxs[s:s + args.batch]
        # one __getitem__ per index: each call resamples points, so
        # pts/segs must come from the SAME call to stay aligned
        items = [ds[i] for i in chunk]
        pts = np.stack([it[0] for it in items])
        segs = np.stack([it[2] for it in items])
        cls = np.zeros((len(chunk), 16), np.float32)
        emb = embed(jnp.asarray(pts, jnp.float32),
                    jnp.asarray(cls))
        res = cluster_batch(emb, quantile=args.quantile, iterations=10,
                            max_num_clusters=25)
        labels = np.asarray(res.labels)
        counts.extend(np.asarray(res.num_clusters).tolist())
        for b in range(len(chunk)):
            nmis.append(normalized_mutual_info_score(segs[b], labels[b]))

    tag = args.ckpt or "random-init"
    print(f"probe[{tag}] space={args.space} split={args.split} "
          f"n={len(nmis)} q={args.quantile}")
    print(f"  NMI(mean-shift clusters, true parts): "
          f"mean={np.mean(nmis):.4f} sd={np.std(nmis):.4f} "
          f"min={np.min(nmis):.4f} max={np.max(nmis):.4f}")
    print(f"  clusters/shape: mean={np.mean(counts):.1f} "
          f"range=[{np.min(counts)}, {np.max(counts)}]")


if __name__ == "__main__":
    main()
