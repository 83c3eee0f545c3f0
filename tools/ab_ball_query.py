"""A/B: fused (nearest-k-within-radius) vs reference-exact
(first-k-by-index) ball query — VERDICT round-1 item 5.

Trains the flagship MSG model supervised on geometry-determined labels
(octant partition of space — learnable structure, unlike the random
fixture labels) with both neighbor-selection semantics, multiple seeds,
and reports loss curves + final/eval accuracy.  Result recorded in
STATUS.md.

Usage: python tools/ab_ball_query.py  (TPU or CPU; ~2 min on v5e)
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

B, N, STEPS, PARTS = 16, 1024, 60, 8


def octant_labels(pts):
    return ((np.asarray(pts[..., 0]) > 0).astype(np.int32)
            + 2 * (np.asarray(pts[..., 1]) > 0).astype(np.int32)
            + 4 * (np.asarray(pts[..., 2]) > 0).astype(np.int32))


def run(fused: bool, seed: int):
    from prifit_tpu.models import get_module
    from prifit_tpu.train.state import create_train_state
    from prifit_tpu.train.steps import make_supervised_step

    mod = get_module("pointnet2_part_seg_msg")
    model = mod.get_model(num_parts=PARTS, fused_ball_query=fused)
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    eval_pts = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    cls = jnp.zeros((B, 16), jnp.float32)
    target = jnp.asarray(octant_labels(pts))
    eval_target = octant_labels(eval_pts)

    state = create_train_state(model, (pts, cls), dict(train=True),
                               seed=seed)
    step = make_supervised_step(model, mod.get_loss)
    losses = []
    for i in range(STEPS):
        state, m = step(state, pts, cls, target, 0.01, 0.1,
                        jax.random.PRNGKey(seed * 1000 + i))
        losses.append(float(np.asarray(m["loss"])))
    train_acc = float(np.asarray(m["acc"]))

    out = model.apply(state.variables(), eval_pts, cls, train=False)
    pred = np.asarray(jnp.argmax(out.seg_logits, -1))
    eval_acc = float((pred == eval_target).mean())
    return losses, train_acc, eval_acc


def main():
    print("backend:", jax.default_backend())
    results = {}
    for fused in (True, False):
        accs, evals, curves = [], [], []
        for seed in (0, 1):
            losses, tr, ev = run(fused, seed)
            accs.append(tr)
            evals.append(ev)
            curves.append(losses)
            print(f"fused={fused} seed={seed}: "
                  f"loss {losses[0]:.3f}->{losses[-1]:.3f} "
                  f"train_acc {tr:.4f} eval_acc {ev:.4f}")
        results[fused] = dict(
            train_acc=float(np.mean(accs)), eval_acc=float(np.mean(evals)),
            final_loss=float(np.mean([c[-1] for c in curves])),
            curve=np.mean(curves, axis=0)[::10].round(4).tolist())
    print()
    for fused, r in results.items():
        print(f"fused={fused}: train_acc {r['train_acc']:.4f} "
              f"eval_acc {r['eval_acc']:.4f} "
              f"final_loss {r['final_loss']:.4f} curve {r['curve']}")
    d = results[True]["eval_acc"] - results[False]["eval_acc"]
    print(f"\neval_acc delta (fused - exact): {d:+.4f}")


if __name__ == "__main__":
    main()
