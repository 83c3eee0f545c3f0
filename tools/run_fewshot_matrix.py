"""Few-shot lift matrix: supervised-only vs joint convex self-sup.

Runs the canonical recipe (reference ``README.md:59-63``) on the
paper-proportioned synthetic lift benchmark
(``synthetic_primitive_dataset.make_lift_benchmark``) across
k_shot x seed x arm at MATCHED supervised budgets: both arms share the
exact epoch structure via ``--epoch_iters`` (the joint arm's natural
epoch length), the same LR/BN schedules and the same number of
supervised steps — the only difference is the interleaved self-sup step
(reference ``train_partseg_shapenet.py:404-451``).

Each run is a subprocess of ``prifit_tpu.cli.train_partseg``; the final
test-split metrics are read back from the run's ``metrics.jsonl``.
Results append to ``--out`` (one JSON line per run) and completed runs
are skipped on restart, so the matrix is resumable.

Usage:
  python tools/run_fewshot_matrix.py --data /tmp/lift8 \
      --k_shots 1,5,10 --seeds 786,787,788 --epochs 20
  # sweep mode (joint arm only), e.g.:
  python tools/run_fewshot_matrix.py --data /tmp/lift8 --k_shots 5 \
      --seeds 786 --sweep lmbda=0.5,1,2 quantile=0.02,0.05,0.1
"""

import argparse
import itertools
import json
import os
import os.path as osp
import subprocess
import sys
import time

N_CATS = 8  # LIFT_ORDER[:8]


def run_key(cfg):
    return "|".join(f"{k}={cfg[k]}" for k in sorted(cfg))


def load_done(out_path):
    done = set()
    if osp.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    done.add(run_key(json.loads(line)["config"]))
                except (json.JSONDecodeError, KeyError):
                    pass
    return done


def final_metrics(exp_dir):
    path = osp.join(exp_dir, "metrics.jsonl")
    final = None
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if "final_eval" in d:
                final = d["final_eval"]
    return final


def ensure_pretrain(seed, args, env, ss_loss="convex"):
    """Run (or reuse) the ACD self-sup pretrain for this seed; return the
    best_model checkpoint path (reference recipe step 1,
    ``pretrain_partseg_shapenet.py`` -> ``--pretrained_model``).

    ``ss_loss="contrastive"`` pretrains with the ACD pairwise
    contrastive loss instead (reference ``pretrain:212``)."""
    import glob
    suffix = "_con" if ss_loss == "contrastive" else ""
    root = osp.join(args.data, "pretrain",
                    f"s{seed}_e{args.pre_epochs}{suffix}")
    found = glob.glob(osp.join(root, "**", "best_model"), recursive=True)
    if found:
        return found[0]
    cmd = [sys.executable, "-m", "prifit_tpu.cli.pretrain_partseg",
           "--model", "pretrain_pointnet2_part_seg_msg",
           "--seed", str(seed), "--selfsup", "--ss_dataset", "acd",
           "--ss_path", args.ss_path,
           "--epoch", str(args.pre_epochs),
           "--batch_size", str(args.batch_size),
           "--npoint", str(args.npoint),
           "--chamfer_npoints", str(args.npoint),
           # reference pretrain schedule: step_size default 20 (constant
           # LR across a 15-epoch pretrain), NOT the finetune recipe's
           # every-epoch decay
           "--learning_rate", "0.01",
           "--lmbda", str(args.lmbda),
           "--quantile", str(args.quantile),
           "--alpha", str(args.alpha),
           "--msc_iterations", "10", "--max_num_clusters", "25",
           "--ss_loss", ss_loss,
           "--experiment_root", root]
    print(f"  pretraining (seed {seed}, {args.pre_epochs} epochs)...",
          flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, cwd="/root/repo",
                          capture_output=True, text=True,
                          timeout=4 * args.timeout)
    if proc.returncode != 0:
        raise RuntimeError(
            f"pretrain failed rc={proc.returncode}\n{proc.stderr[-2000:]}")
    print(f"  pretrain done in {time.time() - t0:.0f}s", flush=True)
    return glob.glob(osp.join(root, "**", "best_model"), recursive=True)[0]


def build_cmd(cfg, args, run_root):
    cmd = [sys.executable, "-m", "prifit_tpu.cli.train_partseg",
           "--seed", str(cfg["seed"]),
           "--k_shot", str(cfg["k_shot"]),
           "--batch_size", str(cfg["batch_size"]),
           "--epoch", str(args.epochs),
           "--epoch_iters", str(cfg["epoch_iters"]),
           "--learning_rate", "0.01",
           "--step_size", str(cfg.get("step_size", 1)),
           "--split", "train",
           "--eval_split", "test",
           "--npoint", str(args.npoint),
           "--chamfer_npoints", str(args.npoint),
           "--data_root", args.data_root,
           "--experiment_root", run_root,
           "--encoder_dtype", cfg.get("encoder_dtype", "auto"),
           ]
    if cfg["arm"] in ("joint", "pre_joint"):
        cmd += ["--selfsup", "--ss_dataset", "acd",
                "--ss_path", args.ss_path,
                "--lmbda", str(cfg["lmbda"]),
                "--quantile", str(cfg["quantile"]),
                "--alpha", str(cfg["alpha"]),
                "--msc_iterations", "10",
                "--max_num_clusters", "25"]
    if cfg["arm"] == "con":
        # joint with the ACD pairwise contrastive self-sup loss — the
        # component labels carry the part structure directly
        cmd += ["--selfsup", "--ss_loss", "contrastive",
                "--ss_dataset", "acd", "--ss_path", args.ss_path,
                "--lmbda", str(cfg["lmbda"])]
    if cfg["arm"] in ("pre", "pre_joint", "pre_con"):
        cmd += ["--pretrained_model", cfg["ckpt"]]
        if args.ft_lr:
            cmd[cmd.index("--learning_rate") + 1] = str(args.ft_lr)
    return cmd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/lift8",
                    help="root containing shapenet/ and acd/ "
                         "(make_lift_benchmark output)")
    ap.add_argument("--out", default=None,
                    help="results jsonl (default <data>/results.jsonl)")
    ap.add_argument("--k_shots", default="1,5,10")
    ap.add_argument("--seeds", default="786,787,788")
    ap.add_argument("--arms", default="sup,joint")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--npoint", type=int, default=2048)
    ap.add_argument("--batch_size", type=int, default=24)
    ap.add_argument("--n_acd", type=int, default=2000,
                    help="for the default epoch_iters computation")
    ap.add_argument("--epoch_iters", type=int, default=0,
                    help="0 = n_acd // batch_size (joint's natural length)")
    ap.add_argument("--lmbda", type=float, default=1.0)
    ap.add_argument("--quantile", type=float, default=0.05)
    ap.add_argument("--alpha", type=float, default=0.01)
    ap.add_argument("--encoder_dtype", default="auto")
    ap.add_argument("--pre_epochs", type=int, default=15,
                    help="ACD pretrain epochs for the pre/pre_joint arms")
    ap.add_argument("--ft_lr", type=float, default=0.0,
                    help="finetune LR override for pre arms (0 = keep "
                         "the recipe LR)")
    ap.add_argument("--sweep", nargs="*", default=[],
                    help="knob=v1,v2,... sweep entries (joint arm only)")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()
    args.data_root = osp.join(args.data, "shapenet")
    args.ss_path = osp.join(args.data, "acd")
    out_path = args.out or osp.join(args.data, "results.jsonl")
    done = load_done(out_path)

    k_shots = [int(k) for k in args.k_shots.split(",")]
    seeds = [int(s) for s in args.seeds.split(",")]
    arms = args.arms.split(",")

    sweeps = [{}]

    def _num(v):
        return int(v) if float(v) == int(float(v)) else float(v)

    swept_knobs = set()
    for entry in args.sweep:
        knob, vals = entry.split("=")
        swept_knobs.add(knob)
        sweeps = [dict(s, **{knob: _num(v)}) for s in sweeps
                  for v in vals.split(",")]
    # joint-only knobs don't change the sup command — keep sup in the
    # sweep only when a shared knob (e.g. step_size) is swept
    if args.sweep and not (swept_knobs - {"lmbda", "quantile", "alpha"}):
        arms = [a for a in arms if a != "sup"] or ["joint"]

    runs = []
    for k, seed, arm, sw in itertools.product(k_shots, seeds, arms,
                                              sweeps):
        bs = min(args.batch_size, k * N_CATS)
        cfg = dict(k_shot=k, seed=seed, arm=arm, batch_size=bs,
                   epoch_iters=args.epoch_iters or args.n_acd // bs,
                   lmbda=args.lmbda, quantile=args.quantile,
                   alpha=args.alpha, epochs=args.epochs,
                   encoder_dtype=args.encoder_dtype, **sw)
        if arm in ("pre", "pre_joint", "pre_con"):
            cfg["pre_epochs"] = args.pre_epochs
            if args.ft_lr:
                cfg["ft_lr"] = args.ft_lr
        runs.append(cfg)

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"

    for i, cfg in enumerate(runs):
        key = run_key(cfg)
        if key in done:
            print(f"[{i + 1}/{len(runs)}] skip (done): {key}", flush=True)
            continue
        tag = f"k{cfg['k_shot']}_s{cfg['seed']}_{cfg['arm']}"
        for knob in ("lmbda", "quantile", "alpha"):
            tag += f"_{knob[0]}{cfg[knob]}"
        if cfg.get("step_size", 1) != 1:
            tag += f"_ss{cfg['step_size']}"
        if cfg.get("pre_epochs"):
            tag += f"_pe{cfg['pre_epochs']}"
        run_root = osp.join(args.data, "runs", tag)
        t0 = time.time()
        print(f"[{i + 1}/{len(runs)}] {key}", flush=True)
        if cfg["arm"] in ("pre", "pre_joint", "pre_con"):
            try:
                cfg["ckpt"] = ensure_pretrain(
                    cfg["seed"], args, env,
                    ss_loss="contrastive" if cfg["arm"] == "pre_con"
                    else "convex")
            except RuntimeError as e:
                print(f"  {e}", flush=True)
                continue
        cmd = build_cmd(cfg, args, run_root)
        try:
            proc = subprocess.run(cmd, env=env, cwd="/root/repo",
                                  capture_output=True, text=True,
                                  timeout=args.timeout)
        except subprocess.TimeoutExpired:
            print(f"  TIMEOUT after {args.timeout}s", flush=True)
            continue
        if proc.returncode != 0:
            print(f"  FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}",
                  flush=True)
            continue
        exp_dirs = [osp.join(run_root, d) for d in os.listdir(run_root)]
        exp_dir = max(exp_dirs, key=osp.getmtime)
        metrics = final_metrics(exp_dir)
        ckpt = cfg.pop("ckpt", None)  # not part of the resume key
        rec = {"config": cfg, "metrics": metrics,
               "wall_s": round(time.time() - t0, 1), "exp_dir": exp_dir}
        if ckpt:
            rec["pretrain_ckpt"] = ckpt
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        miou = metrics["class_avg_iou"] if metrics else float("nan")
        print(f"  done in {rec['wall_s']}s: class_avg_iou={miou:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
