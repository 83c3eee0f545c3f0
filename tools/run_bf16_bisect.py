"""Per-stage bf16-instability bisection (VERDICT r2 item 3).

Round 2 measured that a bf16 encoder destabilizes few-shot supervised
training (f32 mIoU 0.89-0.90 vs bf16 0.64-0.86 across seeds) but only
tried coarse variants.  This driver isolates the mechanism on the
supervised few-shot arm (where the instability was demonstrated most
decisively, STATUS.md item 3): for each encoder stage
{sa1, sa2, sa3, fp3, fp2, fp1} (or stage groups) it trains with

  <stage>:bf16   the stage's MLP chain in bf16 (fwd+bwd rounding)
  <stage>:q      stage f32, OUTPUT quantized to bf16 with exact
                 gradients (straight-through) — forward-value rounding
                 only

plus f32 and full-bf16 baselines, at matched budgets/seeds, and records
final test-split class-avg mIoU per run.  If `q` is benign where `bf16`
degrades, the mechanism is compute/gradient rounding inside the stage,
not the activation values it passes downstream (and vice versa).

Usage:
  python tools/run_bf16_bisect.py --data /tmp/lift8 --seeds 786,787 \
      --phase coarse     # sa-all / fp-all groups
  python tools/run_bf16_bisect.py --data /tmp/lift8 --seeds 786,787 \
      --phase fine --stages sa1,sa2,sa3   # refine the guilty group
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import time

SA = ["sa1", "sa2", "sa3"]
FP = ["fp3", "fp2", "fp1"]


def spec(stages, mode):
    return ",".join(f"{s}:{mode}" for s in stages)


def run_key(cfg):
    return "|".join(f"{k}={cfg[k]}" for k in sorted(cfg))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/lift8")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seeds", default="786,787")
    ap.add_argument("--k_shot", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--epoch_iters", type=int, default=83)
    ap.add_argument("--batch_size", type=int, default=24)
    ap.add_argument("--phase", choices=["coarse", "fine"],
                    default="coarse")
    ap.add_argument("--stages", default="",
                    help="fine phase: comma list of stages to bisect")
    ap.add_argument("--full_encoders", default="",
                    help="extra whole-encoder dtype variants to run "
                         "(e.g. 'mx')")
    ap.add_argument("--modes", default="bf16,q",
                    help="per-group modes to run (bf16 = fwd+bwd "
                         "rounding, q = output-value rounding only, fq = "
                         "bf16-equivalent fwd with exact f32 grads)")
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--tag", default="",
                    help="suffix for variant names: fresh run dirs + "
                         "cache keys (e.g. re-validating mxsr under a "
                         "different PRIFIT_SR_BITS source)")
    args = ap.parse_args()
    out_path = args.out or osp.join(args.data, "bisect.jsonl")

    done = set()
    if osp.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    done.add(run_key(json.loads(line)["config"]))
                except (json.JSONDecodeError, KeyError):
                    pass

    variants = [("f32", "", "auto"), ("full_bf16", "", "bf16")]
    for enc in (args.full_encoders.split(",")
                if args.full_encoders else []):
        variants.append((f"full_{enc}", "", enc))
    if args.phase == "coarse":
        groups = [("sa_all", SA), ("fp_all", FP)]
    else:
        # "sa1" bisects one stage; "sa1+sa2" runs a compound group
        # (candidate fast modes, e.g. bf16 SA with an f32 reset island)
        stages = args.stages.split(",") if args.stages else SA + FP
        groups = [(s.replace("+", "_"), s.split("+")) for s in stages]
    for name, group in groups:
        for mode in args.modes.split(","):
            if mode:
                variants.append((f"{name}_{mode}", spec(group, mode),
                                 "auto"))
    if args.tag:
        # baselines (f32 / full_bf16) keep their cached identity — the
        # tag marks the variants whose behavior changed (e.g. sr bits)
        variants = variants[:2] + [(f"{n}{args.tag}", sdt, enc)
                                   for n, sdt, enc in variants[2:]]

    seeds = [int(s) for s in args.seeds.split(",")]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"

    runs = [(v, s) for v in variants for s in seeds]
    for i, ((vname, sdt, enc), seed) in enumerate(runs):
        cfg = dict(variant=vname, stage_dtypes=sdt, encoder_dtype=enc,
                   seed=seed, k_shot=args.k_shot, epochs=args.epochs,
                   epoch_iters=args.epoch_iters,
                   batch_size=args.batch_size)
        key = run_key(cfg)
        if key in done:
            print(f"[{i + 1}/{len(runs)}] skip: {vname} s{seed}",
                  flush=True)
            continue
        run_root = osp.join(args.data, "bisect_runs",
                            f"{vname}_s{seed}")
        cmd = [sys.executable, "-m", "prifit_tpu.cli.train_partseg",
               "--seed", str(seed), "--k_shot", str(args.k_shot),
               "--batch_size", str(args.batch_size),
               "--epoch", str(args.epochs),
               "--epoch_iters", str(args.epoch_iters),
               "--learning_rate", "0.01", "--step_size", "1",
               "--split", "train", "--eval_split", "test",
               "--npoint", "2048",
               "--data_root", osp.join(args.data, "shapenet"),
               "--experiment_root", run_root,
               "--encoder_dtype", enc]
        if sdt:
            cmd += ["--stage_dtypes", sdt]
        t0 = time.time()
        print(f"[{i + 1}/{len(runs)}] {vname} seed {seed}", flush=True)
        try:
            proc = subprocess.run(cmd, env=env, cwd="/root/repo",
                                  capture_output=True, text=True,
                                  timeout=args.timeout)
        except subprocess.TimeoutExpired:
            print("  TIMEOUT", flush=True)
            continue
        if proc.returncode != 0:
            print(f"  FAILED rc={proc.returncode}\n{proc.stderr[-1500:]}",
                  flush=True)
            continue
        exp_dirs = [osp.join(run_root, d) for d in os.listdir(run_root)]
        exp_dir = max(exp_dirs, key=osp.getmtime)
        final = None
        with open(osp.join(exp_dir, "metrics.jsonl")) as f:
            for line in f:
                d = json.loads(line)
                if "final_eval" in d:
                    final = d["final_eval"]
        rec = {"config": cfg, "metrics": final,
               "wall_s": round(time.time() - t0, 1)}
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        miou = final["class_avg_iou"] if final else float("nan")
        print(f"  done in {rec['wall_s']}s: mIoU={miou:.4f}", flush=True)


if __name__ == "__main__":
    main()
