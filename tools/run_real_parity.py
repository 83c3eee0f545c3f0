"""One-command real-data parity harness (VERDICT r4 item 7).

The few-shot mIoU parity target (BASELINE.json: within 0.5 of the
PyTorch reference under the canonical recipe, README.md:59-63) is
blocked only on dataset availability in this environment.  This tool
makes parity a single command the moment the real downloads appear:

  1. ``check``   — validate a ShapeNet-Part root and an ACD root against
     the exact on-disk expectations of the reference loaders
     (``data_utils/ShapeNetDataLoader.py:29-52`` for the labeled set:
     ``synsetoffset2category.txt`` + ``train_test_split`` jsons +
     per-synset ``.txt`` files; ``:302-327`` for ACD: per-category
     folders of ``.npy`` with the last column = component id).
  2. ``run``     — the canonical recipe (``README.md:59-63``) through our
     trainer + standalone eval, optionally cross-evaluating a reference
     ``.pth`` with our evaluator and exporting our best checkpoint as a
     reference-format ``.pth`` so the PyTorch side can evaluate it too
     (both directions of the interop, ``train/torch_port.py``).
  3. ``dryrun``  — build tiny synthetic fixtures in the real layout and
     run ``check`` + a micro-budget ``run`` end to end (what the test
     suite exercises; proves the procedure before the data exists).

Usage:
  python tools/run_real_parity.py check  --data_root D --ss_path A
  python tools/run_real_parity.py run    --data_root D --ss_path A \
      [--ref_pth model.pth] [--export_pth out.pth] [--log_dir L]
  python tools/run_real_parity.py dryrun [--keep]
"""

import argparse
import json
import os
import os.path as osp
import shlex
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from prifit_tpu.data.shapenet import SEG_CLASSES  # noqa: E402

# the canonical recipe, flag for flag (reference README.md:59-63)
RECIPE = ("--seed 786 --alpha 0.01 --split val --k_shot 10 "
          "--batch_size 24 --step_size 1 --selfsup --epoch 20 "
          "--learning_rate 0.01 --lmbda 1 --quantile 0.05 "
          "--msc_iterations 10 --max_num_clusters 25")


def _fail(problems):
    for p in problems:
        print(f"  FAIL: {p}")
    return 1


def check_shapenet(root: str) -> list:
    """Problems list (empty = the reference loader would accept it)."""
    problems = []
    catfile = osp.join(root, "synsetoffset2category.txt")
    if not osp.isfile(catfile):
        return [f"missing {catfile} (ShapeNetDataLoader.py:29)"]
    cat = {}
    with open(catfile) as f:
        for line in f:
            ls = line.strip().split()
            if len(ls) != 2:
                problems.append(f"malformed category line: {line!r}")
                continue
            cat[ls[0]] = ls[1]
    if not cat:
        problems.append("synsetoffset2category.txt is empty")

    for split in ("train", "val", "test"):
        p = osp.join(root, "train_test_split",
                     f"shuffled_{split}_file_list.json")
        if not osp.isfile(p):
            problems.append(
                f"missing {p} (ShapeNetDataLoader.py:46-52)")
            continue
        with open(p) as f:
            ids = json.load(f)
        bad = [d for d in ids[:50] if len(d.split("/")) != 3]
        if bad:
            problems.append(
                f"{p}: entries must be 'shape_data/<synset>/<token>', "
                f"got e.g. {bad[0]!r}")

    n_total = 0
    for name, synset in sorted(cat.items()):
        d = osp.join(root, synset)
        if not osp.isdir(d):
            problems.append(f"missing category dir {d} ({name})")
            continue
        fns = [f for f in os.listdir(d) if f.endswith(".txt")]
        n_total += len(fns)
        if not fns:
            problems.append(f"{d}: no .txt point files")
            continue
        sample = osp.join(d, sorted(fns)[0])
        try:
            data = np.loadtxt(sample, max_rows=32).astype(np.float32)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{sample}: unparseable ({e})")
            continue
        if data.ndim != 2 or data.shape[1] != 7:
            problems.append(
                f"{sample}: expected 7 columns (xyz + normal + part "
                f"label), got {data.shape}")
            continue
        labels = data[:, -1].astype(np.int64)
        if (labels != data[:, -1]).any():
            problems.append(f"{sample}: non-integer part labels")
        valid = SEG_CLASSES.get(name)
        if valid is not None and not np.isin(labels, valid).all():
            problems.append(
                f"{sample}: part labels {sorted(set(labels.tolist()))} "
                f"outside {name}'s range {valid} "
                f"(testing.py-style category masking would misscore)")
        print(f"  {name:12s} {synset}  {len(fns):5d} shapes  ok")
    print(f"  shapenet total: {len(cat)} categories, {n_total} shapes")
    return problems


def check_acd(root: str) -> list:
    problems = []
    if not osp.isdir(root):
        return [f"missing ACD root {root}"]
    subfolders = sorted(
        d for d in os.listdir(root) if osp.isdir(osp.join(root, d)))
    if not subfolders:
        return [f"{root}: no category subfolders "
                "(ShapeNetDataLoader.py:302-311 lists subdirs)"]
    n_total = 0
    for item in subfolders:
        d = osp.join(root, item)
        fns = [f for f in os.listdir(d) if f.endswith(".npy")]
        n_total += len(fns)
        if not fns:
            problems.append(f"{d}: no .npy files")
            continue
        sample = osp.join(d, sorted(fns)[0])
        try:
            data = np.load(sample)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{sample}: unloadable ({e})")
            continue
        if data.ndim != 2 or data.shape[1] < 4:
            problems.append(
                f"{sample}: expected [n, >=4] (xyz + ... + component "
                f"id), got {data.shape}")
            continue
        comp = data[:, -1]
        if not np.all(comp == comp.astype(np.int64)):
            problems.append(f"{sample}: non-integer ACD component ids")
        print(f"  {item:12s} {len(fns):5d} clouds  "
              f"{int(comp.max()) + 1:3d} components in sample  ok")
    print(f"  acd total: {len(subfolders)} categories, {n_total} clouds")
    return problems


def _run(cmd: str, env=None) -> None:
    print(f"+ {cmd}")
    e = dict(os.environ)
    e.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    if env:
        e.update(env)
    subprocess.run(shlex.split(cmd), check=True, env=e)


def cmd_run(args) -> int:
    problems = check_shapenet(args.data_root) + check_acd(args.ss_path)
    if problems:
        return _fail(problems)
    log_dir = args.log_dir or tempfile.mkdtemp(prefix="parity_")
    recipe = args.recipe or RECIPE
    py = sys.executable

    # 1) canonical joint training run (our trainer)
    _run(f"{py} -m prifit_tpu.cli.train_partseg {recipe} "
         f"--ss_dataset acd --ss_path {args.ss_path} "
         f"--data_root {args.data_root} --log_dir {log_dir} "
         + (args.extra or ""))

    # 2) standalone eval of the best checkpoint (our evaluator)
    best = osp.join(log_dir, "best_model")
    _run(f"{py} -m prifit_tpu.cli.testing --model {args.model} "
         f"--pretrained_model {best} --data_root {args.data_root} "
         f"--batch_size {args.eval_batch} --npoint {args.npoint}")

    # 3) cross-eval a reference .pth with OUR evaluator (torch -> jax)
    if args.ref_pth:
        _run(f"{py} -m prifit_tpu.cli.testing --model {args.model} "
             f"--pretrained_model {args.ref_pth} "
             f"--data_root {args.data_root} "
             f"--batch_size {args.eval_batch} --npoint {args.npoint}")

    # 4) export OUR weights as a reference-format .pth (jax -> torch):
    #    the PyTorch side evaluates it with its own testing.py
    if args.export_pth:
        from prifit_tpu.cli.args_parser import parse_args as _pa
        from prifit_tpu.cli.train_partseg import build_model
        from prifit_tpu.models import get_module
        from prifit_tpu.train.checkpoint import restore_params_only
        from prifit_tpu.train.state import create_train_state
        from prifit_tpu.train.torch_port import export_msg_state_dict

        import jax.numpy as jnp
        import torch

        targs = _pa(shlex.split(recipe) + ["--model", args.model])
        mod = get_module(args.model)
        model = build_model(targs, mod)
        pts = jnp.zeros((2, args.npoint, 3), jnp.float32)
        cls = jnp.zeros((2, targs.num_classes), jnp.float32)
        state = create_train_state(model, (pts, cls), dict(train=True))
        state = restore_params_only(log_dir, "best_model", state)
        sd = export_msg_state_dict(state.variables(),
                                   extra_layers=targs.extra_layers)
        torch.save({"model_state_dict": {
            k: torch.tensor(np.asarray(v)) for k, v in sd.items()}},
            args.export_pth)
        print(f"exported reference-format checkpoint: {args.export_pth}")
    print(f"parity run complete; logs in {log_dir}")
    return 0


def cmd_dryrun(args) -> int:
    """Fixture-scale end-to-end proof of the procedure."""
    root = args.out or tempfile.mkdtemp(prefix="parity_dryrun_")
    py = sys.executable
    _run(f"{py} {osp.join(osp.dirname(osp.abspath(__file__)), 'synthetic_primitive_dataset.py')} "
         f"{root} --n_per_cat 6 --n_acd 8 --n_points 256")
    sn, acd = osp.join(root, "shapenet"), osp.join(root, "acd")
    problems = check_shapenet(sn) + check_acd(acd)
    if problems:
        return _fail(problems)
    ns = argparse.Namespace(
        data_root=sn, ss_path=acd, log_dir=osp.join(root, "log"),
        model=args.model, eval_batch=4, npoint=256,
        ref_pth=None, export_pth=osp.join(root, "export.pth"),
        recipe=("--seed 786 --alpha 0.01 --split val --k_shot 2 "
                "--batch_size 4 --step_size 1 --selfsup --epoch 1 "
                "--learning_rate 0.01 --lmbda 1 --quantile 0.2 "
                "--msc_iterations 2 --max_num_clusters 4 "
                f"--npoint 256 --model {args.model}"),
        extra="--epoch_iters 2 --num_workers 0 --n_per_prim 16")
    rc = cmd_run(ns)
    if rc == 0 and not args.keep:
        import shutil
        shutil.rmtree(root, ignore_errors=True)
    elif args.keep:
        print(f"kept fixtures at {root}")
    return rc


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("check")
    c.add_argument("--data_root", required=True)
    c.add_argument("--ss_path", required=True)

    r = sub.add_parser("run")
    r.add_argument("--data_root", required=True)
    r.add_argument("--ss_path", required=True)
    r.add_argument("--log_dir", default=None)
    r.add_argument("--model", default="pointnet2_part_seg_msg")
    r.add_argument("--ref_pth", default=None,
                   help="reference .pth to cross-evaluate with our "
                        "evaluator (torch -> jax direction)")
    r.add_argument("--export_pth", default=None,
                   help="write our best checkpoint as a reference-format "
                        ".pth (jax -> torch direction)")
    r.add_argument("--eval_batch", type=int, default=24)
    r.add_argument("--npoint", type=int, default=2048)
    r.add_argument("--recipe", default=None,
                   help="override the canonical recipe flags")
    r.add_argument("--extra", default="",
                   help="extra trainer flags appended to the recipe")

    d = sub.add_parser("dryrun")
    d.add_argument("--out", default=None)
    d.add_argument("--keep", action="store_true")
    d.add_argument("--model", default="pointnet2_part_seg_msg")

    args = ap.parse_args(argv)
    if args.cmd == "check":
        problems = check_shapenet(args.data_root) + check_acd(args.ss_path)
        if problems:
            return _fail(problems)
        print("layout ok: the reference loaders (and ours) accept it")
        return 0
    if args.cmd == "run":
        return cmd_run(args)
    return cmd_dryrun(args)


if __name__ == "__main__":
    sys.exit(main())
