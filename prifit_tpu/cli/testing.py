"""Standalone evaluation entry point (rebuilds ``testing.py:252-254``).

  python -m prifit_tpu.cli.testing --pretrained_model <ckpt dir> \
      --model pointnet2_part_seg_msg --data_root <shapenet>
"""

import os.path as osp

import jax.numpy as jnp
import numpy as np

from prifit_tpu.cli.args_parser import parse_args
from prifit_tpu.cli.train_partseg import build_model
from prifit_tpu.data import DataLoader, PartNormalDataset
from prifit_tpu.eval.miou import evaluation, make_eval_forward
from prifit_tpu.models import get_module
from prifit_tpu.parallel import make_data_mesh, shard_batch
from prifit_tpu.train.checkpoint import restore_params_only
from prifit_tpu.train.state import create_train_state


def main(args):
    mod = get_module(args.model)
    model = build_model(args, mod)
    sample_pts = jnp.zeros(
        (2, args.npoint, 6 if args.normal else 3), jnp.float32)
    sample_cls = jnp.zeros((2, args.num_classes), jnp.float32)
    state = create_train_state(model, (sample_pts, sample_cls),
                               dict(train=True), seed=args.seed)
    if args.pretrained_model is not None:
        d, n = osp.split(args.pretrained_model)
        state = restore_params_only(d, n, state)
        print(f"Loaded pretrained model from {args.pretrained_model}")

    eval_ds = PartNormalDataset(
        args.data_root, npoints=args.npoint, split=args.eval_split,
        normal_channel=args.normal, rng=np.random.default_rng(args.seed))
    print(f"The number of test data is: {len(eval_ds)}")
    eval_loader = DataLoader(eval_ds, args.batch_size, shuffle=False,
                             drop_last=False, num_workers=args.num_workers)
    # batch-sharded forward (reference evaluates under DataParallel,
    # testing.py:96-98); tail batches are padded to batch_size
    mesh = make_data_mesh(args.batch_size)
    forward = make_eval_forward(model, state.variables())
    return evaluation(forward, eval_loader, num_parts=args.num_parts,
                      place=lambda b: shard_batch(mesh, b),
                      pad_to=args.batch_size)


if __name__ == "__main__":
    main(parse_args())
