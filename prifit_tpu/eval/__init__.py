from prifit_tpu.eval.miou import (
    category_masked_argmax,
    mean_iou_one_sample,
    evaluation,
    make_eval_forward,
)

__all__ = [
    "category_masked_argmax",
    "mean_iou_one_sample",
    "evaluation",
    "make_eval_forward",
]
