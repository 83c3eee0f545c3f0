from prifit_tpu.eval.miou import (
    category_masked_argmax,
    mean_iou_one_sample,
    evaluation,
    make_eval_forward,
)
from prifit_tpu.eval.eval_utils import mean_IOU_one_sample
from prifit_tpu.eval.svm_probe import (
    extract_global_features,
    make_feature_forward,
    svm_probe,
)

__all__ = [
    "category_masked_argmax",
    "mean_iou_one_sample",
    "evaluation",
    "make_eval_forward",
    "mean_IOU_one_sample",
    "extract_global_features",
    "make_feature_forward",
    "svm_probe",
]
