from prifit_tpu.clustering.mean_shift import (
    ClusterResult,
    compute_bandwidth,
    mean_shift_iterations,
    nms_fixed_slots,
    membership,
    cluster_single,
    cluster_batch,
)

__all__ = [
    "ClusterResult",
    "compute_bandwidth",
    "mean_shift_iterations",
    "nms_fixed_slots",
    "membership",
    "cluster_single",
    "cluster_batch",
]
