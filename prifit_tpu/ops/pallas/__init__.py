"""Pallas TPU kernels for the hot geometric ops.

Each kernel has a jnp reference implementation in :mod:`prifit_tpu.ops` /
:mod:`prifit_tpu.clustering`; the Pallas versions fuse multi-op loops into
single VMEM-resident programs.  On non-TPU backends they fall back to the
reference implementations (tests run them in interpreter mode for
bit-level comparison).
"""

from prifit_tpu.ops.pallas.fps import farthest_point_sample_pallas
from prifit_tpu.ops.pallas.mean_shift import mean_shift_step_pallas
from prifit_tpu.ops.pallas.bandwidth import kth_nn_distance_pallas

__all__ = [
    "farthest_point_sample_pallas",
    "mean_shift_step_pallas",
    "kth_nn_distance_pallas",
]
