from prifit_tpu.utils.guard import guard_exp, guard_sqrt, guard_acos
from prifit_tpu.utils.meters import (
    AverageValueMeter,
    adjust_learning_rate,
    get_colors,
)
from prifit_tpu.utils.profiling import StepTimer, debug_nans, sync, trace

__all__ = [
    "guard_exp", "guard_sqrt", "guard_acos",
    "AverageValueMeter", "adjust_learning_rate", "get_colors",
    "StepTimer", "debug_nans", "sync", "trace",
]
