from prifit_tpu.utils.guard import guard_exp, guard_sqrt, guard_acos

__all__ = ["guard_exp", "guard_sqrt", "guard_acos"]
