"""Epoch-level schedules (reference ``train_partseg_shapenet.py:321-340``).

All return plain floats computed on the host once per epoch and fed to the
jitted step as traced scalars — no recompilation across epochs.
"""

# reference constants (train_partseg_shapenet.py:287-289)
MOMENTUM_ORIGINAL = 0.1
MOMENTUM_DECAY = 0.5
MOMENTUM_DECAY_STEP_DEFAULT = 20


def lr_schedule(epoch: int, learning_rate: float, lr_decay: float = 0.5,
                step_size: int = 20, lr_clip: float = 1e-5) -> float:
    """``max(lr0 * decay^(epoch // step), clip)`` (reference :325)."""
    return max(learning_rate * (lr_decay ** (epoch // step_size)), lr_clip)


def bn_momentum_schedule(epoch: int, step_size: int = 20,
                         floor: float = 0.01) -> float:
    """``max(0.1 * 0.5^(epoch // step), 0.01)`` (reference :330-334)."""
    m = MOMENTUM_ORIGINAL * (MOMENTUM_DECAY ** (epoch // step_size))
    return max(m, floor)


def lambda_schedule(epoch: int, lmbda: float, anneal_lambda: bool = False,
                    anneal_rate: float = 0.5,
                    anneal_step: int = 5) -> float:
    """Self-sup weight anneal (reference :337-340)."""
    if not anneal_lambda:
        return lmbda
    return lmbda * (anneal_rate ** (epoch // anneal_step))
