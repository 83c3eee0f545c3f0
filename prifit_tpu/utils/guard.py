"""Numeric guards.

Parity with the reference sanitizers (``src/guard.py:6-23``): clamp the
argument of ``exp`` to [-13, 75], floor the argument of ``sqrt``, clamp the
argument of ``acos`` to the open interval around [-1, 1].  These run inside
jitted loss code, so they are plain jnp ops (no host sync).
"""

import jax.numpy as jnp

_EXP_LO = -13.0
_EXP_HI = 75.0


def guard_exp(x, max_value: float = _EXP_HI, min_value: float = _EXP_LO):
    """exp with clamped argument (reference ``src/guard.py:6-10``)."""
    return jnp.exp(jnp.clip(x, min_value, max_value))


def guard_sqrt(x, minimum: float = 1e-5):
    """sqrt with floored argument (reference ``src/guard.py:13-16``)."""
    return jnp.sqrt(jnp.maximum(x, minimum))


def guard_acos(x, eps: float = 1e-6):
    """acos with argument clamped inside (-1, 1) (``src/guard.py:19-23``)."""
    return jnp.arccos(jnp.clip(x, -1.0 + eps, 1.0 - eps))
