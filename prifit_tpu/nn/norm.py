"""Batch normalization with a *traced* momentum and cross-replica stats.

Why not ``flax.linen.BatchNorm``: the reference schedules BN momentum per
epoch (``train_partseg_shapenet.py:330-334``: ``0.1 * 0.5^(e//step)``,
floored at 0.01) and flax bakes momentum in as a static attribute — every
epoch would recompile.  Here momentum is a runtime scalar argument.

Semantics follow torch (what the schedule was written for):
``running = (1 - momentum) * running + momentum * batch_stat`` — note this
is the *opposite* convention of flax's ``momentum``.

Under data parallelism the reference relies on ``DataParallel``'s
per-replica batch stats; here ``axis_name`` (when set and present) gives
cross-replica mean/var via ``lax.pmean``, which is the idiomatic
mesh-sharded equivalent (SURVEY.md §7 design translation 6).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """Torch-convention batch norm over all axes but the last.

    Attributes:
        use_bias/use_scale: affine params (torch defaults true).
        epsilon: torch default 1e-5.
        axis_name: optional mapped axis for cross-replica statistics.
    """
    use_bias: bool = True
    use_scale: bool = True
    epsilon: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool,
                 momentum: jax.Array | float = 0.1) -> jax.Array:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=reduce_axes)
            mean2 = jnp.mean(x32 ** 2, axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - mean ** 2, 0.0)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                # torch tracks the *unbiased* variance in running stats
                n = 1.0
                for a in reduce_axes:
                    n = n * x.shape[a]
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (features,))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (features,))
        return y.astype(x.dtype)
