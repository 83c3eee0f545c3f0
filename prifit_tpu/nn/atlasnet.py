"""AtlasNet reconstruction decoder (flax).

Rebuilds ``models/reconstruction.py:8-70``: ``num_charts`` small MLP
decoders each mapping (2-d regular UV grid ++ latent) -> 3-d points; the
per-chart Python loop of the reference becomes one vmapped decoder with a
chart axis (identical math — charts never share weights — but one fused
kernel on the MXU instead of 25 small launches).
"""

import math

import jax.numpy as jnp
from flax import linen as nn

from prifit_tpu.nn.norm import BatchNorm


class PointGenCon(nn.Module):
    """Per-chart point-generation MLP (``reconstruction.py:8-29``)."""
    bottleneck_size: int = 2500
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=0.1):
        """x [B, G, bottleneck] -> [B, G, 3] in tanh range."""
        sizes = [self.bottleneck_size, self.bottleneck_size // 2,
                 self.bottleneck_size // 4]
        for f in sizes:
            x = nn.Dense(f)(x)
            x = BatchNorm(axis_name=self.axis_name)(
                x, use_running_average=not train, momentum=bn_momentum)
            x = nn.relu(x)
        return jnp.tanh(nn.Dense(3)(x))


class AtlasNet(nn.Module):
    """Multi-chart decoder (``reconstruction.py:32-70``).

    ``num_points`` is per-chart; the UV grid is the same regular
    ``sqrt(num_points)``^2 lattice in [0, 1]^2 as the reference.
    """
    bottleneck_size: int = 128
    num_charts: int = 25
    num_points: int = 128
    axis_name: str | None = None

    @nn.compact
    def __call__(self, z, train: bool, bn_momentum=0.1):
        """z [B, bottleneck] -> [B, num_charts * grid^2, 3]."""
        B = z.shape[0]
        g = int(math.isqrt(self.num_points))
        uv = jnp.stack(jnp.meshgrid(jnp.arange(g), jnp.arange(g),
                                    indexing="ij"), -1).reshape(-1, 2)
        uv = uv.astype(jnp.float32) / max(g - 1, 1)          # [G, 2]
        G = uv.shape[0]
        y = jnp.concatenate(
            [jnp.broadcast_to(uv[None], (B, G, 2)),
             jnp.broadcast_to(z[:, None, :], (B, G, z.shape[-1]))], axis=-1)

        decoder = nn.vmap(
            PointGenCon,
            in_axes=None, out_axes=1,                # charts axis
            axis_size=self.num_charts,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
        )(bottleneck_size=2 + self.bottleneck_size,
          axis_name=self.axis_name)
        pts = decoder(y, train, bn_momentum)         # [B, charts, G, 3]
        return pts.reshape(B, self.num_charts * G, 3)
