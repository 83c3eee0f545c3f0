"""On-device (jnp) augmentations for the fused train step.

The reference augments on the host with numpy before every step
(``train_partseg_shapenet.py:372-373``).  These are the same math as
:mod:`prifit_tpu.data.provider` as pure jnp functions of a PRNG key, so
the ``--fused_augment`` path can run augment -> encode -> fit -> cluster
-> loss as ONE XLA program with zero host work per step (the north-star
fusion in BASELINE.json).
"""

import jax
import jax.numpy as jnp


def random_scale_point_cloud(key, batch, scale_low=0.8, scale_high=1.25):
    """Per-shape isotropic scale (provider.py:292-304)."""
    scales = jax.random.uniform(key, (batch.shape[0], 1, 1),
                                minval=scale_low, maxval=scale_high)
    return batch * scales


def shift_point_cloud(key, batch, shift_range=0.1):
    """Per-shape uniform translation (provider.py:278-290)."""
    shifts = jax.random.uniform(key, (batch.shape[0], 1, 3),
                                minval=-shift_range, maxval=shift_range)
    return batch + shifts


def jitter_point_cloud(key, batch, sigma=0.01, clip=0.05):
    """Clipped per-point gaussian jitter (provider.py:265-276)."""
    noise = jnp.clip(sigma * jax.random.normal(key, batch.shape),
                     -clip, clip)
    return batch + noise


def _rot_y(angles):
    c, s = jnp.cos(angles), jnp.sin(angles)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([jnp.stack([c, z, s], -1),
                      jnp.stack([z, o, z], -1),
                      jnp.stack([-s, z, c], -1)], -2)


def _rot_z(angles):
    c, s = jnp.cos(angles), jnp.sin(angles)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([jnp.stack([c, s, z], -1),
                      jnp.stack([-s, c, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def rotate_point_cloud(key, batch):
    """Random per-shape rotation about y (provider.py:46-64)."""
    angles = jax.random.uniform(key, (batch.shape[0],)) * 2 * jnp.pi
    return jnp.einsum("bnc,bcd->bnd", batch, _rot_y(angles))


def rotate_point_cloud_z(key, batch):
    """Random per-shape rotation about z (provider.py:66-85)."""
    angles = jax.random.uniform(key, (batch.shape[0],)) * 2 * jnp.pi
    return jnp.einsum("bnc,bcd->bnd", batch, _rot_z(angles))


def random_anisotropic_scale_point_cloud(key, batch, scale_low=0.8,
                                         scale_high=1.25):
    """Per-shape per-axis scale (provider.py:306-318)."""
    scales = jax.random.uniform(
        key, (batch.shape[0], 1, batch.shape[2]),
        minval=scale_low, maxval=scale_high)
    return batch * scales


def random_point_dropout(key, batch, max_dropout_ratio=0.875):
    """Replace a random fraction of points with the first point
    (provider.py:320-327)."""
    k1, k2 = jax.random.split(key)
    ratios = jax.random.uniform(k1, (batch.shape[0], 1)) \
        * max_dropout_ratio
    drop = jax.random.uniform(k2, batch.shape[:2]) <= ratios
    return jnp.where(drop[:, :, None], batch[:, :1, :], batch)


def standard_train_augment(key, points):
    """The per-step augmentation pair every reference train loop applies:
    random isotropic scale then shift (``train:372-373``)."""
    k1, k2 = jax.random.split(key)
    xyz = shift_point_cloud(k2, random_scale_point_cloud(
        k1, points[..., :3]))
    if points.shape[-1] > 3:
        return jnp.concatenate([xyz, points[..., 3:]], axis=-1)
    return xyz
