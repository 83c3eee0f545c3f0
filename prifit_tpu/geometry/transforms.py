"""Point-cloud standardization / PCA / projection helpers.

Rebuilds ``src/fitting_utils.py:142-248`` on device with static shapes:
per-shape loops become ``vmap``; ``np.linalg.eig`` of the covariance
becomes symmetric ``eigh``; the try/except singular-matrix fallback of
``rotation_matrix_a_to_b`` becomes a determinant-guarded ``where``.
"""

import jax
import jax.numpy as jnp

EPS = 1.1920929e-07  # float32 machine eps, as in the reference


def pca(X: jax.Array):
    """Eigen-decomposition of ``X^T X`` (reference ``pca_numpy``/
    ``pca_torch``, ``fitting_utils.py:201-211``).

    Returns (eigenvalues [C], eigenvectors [C, C]) ascending.
    """
    cov = jnp.matmul(X.T, X, preferred_element_type=jnp.float32)
    return jnp.linalg.eigh(cov)


def rotation_matrix_a_to_b(A: jax.Array, B: jax.Array) -> jax.Array:
    """Rotation R with ``B = R @ A`` for unit 3-vectors
    (``fitting_utils.py:177-198``); identity when the frame is singular."""
    cos = jnp.dot(A, B)
    sin = jnp.linalg.norm(jnp.cross(B, A))
    u = A
    v = B - jnp.dot(A, B) * A
    v = v / (jnp.linalg.norm(v) + EPS)
    w = jnp.cross(B, A)
    w = w / (jnp.linalg.norm(w) + EPS)
    F = jnp.stack([u, v, w], axis=1)
    G = jnp.array([[1.0, 0.0, 0.0],
                   [0.0, 1.0, 0.0],
                   [0.0, 0.0, 1.0]]).at[0, 0].set(cos).at[0, 1].set(
        -sin).at[1, 0].set(sin).at[1, 1].set(cos)
    det = jnp.linalg.det(F)
    ok = jnp.abs(det) > 1e-8
    F_safe = jnp.where(ok, F, jnp.eye(3))
    R = F_safe @ G @ jnp.linalg.inv(F_safe)
    return jnp.where(ok, R, jnp.eye(3))


def standardize_point(point: jax.Array):
    """Center, rotate smallest principal axis onto x, scale to unit extent
    (``fitting_utils.py:160-174``).

    Intended-behavior fix: the reference computes
    ``mean = torch.mean(point, 0)[0]`` — indexing out the x-coordinate
    mean and subtracting that SCALAR from all three axes (an indexing
    quirk); this subtracts the full centroid vector, which is what
    standardization means.

    Returns (point [N, 3], std [1, 3], mean [3], R [3, 3]).
    """
    mean = jnp.mean(point, axis=0)
    centered = point - mean
    S, U = pca(centered)
    smallest = U[:, jnp.argmin(S)]
    R = rotation_matrix_a_to_b(smallest, jnp.array([1.0, 0.0, 0.0]))
    rotated = jnp.matmul(centered, R.T,
                         preferred_element_type=jnp.float32)
    std = jnp.abs(jnp.max(rotated, axis=0)
                  - jnp.min(rotated, axis=0)).reshape(1, 3)
    return rotated / (std + EPS), std, mean, R


def standardize_points(points: jax.Array):
    """Batched :func:`standardize_point` (``fitting_utils.py:142-157``).

    Returns (points [B, N, 3], stds [B, 1, 3], means [B, 3], Rs [B, 3, 3]).
    """
    return jax.vmap(standardize_point)(points)


def reverse_all_transformation(point, mean, std, R):
    """Invert :func:`standardize_point` (``fitting_utils.py:220-227``)."""
    scaled = point * std.reshape(1, 3)
    unrot = jnp.matmul(scaled, jnp.linalg.inv(R).T,
                       preferred_element_type=jnp.float32)
    return unrot + mean


def reverse_all_transformations(points, means, stds, Rs):
    """Batched inverse (``fitting_utils.py:214-218``)."""
    return jax.vmap(reverse_all_transformation)(points, means, stds, Rs)


def project_to_plane(points: jax.Array, a: jax.Array,
                     d: jax.Array) -> jax.Array:
    """Project points onto the plane ``<a, x> = d``
    (``fitting_utils.py:230-239``)."""
    a = a.reshape(3)
    a = a / jnp.linalg.norm(a)
    proj = points - jnp.outer(points @ a, a)
    return proj + a[None, :] * d


def project_to_point_cloud(points: jax.Array,
                           surface: jax.Array) -> jax.Array:
    """Snap each point to its nearest surface point
    (``fitting_utils.py:242-248``)."""
    d = jnp.sum((points[:, None, :] - surface[None, :, :]) ** 2, axis=2)
    return surface[jnp.argmin(d, axis=1)]
