"""Random-augmentation combinator (rebuilds ``src/augment_utils.py``).

The reference keeps an older duplicate of the provider functions plus an
``Augment`` class that applies each enabled augmentation with probability
0.3 (``src/augment_utils.py:6-127``).  The duplicates are NOT reproduced —
the combinator composes the canonical ``prifit_tpu.data.provider``
functions instead.
"""

import numpy as np

from prifit_tpu.data import provider


class Augment:
    """Apply each configured augmentation with probability ``p``."""

    def __init__(self, p: float = 0.3, rotation: bool = True,
                 scale: bool = True, shift: bool = True,
                 jitter: bool = True, dropout: bool = False,
                 anisotropic: bool = False,
                 rng: np.random.Generator | None = None):
        self.p = p
        self.rng = rng if rng is not None else np.random.default_rng()
        self.ops = []
        if rotation:
            self.ops.append(lambda x: provider.rotate_point_cloud(
                x, rng=self.rng))
        if scale:
            self.ops.append(lambda x: provider.random_scale_point_cloud(
                x, rng=self.rng))
        if anisotropic:
            self.ops.append(
                lambda x: provider.random_anisotropic_scale_point_cloud(
                    x, rng=self.rng))
        if shift:
            self.ops.append(lambda x: provider.shift_point_cloud(
                x, rng=self.rng))
        if jitter:
            self.ops.append(lambda x: provider.jitter_point_cloud(
                x, rng=self.rng))
        if dropout:
            self.ops.append(lambda x: provider.random_point_dropout(
                x, rng=self.rng))

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        out = batch
        for op in self.ops:
            if self.rng.random() < self.p:
                out = op(out)
        return out
