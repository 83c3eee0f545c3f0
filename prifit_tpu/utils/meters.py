"""Training meters and small init/color helpers.

Rebuilds the non-viz half of ``src/color_utils.py``: the
``AverageValueMeter`` (:22-38), DCGAN-style init (:6-12, as flax
initializers), step LR drop (:15-19), and pastel color generation
(:55-91) used by the cluster visualizations.
"""

import random

from flax import linen as nn


class AverageValueMeter:
    """Running average (``src/color_utils.py:22-38``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


# DCGAN-style initializers (reference ``weights_init``, color_utils.py:6-12)
conv_init = nn.initializers.normal(stddev=0.02)


def scale_init(key, shape, dtype=None):
    """BatchNorm scale ~ N(1, 0.02)."""
    import jax.numpy as jnp

    return 1.0 + nn.initializers.normal(stddev=0.02)(
        key, shape, dtype or jnp.float32)


def adjust_learning_rate(lr: float, epoch: int, phase: int) -> float:
    """Divide lr by 10 at the end of every ``phase`` epochs
    (``color_utils.py:15-19``, functional form)."""
    if epoch % phase == (phase - 1):
        return lr / 10.0
    return lr


def get_random_color(pastel_factor=0.5, rng=None):
    r = rng or random
    return [(x + pastel_factor) / (1.0 + pastel_factor)
            for x in [r.uniform(0, 1.0) for _ in range(3)]]


def color_distance(c1, c2):
    return sum(abs(x - y) for x, y in zip(c1, c2))


def generate_new_color(existing_colors, pastel_factor=0.5, rng=None):
    max_distance = None
    best_color = None
    for _ in range(100):
        color = get_random_color(pastel_factor, rng)
        if not existing_colors:
            return color
        best = min(color_distance(color, c) for c in existing_colors)
        if max_distance is None or best > max_distance:
            max_distance = best
            best_color = color
    return best_color


def get_colors(num_colors=10, rng=None):
    colors = []
    for _ in range(num_colors):
        colors.append(generate_new_color(colors, rng=rng))
    return colors
