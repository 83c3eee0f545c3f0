"""Train state and optimizers (torch-semantics, traced learning rate).

The reference mutates the optimizer's lr per epoch
(``train_partseg_shapenet.py:327-328``); here the optimizer transform is
LR-free (``add_decayed_weights + scale_by_adam`` / ``trace``) and the
train step applies ``-lr * update`` with lr as a traced scalar — epoch
schedules never recompile.

Optimizer semantics match torch exactly:
  - Adam(wd): L2 is added to the gradient BEFORE the Adam moments
    (torch ``weight_decay``; NOT AdamW's decoupled decay);
  - SGD(momentum=0.9): ``buf = m * buf + g``, update ``-lr * buf``.
"""

from typing import Any

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    selfsup_state: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def variables(self) -> dict:
        v = {"params": self.params, "batch_stats": self.batch_stats}
        if self.selfsup_state:
            v["selfsup_state"] = self.selfsup_state
        return v

    def apply_gradients(self, grads, lr):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            opt_state=new_opt)


def make_optimizer(name: str = "Adam",
                   decay_rate: float = 1e-4) -> optax.GradientTransformation:
    """LR-free optimizer transform (reference
    ``train_partseg_shapenet.py:252-261``: Adam(lr, (0.9, 0.999), eps=1e-8,
    weight_decay=decay_rate) or SGD(lr, momentum=0.9))."""
    if name.lower() == "adam":
        return optax.chain(
            optax.add_decayed_weights(decay_rate),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
    if name.lower() == "sgd":
        return optax.trace(decay=0.9, nesterov=False)
    raise ValueError(f"unknown optimizer {name!r}")


def selfsup_init_kwargs(chamfer_points=None) -> dict:
    """Cheapest forward kwargs that materialize ALL parameters.

    flax creates params lazily on first call, so a supervised-only init
    would miss the convex-path layers (``extra_conv_emb``, the
    extra_layers embedding tower).  Parameter shapes don't depend on the
    convex-loss knobs, so init with the smallest possible pipeline.
    """
    import jax.numpy as jnp

    kw = dict(train=True, include_convex_loss=True, quantile=0.5,
              msc_iterations=1, max_num_clusters=2, n_per_prim=4)
    if chamfer_points is not None:
        kw["chamfer_points"] = chamfer_points
    return kw


def create_train_state(model, sample_args, sample_kwargs, *,
                       optimizer: str = "Adam", decay_rate: float = 1e-4,
                       seed: int = 0) -> TrainState:
    """Initialize model variables and optimizer state.

    ``sample_args``/``sample_kwargs`` are a representative call (tiny batch
    is fine — parameter shapes don't depend on batch).  For models with a
    convex self-sup path, pass :func:`selfsup_init_kwargs` so the lazy
    flax init sees every layer.
    """
    import jax.numpy as jnp

    rngs = {"params": jax.random.PRNGKey(seed),
            "sampling": jax.random.PRNGKey(seed + 1),
            "dropout": jax.random.PRNGKey(seed + 2),
            "selfsup": jax.random.PRNGKey(seed + 3)}
    # jit the init: eager init dispatches every op individually (minutes
    # through a remote-TPU tunnel); one compiled program is far cheaper
    variables = jax.jit(
        lambda r: model.init(r, *sample_args, **sample_kwargs))(rngs)
    params = variables["params"]
    tx = make_optimizer(optimizer, decay_rate)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        selfsup_state=variables.get("selfsup_state", {}),
        opt_state=tx.init(params),
        tx=tx,
    )
