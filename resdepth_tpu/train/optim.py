"""Optimizers with torch-default semantics.

Parity with /root/reference/lib/utils.py:319-341: Adam (betas 0.9/0.999,
eps 1e-8, L2 weight decay folded into the gradient BEFORE the moment
updates — torch's coupling, not AdamW) and plain SGD (no momentum). The
learning rate is applied OUTSIDE the optax transform as an explicit scalar in
the train state, so LR schedules (including the data-dependent
ReduceLROnPlateau) never retrigger compilation.
"""

from __future__ import annotations

import jax
import optax


def build_optimizer(name: str, weight_decay: float = 0.0):
    """Returns an optax GradientTransformation producing UNSCALED updates.

    The caller applies ``params - lr * updates``.
    """
    transforms = []
    if weight_decay:
        transforms.append(optax.add_decayed_weights(weight_decay))
    if name == "Adam":
        transforms.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif name == "SGD":
        pass  # raw (decayed) gradient
    else:
        raise ValueError(f"Unknown optimizer: {name!r}. Choose among ['Adam', 'SGD'].")
    if not transforms:
        return optax.identity()
    return optax.chain(*transforms) if len(transforms) > 1 else transforms[0]


def apply_updates(params, updates, lr):
    return jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
