"""Denormalised masked L1 loss.

Parity with /root/reference/lib/Trainer.py:87-100: predictions and targets
are mapped back to metric heights (x * sigma + per-sample mean), invalid
pixels are excluded, and the mean runs over VALID pixels only (the reference
achieves this by zeroing invalid pixels and rescaling a full-size mean by
numel/sum(mask) — algebraically identical to the weighted form used here).
The resulting metric is the denormalised masked MAE in meters — the sole
training/validation metric of the reference (lib/Trainer.py:197).

The padded-sample weights from the fixed-shape batch iterator fold into the
same weighting, so padding contributes exactly zero to loss and gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def denormalized_masked_l1(pred, target, loss_mask, dsm_mean, dsm_std,
                           sample_weights=None, axis_name=None):
    """Returns ``(loss, (num, den))``.

    ``loss`` is differentiable and globally correct under data parallelism:
    the denominator is summed across the mesh axis, the numerator stays local
    so that the cross-device ``psum`` of per-device gradients reconstructs
    the gradient of the global masked mean.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mean = dsm_mean[:, None, None, None]
    pred_m = pred * dsm_std + mean
    target_m = target * dsm_std + mean

    weights = loss_mask.astype(jnp.float32)
    if sample_weights is not None:
        weights = weights * sample_weights[:, None, None, None]

    num = (jnp.abs(pred_m - target_m) * weights).sum()
    den = weights.sum()
    den_global = jax.lax.psum(den, axis_name) if axis_name else den
    loss = num / jnp.maximum(den_global, 1.0)
    return loss, (num, den)
