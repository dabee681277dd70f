"""Robust loss functions matching Ceres' loss family as used by the reference
(``GetLossFunction``, `/root/reference/rig_calibrator/bin/rig_calibrator.cc:394-411`):
l2 (none), huber, cauchy, soft_l1 (Ceres SoftLOneLoss, the reference's "l1").

Each rho(s) maps a *squared* residual-block norm s to the robustified cost,
as in Ceres. The solver applies robustness by IRLS-style residual scaling
with sqrt(rho'(s)) — the first-order Triggs correction.
"""

from __future__ import annotations

import jax.numpy as jnp

VALID_LOSSES = ("l2", "huber", "cauchy", "soft_l1", "l1")


def rho(loss: str, s, scale):
    """Robust cost of squared norm s; scale = robust threshold a."""
    a2 = scale * scale
    if loss == "l2":
        return s
    if loss == "huber":
        # Ceres HuberLoss: s <= a2 -> s ; else 2a sqrt(s) - a2.
        # sqrt argument clamped to a2 so the unselected branch's gradient is
        # finite (the where-NaN autodiff pitfall).
        return jnp.where(s <= a2, s, 2.0 * scale * jnp.sqrt(jnp.maximum(s, a2)) - a2)
    if loss == "cauchy":
        return a2 * jnp.log1p(s / a2)
    if loss in ("soft_l1", "l1"):
        return 2.0 * a2 * (jnp.sqrt(1.0 + s / a2) - 1.0)
    raise ValueError(f"Unknown loss: {loss}")


def rho_prime(loss: str, s, scale):
    """d rho / d s. Used for IRLS weights w = sqrt(rho')."""
    a2 = scale * scale
    if loss == "l2":
        return jnp.ones_like(s)
    if loss == "huber":
        return jnp.where(s <= a2, jnp.ones_like(s),
                         scale / jnp.sqrt(jnp.maximum(s, a2)))
    if loss == "cauchy":
        return 1.0 / (1.0 + s / a2)
    if loss in ("soft_l1", "l1"):
        return 1.0 / jnp.sqrt(1.0 + s / a2)
    raise ValueError(f"Unknown loss: {loss}")


def robust_weights(loss: str, residual_blocks, scale):
    """Per-block IRLS weights sqrt(rho'(|r|^2)) for residual blocks [...,k]."""
    s = jnp.sum(residual_blocks * residual_blocks, axis=-1)
    return jnp.sqrt(rho_prime(loss, s, scale))
