"""Dense Levenberg-Marquardt with parameter masks and bounds.

The TPU-native replacement for small/medium Ceres problems in the reference
(RPC inverse fitting `rpc_distortion.cc:559-721`, registration refinement,
and the single-sensor BA configs). Jacobians come from autodiff
(``jax.jacrev``) instead of the reference's numeric differentiation
(DynamicNumericDiffCostFunction) — exact and one compiled kernel per solve.

The whole solve runs inside one ``lax.while_loop`` so it jits cleanly and
executes on-device with no host round-trips per iteration.

For large sparse BA problems use ``solver.schur`` instead.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    x: jnp.ndarray          # final parameters
    cost: jnp.ndarray       # final robust cost (0.5 * sum rho)
    initial_cost: jnp.ndarray
    iterations: jnp.ndarray
    lam: jnp.ndarray        # final damping
    converged: jnp.ndarray


def levenberg_marquardt(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    max_iterations: int = 20,
    lam0: float = 1e-4,
    parameter_tolerance: float = 1e-8,
    function_tolerance: float = 1e-6,
    mask: Optional[jnp.ndarray] = None,
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
) -> LMResult:
    """Minimize 0.5 * |residual_fn(x)|^2 over x.

    residual_fn: x [n] -> residuals [m] (robust weighting, if any, must be
      baked into the residuals — see losses.robust_weights).
    mask: boolean [n]; False entries are frozen (Ceres
      SetParameterBlockConstant semantics, `bin/rig_calibrator.cc:1702-1752`).
    lower/upper: optional [n] box bounds; steps are projected.

    Uses Nielsen's damping update (gain-ratio driven), Jacobi-scaled
    (lambda * diag(J^T J)) like Ceres' default LM.
    """
    x0 = jnp.asarray(x0)
    n = x0.shape[0]
    dtype = x0.dtype
    if mask is None:
        mask = jnp.ones(n, bool)
    free = mask.astype(dtype)

    def project(x):
        if lower is not None:
            x = jnp.maximum(x, lower)
        if upper is not None:
            x = jnp.minimum(x, upper)
        return x

    def cost_of(x):
        r = residual_fn(x)
        return 0.5 * jnp.sum(r * r)

    jac_fn = jax.jacrev(residual_fn)

    c0 = cost_of(x0)

    class State(NamedTuple):
        x: jnp.ndarray
        cost: jnp.ndarray
        lam: jnp.ndarray
        nu: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray

    init = State(x0, c0, jnp.asarray(lam0, dtype), jnp.asarray(2.0, dtype),
                 jnp.asarray(0), jnp.asarray(False))

    def cond(s: State):
        return (s.it < max_iterations) & (~s.done)

    def body(s: State):
        r = residual_fn(s.x)
        J = jac_fn(s.x) * free[None, :]          # zero columns of frozen params
        g = J.T @ r
        H = J.T @ J
        diag = jnp.clip(jnp.diagonal(H), 1e-12, 1e32)
        # frozen entries get unit diagonal so the solve stays well-posed
        Hd = H + jnp.diag(s.lam * diag + (1.0 - free))
        # solve (H + lam D) dx = -g
        L, lowflag = jax.scipy.linalg.cho_factor(Hd)
        dx = -jax.scipy.linalg.cho_solve((L, lowflag), g)
        dx = dx * free

        x_new = project(s.x + dx)
        step = x_new - s.x
        new_cost = cost_of(x_new)

        # gain ratio: actual reduction / model reduction
        pred = -(step @ g) - 0.5 * step @ (H @ step) \
            - 0.5 * s.lam * jnp.sum(diag * step * step)
        rho = (s.cost - new_cost) / jnp.maximum(pred, 1e-30)
        good = (new_cost < s.cost) & jnp.isfinite(new_cost)

        lam_dec = s.lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_new = jnp.where(good, jnp.maximum(lam_dec, 1e-14), s.lam * s.nu)
        nu_new = jnp.where(good, jnp.asarray(2.0, dtype), s.nu * 2.0)

        x_next = jnp.where(good, x_new, s.x)
        cost_next = jnp.where(good, new_cost, s.cost)

        step_norm = jnp.linalg.norm(step)
        x_norm = jnp.linalg.norm(s.x)
        small_step = good & (step_norm <= parameter_tolerance * (x_norm + parameter_tolerance))
        small_decrease = good & (jnp.abs(s.cost - new_cost)
                                 <= function_tolerance * jnp.maximum(s.cost, 1e-30))
        blown_up = s.lam > 1e10
        done = small_step | small_decrease | blown_up

        return State(x_next, cost_next, lam_new, nu_new, s.it + 1, done)

    out = jax.lax.while_loop(cond, body, init)
    return LMResult(out.x, out.cost, c0, out.it, out.lam, out.done)
