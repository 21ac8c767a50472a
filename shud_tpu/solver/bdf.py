"""Jittable adaptive implicit multistep solver (the CVODE replacement).

Replaces SUNDIALS CVODE (BDF + matrix-free SPGMR Newton–Krylov; reference
configuration at ``src/Equations/cvode_config.cpp:149-197``) with a
TPU-native design:

* variable-step, variable-order BDF(1,2) with history carried across solver
  windows (like CVODE, the method does NOT restart at forcing boundaries);
* modified Newton inner iterations with **exact** Jacobian-vector products
  from ``jax.linearize`` (CVODE can only difference-quotient J·v — exact
  JVPs converge faster);
* matrix-free GMRES(m) for the Newton linear systems (SPGMR equivalent);
* WRMS error control with per-component weights 1/(rtol·|y| + atol),
  a standard step controller, min/max step bounds and exact stop-at-tout —
  all inside one ``lax.while_loop`` so a single device dispatch integrates an
  entire output window.

Within a window the RHS is autonomous (the driver freezes the forcing slice,
exactly as the reference driver refreshes forcing only between CVode calls,
``shud.cpp:91-155``), which the error estimator exploits: the predictor
reuses f(y_n) computed once per step.

NFE is tracked in-carry (the reference's ``nFCall``; the cell-steps/s
benchmark metric is NumEle × NFE / wall).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class SolverConfig(NamedTuple):
    rtol: float = 1.0e-3
    atol: float = 1.0e-4
    h_init: float = 1.0e-2  # [min] CS.InitStep
    h_min: float = 1.0e-6  # [min] CVodeSetMinStep
    h_max: float = 30.0  # [min] CVodeSetMaxStep
    newton_iters: int = 3
    krylov_m: int = 5  # SPGMR default dimension
    newton_tol: float = 0.1  # nonlinear tolerance in WRMS units
    safety: float = 0.9
    eta_max: float = 6.0
    eta_min: float = 0.2
    max_steps: int = 100000  # per-window backstop


class BDFState(NamedTuple):
    t: jnp.ndarray
    y: jnp.ndarray
    y_prev: jnp.ndarray  # state at t - h_prev
    h: jnp.ndarray  # next step size to attempt
    h_prev: jnp.ndarray  # last successful step size
    order: jnp.ndarray  # current order (1 or 2)
    nfe: jnp.ndarray  # RHS evaluation count
    nsteps: jnp.ndarray
    nfails: jnp.ndarray  # error-test failures
    nnifails: jnp.ndarray  # Newton failures


def bdf_init(t0, y0, cfg: SolverConfig) -> BDFState:
    y0 = jnp.asarray(y0)
    z = jnp.zeros((), dtype=jnp.int64)
    return BDFState(
        t=jnp.asarray(t0, dtype=y0.dtype),
        y=y0,
        y_prev=y0,
        h=jnp.asarray(cfg.h_init, dtype=y0.dtype),
        h_prev=jnp.asarray(cfg.h_init, dtype=y0.dtype),
        order=jnp.ones((), dtype=jnp.int64),
        nfe=z, nsteps=z, nfails=z, nnifails=z,
    )


def _wrms(x, ewt):
    return jnp.sqrt(jnp.mean((x * ewt) ** 2))


def _gmres(matvec, b, m):
    """Single-cycle matrix-free GMRES(m), modified Gram-Schmidt, x0 = 0.

    m is small and static (SPGMR default 5), so the Arnoldi loop unrolls at
    trace time into pure fused vector ops."""
    dtype = b.dtype
    beta = jnp.linalg.norm(b)
    safe = jnp.where(beta > 0, beta, 1.0)
    vs = [b / safe]
    h = jnp.zeros((m + 1, m), dtype=dtype)
    for j in range(m):
        w = matvec(vs[j])
        for i in range(j + 1):
            hij = jnp.vdot(vs[i], w)
            h = h.at[i, j].set(hij)
            w = w - hij * vs[i]
        wnorm = jnp.linalg.norm(w)
        h = h.at[j + 1, j].set(wnorm)
        vs.append(w / jnp.where(wnorm > 0, wnorm, 1.0))
    e1 = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
    yls, *_ = jnp.linalg.lstsq(h, e1, rcond=None)
    x = jnp.tensordot(yls, jnp.stack(vs[:m], axis=0), axes=1)
    return jnp.where(beta > 0, x, jnp.zeros_like(b))


def _newton(f, t_new, y_guess, c0, bh, ewt, cfg: SolverConfig):
    """Solve y = c0 + bh·f(t_new, y) by Newton-GMRES with exact JVPs.

    Returns (y, converged, nfe_used)."""

    def body(carry):
        y, _, it, nfe = carry
        fy, jvp = jax.linearize(lambda yy: f(t_new, yy), y)
        res = y - bh * fy - c0

        def matvec(v):
            return v - bh * jvp(v)

        dy = _gmres(matvec, -res, cfg.krylov_m)
        dnorm = _wrms(dy, ewt)
        return (y + dy, dnorm, it + 1, nfe + 1 + cfg.krylov_m)

    def cond(carry):
        _, dnorm, it, _ = carry
        return (it < cfg.newton_iters) & (dnorm > cfg.newton_tol)

    dtype = y_guess.dtype
    carry = (
        y_guess,
        jnp.asarray(jnp.inf, dtype=dtype),
        jnp.zeros((), dtype=jnp.int64),
        jnp.zeros((), dtype=jnp.int64),
    )
    carry = body(carry)
    y, dnorm, it, nfe = lax.while_loop(cond, body, carry)
    return y, dnorm <= cfg.newton_tol, nfe


@partial(jax.jit, static_argnums=(0, 4))
def solve_to(f, state: BDFState, tout, params, cfg: SolverConfig) -> BDFState:
    """Advance the ODE to ``tout`` — one ``CVode(CV_NORMAL)`` equivalent.

    ``f(t, y, params)`` must be jit-pure; ``params`` carries the mesh +
    forcing slice pytree."""
    dtype = state.y.dtype
    tout = jnp.asarray(tout, dtype=dtype)

    def rhs(t, y):
        return f(t, y, params)

    def step_cond(s: BDFState):
        return (s.t < tout - 1e-9) & (s.nsteps < cfg.max_steps)

    def step_body(s: BDFState):
        ewt = 1.0 / (cfg.rtol * jnp.abs(s.y) + cfg.atol)
        h = jnp.minimum(jnp.minimum(s.h, cfg.h_max), tout - s.t)
        h = jnp.maximum(h, cfg.h_min)
        tau = s.h_prev
        use2 = s.order >= 2

        fy0 = rhs(s.t, s.y)  # slope at the current point (predictors)

        # predictors matched to each order's accuracy:
        #  order 1: forward Euler  (error O(h^2), ~2x the BDF1 LTE)
        #  order 2: quadratic Hermite through (y_prev, y, fy0) (error O(h^3))
        y_pred1 = s.y + h * fy0
        a_coef = (s.y_prev - s.y + fy0 * tau) / (tau * tau)
        y_pred2 = s.y + fy0 * h + a_coef * h * h
        y_pred = jnp.where(use2, y_pred2, y_pred1)

        # variable-step BDF coefficients
        r = h / tau
        a1_2 = (1 + r) ** 2 / (1 + 2 * r)
        a2_2 = -(r**2) / (1 + 2 * r)
        b_2 = (1 + r) / (1 + 2 * r)
        c0 = jnp.where(use2, a1_2 * s.y + a2_2 * s.y_prev, s.y)
        bh = jnp.where(use2, b_2, 1.0) * h

        t_new = s.t + h
        y_new, conv, nfe_n = _newton(rhs, t_new, y_pred, c0, bh, ewt, cfg)

        # predictor-corrector difference estimates the LTE at this order
        diff = y_new - y_pred
        err = _wrms(diff, ewt) * 0.5
        accept = conv & (err <= 1.0)
        at_hmin = h <= cfg.h_min * (1 + 1e-9)
        accept = accept | (at_hmin & conv)

        order_p1 = jnp.where(use2, 3.0, 2.0)
        eta_raw = cfg.safety * (1.0 / jnp.maximum(err, 1e-10)) ** (1.0 / order_p1)
        h_acc = h * jnp.clip(eta_raw, cfg.eta_min, cfg.eta_max)
        h_rej = jnp.where(conv, h * jnp.clip(eta_raw, 0.1, 0.5), h * 0.25)
        h_next = jnp.where(accept, h_acc, jnp.maximum(h_rej, cfg.h_min))

        new_order = jnp.where(
            accept,
            jnp.minimum(s.order + 1, 2),
            jnp.where(conv, s.order, jnp.ones_like(s.order)),
        )

        one = jnp.ones((), dtype=s.nfails.dtype)
        zero = jnp.zeros((), dtype=s.nfails.dtype)
        return BDFState(
            t=jnp.where(accept, t_new, s.t),
            y=jnp.where(accept, y_new, s.y),
            y_prev=jnp.where(accept, s.y, s.y_prev),
            h=h_next,
            h_prev=jnp.where(accept, h, s.h_prev),
            order=new_order,
            nfe=s.nfe + nfe_n + 1,
            nsteps=s.nsteps + 1,
            nfails=s.nfails + jnp.where(conv & ~accept, one, zero),
            nnifails=s.nnifails + jnp.where(conv, zero, one),
        )

    return lax.while_loop(step_cond, step_body, state)
