"""Jittable adaptive implicit multistep solver (the CVODE replacement).

Replaces SUNDIALS CVODE (BDF + matrix-free SPGMR Newton–Krylov; reference
configuration at ``src/Equations/cvode_config.cpp:149-197``) with a
TPU-native design:

* variable-step, variable-order BDF(1,2,3) with history carried across
  solver windows (like CVODE, the method does NOT restart at forcing
  boundaries); ``SolverConfig.max_order`` picks the cap (see
  docs/VALIDATION.md for the order-2 vs order-3 measurement);
* modified Newton inner iterations with **exact** Jacobian-vector products
  from ``jax.linearize`` (CVODE can only difference-quotient J·v);
* matrix-free GMRES(m) for the Newton linear systems (SPGMR equivalent);
* WRMS error control with per-component weights 1/(rtol·|y| + atol),
  a standard step controller, min/max step bounds and exact stop-at-tout —
  all inside one ``lax.while_loop`` so a single device dispatch integrates an
  entire output window.

The state is any pytree (single-chip: one concatenated vector; multi-chip:
sharded cell blocks + replicated river/lake arrays — the solver code is
layout-agnostic and XLA inserts the cross-device ``psum`` for the few global
dot products, which are the ONLY global communication in the whole solve,
mirroring CVODE's SPGMR dot products).

Within a window the RHS is autonomous (the driver freezes the forcing slice,
exactly as the reference refreshes forcing only between CVode calls,
``shud.cpp:91-155``).  NFE is tracked in-carry (the reference's ``nFCall``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from shud_tpu.solver.tree import (
    taxpy,
    tdot,
    tewt,
    tmap,
    tsize,
    twhere,
    twrms,
)


class SolverConfig(NamedTuple):
    rtol: float = 1.0e-3
    atol: float = 1.0e-4
    h_init: float = 1.0e-2  # [min] CS.InitStep
    h_min: float = 1.0e-6  # [min] CVodeSetMinStep
    h_max: float = 30.0  # [min] CVodeSetMaxStep
    newton_iters: int = 3
    krylov_m: int = 3  # Krylov dimension (CVODE's SPGMR default is 5;
    # 3 suffices at the loose Newton tolerance and cuts NFE ~30%)
    newton_tol: float = 0.5  # nonlinear tolerance in WRMS units (the
    # physics' switching-surface chatter makes tighter Newton tolerances
    # cost ~2x NFE for no trajectory benefit; see docs/VALIDATION.md)
    safety: float = 0.9
    eta_max: float = 6.0
    eta_min: float = 0.2
    max_steps: int = 100000  # per-window backstop
    max_order: int = 2  # BDF order cap (1..3); CVODE runs up to 5, but on
    # 10-min forcing windows the measured NFE gain beyond 2 is small —
    # docs/VALIDATION.md records the order-3 measurement
    history_predictor: bool = True  # predict from state history alone
    # (variable-step Lagrange through y_prev2/y_prev/y — CVODE's Nordsieck
    # extrapolation), eliminating the per-step fy0 evaluation the Hermite
    # predictors need.  Measured: -20% NFE (ccw) / -27% (heihe) at
    # unchanged step counts and tolerance-class trajectory deviation
    # (docs/PERF.md "Predictor economy"); the CVODE-consistent default.
    # Requires max_order <= 2; the BDF3 option falls back to Hermite.


class BDFState(NamedTuple):
    t: jnp.ndarray
    y: object  # pytree
    y_prev: object  # pytree, state at t - h_prev
    h: jnp.ndarray  # next step size to attempt
    h_prev: jnp.ndarray  # last successful step size
    order: jnp.ndarray  # current order (1..max_order)
    nfe: jnp.ndarray
    nsteps: jnp.ndarray
    nfails: jnp.ndarray
    nnifails: jnp.ndarray
    quad: object = None  # optional pytree of flux-quadrature accumulators
    y_prev2: object = None  # pytree, state at t - h_prev - h_prev2 (BDF3)
    h_prev2: jnp.ndarray = None


def bdf_init(t0, y0, cfg: SolverConfig, quad0=None) -> BDFState:
    leaves = jax.tree_util.tree_leaves(y0)
    dtype = leaves[0].dtype
    z = jnp.zeros((), dtype=jnp.int32)
    return BDFState(
        t=jnp.asarray(t0, dtype=dtype),
        y=y0,
        y_prev=y0,
        h=jnp.asarray(cfg.h_init, dtype=dtype),
        h_prev=jnp.asarray(cfg.h_init, dtype=dtype),
        order=jnp.ones((), dtype=jnp.int32),
        nfe=z, nsteps=z, nfails=z, nnifails=z,
        quad=quad0,
        y_prev2=y0,
        h_prev2=jnp.asarray(cfg.h_init, dtype=dtype),
    )


def _gmres(matvec, b, m):
    """Single-cycle matrix-free GMRES(m) on pytrees, modified Gram-Schmidt
    with incremental Givens rotations, x0 = 0.  m is small and static (the
    SPGMR default is 5), so everything unrolls at trace time into fused
    vector ops plus a handful of scalars; the dot products are the only
    global reductions.  (No LAPACK-style ops — keeps the TPU lowering
    simple.)"""
    leaves = jax.tree_util.tree_leaves(b)
    dtype = leaves[0].dtype
    beta = jnp.sqrt(tdot(b, b))
    safe = jnp.where(beta > 0, beta, 1.0)
    vs = [tmap(lambda l: l / safe, b)]
    # upper-triangular R columns (lists of scalars), Givens (c, s), rhs g
    r_cols = []
    givens = []
    g = [beta] + [jnp.zeros((), dtype)] * m
    for j in range(m):
        w = matvec(vs[j])
        hcol = []
        for i in range(j + 1):
            hij = tdot(vs[i], w)
            hcol.append(hij)
            w = taxpy(-hij, vs[i], w)
        wnorm = jnp.sqrt(tdot(w, w))
        wsafe = jnp.where(wnorm > 0, wnorm, 1.0)
        vs.append(tmap(lambda l: l / wsafe, w))
        # apply previous rotations to this column (i < j, acts on i, i+1)
        for i, (c, s) in enumerate(givens):
            tmp = c * hcol[i] + s * hcol[i + 1]
            hcol[i + 1] = -s * hcol[i] + c * hcol[i + 1]
            hcol[i] = tmp
        # new rotation eliminating wnorm
        denom = jnp.sqrt(hcol[j] ** 2 + wnorm**2)
        dsafe = jnp.where(denom > 0, denom, 1.0)
        c = jnp.where(denom > 0, hcol[j] / dsafe, 1.0)
        s = jnp.where(denom > 0, wnorm / dsafe, 0.0)
        givens.append((c, s))
        hcol[j] = c * hcol[j] + s * wnorm
        g[j + 1] = -s * g[j]
        g[j] = c * g[j]
        r_cols.append(hcol)
    # back-substitution R y = g[:m]
    ys = [jnp.zeros((), dtype)] * m
    for j in range(m - 1, -1, -1):
        acc = g[j]
        for k in range(j + 1, m):
            acc = acc - r_cols[k][j] * ys[k]
        rjj = r_cols[j][j]
        rsafe = jnp.where(jnp.abs(rjj) > 0, rjj, 1.0)
        ys[j] = jnp.where(jnp.abs(rjj) > 0, acc / rsafe, 0.0)
    x = tmap(lambda l: l * ys[0], vs[0])
    for j in range(1, m):
        x = taxpy(ys[j], vs[j], x)
    return twhere(beta > 0, x, tmap(jnp.zeros_like, b))


def _newton(f, t_new, y_guess, c0, bh, ewt, cfg: SolverConfig):
    """Solve y = c0 + bh·f(t_new, y) by Newton-GMRES with exact JVPs.
    Returns (y, converged, nfe_used)."""

    def body(carry):
        y, _, it, nfe = carry
        fy, jvp = jax.linearize(lambda yy: f(t_new, yy), y)
        # residual: y - bh*f(y) - c0
        res = tmap(lambda ly, lf, lc: ly - bh * lf - lc, y, fy, c0)

        def matvec(v):
            jv = jvp(v)
            return tmap(lambda lv, lj: lv - bh * lj, v, jv)

        neg_res = tmap(jnp.negative, res)
        dy = _gmres(matvec, neg_res, cfg.krylov_m)
        dnorm = twrms(dy, ewt)
        y_new = tmap(jnp.add, y, dy)
        return (y_new, dnorm, it + 1, nfe + 1 + cfg.krylov_m)

    def cond(carry):
        _, dnorm, it, _ = carry
        return (it < cfg.newton_iters) & (dnorm > cfg.newton_tol)

    leaves = jax.tree_util.tree_leaves(y_guess)
    dtype = leaves[0].dtype
    carry = (
        y_guess,
        jnp.asarray(jnp.inf, dtype=dtype),
        jnp.zeros((), dtype=jnp.int32),
        jnp.zeros((), dtype=jnp.int32),
    )
    carry = body(carry)
    y, dnorm, it, nfe = lax.while_loop(cond, body, carry)
    return y, dnorm <= cfg.newton_tol, nfe


@partial(jax.jit, static_argnums=(0, 4, 5))
def solve_to(f, state: BDFState, tout, params, cfg: SolverConfig,
             quad_fn=None, ewt_scale=None) -> BDFState:
    """Advance the ODE to ``tout`` — one ``CVode(CV_NORMAL)`` equivalent.
    ``f(t, y, params)`` must be jit-pure.

    ``quad_fn(t, y, params) -> pytree of rates``: optional flux quadrature
    accumulated as ``quad += h * quad_fn(t_new, y_new)`` on each accepted
    step — the reference's ``SHUD_WB_DIAG_QUAD`` CV_ONE_STEP integration
    (WaterBalanceDiag.cpp / shud.cpp:116-152), but inside the jitted
    solve.

    ``ewt_scale``: optional pytree (same structure as ``y``) multiplied
    into the WRMS error weights.  Used by padded state layouts (the Pallas
    megakernel's blocked Z array) to zero padding lanes out of the norm and
    rescale for the padded length, so the effective tolerance matches the
    unpadded layout exactly."""
    dtype = state.t.dtype
    tout = jnp.asarray(tout, dtype=dtype)

    def rhs(t, y):
        return f(t, y, params)

    # per-window backstop: nsteps accumulates across the whole run (the
    # reference's nst does too), so the cap must be relative to this call's
    # starting count or a long run would freeze once the lifetime total
    # crossed max_steps
    nsteps0 = state.nsteps

    def step_cond(s: BDFState):
        return (s.t < tout - 1e-9) & (s.nsteps - nsteps0 < cfg.max_steps)

    def step_body(s: BDFState):
        ewt = tewt(s.y, cfg.rtol, cfg.atol)
        if ewt_scale is not None:
            ewt = tmap(lambda w, m: w * m, ewt, ewt_scale)
        h = jnp.minimum(jnp.minimum(s.h, cfg.h_max), tout - s.t)
        h = jnp.maximum(h, cfg.h_min)
        tau = s.h_prev
        tau2 = s.h_prev2
        use2 = s.order >= 2
        use3 = s.order >= 3

        # history predictor needs max_order <= 2 (no y_prev3 in the carry
        # for an O(h^4) history predictor); BDF3 runs keep Hermite
        if cfg.history_predictor and cfg.max_order < 3:
            # state-history predictors (no RHS evaluation — CVODE's
            # Nordsieck extrapolation, cvode BDF predictor):
            #  order 1: constant (error O(h), 1st-order like BDF1's LTE)
            #  order 2: quadratic Lagrange through
            #           (t-tau-tau2, y_prev2), (t-tau, y_prev), (t, y)
            #           extrapolated to t+h (error O(h^3))
            e0h = h + tau + tau2
            e1h = h + tau

            def lagrange2(lp2, lp1, ly):
                d01 = (lp1 - lp2) / tau2
                d12 = (ly - lp1) / tau
                d2 = (d12 - d01) / (tau + tau2)
                return lp2 + d01 * e0h + d2 * e0h * e1h

            y_pred2h = tmap(lagrange2, s.y_prev2, s.y_prev, s.y)
            y_pred = twhere(use2, y_pred2h, s.y)
            fy0 = None
        else:
            fy0 = rhs(s.t, s.y)  # slope at the current point (predictors)

            # predictors matched to each order's accuracy:
            #  order 1: forward Euler (error O(h^2), ~2x the BDF1 LTE)
            #  order 2: quadratic Hermite through (y_prev, y, fy0) (O(h^3))
            #  order 3: cubic Hermite through (y_prev2, y_prev, y, fy0)
            #           (O(h^4))
            y_pred1 = taxpy(h, fy0, s.y)
            a_coef = tmap(
                lambda lp, ly, lf: (lp - ly + lf * tau) / (tau * tau),
                s.y_prev, s.y, fy0,
            )
            y_pred2 = tmap(
                lambda ly, lf, la: ly + lf * h + la * h * h, s.y, fy0, a_coef
            )
            y_pred = twhere(use2, y_pred2, y_pred1)
        use_hist = cfg.history_predictor and cfg.max_order < 3
        if cfg.max_order >= 3:
            # Hermite divided differences, nodes [t-tau-tau2, t-tau, t, t]
            w01 = 1.0 / tau2          # 1/(z1-z0)
            w12 = 1.0 / tau           # 1/(z2-z1)
            w02 = 1.0 / (tau + tau2)  # 1/(z2-z0)
            e0 = h + tau + tau2  # (t_new - z0)
            e1 = h + tau         # (t_new - z1)

            def cubic(lp2, lp1, ly, lf):
                d01 = (lp1 - lp2) * w01
                d12 = (ly - lp1) * w12
                d2_012 = (d12 - d01) * w02
                d2_122 = (lf - d12) * w12
                d3 = (d2_122 - d2_012) * w02
                return lp2 + d01 * e0 + d2_012 * e0 * e1 + d3 * e0 * e1 * h

            y_pred3 = tmap(cubic, s.y_prev2, s.y_prev, s.y, fy0)
            y_pred = twhere(use3, y_pred3, y_pred)

        # variable-step BDF coefficients
        r = h / tau
        a1_2 = (1 + r) ** 2 / (1 + 2 * r)
        a2_2 = -(r**2) / (1 + 2 * r)
        b_2 = (1 + r) / (1 + 2 * r)
        c0_2 = tmap(lambda ly, lp: a1_2 * ly + a2_2 * lp, s.y, s.y_prev)
        c0 = twhere(use2, c0_2, s.y)
        bh = jnp.where(use2, b_2, 1.0) * h
        if cfg.max_order >= 3:
            # variable-step BDF3 via the Lagrange-derivative form: the
            # cubic through (t_new, t, t-tau, t-tau-tau2) satisfies
            # f(y_new) = g0 y_new + g1 y + g2 y_prev + g3 y_prev2, so the
            # Newton fixed point is y = c0 + (1/g0) f with
            # c0 = -(g1 y + g2 y_prev + g3 y_prev2)/g0.  Equal steps
            # recover the textbook 18/11, -9/11, 2/11, 6/11 weights.
            s1 = h + tau
            s2 = h + tau + tau2
            g0 = 1.0 / h + 1.0 / s1 + 1.0 / s2
            g1 = -(s1 * s2) / (h * tau * (tau + tau2))
            g2 = (h * s2) / (s1 * tau * tau2)
            g3 = -(h * s1) / (s2 * (tau + tau2) * tau2)
            c0_3 = tmap(
                lambda ly, lp, lp2:
                -(g1 * ly + g2 * lp + g3 * lp2) / g0,
                s.y, s.y_prev, s.y_prev2,
            )
            c0 = twhere(use3, c0_3, c0)
            bh = jnp.where(use3, 1.0 / g0, bh)

        t_new = s.t + h
        y_new, conv, nfe_n = _newton(rhs, t_new, y_pred, c0, bh, ewt, cfg)

        # predictor-corrector difference estimates the LTE at this order
        diff = tmap(jnp.subtract, y_new, y_pred)
        err = twrms(diff, ewt) * 0.5
        accept = conv & (err <= 1.0)
        at_hmin = h <= cfg.h_min * (1 + 1e-9)
        accept = accept | (at_hmin & conv)

        order_p1 = (s.order + 1).astype(err.dtype)
        eta_raw = cfg.safety * (1.0 / jnp.maximum(err, 1e-10)) ** (1.0 / order_p1)
        h_acc = h * jnp.clip(eta_raw, cfg.eta_min, cfg.eta_max)
        h_rej = jnp.where(conv, h * jnp.clip(eta_raw, 0.1, 0.5), h * 0.25)
        h_next = jnp.where(accept, h_acc, jnp.maximum(h_rej, cfg.h_min))

        new_order = jnp.where(
            accept,
            jnp.minimum(s.order + 1, cfg.max_order),
            jnp.where(conv, s.order, jnp.ones_like(s.order)),
        )

        if quad_fn is not None:
            # midpoint rule: one rate evaluation per accepted step, 2nd
            # order like the reference's SHUD_WB_DIAG_TRAPZ accumulation
            # (WaterBalanceDiag.cpp:500-515) but without carrying the
            # previous-rate state
            y_mid = tmap(lambda a, b: 0.5 * (a + b), s.y, y_new)
            rates = quad_fn(s.t + 0.5 * h, y_mid, params)
            new_quad = jax.tree_util.tree_map(
                lambda acc, r: acc + jnp.where(accept, h * r, 0.0),
                s.quad, rates,
            )
        else:
            new_quad = s.quad

        one = jnp.ones((), dtype=s.nfails.dtype)
        zero = jnp.zeros((), dtype=s.nfails.dtype)
        return BDFState(
            t=jnp.where(accept, t_new, s.t),
            y=twhere(accept, y_new, s.y),
            y_prev=twhere(accept, s.y, s.y_prev),
            h=h_next,
            h_prev=jnp.where(accept, h, s.h_prev),
            order=new_order,
            nfe=s.nfe + nfe_n + (0 if use_hist else 1),
            nsteps=s.nsteps + 1,
            nfails=s.nfails + jnp.where(conv & ~accept, one, zero),
            nnifails=s.nnifails + jnp.where(conv, zero, one),
            quad=new_quad,
            y_prev2=twhere(accept, s.y_prev, s.y_prev2),
            h_prev2=jnp.where(accept, s.h_prev, s.h_prev2),
        )

    return lax.while_loop(step_cond, step_body, state)
