"""Fixed-step implicit BDF1 integrator (verification mode).

The production path is the adaptive solver in ``bdf.py``; this fixed-step
variant exists to manufacture *truth* trajectories: with h small the Newton
iteration contracts strongly even at the physics' switching surfaces (whose
branch chatter makes tight-tolerance adaptive control infeasible — in any
integrator, including the reference's CVODE).  Used by the trajectory
verification tests and the sharded-vs-single-device equivalence test.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from shud_tpu.solver.bdf import _gmres
from shud_tpu.solver.tree import taxpy, tmap


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def fixed_bdf1(f, y0, t0, params, h: float, n_steps: int, newton_iters: int = 3):
    """Integrate n_steps of backward Euler with step h.

    Newton with exact JVPs and GMRES(5); fixed iteration count (the residual
    reaches the branch-chatter floor in 2-3 iterations).  y0 is any pytree."""

    def rhs(t, y):
        return f(t, y, params)

    leaves = jax.tree_util.tree_leaves(y0)
    dtype = leaves[0].dtype

    def step(carry, _):
        t, y = carry
        t_new = t + h
        fy0 = rhs(t_new, y)
        yk = taxpy(h, fy0, y)

        def newton_body(i, yk):
            fy, jvp = jax.linearize(lambda yy: rhs(t_new, yy), yk)
            res = tmap(lambda lk, lf, ly: lk - h * lf - ly, yk, fy, y)

            def matvec(v):
                jv = jvp(v)
                return tmap(lambda lv, lj: lv - h * lj, v, jv)

            dy = _gmres(matvec, tmap(jnp.negative, res), 5)
            return tmap(jnp.add, yk, dy)

        yk = lax.fori_loop(0, newton_iters, newton_body, yk)
        return (t_new, yk), None

    (t_end, y_end), _ = lax.scan(step, (jnp.asarray(t0, dtype), y0),
                                 None, length=n_steps)
    return t_end, y_end
