"""Pytree vector algebra for the solvers.

The ODE state is a pytree (on one chip: a single array; sharded: cell blocks
with device axes + replicated river/lake arrays).  These helpers implement
the handful of vector-space ops the integrators need, leaf-wise, so the same
solver code runs on any state layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

tmap = jax.tree_util.tree_map


def tadd(*xs):
    return tmap(lambda *ls: sum(ls), *xs)


def tsub(a, b):
    return tmap(jnp.subtract, a, b)


def tscale(c, x):
    return tmap(lambda l: c * l, x)


def taxpy(c, x, y):
    """c*x + y"""
    return tmap(lambda lx, ly: c * lx + ly, x, y)


def twhere(pred, a, b):
    return tmap(lambda la, lb: jnp.where(pred, la, lb), a, b)


def tdot(a, b):
    leaves = tmap(lambda la, lb: jnp.vdot(la, lb), a, b)
    return sum(jax.tree_util.tree_leaves(leaves))


def tnorm(a):
    return jnp.sqrt(tdot(a, a))


def tsize(a):
    return sum(l.size for l in jax.tree_util.tree_leaves(a))


def twrms(x, ewt):
    """Weighted RMS norm over all leaves: sqrt(mean((x*ewt)^2))."""
    sq = tmap(lambda lx, lw: jnp.sum((lx * lw) ** 2), x, ewt)
    total = sum(jax.tree_util.tree_leaves(sq))
    n = tsize(x)
    return jnp.sqrt(total / n)


def tewt(y, rtol, atol):
    return tmap(lambda l: 1.0 / (rtol * jnp.abs(l) + atol), y)


def tzeros_like(a):
    return tmap(jnp.zeros_like, a)
