#!/usr/bin/env python3
"""TPU benchmark: fused Pallas edge-flux kernel vs the XLA gather path.

Builds a large synthetic watershed, destroys its structured numbering with a
random permutation (simulating real-world mesh-generator output), recovers
locality with RCM (utils/reorder.py), and times the lateral edge-flux stencil
both ways with the honest chained-timing protocol (docs/PERF.md: lax.scan
chain with data-dependent carry, host-fetch sync, marginal cost from two
chain lengths).

Usage: python tools/bench_pallas_edge.py [nx] [ny]   (default 724 724 ~ 1.05M)
"""

from __future__ import annotations

import functools
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(nx: int, ny: int):
    from shud_tpu.core.mesh import build_mesh
    from shud_tpu.core.pallas_edge import build_edge_blocks, graph_bandwidth
    from shud_tpu.utils.reorder import localize_project, permute_project
    from shud_tpu.utils.synthetic import make_synthetic_project

    cache = f"/tmp/bench_pallas_{nx}x{ny}_v3.pkl"  # v3: per-block used-shift masks
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    t0 = time.time()
    inp = make_synthetic_project(nx, ny)
    ne = inp.tri.shape[0]
    rng = np.random.default_rng(0)
    inp = permute_project(inp, rng.permutation(ne))
    inp, _ = localize_project(inp)
    md = build_mesh(inp)
    band = graph_bandwidth(np.asarray(md.nabr))
    eb = build_edge_blocks(md)
    print(f"# built ne={ne} band={band} blk={eb.blk} nb={eb.nb} "
          f"roll={md.roll_offsets is not None} ({time.time()-t0:.1f}s)",
          flush=True)
    with open(cache, "wb") as f:
        pickle.dump((md, eb), f)
    return md, eb


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 724
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 724
    md, eb = build(nx, ny)

    import jax
    import jax.numpy as jnp

    import shud_tpu  # noqa: F401
    from shud_tpu.core import rhs as R
    from shud_tpu.core.device import to_device
    from shud_tpu.core.pallas_edge import (edge_blocks_to_device,
                                           edge_fluxes_pallas)

    ne = md.num_ele
    dm = to_device(md, jnp.float32)
    ebd = edge_blocks_to_device(eb)
    rng = np.random.default_rng(1)
    sf0 = jnp.asarray(rng.uniform(0, 0.05, ne), jnp.float32)
    gw0 = jnp.asarray(rng.uniform(0, 8.0, ne), jnp.float32)
    us0 = jnp.asarray(rng.uniform(0, 1.0, ne), jnp.float32)
    lake_stg = jnp.zeros((0,), jnp.float32)

    cu0 = R.update_element(dm, sf0, us0, gw0)
    kh0 = cu0.eff_kh

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_xla(sf, gw, kh, n):
        def step(carry, _):
            sf, gw = carry
            cu = cu0._replace(eff_kh=kh)
            qs, qb, _, _ = R.edge_fluxes(dm, cu, sf, gw, lake_stg, True)
            ds = jnp.sum(qs, axis=1) * 1e-9
            db = jnp.sum(qb, axis=1) * 1e-9
            return (sf + ds, gw + db), None

        (sf, gw), _ = jax.lax.scan(step, (sf, gw), None, length=n)
        return jnp.sum(sf) + jnp.sum(gw)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_pallas(sf, gw, kh, n):
        def step(carry, _):
            sf, gw = carry
            qs, qb = edge_fluxes_pallas(ebd, sf, gw, kh, close_boundary=True)
            ds = jnp.sum(qs, axis=1) * 1e-9
            db = jnp.sum(qb, axis=1) * 1e-9
            return (sf + ds, gw + db), None

        (sf, gw), _ = jax.lax.scan(step, (sf, gw), None, length=n)
        return jnp.sum(sf) + jnp.sum(gw)

    # correctness cross-check on device
    qs_a, qb_a, _, _ = jax.jit(
        lambda sf, gw: R.edge_fluxes(dm, cu0, sf, gw, lake_stg, True)
    )(sf0, gw0)
    qs_b, qb_b = edge_fluxes_pallas(ebd, sf0, gw0, kh0, close_boundary=True)
    es = float(jnp.max(jnp.abs(qs_a - qs_b)))
    ebv = float(jnp.max(jnp.abs(qb_a - qb_b)))
    ss = float(jnp.max(jnp.abs(qs_a)))
    print(f"# on-device agreement: surf {es:.3e} (max {ss:.3e}) sub {ebv:.3e}",
          flush=True)

    for name, fn in (("xla_gather", chain_xla), ("pallas_fused", chain_pallas)):
        n_lo, n_hi = 4, 32
        _ = float(fn(sf0, gw0, kh0, n_lo))  # compile+warm
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            _ = float(fn(sf0, gw0, kh0, n_lo))
            t_lo = time.time() - t0
            t0 = time.time()
            _ = float(fn(sf0, gw0, kh0, n_hi))
            t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
        evals = ne / best
        print(f"{name}: {best*1e3:.3f} ms/eval  ({evals/1e6:.0f}M cell-edges-evals/s)",
              flush=True)


if __name__ == "__main__":
    main()
