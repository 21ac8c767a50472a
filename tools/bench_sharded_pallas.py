#!/usr/bin/env python3
"""TPU benchmark: the sharded RHS with the Pallas edge kernel per shard.

VERDICT r2 item 1's contract: on a 1M-cell synthetic mesh, the
`shard_map` RHS with `use_pallas=True` (P=1 on the single available
chip) must land within ~2x of the single-chip kernel number, proving the
21x edge kernel and the domain decomposition compose at the 10M-cell
multi-chip target.  Numbering is destroyed with a random permutation and
recovered per shard by the partition's own RCM (shard_order="rcm") — the
real-mesh scenario.

Times the full sharded RHS three ways (XLA gather path f64, XLA f32,
Pallas f32) with the chained-timing protocol (docs/PERF.md "How we
time").

Usage: python tools/bench_sharded_pallas.py [nx] [ny] [p]
       (default 724 724 1 ~ 1.05M cells, P=1)
"""

from __future__ import annotations

import functools
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(nx: int, ny: int, p: int, tile_cells: "int | None" = None):
    from shud_tpu.core.mesh import build_mesh
    from shud_tpu.parallel.partition import build_sharded_mesh
    from shud_tpu.utils.reorder import permute_project
    from shud_tpu.utils.synthetic import make_synthetic_project

    tag = f"_t{tile_cells}" if tile_cells else ""
    cache = f"/tmp/bench_shpallas_{nx}x{ny}_p{p}{tag}_v1.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    t0 = time.time()
    inp = make_synthetic_project(nx, ny)
    ne = inp.tri.shape[0]
    rng = np.random.default_rng(0)
    inp = permute_project(inp, rng.permutation(ne))
    md = build_mesh(inp)
    sm = build_sharded_mesh(md, p, shard_order="rcm", tile_cells=tile_cells)
    assert sm.edge_blocks is not None, "per-shard RCM failed to band"
    print(f"# built ne={ne} p={p} np_cells={sm.np_cells} "
          f"blk={sm.edge_blocks.blk} k=[{sm.edge_blocks.k_lo},"
          f"{sm.edge_blocks.k_hi}] rounds={sm.plan.k} "
          f"({time.time()-t0:.1f}s)", flush=True)
    with open(cache, "wb") as f:
        pickle.dump((md, sm), f)
    return md, sm


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 724
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 724
    p = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    tile = int(sys.argv[4]) if len(sys.argv) > 4 else None
    md, sm = build(nx, ny, p, tile_cells=tile)

    import jax
    import jax.numpy as jnp

    import shud_tpu  # noqa: F401
    from shud_tpu.parallel.partition import riv_blocks, shard_state
    from shud_tpu.parallel.sharded import make_sharded_rhs

    ne, nr = md.num_ele, md.num_riv
    rng = np.random.default_rng(1)
    y = np.concatenate([
        rng.uniform(0, 0.05, ne), rng.uniform(0, 1.0, ne),
        rng.uniform(0, 8.0, ne), rng.uniform(0, 2.0, nr),
    ])
    fsargs = dict(
        net_prcp=rng.uniform(0, 2e-5, ne), prcp=rng.uniform(0, 2e-5, ne),
        pot_evap=rng.uniform(0, 3e-6, ne), pot_tran=rng.uniform(0, 3e-6, ne),
        e_ic=rng.uniform(0, 2e-6, ne), lai=rng.uniform(0, 4, ne),
        fu_surf=np.ones(ne), fu_sub=np.ones(ne),
        ele_ybc=np.zeros(ne), ele_qbc=np.zeros(ne), ele_qss=np.zeros(ne),
    )

    def blocks(v, fd):
        buf = np.zeros((sm.p, sm.np_cells))
        buf[sm.old_to_shard, sm.old_to_slot] = v
        return jnp.asarray(buf, fd)

    devices = np.array(jax.devices()[:p])

    def bench(label, float_dtype, use_pallas):
        from shud_tpu.parallel.sharded import place_params

        fd = float_dtype
        mesh, rhs_fn, params = make_sharded_rhs(
            sm, devices=devices, float_dtype=fd, use_pallas=use_pallas)
        # device_put the params (as the production driver does) and pass
        # them as a jit ARGUMENT: baking them as compile-time constants
        # ships the whole static mesh inside the XLA program, which the
        # axon remote-compile tunnel rejects above ~2 GB (HTTP 413) at
        # the 10M-cell sizes
        params = place_params(mesh, params)
        fs_cell = {k: blocks(fsargs[k], fd) for k in fsargs}
        fs_riv = {"riv_ybc": jnp.asarray(riv_blocks(sm, np.zeros(nr)), fd),
                  "riv_qbc": jnp.asarray(riv_blocks(sm, np.zeros(nr)), fd)}
        ys = {k: jnp.asarray(np.asarray(v), fd)
              for k, v in shard_state(sm, y).items()}

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(ys, params, n):
            def step(carry, _):
                dy = rhs_fn(0.0, carry, params)
                return jax.tree_util.tree_map(
                    lambda a, b: a + 1e-9 * b, carry, dy), None

            out, _ = jax.lax.scan(step, ys, None, length=n)
            return sum(jnp.sum(v) for v in out.values())

        params = params + (fs_cell, fs_riv)
        n_lo, n_hi = 4, 32
        _ = float(chain(ys, params, n_lo))  # compile+warm
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(ys, params, n_lo))
            t_lo = time.time() - t0
            t0 = time.time()
            _ = float(chain(ys, params, n_hi))
            t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
        print(f"{label}: {best*1e3:.3f} ms/eval "
              f"({ne/best/1e6:.0f}M cell-evals/s)", flush=True)
        return best

    only = os.environ.get("SHUD_BENCH_VARIANTS", "f64,f32,pallas")
    if "f64" in only:
        bench("sharded XLA f64", jnp.float64, False)
    if "f32" in only.replace("pallas", ""):
        bench("sharded XLA f32", jnp.float32, False)
    if "pallas" in only:
        bench("sharded Pallas f32", jnp.float32, True)


if __name__ == "__main__":
    main()
