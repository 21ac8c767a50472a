#!/usr/bin/env python3
"""Itemise the composed sharded-RHS cost (VERDICT r3 item 3).

The round-3 measurement: full sharded RHS with the Pallas edge kernel at
1.05M cells, P=1, is 9.30 ms/eval while the kernel itself is 0.767 ms —
~8.5 ms of remainder/merge/shard_map/XLA cost was unitemised.  This tool
times ablations of `_local_rhs` (the `parts` knob) with the chained
protocol (docs/PERF.md "How we time") and prints the per-stage breakdown
by difference.

Usage: python tools/profile_sharded.py [nx ny p] (default 724 724 1)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.bench_sharded_pallas import build


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 724
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 724
    p = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    md, sm = build(nx, ny, p)

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
    fd = jnp.float32
    fs_cell = {k: blocks(fsargs[k], fd) for k in fsargs}
    fs_riv = {"riv_ybc": jnp.asarray(riv_blocks(sm, np.zeros(nr)), fd),
              "riv_qbc": jnp.asarray(riv_blocks(sm, np.zeros(nr)), fd)}
    ys = {k: jnp.asarray(np.asarray(v), fd)
          for k, v in shard_state(sm, y).items()}

    def bench(label, use_pallas, parts):
        _, rhs_fn, params = make_sharded_rhs(
            sm, devices=devices, float_dtype=fd, use_pallas=use_pallas,
            parts=parts)

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(ys, n):
            def step(carry, _):
                dy = rhs_fn(0.0, carry, params + (fs_cell, fs_riv))
                return jax.tree_util.tree_map(
                    lambda a, b: a + 1e-9 * b, carry, dy), None

            out, _ = jax.lax.scan(step, ys, None, length=n)
            return sum(jnp.sum(v) for v in out.values())

        n_lo, n_hi = 4, 32
        _ = float(chain(ys, n_lo))
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(ys, n_lo))
            t_lo = time.time() - t0
            t0 = time.time()
            _ = float(chain(ys, n_hi))
            t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
        print(f"{label:34s} {best*1e3:7.3f} ms/eval", flush=True)
        return best

    full = ("ele", "edge", "seg", "riv")
    t_full = bench("FULL (pallas)", True, full)
    t_noedge = bench("no edge stencil", True, ("ele", "seg", "riv"))
    t_noseg = bench("no segments", True, ("ele", "edge", "riv"))
    t_noriv = bench("no river chain", True, ("ele", "edge", "seg"))
    t_ele = bench("elementwise only", True, ("ele",))
    t_edge = bench("ele+edge (kernel path)", True, ("ele", "edge"))
    t_full_x = bench("FULL (XLA fallback)", False, full)

    print("\nby difference (vs FULL pallas):")
    print(f"  edge stencil (kernel+merge): {1e3*(t_full-t_noedge):7.3f} ms")
    print(f"  segments:                    {1e3*(t_full-t_noseg):7.3f} ms")
    print(f"  river chain:                 {1e3*(t_full-t_noriv):7.3f} ms")
    print(f"  elementwise+assembly floor:  {1e3*t_ele:7.3f} ms")
    print(f"  ele+edge composition:        {1e3*t_edge:7.3f} ms")
    print(f"  XLA-fallback delta:          {1e3*(t_full_x-t_full):7.3f} ms")


if __name__ == "__main__":
    main()
