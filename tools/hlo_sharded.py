#!/usr/bin/env python3
"""Dump the compiled HLO of the composed sharded RHS and rank the ops by
output size — direct evidence for where the 8.5 ms of non-kernel cost
lives (tools/profile_sharded.py shows the kernel itself is 0.86 ms inside
shard_map, yet FULL is 9.26 ms while no-edge is 0.79 ms).

Also times the "edge_raw" ablation (kernel WITHOUT the remainder/merge).
"""

from __future__ import annotations

import functools
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.bench_sharded_pallas import build


def main():
    md, sm = build(724, 724, 1)

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

    devices = np.array(jax.devices()[:1])
    fd = jnp.float32
    fs_cell = {k: blocks(fsargs[k], fd) for k in fsargs}
    fs_riv = {"riv_ybc": jnp.asarray(riv_blocks(sm, np.zeros(nr)), fd),
              "riv_qbc": jnp.asarray(riv_blocks(sm, np.zeros(nr)), fd)}
    ys = {k: jnp.asarray(np.asarray(v), fd)
          for k, v in shard_state(sm, y).items()}

    def bench(label, parts):
        _, rhs_fn, params = make_sharded_rhs(
            sm, devices=devices, float_dtype=fd, use_pallas=True,
            parts=parts)

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(ys, n):
            def step(carry, _):
                dy = rhs_fn(0.0, carry, params + (fs_cell, fs_riv))
                return jax.tree_util.tree_map(
                    lambda a, b: a + 1e-9 * b, carry, dy), None

            out, _ = jax.lax.scan(step, ys, None, length=n)
            return sum(jnp.sum(v) for v in out.values())

        _ = float(chain(ys, 4))
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(ys, 4))
            t_lo = time.time() - t0
            t0 = time.time()
            _ = float(chain(ys, 32))
            t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / 28)
        print(f"{label:30s} {best*1e3:7.3f} ms/eval", flush=True)
        return best

    bench("edge_raw (kernel, no merge)", ("ele", "edge_raw", "seg", "riv"))

    # ---- HLO dump of the FULL single-eval program ----
    _, rhs_fn, params = make_sharded_rhs(
        sm, devices=devices, float_dtype=fd, use_pallas=True)

    def one(ys):
        return rhs_fn(0.0, ys, params + (fs_cell, fs_riv))

    txt = jax.jit(one).lower(ys).compile().as_text()
    print(f"# HLO: {len(txt.splitlines())} lines", flush=True)

    # rank non-parameter ops by output element count
    pat = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = (\w+)\[([\d,]*)\]"
                     r"[^ ]* (\w+)\(")
    sizes = []
    for ln in txt.splitlines():
        m = pat.match(ln)
        if not m:
            continue
        name, dt, shape, op = m.groups()
        if op in ("parameter", "constant"):
            continue
        n = 1
        for s in shape.split(","):
            if s:
                n *= int(s)
        bytes_ = n * (8 if dt in ("f64", "s64", "u64") else 4)
        sizes.append((bytes_, op, dt, shape, name))
    sizes.sort(reverse=True)
    tot = {}
    for b, op, *_ in sizes:
        tot[op] = tot.get(op, 0) + b
    print("\n# total output bytes by op kind (top 12):")
    for op, b in sorted(tot.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {op:20s} {b/1e6:10.1f} MB")
    print("\n# 25 largest ops:")
    for b, op, dt, shape, name in sizes[:25]:
        print(f"  {b/1e6:8.1f} MB  {op:14s} {dt}[{shape}]  {name}")
    with open("/tmp/sharded_full_hlo.txt", "w") as f:
        f.write(txt)
    print("\nfull HLO written to /tmp/sharded_full_hlo.txt")


if __name__ == "__main__":
    main()
