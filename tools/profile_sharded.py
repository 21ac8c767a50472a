#!/usr/bin/env python3
"""Itemise the composed sharded-RHS cost (VERDICT r3 item 3).

The round-3 measurement: full sharded RHS with the Pallas edge kernel at
1.05M cells, P=1, is 9.30 ms/eval while the kernel itself is 0.767 ms —
~8.5 ms of remainder/merge/shard_map/XLA cost was unitemised.  This tool
times ablations of `_local_rhs` (the `parts` knob) with the chained
protocol (docs/PERF.md "How we time") and prints the per-stage breakdown
by difference.

Usage: python tools/profile_sharded.py [nx ny p tile] (default 724 724 1)

``tile`` (0 = untiled) plumbs to build_sharded_mesh(tile_cells=...);
``SHUD_PROFILE_ABLATIONS`` (comma list of full,noedge,noseg,noriv,ele,
eleedge,xla) selects a subset — the 10M mesh cannot afford all seven
compiles, and the XLA-fallback chain OOMs HBM at that size.
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
    tile = (int(sys.argv[4]) or None) if len(sys.argv) > 4 else None
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
    fd = jnp.float32
    fs_cell = {k: blocks(fsargs[k], fd) for k in fsargs}
    fs_riv = {"riv_ybc": jnp.asarray(riv_blocks(sm, np.zeros(nr)), fd),
              "riv_qbc": jnp.asarray(riv_blocks(sm, np.zeros(nr)), fd)}
    ys = {k: jnp.asarray(np.asarray(v), fd)
          for k, v in shard_state(sm, y).items()}

    def bench(label, use_pallas, parts):
        from shud_tpu.parallel.sharded import place_params

        mesh, rhs_fn, params = make_sharded_rhs(
            sm, devices=devices, float_dtype=fd, use_pallas=use_pallas,
            parts=parts)
        # pass device-put params as jit ARGUMENTS (closure-baked constants
        # exceed the axon remote-compile body limit at 10M cells)
        params = place_params(mesh, params) + (fs_cell, fs_riv)

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(ys, params, n):
            def step(carry, _):
                dy = rhs_fn(0.0, carry, params)
                return jax.tree_util.tree_map(
                    lambda a, b: a + 1e-9 * b, carry, dy), None

            out, _ = jax.lax.scan(step, ys, None, length=n)
            return sum(jnp.sum(v) for v in out.values())

        n_lo, n_hi = 4, 32
        _ = float(chain(ys, params, n_lo))
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(ys, params, n_lo))
            t_lo = time.time() - t0
            t0 = time.time()
            _ = float(chain(ys, params, n_hi))
            t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
        print(f"{label:34s} {best*1e3:7.3f} ms/eval", flush=True)
        return best

    full = ("ele", "edge", "seg", "riv")
    want = os.environ.get(
        "SHUD_PROFILE_ABLATIONS",
        "full,noedge,noseg,noriv,ele,eleedge,xla").split(",")
    t = {}
    if "full" in want:
        t["full"] = bench("FULL (pallas)", True, full)
    if "noedge" in want:
        t["noedge"] = bench("no edge stencil", True, ("ele", "seg", "riv"))
    if "noseg" in want:
        t["noseg"] = bench("no segments", True, ("ele", "edge", "riv"))
    if "noriv" in want:
        t["noriv"] = bench("no river chain", True, ("ele", "edge", "seg"))
    if "ele" in want:
        t["ele"] = bench("elementwise only", True, ("ele",))
    if "eleedge" in want:
        t["eleedge"] = bench("ele+edge (kernel path)", True, ("ele", "edge"))
    if "xla" in want:
        t["xla"] = bench("FULL (XLA fallback)", False, full)

    print("\nby difference (vs FULL pallas):")
    if "noedge" in t:
        print(f"  edge stencil (kernel+merge): "
              f"{1e3*(t['full']-t['noedge']):7.3f} ms")
    if "noseg" in t:
        print(f"  segments:                    "
              f"{1e3*(t['full']-t['noseg']):7.3f} ms")
    if "noriv" in t:
        print(f"  river chain:                 "
              f"{1e3*(t['full']-t['noriv']):7.3f} ms")
    if "ele" in t:
        print(f"  elementwise+assembly floor:  {1e3*t['ele']:7.3f} ms")
    if "eleedge" in t:
        print(f"  ele+edge composition:        {1e3*t['eleedge']:7.3f} ms")
    if "xla" in t:
        print(f"  XLA-fallback delta:          "
              f"{1e3*(t['xla']-t['full']):7.3f} ms")


def kernel_probe():
    """Isolate the kernel: standalone on the shard block vs wrapped in
    shard_map, plus the band/geometry of the per-shard EdgeBlocks."""
    nx, ny, p = 724, 724, 1
    md, sm = build(nx, ny, p)

    import jax
    import jax.numpy as jnp

    import shud_tpu  # noqa: F401
    from shud_tpu.core.pallas_edge import EdgeBlocks, edge_fluxes_pallas
    from shud_tpu.parallel.partition import shard_state

    eb = sm.edge_blocks
    print(f"shard eb: blk={eb.blk} bc={eb.bc} k=[{eb.k_lo},{eb.k_hi}] "
          f"num_ele={eb.num_ele}")
    # single-shard views (strip the leading P axis)
    eb1 = EdgeBlocks(
        blk=eb.blk, nb=eb.nb, bc=eb.bc, num_ele=eb.num_ele,
        k_lo=eb.k_lo, k_hi=eb.k_hi,
        **{f: jnp.asarray(np.asarray(getattr(eb, f))[0])
           for f in ("nbq", "edge", "dist", "rough_avg", "dzs", "dzb",
                     "m_int", "m_bnd", "dist2edge", "dep", "rough_cell",
                     "used")},
    )
    ne, nr = md.num_ele, md.num_riv
    rng = np.random.default_rng(1)
    y = np.concatenate([
        rng.uniform(0, 0.05, ne), rng.uniform(0, 1.0, ne),
        rng.uniform(0, 8.0, ne), rng.uniform(0, 2.0, nr),
    ])
    ys = shard_state(sm, y)
    sf = jnp.asarray(ys["sf"][0], jnp.float32)
    gw = jnp.asarray(ys["gw"][0], jnp.float32)
    kh = jnp.asarray(np.full(sm.np_cells, 0.01), jnp.float32)

    import functools
    import time

    def timeit(label, fn, *args):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(sf, n):
            def step(carry, _):
                qs, qb = fn(carry, *args)
                return carry + 1e-9 * (qs.sum(axis=1) + qb.sum(axis=1)), None

            out, _ = jax.lax.scan(step, sf, None, length=n)
            return out.sum()

        _ = float(chain(sf, 4))
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(sf, 4))
            t_lo = time.time() - t0
            t0 = time.time()
            _ = float(chain(sf, 32))
            t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / 28)
        print(f"{label:34s} {best*1e3:7.3f} ms/eval", flush=True)
        return best

    timeit("kernel standalone (no shard_map)",
           lambda s_, g, k: edge_fluxes_pallas(eb1, s_, g, k,
                                               close_boundary=True,
                                               interpret=False), gw, kh)

    # shard_map-wrapped kernel only
    from jax.sharding import Mesh, PartitionSpec as P

    try:
        from jax import shard_map as _sm0

        def shard_map(f, **kw):
            kw["check_vma"] = kw.pop("check_rep", False)
            return _sm0(f, **kw)
    except ImportError:
        from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.array(jax.devices()[:1]), ("shards",))
    ebm = sm.edge_blocks
    fields = {f: jnp.asarray(np.asarray(getattr(ebm, f)))
              for f in ("nbq", "edge", "dist", "rough_avg", "dzs", "dzb",
                        "m_int", "m_bnd", "dist2edge", "dep", "rough_cell",
                        "used")}

    def smk(sf_b, gw_b, kh_b, fb):
        def body(sf_l, gw_l, kh_l, f_l):
            eb_l = EdgeBlocks(
                blk=ebm.blk, nb=ebm.nb, bc=ebm.bc, num_ele=ebm.num_ele,
                k_lo=ebm.k_lo, k_hi=ebm.k_hi,
                **{k: v[0] for k, v in f_l.items()},
            )
            qs, qb = edge_fluxes_pallas(eb_l, sf_l[0], gw_l[0], kh_l[0],
                                        close_boundary=True,
                                        interpret=False)
            return qs[None], qb[None]

        return shard_map(
            body, mesh=mesh,
            in_specs=(P("shards"), P("shards"), P("shards"),
                      {k: P("shards") for k in fb}),
            out_specs=(P("shards"), P("shards")),
            check_rep=False,
        )(sf_b, gw_b, kh_b, fb)

    sfb = jnp.asarray(ys["sf"], jnp.float32)
    gwb = jnp.asarray(ys["gw"], jnp.float32)
    khb = jnp.asarray(np.full((sm.p, sm.np_cells), 0.01), jnp.float32)

    def smk_fn(sf_, gw_, kh_):
        qs, qb = smk(sf_, gw_, kh_, fields)
        return qs[0], qb[0]

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain2(sf_, n):
        def step(carry, _):
            qs, qb = smk(carry, gwb, khb, fields)
            return carry + 1e-9 * (qs.sum(axis=2) + qb.sum(axis=2))[
                :, :, None].squeeze(-1), None

        out, _ = jax.lax.scan(step, sf_, None, length=n)
        return out.sum()

    import time

    _ = float(chain2(sfb, 4))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        _ = float(chain2(sfb, 4))
        t_lo = time.time() - t0
        t0 = time.time()
        _ = float(chain2(sfb, 32))
        t_hi = time.time() - t0
        best = min(best, (t_hi - t_lo) / 28)
    print(f"{'kernel in shard_map':34s} {best*1e3:7.3f} ms/eval", flush=True)


if __name__ == "__main__":
    if "--kernel" in sys.argv:
        kernel_probe()
    else:
        main()
