#!/usr/bin/env python3
"""Kernel block-size sweep at the 10M design point (real chip).

The 10.49M tiled partition runs the edge kernel with blk=1024 ->
nb=10243 grid steps of ~0.15 MiB VMEM each; per-grid-step fixed cost
(DMA issue + semaphores) is a candidate for the measured gap over linear
scaling from the 1.05M number.  This tool rebuilds ONLY the per-shard
EdgeBlocks from a cached partition at larger block sizes (the banded
numbering is unchanged — nbq is recovered from the blocked layout) and
times the FULL composed sharded RHS for each.

Usage: python tools/bench_edge_blk.py [nx ny p tile] [blk,blk,...]
       (default 2290 2290 1 131072  2048,4096,8192)
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.bench_sharded_pallas import build


def unblock_edge(a, nb, bc, npad):
    """Invert pallas_edge.build_edge_blocks_arrays.blk_edge."""
    return np.ascontiguousarray(
        np.asarray(a).reshape(nb, 3, bc, 128).transpose(0, 2, 3, 1)
        .reshape(npad, 3))


def unblock_cell(a, npad):
    return np.asarray(a).reshape(npad)


def rebuild_eb(sm, blk_target: int):
    """Per-shard EdgeBlocks at a new block size from the existing ones."""
    from shud_tpu.core.pallas_edge import EdgeBlocks, build_edge_blocks_arrays

    eb = sm.edge_blocks
    nb, bc, blk, npad = eb.nb, eb.bc, eb.blk, eb.nb * eb.blk
    ne = eb.num_ele
    per_shard = []
    for q in range(sm.p):
        m_int = unblock_edge(eb.m_int[q], nb, bc, npad)[:ne].astype(bool)
        m_bnd = unblock_edge(eb.m_bnd[q], nb, bc, npad)[:ne].astype(bool)
        qwin = unblock_edge(eb.nbq[q], nb, bc, npad)[:ne]
        win_start = (np.arange(ne) // blk - 1) * blk
        nabr = np.where(m_int, qwin + win_start[:, None], -1)
        per_shard.append(build_edge_blocks_arrays(
            ne, nabr, m_int=m_int, m_bnd=m_bnd,
            edge_len=unblock_edge(eb.edge[q], nb, bc, npad)[:ne],
            dist2nabor=unblock_edge(eb.dist[q], nb, bc, npad)[:ne],
            avg_rough=unblock_edge(eb.rough_avg[q], nb, bc, npad)[:ne],
            dz_surf=unblock_edge(eb.dzs[q], nb, bc, npad)[:ne],
            dz_bottom=unblock_edge(eb.dzb[q], nb, bc, npad)[:ne],
            dist2edge=unblock_edge(eb.dist2edge[q], nb, bc, npad)[:ne],
            depression=unblock_cell(eb.dep[q], npad)[:ne],
            rough=unblock_cell(eb.rough_cell[q], npad)[:ne],
            min_blk=blk_target, max_blk=blk_target, force_blk=blk_target,
        ))
        if per_shard[-1] is None:
            return None
    e0 = per_shard[0]
    fields = ["nbq", "edge", "dist", "rough_avg", "dzs", "dzb", "m_int",
              "m_bnd", "dist2edge", "dep", "rough_cell"]
    k_lo = min(e.k_lo for e in per_shard)
    k_hi = max(e.k_hi for e in per_shard)
    used = np.zeros((sm.p, e0.nb, k_hi - k_lo + 1), np.int32)
    for q, e in enumerate(per_shard):
        used[q, :, e.k_lo - k_lo:e.k_lo - k_lo + e.used.shape[1]] = e.used
    return EdgeBlocks(
        blk=e0.blk, nb=e0.nb, bc=e0.bc, num_ele=e0.num_ele,
        k_lo=k_lo, k_hi=k_hi, used=used, use_skip=False,
        **{f: np.stack([getattr(e, f) for e in per_shard])
           for f in fields})


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2290
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 2290
    p = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    tile = (int(sys.argv[4]) or None) if len(sys.argv) > 4 else 131072
    blks = [int(b) for b in (sys.argv[5] if len(sys.argv) > 5
                             else "2048,4096,8192").split(",")]
    md, sm0 = build(nx, ny, p, tile_cells=tile)

    import jax
    import jax.numpy as jnp

    import shud_tpu  # noqa: F401
    from shud_tpu.parallel.partition import riv_blocks, shard_state
    from shud_tpu.parallel.sharded import make_sharded_rhs, place_params

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
    fd = jnp.float32

    def blocks(v):
        buf = np.zeros((sm0.p, sm0.np_cells))
        buf[sm0.old_to_shard, sm0.old_to_slot] = v
        return jnp.asarray(buf, fd)

    fs_cell = {k: blocks(fsargs[k]) for k in fsargs}
    fs_riv = {"riv_ybc": jnp.asarray(riv_blocks(sm0, np.zeros(nr)), fd),
              "riv_qbc": jnp.asarray(riv_blocks(sm0, np.zeros(nr)), fd)}
    ys = {k: jnp.asarray(np.asarray(v), fd)
          for k, v in shard_state(sm0, y).items()}
    devices = np.array(jax.devices()[:p])

    ref = None
    for blk in [None] + blks:
        if blk is None:
            sm, label = sm0, f"blk={sm0.edge_blocks.blk} (shipped)"
        else:
            t0 = time.time()
            eb = rebuild_eb(sm0, blk)
            if eb is None:
                print(f"blk={blk}: numbering not banded enough, skipped")
                continue
            sm = dataclasses.replace(sm0, edge_blocks=eb) \
                if dataclasses.is_dataclass(sm0) else sm0._replace(
                    edge_blocks=eb)
            label = (f"blk={blk} nb={eb.nb} k=[{eb.k_lo},{eb.k_hi}] "
                     f"(rebuilt {time.time()-t0:.0f}s)")
        mesh, rhs_fn, params = make_sharded_rhs(
            sm, devices=devices, float_dtype=fd, use_pallas=True)
        params = place_params(mesh, params) + (fs_cell, fs_riv)

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(ys, params, n, rhs_fn=rhs_fn):
            def step(carry, _):
                dy = rhs_fn(0.0, carry, params)
                return jax.tree_util.tree_map(
                    lambda a, b: a + 1e-9 * b, carry, dy), None
            out, _ = jax.lax.scan(step, ys, None, length=n)
            return sum(jnp.sum(v) for v in out.values())

        n_lo, n_hi = 4, 32
        out0 = float(chain(ys, params, n_lo))
        if ref is None:
            ref = out0
        else:
            assert abs(out0 - ref) <= 1e-4 * max(abs(ref), 1.0), \
                (out0, ref)  # same physics, new layout
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(ys, params, n_lo))
            t_lo = time.time() - t0
            t0 = time.time()
            _ = float(chain(ys, params, n_hi))
            t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
        print(f"{label:44s} {best*1e3:7.3f} ms/eval "
              f"({ne/best/1e6:.0f}M cell-evals/s)", flush=True)


if __name__ == "__main__":
    main()
