#!/usr/bin/env python3
"""The 10M-cell design point through the COMPOSED sharded f32+Pallas path.

VERDICT r4 item 2: every published 10M number (20.1 ms/eval RHS, ~420M
cell-steps/s solver) is the structured roll-gather path; the flagship
unstructured path (shuffled numbering -> per-shard RCM -> Pallas banded
row-sum) had only been measured to 1.05M cells.  This tool measures it at
10.49M cells (nx=ny=2290 synthetic watershed, numbering destroyed by a
random permutation, recovered by the partition's RCM) on the real chip:

  window       full adaptive BDF Newton-GMRES windows via ShardedSimulation
               (f32 + Pallas, P=1) -> cell-steps/s, NFE, ms/eval-in-solver
  parity       single-eval composed-Pallas vs sharded-XLA f32 agreement on
               the SAME 10.49M mesh (the kernel's cbrt-tolerance contract)
  parity-p8    P=8 vs P=1 XLA f64 single eval on the virtual CPU mesh —
               the decomposition itself at 10M/P=8 (run with
               JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)

The per-stage itemisation (kernel / elementwise / segments / rivers) is
`tools/profile_sharded.py 2290 2290 1`, and the raw RHS ms/eval is
`tools/bench_sharded_pallas.py 2290 2290 1` — same cached partition.

Usage: python tools/bench_10m_composed.py window|parity|parity-p8 [nx ny p tile]

``tile`` (0 = untiled) plumbs through to
``build_sharded_mesh(tile_cells=...)``: per-tile RCM caps the kernel band
at ~2*sqrt(tile) regardless of mesh size (the round-5 scaling fix — the
untiled 10.49M band is ~2.3k -> 37 row-shift iterations).
"""

from __future__ import annotations

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.bench_sharded_pallas import build


def build_inp(nx: int, ny: int):
    """The ProjectInput matching tools.bench_sharded_pallas.build's mesh
    (same generator, same destroy-the-numbering permutation, seed 0)."""
    from shud_tpu.utils.reorder import permute_project
    from shud_tpu.utils.synthetic import make_synthetic_project

    cache = f"/tmp/bench_shpallas_inp_{nx}x{ny}_v1.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    t0 = time.time()
    inp = make_synthetic_project(nx, ny)
    ne = inp.tri.shape[0]
    rng = np.random.default_rng(0)
    inp = permute_project(inp, rng.permutation(ne))
    print(f"# inp built ne={ne} ({time.time()-t0:.1f}s)", flush=True)
    with open(cache, "wb") as f:
        pickle.dump(inp, f)
    return inp


def kernel_report(sm):
    eb = sm.edge_blocks
    nshift = eb.k_hi - eb.k_lo + 1
    # VMEM per grid step: 3 dynamic cell blocks x 3 fields (sf, gw, effKH)
    # + the per-edge statics of one block + per-cell statics + 2x3 outputs
    f32 = 4
    dyn = 3 * eb.blk * 3 * f32
    edge_statics = 9 * 3 * eb.bc * 128 * f32  # nbq..dist2edge ([nb,3bc,128])
    cell_statics = 2 * eb.bc * 128 * f32      # dep, rough_cell
    outs = 2 * 3 * eb.bc * 128 * f32
    print(f"# kernel: blk={eb.blk} bc={eb.bc} nb={eb.nb} "
          f"k=[{eb.k_lo},{eb.k_hi}] -> {nshift} row-shift iterations; "
          f"VMEM/grid-step ~ {(dyn+edge_statics+cell_statics+outs)/2**20:.2f}"
          f" MiB (dyn {dyn/2**20:.2f} + statics "
          f"{(edge_statics+cell_statics)/2**20:.2f} + out {outs/2**20:.2f})",
          flush=True)


def cmd_window(nx, ny, p, tile=None):
    import jax
    import jax.numpy as jnp

    import shud_tpu  # noqa: F401
    from shud_tpu.parallel.runtime import ShardedSimulation

    md, sm = build(nx, ny, p, tile_cells=tile)
    inp = build_inp(nx, ny)
    kernel_report(sm)
    ne = md.num_ele

    t0 = time.time()
    sim = ShardedSimulation(inp, md, p, float_dtype=jnp.float32,
                            use_pallas=True, sm=sm)
    print(f"# sim built ({time.time()-t0:.1f}s)", flush=True)

    win = inp.control.solver_step  # 10-min windows, reference config
    n_win = int(os.environ.get("SHUD_BENCH_WINDOWS", "5"))
    # start mid-storm (storm is day 0.5-1.5): dynamic, honest NFE
    t = 720.0
    sim.state = sim.state._replace(t=jnp.asarray(t, sim.state.t.dtype))
    sim.t = t
    t0 = time.time()
    sim.advance_window(t + win)   # compile + first window
    _ = int(sim.nfe)
    print(f"# first window (compile) {time.time()-t0:.1f}s", flush=True)
    t += win

    best = 0.0
    for rep in range(3):
        nfe0 = int(sim.nfe)
        t0 = time.time()
        for _ in range(n_win):
            t += win
            sim.advance_window(t)
        nfe = int(sim.nfe) - nfe0  # host fetch = sync
        wall = time.time() - t0
        rate = ne * nfe / wall
        print(f"  {n_win} windows: {nfe} NFE in {wall:.2f}s -> "
              f"{rate/1e6:.1f}M cell-steps/s "
              f"({wall/max(nfe,1)*1e3:.1f} ms/eval incl. solver)",
              flush=True)
        best = max(best, rate)
    print(f"BEST: {best/1e6:.1f}M cell-steps/s on {ne} cells (composed "
          f"f32+Pallas, P={p})")


def _rand_inputs(md, sm, fd, use_pallas):
    """Shared random state/forcing in the block layout (bench protocol)."""
    import jax.numpy as jnp

    from shud_tpu.parallel.partition import riv_blocks, shard_state

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

    def blocks(v):
        buf = np.zeros((sm.p, sm.np_cells))
        buf[sm.old_to_shard, sm.old_to_slot] = v
        return jnp.asarray(buf, fd)

    fs_cell = {k: blocks(fsargs[k]) for k in fsargs}
    fs_riv = {"riv_ybc": jnp.asarray(riv_blocks(sm, np.zeros(nr)), fd),
              "riv_qbc": jnp.asarray(riv_blocks(sm, np.zeros(nr)), fd)}
    ys = {k: jnp.asarray(np.asarray(v), fd)
          for k, v in shard_state(sm, y).items()}
    return ys, fs_cell, fs_riv


def cmd_parity(nx, ny, p, tile=None):
    """Composed Pallas f32 vs sharded XLA f32, single eval, real chip."""
    import jax

    import shud_tpu  # noqa: F401
    from shud_tpu.parallel.sharded import make_sharded_rhs

    md, sm = build(nx, ny, p, tile_cells=tile)
    kernel_report(sm)
    import jax.numpy as jnp

    devices = np.array(jax.devices()[:p])
    outs = {}
    for label, use_pallas in (("xla", False), ("pallas", True)):
        _, rhs_fn, params = make_sharded_rhs(
            sm, devices=devices, float_dtype=jnp.float32,
            use_pallas=use_pallas)
        ys, fs_cell, fs_riv = _rand_inputs(md, sm, jnp.float32, use_pallas)
        dy = jax.jit(rhs_fn)(0.0, ys, params + (fs_cell, fs_riv))
        outs[label] = {k: np.asarray(v) for k, v in dy.items()}
        del params
    for k in outs["xla"]:
        a, b = outs["xla"][k], outs["pallas"][k]
        scale = np.maximum(np.abs(a), 1e-8)
        rel = np.max(np.abs(a - b) / scale)
        print(f"  {k}: max|d| {np.max(np.abs(a-b)):.3e}  max rel {rel:.3e}")


def cmd_parity_p8(nx, ny):
    """P=8 vs P=1, XLA f64, virtual CPU devices, single eval at 10.49M."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8")

    import jax

    # the image's sitecustomize force-registers the axon TPU plugin; select
    # the CPU backend explicitly (same dance as tools/bench_scaling.py)
    jax.config.update("jax_platforms", "cpu")

    import shud_tpu  # noqa: F401
    from shud_tpu.parallel.partition import unshard_state
    from shud_tpu.parallel.sharded import make_sharded_rhs

    assert jax.devices()[0].platform == "cpu", jax.devices()
    full = {}
    for p in (1, 8):
        md, sm = build(nx, ny, p)
        devices = np.array(jax.devices()[:p])
        _, rhs_fn, params = make_sharded_rhs(sm, devices=devices)
        ys, fs_cell, fs_riv = _rand_inputs(md, sm, None, False)
        t0 = time.time()
        dy = jax.jit(rhs_fn)(0.0, ys, params + (fs_cell, fs_riv))
        dy = {k: np.asarray(v) for k, v in dy.items()}
        print(f"# P={p} eval {time.time()-t0:.1f}s", flush=True)
        full[p] = unshard_state(sm, dy)
        del params, dy, ys, fs_cell, fs_riv
    d = np.max(np.abs(full[1] - full[8]))
    print(f"  P=8 vs P=1 max|d dY| = {d:.3e} over {full[1].size} rows")
    assert d < 1e-12, d
    print("  OK (decomposition exact at 10.49M / P=8)")


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "window"
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 2290
    ny = int(sys.argv[3]) if len(sys.argv) > 3 else 2290
    p = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    tile = int(sys.argv[5]) if len(sys.argv) > 5 else None
    tile = tile or None
    if cmd == "window":
        cmd_window(nx, ny, p, tile)
    elif cmd == "parity":
        cmd_parity(nx, ny, p, tile)
    elif cmd == "parity-p8":
        cmd_parity_p8(nx, ny)
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
