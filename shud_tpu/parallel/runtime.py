"""Multi-chip runtime: sharded solver windows.

Glues the domain-decomposed RHS (``parallel.sharded``) to the pytree-native
adaptive solver: cell blocks live sharded over the device mesh, river/lake
state is replicated, and ``solve_to`` runs unchanged — its dot products
become cross-device ``psum``s under GSPMD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from shud_tpu.core import solar as solar_mod
from shud_tpu.core.device import to_device
from shud_tpu.core.landsurface import BucketState, cell_forcing, et_bucket_step
from shud_tpu.core.mesh import MeshData
from shud_tpu.driver.forcing import build_forcing
from shud_tpu.io.project import ProjectInput
from shud_tpu.parallel.partition import ShardedMesh
from shud_tpu.parallel.sharded import AXIS, make_sharded_rhs
from shud_tpu.solver.bdf import SolverConfig, bdf_init, solve_to


def compute_forcing_blocks(inp: ProjectInput, md: MeshData, sm: ShardedMesh,
                           t: float, tout: float,
                           buckets: BucketState | None = None):
    """Host-side forcing slice for window [t, tout), scattered to shard
    blocks.  (Single-dispatch path used by the dry run and scaling tests;
    the production driver fuses this on-device.)"""
    fr = build_forcing(inp, md)
    dm = to_device(md)
    sv = jnp.asarray(fr.station_values(t))
    sx, sy, sz, wdt, den = [jnp.asarray(a) for a in fr.tsr_sample(t)]
    fac = solar_mod.tsr_factor(dm.nx, dm.ny, dm.nz, sx, sy, sz, wdt, den,
                               fr.rad_factor_cap, fr.rad_cosz_min)
    cf = cell_forcing(dm, sv, fr.station_z, jnp.asarray(fr.lai_at(t)),
                      jnp.asarray(fr.mf_at(t)), fac, fr.cal)
    if buckets is None:
        buckets = BucketState(
            ic_stg=jnp.zeros(md.num_ele), snow=jnp.zeros(md.num_ele)
        )
    out = et_bucket_step(dm, cf, buckets, tout - t, fr.cal.c_ismax)

    def blocks(v):
        v = np.asarray(v)
        buf = np.zeros((sm.p, sm.np_cells))
        sizes = sm.valid.sum(axis=1)
        flat = v[sm.perm]
        pos = 0
        for q in range(sm.p):
            buf[q, : sizes[q]] = flat[pos : pos + sizes[q]]
            pos += sizes[q]
        return buf

    ne = md.num_ele
    zeros = np.zeros(ne)
    fs_cell = {
        "net_prcp": blocks(out.net_prcp), "prcp": blocks(cf.prcp),
        "pot_evap": blocks(cf.pot_evap), "pot_tran": blocks(cf.pot_tran),
        "e_ic": blocks(out.e_ic), "lai": blocks(cf.lai),
        "fu_surf": blocks(np.ones(ne)), "fu_sub": blocks(np.ones(ne)),
        "ele_ybc": blocks(zeros), "ele_qbc": blocks(zeros),
        "ele_qss": blocks(zeros),
    }
    fs_riv = {"riv_ybc": np.zeros(md.num_riv), "riv_qbc": np.zeros(md.num_riv)}
    return fs_cell, fs_riv, out.state


# make_sharded_rhs returns a fresh closure each call; reuse it per ShardedMesh
# so solve_to's jit cache hits across windows (stable function identity).
_RHS_CACHE: dict[int, tuple] = {}


def _cached_sharded_rhs(sm: ShardedMesh):
    key = id(sm)
    if key not in _RHS_CACHE:
        _RHS_CACHE.clear()  # keep at most one mesh alive (avoid id reuse bugs)
        _RHS_CACHE[key] = (sm, make_sharded_rhs(sm))
    return _RHS_CACHE[key][1]


def sharded_window_step(inp: ProjectInput, md: MeshData, sm: ShardedMesh,
                        ys: dict, t0: float, tout: float,
                        cfg: SolverConfig | None = None):
    """One solver window on the device mesh; returns the final BDFState."""
    mesh, rhs_fn, params = _cached_sharded_rhs(sm)
    cell_sh = NamedSharding(mesh, P(AXIS))
    rep_sh = NamedSharding(mesh, P())

    def put_cell(v):
        return jax.device_put(jnp.asarray(v), cell_sh)

    def put_rep(v):
        return jax.device_put(jnp.asarray(v), rep_sh)

    fs_cell, fs_riv, _ = compute_forcing_blocks(inp, md, sm, t0, tout)
    fs_cell = {k: put_cell(v) for k, v in fs_cell.items()}
    fs_riv = {k: put_rep(v) for k, v in fs_riv.items()}
    params_dev = tuple(
        jax.tree_util.tree_map(put_cell, p) if i < 3 or i == 4
        else jax.tree_util.tree_map(put_rep, p)
        for i, p in enumerate(params)
    )

    y_dev = {
        "sf": put_cell(ys["sf"]), "us": put_cell(ys["us"]),
        "gw": put_cell(ys["gw"]), "riv": put_rep(ys["riv"]),
        "lake": put_rep(ys["lake"]),
    }
    if cfg is None:
        cs = inp.control
        cfg = SolverConfig(rtol=cs.reltol, atol=cs.abstol,
                           h_init=cs.init_step, h_max=cs.max_step)
    state = bdf_init(t0, y_dev, cfg)
    return solve_to(rhs_fn, state, tout, params_dev + (fs_cell, fs_riv), cfg)
