"""Multi-chip runtime: sharded solver windows.

Glues the domain-decomposed RHS (``parallel.sharded``) to the pytree-native
adaptive solver: cell and river blocks live sharded over the device mesh,
lake state is replicated, and ``solve_to`` runs unchanged — its dot
products become cross-device ``psum``s under GSPMD.
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
from shud_tpu.parallel.partition import ShardedMesh, riv_blocks
from shud_tpu.parallel.sharded import AXIS, make_sharded_rhs, place_params
from shud_tpu.solver.bdf import SolverConfig, bdf_init, solve_to


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host initialisation (SURVEY §2.4: DP across hosts via
    ``jax.distributed``).

    Call once per host process before any jax use; afterwards
    ``jax.devices()`` spans the whole pod slice and every sharded
    construct in this package (RCB partition over the global device
    count, `shard_map` RHS, psum reductions) works unchanged — GSPMD
    routes the neighbour-wise halo `ppermute`s over ICI within a slice
    and DCN across slices.  Arguments default to the standard TPU pod environment
    (`jax.distributed.initialize()` autodetects on Cloud TPU); pass them
    explicitly elsewhere (coordinator `"host0:8476"`, total process
    count, this host's rank).

    Returns (process_index, global_device_count)."""
    import jax

    kw = {}
    if coordinator is not None:
        kw = dict(coordinator_address=coordinator,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)
    return jax.process_index(), len(jax.devices())


def compute_forcing_blocks(inp: ProjectInput, md: MeshData, sm: ShardedMesh,
                           t: float, tout: float,
                           buckets: BucketState | None = None,
                           fr=None, dm=None, cryo=None,
                           cryo_bounds=(-1.0, -5.0, -3.0, -10.0)):
    """Host-side forcing slice for window [t, tout), scattered to shard
    blocks.  Pass prebuilt ``fr``/``dm`` to amortise across windows (the
    multi-window driver does); otherwise built per call (dry run, tests).

    BC/SS time series (MD_update.cpp:102-189) and the cryosphere frozen
    fractions (MD_ET.cpp:301-311) are applied exactly as the single-chip
    fused driver does: per-window step-semantics row lookup for the BCs,
    and one ``cryo_step`` per window when a ``cryo`` state is passed.
    Returns (fs_cell, fs_riv, new_buckets, new_cryo)."""
    if fr is None:
        fr = build_forcing(inp, md)
    if dm is None:
        dm = to_device(md)
    sv = jnp.asarray(fr.station_values(t))
    sx, sy, sz, wdt, den = [jnp.asarray(a) for a in fr.tsr_sample(t)]
    fac = solar_mod.tsr_factor(dm.nx, dm.ny, dm.nz, sx, sy, sz, wdt, den,
                               fr.rad_factor_cap, fr.rad_cosz_min)
    cf = cell_forcing(dm, sv, fr.station_z, jnp.asarray(fr.lai_at(t)),
                      jnp.asarray(fr.mf_at(t)), fac, fr.cal,
                      swnet_mode=fr.swnet_mode, et_mode=fr.et_mode)
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
    if cryo is not None:
        from shud_tpu.core.cryo import cryo_step

        cryo, fu_surf, fu_sub = cryo_step(cryo, cf.temp, t, *cryo_bounds)
        fu_surf = np.asarray(fu_surf)
        fu_sub = np.asarray(fu_sub)
    else:
        fu_surf = fu_sub = np.ones(ne)
    bc = fr.bc_values(md, t)
    fs_cell = {
        "net_prcp": blocks(out.net_prcp), "prcp": blocks(cf.prcp),
        "pot_evap": blocks(cf.pot_evap), "pot_tran": blocks(cf.pot_tran),
        "e_ic": blocks(out.e_ic), "lai": blocks(cf.lai),
        "fu_surf": blocks(fu_surf), "fu_sub": blocks(fu_sub),
        "ele_ybc": blocks(bc["ele_ybc"]), "ele_qbc": blocks(bc["ele_qbc"]),
        "ele_qss": blocks(bc["ele_qss"]),
    }
    fs_riv = {"riv_ybc": riv_blocks(sm, bc["riv_ybc"]),
              "riv_qbc": riv_blocks(sm, bc["riv_qbc"])}
    return fs_cell, fs_riv, out.state, cryo


# make_sharded_rhs returns a fresh closure each call; reuse it per ShardedMesh
# so solve_to's jit cache hits across windows (stable function identity).
_RHS_CACHE: dict[tuple, tuple] = {}


def _cached_sharded_rhs(sm: ShardedMesh, float_dtype=None,
                        use_pallas: bool = False):
    key = (id(sm), str(float_dtype), use_pallas)
    if key not in _RHS_CACHE:
        _RHS_CACHE.clear()  # keep at most one mesh alive (avoid id reuse bugs)
        _RHS_CACHE[key] = (
            sm,
            make_sharded_rhs(sm, float_dtype=float_dtype,
                             use_pallas=use_pallas),
        )
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

    fs_cell, fs_riv, _, _ = compute_forcing_blocks(inp, md, sm, t0, tout)
    fs_cell = {k: put_cell(v) for k, v in fs_cell.items()}
    fs_riv = {k: put_cell(v) for k, v in fs_riv.items()}
    params_dev = place_params(mesh, params)

    y_dev = {
        "sf": put_cell(ys["sf"]), "us": put_cell(ys["us"]),
        "gw": put_cell(ys["gw"]), "riv": put_cell(ys["riv"]),
        "lake": put_rep(ys["lake"]),
    }
    if cfg is None:
        cs = inp.control
        cfg = SolverConfig(rtol=cs.reltol, atol=cs.abstol,
                           h_init=cs.init_step, h_max=cs.max_step)
    state = bdf_init(t0, y_dev, cfg)
    return solve_to(rhs_fn, state, tout, params_dev + (fs_cell, fs_riv), cfg)


class ShardedSimulation:
    """Multi-window domain-decomposed simulation (the multi-chip production
    driver).

    The single-device ``driver.simulate.Simulation`` equivalent for a
    ``jax.sharding.Mesh`` of P devices: cell and river blocks live sharded,
    lakes replicated, one BDF state persists across windows (multistep
    history survives, as in the fused driver), and each window re-binds only
    the forcing tables.  The reference has no counterpart — its only
    parallelism is OpenMP threads (SURVEY §2.4/§5.7)."""

    def __init__(self, inp: ProjectInput, md: MeshData, p: int,
                 cfg: SolverConfig | None = None, float_dtype=None,
                 use_pallas: bool = False, shard_order: str | None = None):
        import jax.numpy as jnp

        from shud_tpu.driver.init import initial_buckets, initial_state
        from shud_tpu.parallel.partition import build_sharded_mesh, shard_state

        self.inp = inp
        self.md = md
        if shard_order is None:
            shard_order = "rcm" if use_pallas else "keep"
        self.fd = float_dtype or jnp.float64
        self.sm = build_sharded_mesh(md, p, shard_order=shard_order)
        self.fr = build_forcing(inp, md)
        self.dm = to_device(md)
        cs = inp.control
        self.cfg = cfg or SolverConfig(rtol=cs.reltol, atol=cs.abstol,
                                       h_init=cs.init_step, h_max=cs.max_step)
        self.mesh, self.rhs_fn, params = _cached_sharded_rhs(
            self.sm, float_dtype=float_dtype, use_pallas=use_pallas)
        self.cell_sh = NamedSharding(self.mesh, P(AXIS))
        self.rep_sh = NamedSharding(self.mesh, P())
        self.params_dev = place_params(self.mesh, params)
        ic0, snow0 = initial_buckets(inp, md)
        self.buckets = BucketState(ic_stg=jnp.asarray(ic0),
                                   snow=jnp.asarray(snow0))
        gc = inp.calib
        self.cryo = None
        self.cryo_bounds = (gc.fzn_surfmax, gc.fzn_surfmin,
                            gc.fzn_submax, gc.fzn_submin)
        if cs.cryosphere:
            from shud_tpu.core.cryo import cryo_init

            self.cryo = cryo_init(md.num_ele, int(gc.fzn_surfday),
                                  int(gc.fzn_subday), jnp.float64)
        ys = shard_state(self.sm, initial_state(inp, md))
        y_dev = {
            "sf": self._put_cell(ys["sf"]), "us": self._put_cell(ys["us"]),
            "gw": self._put_cell(ys["gw"]), "riv": self._put_cell(ys["riv"]),
            "lake": self._put_rep(ys["lake"]),
        }
        self.state = bdf_init(cs.start_time, y_dev, self.cfg)
        self.t = cs.start_time

    def _put_cell(self, v):
        import jax.numpy as jnp

        v = jnp.asarray(v)
        if v.dtype.kind == "f":
            v = v.astype(self.fd)
        return jax.device_put(v, self.cell_sh)

    def _put_rep(self, v):
        import jax.numpy as jnp

        v = jnp.asarray(v)
        if v.dtype.kind == "f":
            v = v.astype(self.fd)
        return jax.device_put(v, self.rep_sh)

    def advance_window(self, tout: float):
        """Advance the sharded solver to ``tout``; returns nothing (state
        updates in place).  Buckets advance host-side, as the reference's
        explicit ET step does."""
        fs_cell, fs_riv, new_buckets, new_cryo = compute_forcing_blocks(
            self.inp, self.md, self.sm, self.t, tout,
            buckets=self.buckets, fr=self.fr, dm=self.dm,
            cryo=self.cryo, cryo_bounds=self.cryo_bounds,
        )
        self.buckets = new_buckets
        self.cryo = new_cryo
        fs_cell = {k: self._put_cell(v) for k, v in fs_cell.items()}
        fs_riv = {k: self._put_cell(v) for k, v in fs_riv.items()}
        self.state = solve_to(self.rhs_fn, self.state, tout,
                              self.params_dev + (fs_cell, fs_riv), self.cfg)
        self.t = tout

    def y_full(self) -> np.ndarray:
        """Gather the global state vector to host (reference Y layout)."""
        from shud_tpu.parallel.partition import unshard_state

        y = self.state.y
        return unshard_state(self.sm, {k: np.asarray(v)
                                       for k, v in y.items()})

    @property
    def nfe(self) -> int:
        return int(self.state.nfe)

    def run(self, t_end: float, observer=None):
        step = self.inp.control.solver_step
        while self.t < t_end - 1e-9:
            tout = min(self.t + step, t_end)
            self.advance_window(tout)
            if observer is not None:
                observer(self)


def run_project_sharded(project: str, base: str = ".", p: int | None = None,
                        end_day: float | None = None, verbose: bool = True,
                        outpath: str | None = None, float_dtype=None,
                        use_pallas: bool = False, **overrides):
    """Full sharded run with state outputs, restart snapshots and time log —
    ``./shud <prj>`` over a P-device mesh.  ``float_dtype=jnp.float32`` +
    ``use_pallas=True`` runs the per-shard fused edge kernel."""
    import time as _time

    import jax.numpy as jnp

    from shud_tpu.io.output import PrintCtrl, TimeLog, write_restart
    from shud_tpu.io.project import load_project
    from shud_tpu.core.mesh import build_mesh

    inp = load_project(project, base=base)
    if end_day is not None:
        inp.control.day_end = end_day
    for k, v in overrides.items():
        setattr(inp.control, k, v)
    if outpath:
        inp.paths.outpath = outpath
    from shud_tpu.io.validate import check_input

    check_input(inp)
    md = build_mesh(inp)
    if p is None:
        p = len(jax.devices())
        while p & (p - 1):
            p -= 1  # largest power of two <= device count
    sim = ShardedSimulation(inp, md, p, float_dtype=float_dtype,
                            use_pallas=use_pallas)
    cs = inp.control
    paths = inp.paths
    ne, nr, nl = md.num_ele, md.num_riv, md.num_lake
    t_end = cs.end_time if end_day is None else end_day * 1440.0
    import os as _os

    _os.makedirs(paths.outpath, exist_ok=True)
    start = inp.forc.start_yyyymmdd
    interval = cs.dt_ye_gw or 1440
    chans = []
    for name, sl in (("eleysurf", slice(0, ne)),
                     ("eleyunsat", slice(ne, 2 * ne)),
                     ("eleygw", slice(2 * ne, 3 * ne)),
                     ("rivystage", slice(3 * ne, 3 * ne + nr))):
        n = sl.stop - sl.start
        chans.append((PrintCtrl(_os.path.join(
            paths.outpath, f"{paths.project}.{name}"), start,
            int(interval), False, n), sl))
    if nl:
        chans.append((PrintCtrl(_os.path.join(
            paths.outpath, f"{paths.project}.lakystage"), start,
            int(interval), False, nl), slice(3 * ne + nr, 3 * ne + nr + nl)))
    tlog = TimeLog(_os.path.join(paths.outpath, f"{paths.project}.time.csv"))
    paths.save_project_file()

    wall0 = _time.time()
    step = cs.solver_step
    last_nfe = 0
    while sim.t < t_end - 1e-9:
        tout = min(sim.t + step, t_end)
        sim.advance_window(tout)
        y = sim.y_full()
        for pc, sl in chans:
            pc.push(sim.t, y[sl])
        if abs(sim.t % interval) < 1e-6 or sim.t >= t_end - 1e-9:
            nfe = sim.nfe
            wall = _time.time() - wall0
            tlog.write(sim.t, 100.0 * sim.t / t_end,
                       _time.process_time(), wall, nfe - last_nfe)
            write_restart(
                _os.path.join(paths.outpath,
                              f"{paths.project}.cfg.ic.update"),
                sim.t, np.asarray(sim.buckets.ic_stg),
                np.asarray(sim.buckets.snow),
                y[:ne], y[ne:2 * ne], y[2 * ne:3 * ne],
                y[3 * ne:3 * ne + nr], y[3 * ne + nr:] if nl else None,
            )
            if verbose:
                print(f"day {sim.t/1440:8.2f}  ({p} shards)  "
                      f"nfe {nfe}  wall {wall:.1f}s", flush=True)
            last_nfe = nfe
    for pc, _sl in chans:
        pc.close()
    tlog.close()
    return sim
