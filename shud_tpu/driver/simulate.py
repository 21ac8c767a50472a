"""Simulation driver: the outer time loop.

Mirrors the reference's global-implicit driver (``src/Model/shud.cpp:32-168``):
per SolverStep window — refresh forcing (step semantics), update the
snow/interception buckets explicitly, then advance the coupled ODE implicitly
to the window end.  The per-window compute (forcing transform → TSR → ET
buckets → adaptive BDF to tout) is a single jitted function; the Python loop
only does host-side bookkeeping and output accumulation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from shud_tpu.core import solar as solar_mod
from shud_tpu.core.device import to_device
from shud_tpu.core.landsurface import (
    BucketState,
    cell_forcing,
    et_bucket_step,
)
from shud_tpu.core.mesh import MeshData, build_mesh
from shud_tpu.core.rhs import rhs, rhs_full
from shud_tpu.core.state import ForcingSlice
from shud_tpu.driver.forcing import ForcingRuntime, build_forcing
from shud_tpu.driver.init import initial_buckets, initial_state
from shud_tpu.io.project import ProjectInput, load_project
from shud_tpu.solver.bdf import BDFState, SolverConfig, bdf_init, solve_to


@partial(jax.jit, static_argnames=("close_boundary", "terrain_radiation",
                                   "swnet_mode", "et_mode", "cfg"))
def window_step(
    dm: MeshData,
    bdf_state: BDFState,
    buckets: BucketState,
    station_vals,  # [S, 5]
    station_z,
    lai_vals,
    mf_vals,
    tsr_sx, tsr_sy, tsr_sz, tsr_wdt, tsr_den,
    bc_ele_ybc, bc_ele_qbc, bc_ele_qss, bc_riv_ybc, bc_riv_qbc,
    cal,
    t, tout,
    rad_cap, rad_cosz_min,
    cfg: SolverConfig,
    close_boundary: bool = True,
    terrain_radiation: bool = True,
    swnet_mode: bool = False,
    et_mode: int = 0,
):
    """One forcing window: forcing -> buckets -> implicit solve to tout."""
    if terrain_radiation:
        factor = solar_mod.tsr_factor(
            dm.nx, dm.ny, dm.nz, tsr_sx, tsr_sy, tsr_sz, tsr_wdt, tsr_den,
            rad_cap, rad_cosz_min,
        )
    else:
        factor = jnp.ones_like(dm.nx)
    cf = cell_forcing(
        dm, station_vals, station_z, lai_vals, mf_vals, factor, cal,
        swnet_mode=swnet_mode, terrain_radiation=terrain_radiation,
        et_mode=et_mode,
    )
    out = et_bucket_step(dm, cf, buckets, tout - t, cal.c_ismax)
    ones = jnp.ones_like(dm.nx)
    fs = ForcingSlice(
        net_prcp=out.net_prcp, prcp=cf.prcp,
        pot_evap=cf.pot_evap, pot_tran=cf.pot_tran,
        e_ic=out.e_ic, lai=cf.lai,
        fu_surf=ones, fu_sub=ones,
        ele_ybc=bc_ele_ybc, ele_qbc=bc_ele_qbc, ele_qss=bc_ele_qss,
        riv_ybc=bc_riv_ybc, riv_qbc=bc_riv_qbc,
    )

    def f(tt, yy, params):
        mesh, slc = params
        return rhs(mesh, slc, tt, yy, close_boundary=close_boundary)

    new_state = solve_to(f, bdf_state, tout, (dm, fs), cfg)
    return new_state, out.state, fs, cf


@dataclasses.dataclass
class Simulation:
    inp: ProjectInput
    md: MeshData
    dm: MeshData  # device mesh
    fr: ForcingRuntime
    cfg: SolverConfig
    bdf: BDFState
    buckets: BucketState
    t: float

    @classmethod
    def create(cls, project: str, base: str = ".", float_dtype=jnp.float64,
               calib=None, **control_overrides):
        inp = load_project(project, base=base)
        if calib is not None:
            inp.calib = calib
        for k, v in control_overrides.items():
            setattr(inp.control, k, v)
        from shud_tpu.io.validate import check_input

        check_input(inp)
        md = build_mesh(inp)
        dm = to_device(md, float_dtype)
        fr = build_forcing(inp, md)
        cs = inp.control
        cfg = SolverConfig(
            rtol=cs.reltol, atol=cs.abstol, h_init=cs.init_step,
            h_max=cs.max_step,
        )
        y0 = initial_state(inp, md)
        ic0, snow0 = initial_buckets(inp, md)
        buckets = BucketState(
            ic_stg=jnp.asarray(ic0, dtype=float_dtype),
            snow=jnp.asarray(snow0, dtype=float_dtype),
        )
        bdf = bdf_init(cs.start_time, jnp.asarray(y0, dtype=float_dtype), cfg)
        return cls(inp=inp, md=md, dm=dm, fr=fr, cfg=cfg, bdf=bdf,
                   buckets=buckets, t=cs.start_time)

    def advance_window(self, tout: float):
        """Advance to tout (one SolverStep window)."""
        fr, md = self.fr, self.md
        t = self.t
        sv = jnp.asarray(fr.station_values(t))
        lai = jnp.asarray(fr.lai_at(t))
        mf = jnp.asarray(fr.mf_at(t))
        sx, sy, sz, wdt, den = fr.tsr_sample(t)
        bc = fr.bc_values(md, t)
        new_bdf, new_buckets, fs, cf = window_step(
            self.dm, self.bdf, self.buckets,
            sv, fr.station_z, lai, mf,
            jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(sz),
            jnp.asarray(wdt), jnp.asarray(den),
            jnp.asarray(bc["ele_ybc"]), jnp.asarray(bc["ele_qbc"]),
            jnp.asarray(bc["ele_qss"]), jnp.asarray(bc["riv_ybc"]),
            jnp.asarray(bc["riv_qbc"]),
            fr.cal, t, tout, fr.rad_factor_cap, fr.rad_cosz_min,
            self.cfg,
            close_boundary=bool(self.inp.control.close_boundary),
            terrain_radiation=fr.terrain_radiation,
            swnet_mode=fr.swnet_mode,
            et_mode=fr.et_mode,
        )
        self.bdf = new_bdf
        self.buckets = new_buckets
        self.t = tout
        return fs, cf

    def forcing_slice(self, tout: float):
        """Forcing + bucket update for [t, tout) WITHOUT advancing the
        implicit solver (used by the operator-split driver)."""
        from shud_tpu.core import solar as sol
        from shud_tpu.core.landsurface import cell_forcing, et_bucket_step

        fr, md, t = self.fr, self.md, self.t
        sv = jnp.asarray(fr.station_values(t))
        sx, sy, sz, wdt, den = [jnp.asarray(a) for a in fr.tsr_sample(t)]
        if fr.terrain_radiation:
            fac = sol.tsr_factor(self.dm.nx, self.dm.ny, self.dm.nz,
                                 sx, sy, sz, wdt, den,
                                 fr.rad_factor_cap, fr.rad_cosz_min)
        else:
            fac = jnp.ones_like(self.dm.nx)
        cf = cell_forcing(self.dm, sv, fr.station_z,
                          jnp.asarray(fr.lai_at(t)), jnp.asarray(fr.mf_at(t)),
                          fac, fr.cal, swnet_mode=fr.swnet_mode,
                          terrain_radiation=fr.terrain_radiation,
                          et_mode=fr.et_mode)
        out = et_bucket_step(self.dm, cf, self.buckets, tout - t,
                             fr.cal.c_ismax)
        self.buckets = out.state
        bc = fr.bc_values(md, t)
        ones = jnp.ones_like(self.dm.nx)
        fs = ForcingSlice(
            net_prcp=out.net_prcp, prcp=cf.prcp, pot_evap=cf.pot_evap,
            pot_tran=cf.pot_tran, e_ic=out.e_ic, lai=cf.lai,
            fu_surf=ones, fu_sub=ones,
            ele_ybc=jnp.asarray(bc["ele_ybc"]),
            ele_qbc=jnp.asarray(bc["ele_qbc"]),
            ele_qss=jnp.asarray(bc["ele_qss"]),
            riv_ybc=jnp.asarray(bc["riv_ybc"]),
            riv_qbc=jnp.asarray(bc["riv_qbc"]),
        )
        self.t = tout
        return fs, cf

    def run(self, t_end: float | None = None,
            observer: Callable | None = None):
        cs = self.inp.control
        if t_end is None:
            t_end = cs.end_time
        step = cs.solver_step
        while self.t < t_end - 1e-9:
            tout = min(self.t + step, t_end)
            fs, cf = self.advance_window(tout)
            if observer is not None:
                observer(self, fs, cf)
        return self

    def diagnostics(self, fs: ForcingSlice):
        """Flux diagnostics at the current accepted state."""
        _, diag = rhs_full(
            self.dm, fs, self.t, self.bdf.y,
            close_boundary=bool(self.inp.control.close_boundary),
        )
        return diag
