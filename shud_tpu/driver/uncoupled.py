"""Operator-split ("uncoupled") mode — the reference's ``-g`` driver.

Five sub-systems (surface, unsaturated, groundwater, river, lake) are
advanced sequentially over each window, each treating the others as frozen
(Gauss–Seidel splitting; reference ``SHUD_uncouple`` at shud.cpp:171-357 and
the sub-RHS set in ``MD_f_uncouple.cpp``).  Serves as an independent second
solver path over identical physics: implicit-vs-split agreement at splitting
error is a built-in regression oracle (SURVEY §3.3).

Faithful structural notes (kept from the reference):
* the surface sub-DY has NO surface-evaporation sink (f_applyDYi flag 1);
* recharge/exfiltration are FROZEN during the groundwater solve (f_loop3
  recomputes only lateral fluxes);
* river dV is converted by the top area, not the bank-slope quadratic
  (f_applyDYi flag 4).
One pure-function deviation: the reference evaluates the ET partition with
whatever element state the previous RHS call left behind; here it is
evaluated once per window at the frozen stage states (within splitting
error).

Lake deviation (documented): the reference allocates a 5th CVODE instance
for lakes (shud.cpp:171-357 ``mem5``/``f_lake``) but its ``f_loop5`` is
EMPTY and ``f_applyDYi(flag=5)`` never writes DY
(MD_f_uncouple.cpp:107-109,203-212) — the lake derivative is left
unassembled, so ``-g`` on a lake mesh integrates garbage upstream.  Here
the 5th sub-solve is real: the implicit-mode lake budget
(P − E + (RivIn + Qsub + Qsurf)/A(stage), MD_f.cpp:180-191) is advanced
with element/river states frozen at their staged values, and the frozen
lake stage feeds the lake-bank branches of the surface/groundwater
sub-systems and the river routing — so split-vs-implicit agreement holds
at splitting error on lake meshes (qhh).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.ops import segment_sum

from shud_tpu.config import EPSILON, ZERO
from shud_tpu.core import physics as ph
from shud_tpu.core.rhs import (
    _lake_toparea,
    edge_fluxes,
    et_flux,
    flux_infiltration,
    flux_recharge,
    lake_cell_update,
    update_element,
)
from shud_tpu.core.state import ForcingSlice
from shud_tpu.solver.bdf import SolverConfig, bdf_init, solve_to


def _seg_surface(m, fs, sf, q_infil, q_exfil, riv_stage):
    se, sr = m.seg_ele, m.seg_riv
    seg_isf = jnp.maximum(0.0, sf[se] - q_infil[se] + q_exfil[se])
    zs_e = m.z_surf[se]
    return ph.weir_flow_jtoi(
        zs_e, seg_isf, zs_e - m.riv_depth[sr], riv_stage[sr],
        zs_e, m.seg_cwr, m.seg_length, m.depression[se],
    )


def _seg_sub(m, fs, gw, effkh, riv_stage):
    se, sr = m.seg_ele, m.seg_riv
    zs_e = m.z_surf[se]
    return ph.flux_r2e_gw(
        riv_stage[sr], zs_e - m.riv_depth[sr], gw[se], m.z_bottom[se],
        effkh[se], m.riv_ksat_h[sr], m.seg_length, m.riv_bed_thick[sr],
    ) * fs.fu_sub[se]


def _cell_update_split(m, sf, us, gw):
    """updateElement + the lake-cell overrides (rhs_full does the same)."""
    cu = update_element(m, sf, us, gw)
    if m.num_lake > 0:
        cu = lake_cell_update(m, cu)
    return cu


def _frozen_lake(m, lake0, dtype):
    if m.num_lake > 0:
        if lake0 is None:
            # fail loudly: a forgotten lake0 on a lake mesh would silently
            # drop all lake-bank fluxes (wrong physics, not an error)
            raise ValueError(
                "mesh has lakes but lake0 is None — pass the frozen lake "
                "stage to the sub-RHS (advance_window_uncoupled does)"
            )
        return jnp.maximum(lake0, 0.0)
    return jnp.zeros((0,), dtype)


def rhs_surf(m, fs: ForcingSlice, t, sf, us0, gw0, riv0, lake0=None,
             close_boundary=True):
    """d(sf)/dt with us/gw/riv/lake frozen (f_surf: f_loop1 +
    f_applyDYi(1))."""
    ne, nr = m.area.shape[0], m.riv_length.shape[0]
    sf = jnp.maximum(sf, 0.0)  # f_updatei clamps (MD_update.cpp:49-53)
    cu = _cell_update_split(m, sf, us0, gw0)
    qi, qex = flux_infiltration(m, cu, sf, us0, gw0, fs.net_prcp)
    q_infil = qi * fs.fu_surf
    q_exfil = qex * fs.fu_surf
    lake_stg = _frozen_lake(m, lake0, sf.dtype)
    if m.num_lake > 0:
        is_lake = m.i_lake > 0
        q_infil = jnp.where(is_lake, 0.0, q_infil)
        q_exfil = jnp.where(is_lake, 0.0, q_exfil)
    q_esurf, _, _, _ = edge_fluxes(m, cu, sf, gw0, lake_stg, close_boundary)
    if m.num_lake > 0:
        q_esurf = jnp.where(is_lake[:, None], 0.0, q_esurf)
    q_seg = _seg_surface(m, fs, sf, q_infil, q_exfil, riv0)
    q_e2r = segment_sum(-q_seg, m.seg_ele, num_segments=ne)
    q_tot = q_e2r + q_esurf.sum(axis=1)
    dsf = fs.net_prcp - q_infil + q_exfil - q_tot / m.area
    dsf = dsf + jnp.where(m.i_ss > 0, fs.ele_qss / m.area, 0.0)
    if m.num_lake > 0:
        dsf = jnp.where(is_lake, 0.0, dsf)
    return dsf


def rhs_unsat(m, fs: ForcingSlice, t, us, sf0, gw0, close_boundary=True):
    """d(us)/dt (f_unsat: f_loop2 + f_applyDYi(2))."""
    us = jnp.maximum(us, 0.0)
    cu = _cell_update_split(m, sf0, us, gw0)
    es, eu, eg, tu, tg, _, _ = et_flux(m, fs, sf0, us, gw0, cu.satn)
    qi, qex = flux_infiltration(m, cu, sf0, us, gw0, fs.net_prcp)
    q_infil = qi * fs.fu_surf
    q_rech = flux_recharge(m, cu, us, gw0) * fs.fu_sub
    evapo = es + eu + eg
    trans = tu + tg
    dus = q_infil - q_rech - evapo
    dus = dus - jnp.where(gw0 > m.rootreach_level, 0.0, trans)
    if m.num_lake > 0:
        dus = jnp.where(m.i_lake > 0, 0.0, dus)
    return dus / m.sy


def rhs_gw(m, fs: ForcingSlice, t, gw, sf0, us0, riv0, q_rech0, q_exfil0,
           evapo0, trans0, lake0=None, close_boundary=True):
    """d(gw)/dt with frozen recharge/exfiltration (f_gw: f_loop3 +
    f_applyDY_gw)."""
    ne = m.area.shape[0]
    gw_c = jnp.maximum(gw, 0.0)
    gw_bc = jnp.where(m.i_bc > 0, fs.ele_ybc, gw_c)
    cu = _cell_update_split(m, sf0, us0, gw_bc)
    lake_stg = _frozen_lake(m, lake0, gw.dtype)
    _, q_esub, _, _ = edge_fluxes(m, cu, sf0, gw_bc, lake_stg, close_boundary)
    q_esub = q_esub * fs.fu_sub[:, None]
    if m.num_lake > 0:
        is_lake = m.i_lake > 0
        q_esub = jnp.where(is_lake[:, None], 0.0, q_esub)
    q_seg = _seg_sub(m, fs, gw_bc, cu.eff_kh, riv0)
    q_e2r = segment_sum(-q_seg, m.seg_ele, num_segments=ne)
    q_tot = q_e2r + q_esub.sum(axis=1)
    dgw = q_rech0 - q_exfil0 - q_tot / m.area
    no_pond = sf0 < EPSILON
    dgw = dgw - jnp.where(no_pond & (gw_bc >= m.wetland_level), evapo0, 0.0)
    dgw = dgw - jnp.where(gw_bc > m.rootreach_level, trans0, 0.0)
    dgw = jnp.where(m.i_bc > 0, 0.0, dgw)
    dgw = dgw + jnp.where(m.i_bc < 0, fs.ele_qbc / m.area, 0.0)
    dgw = dgw + jnp.where(m.i_ss < 0, fs.ele_qss / m.area, 0.0)
    if m.num_lake > 0:
        dgw = jnp.where(is_lake, 0.0, dgw)
    return dgw / m.sy


def rhs_lake(m, fs: ForcingSlice, t, lake_stg, sf0, us0, gw0, q_lake_rivin0,
             close_boundary=True):
    """d(lake stage)/dt with element/river states frozen (the real 5th
    sub-solve; implicit-mode budget MD_f.cpp:180-191 — see module
    docstring for the deviation from the reference's empty f_loop5)."""
    nl = m.lake_zmin.shape[0]
    lake_c = jnp.maximum(lake_stg, 0.0)
    # Dirichlet-BC elements contribute lake-bank fluxes at the prescribed
    # head, as rhs_full/rhs_gw do before edge_fluxes (MD_update.cpp BC scatter)
    gw_bc = jnp.where(m.i_bc > 0, fs.ele_ybc, gw0)
    cu = _cell_update_split(m, sf0, us0, gw_bc)
    is_lake = m.i_lake > 0
    _, _, q_lake_surf_e, q_lake_sub_e = edge_fluxes(
        m, cu, sf0, gw_bc, lake_c, close_boundary
    )
    # lake cells have no lateral fluxes (fun_Ele_lakeHorizon)
    q_lake_surf_e = jnp.where(is_lake[:, None], 0.0, q_lake_surf_e)
    q_lake_sub_e = jnp.where(is_lake[:, None], 0.0, q_lake_sub_e)
    lk_e = jnp.where(m.lakenabr >= 0, m.lakenabr, 0)
    q_lake_surf = segment_sum(
        q_lake_surf_e.ravel(), lk_e.ravel(), num_segments=nl
    )
    q_lake_sub = segment_sum(
        q_lake_sub_e.ravel(), lk_e.ravel(), num_segments=nl
    )
    lk_cell = jnp.where(is_lake, m.i_lake - 1, 0)
    inv_nele = 1.0 / jnp.maximum(m.lake_num_ele.astype(lake_c.dtype), 1.0)
    q_lake_evap = segment_sum(
        jnp.where(is_lake, fs.pot_evap * inv_nele[lk_cell], 0.0),
        lk_cell, num_segments=nl,
    )
    q_lake_prcp = segment_sum(
        jnp.where(is_lake, fs.prcp * inv_nele[lk_cell], 0.0),
        lk_cell, num_segments=nl,
    )
    # clamp (MD_f.cpp:44-47): min first, then max — NOT jnp.clip
    q_lake_evap = jnp.maximum(
        0.0, jnp.minimum(q_lake_evap, q_lake_prcp + lake_c)
    )
    lake_area = _lake_toparea(m, lake_c)
    return q_lake_prcp - q_lake_evap + (
        q_lake_rivin0 + q_lake_sub + q_lake_surf
    ) / lake_area


def rhs_river(m, fs: ForcingSlice, t, riv, q_riv_surf0, q_riv_sub0):
    """d(stage)/dt with frozen exchange fluxes (f_river: f_loop4 +
    f_applyDYi(4)); dV -> dStage via the top area."""
    nr = m.riv_length.shape[0]
    riv_c = jnp.maximum(riv, 0.0)
    riv_stage = jnp.where(m.riv_bc > 0, fs.riv_ybc, riv_c)
    r_csa = jnp.maximum(
        riv_stage * (m.riv_bottom_width + riv_stage * m.riv_bank_slope), 0.0
    )
    r_per = jnp.maximum(
        2.0 * jnp.abs(riv_stage) * jnp.sqrt(1.0 + m.riv_bank_slope**2)
        + m.riv_bottom_width, 0.0,
    )
    r_eqw = jnp.maximum(
        0.5 * (riv_stage * m.riv_bank_slope * 2.0 + 2.0 * m.riv_bottom_width),
        0.0,
    )
    top_area = jnp.maximum(r_eqw * m.riv_length, 1e-12)

    down = m.riv_down
    has_down = down >= 0
    dn = jnp.where(has_down, down, 0)
    s_mean = 0.5 * (m.riv_bed_slope + m.riv_bed_slope[dn])
    s_down = ((riv_stage - m.riv_depth)
              - (riv_stage[dn] - m.riv_depth[dn])) / m.riv_dist2down + s_mean
    r_hyd = jnp.where(r_per <= ZERO, 0.0,
                      r_csa / jnp.where(r_per <= ZERO, 1.0, r_per))
    q_down_int = ph.manning_equation(r_csa, m.riv_avg_rough, r_hyd, s_down)
    s_out = m.riv_bed_slope + riv_stage * 2.0 / m.riv_length
    q_out_zdg = ph.manning_equation(r_csa, m.riv_avg_rough, r_hyd, s_out)
    from shud_tpu.config import GRAV

    q_out_crit = r_csa * jnp.sqrt(GRAV * jnp.maximum(riv_stage, 1e-30)) * 60.0
    # lake-bound reaches (down <= -4): zero-depth-gradient Manning into the
    # lake (MD_RiverFlux.cpp:17-24), same precedence as rhs_full
    q_riv_down = jnp.where(
        m.riv_to_lake >= 0, q_out_zdg,
        jnp.where(
            has_down, q_down_int,
            jnp.where(m.riv_outlet_code == -4, q_out_crit, q_out_zdg),
        ),
    )
    q_riv_up = segment_sum(
        jnp.where(has_down, -q_riv_down, 0.0), dn, num_segments=nr
    )
    driv = (-q_riv_up - q_riv_surf0 - q_riv_sub0 - q_riv_down
            + fs.riv_qbc) / top_area
    return jnp.where(m.riv_bc > 0, 0.0, driv)


@dataclasses.dataclass
class UncoupledStates:
    surf: object
    unsat: object
    gw: object
    riv: object
    lake: object = None  # None when the mesh has no lakes


# module-level sub-RHS adapters with STABLE identities: solve_to jits on
# the static `f` argument, so per-window closures would recompile all five
# sub-programs EVERY window (measured: ~8 MB/s of leaked executables and a
# 70x wall penalty on multi-day runs).  Frozen stage states ride in the
# `params` pytree instead; `close_boundary` is baked per-value via
# functools.lru_cache.
from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _split_fns(close_boundary: bool):
    def f1(tt, yy, p):  # surface
        dm, fs, (us0, gw0, riv0, lake0) = p
        return rhs_surf(dm, fs, tt, yy, us0, gw0, riv0, lake0,
                        close_boundary)

    def f2(tt, yy, p):  # unsaturated
        dm, fs, (sf1, gw0) = p
        return rhs_unsat(dm, fs, tt, yy, sf1, gw0, close_boundary)

    def f3(tt, yy, p):  # groundwater
        dm, fs, (sf1, us1, riv0, q_rech0, q_exfil0, evapo0, trans0,
                 lake0) = p
        return rhs_gw(dm, fs, tt, yy, sf1, us1, riv0, q_rech0, q_exfil0,
                      evapo0, trans0, lake0, close_boundary)

    def f4(tt, yy, p):  # river
        dm, fs, (q_riv_surf0, q_riv_sub0) = p
        return rhs_river(dm, fs, tt, yy, q_riv_surf0, q_riv_sub0)

    def f5(tt, yy, p):  # lake
        dm, fs, (sf1, us1, gw1, q_lake_rivin0) = p
        return rhs_lake(dm, fs, tt, yy, sf1, us1, gw1, q_lake_rivin0,
                        close_boundary)

    return f1, f2, f3, f4, f5


def advance_window_uncoupled(dm, fs: ForcingSlice, states: UncoupledStates,
                             t: float, tout: float, cfg: SolverConfig,
                             close_boundary=True):
    """One Gauss-Seidel sweep: surf -> unsat -> gw -> river -> lake, each
    advanced over [t, tout] by its own adaptive implicit solver instance."""
    ne, nr = dm.area.shape[0], dm.riv_length.shape[0]
    has_lake = dm.num_lake > 0 and states.lake is not None
    f1, f2, f3, f4, f5 = _split_fns(bool(close_boundary))

    us0 = jnp.maximum(states.unsat.y, 0.0)
    gw0 = jnp.maximum(states.gw.y, 0.0)
    riv0 = jnp.maximum(states.riv.y, 0.0)
    lake0 = jnp.maximum(states.lake.y, 0.0) if has_lake else None

    # 1) surface
    st1 = solve_to(f1, states.surf, tout,
                   (dm, fs, (us0, gw0, riv0, lake0)), cfg)
    sf1 = jnp.maximum(st1.y, 0.0)

    # 2) unsaturated
    st2 = solve_to(f2, states.unsat, tout, (dm, fs, (sf1, gw0)), cfg)
    us1 = jnp.maximum(st2.y, 0.0)

    # 3) groundwater: freeze recharge/exfil/ET at the staged states
    cu = _cell_update_split(dm, sf1, us1, gw0)
    es, eu, eg, tu, tg, _, _ = et_flux(dm, fs, sf1, us1, gw0, cu.satn)
    qi, qex = flux_infiltration(dm, cu, sf1, us1, gw0, fs.net_prcp)
    q_rech0 = flux_recharge(dm, cu, us1, gw0) * fs.fu_sub
    q_exfil0 = qex * fs.fu_surf
    if has_lake:
        is_lake = dm.i_lake > 0
        q_rech0 = jnp.where(is_lake, 0.0, q_rech0)
        q_exfil0 = jnp.where(is_lake, 0.0, q_exfil0)

    st3 = solve_to(
        f3, states.gw, tout,
        (dm, fs, (sf1, us1, riv0, q_rech0, q_exfil0, es + eu + eg,
                  tu + tg, lake0)), cfg)
    gw1 = jnp.maximum(st3.y, 0.0)

    # 4) river: freeze exchange fluxes at staged states
    cu1 = _cell_update_split(dm, sf1, us1, gw1)
    qi1, qex1 = flux_infiltration(dm, cu1, sf1, us1, gw1, fs.net_prcp)
    q_if1, q_ex1 = qi1 * fs.fu_surf, qex1 * fs.fu_surf
    if has_lake:
        q_if1 = jnp.where(is_lake, 0.0, q_if1)
        q_ex1 = jnp.where(is_lake, 0.0, q_ex1)
    q_seg_s = _seg_surface(dm, fs, sf1, q_if1, q_ex1, riv0)
    q_seg_b = _seg_sub(dm, fs, gw1, cu1.eff_kh, riv0)
    q_riv_surf0 = segment_sum(q_seg_s, dm.seg_riv, num_segments=nr)
    q_riv_sub0 = segment_sum(q_seg_b, dm.seg_riv, num_segments=nr)

    st4 = solve_to(f4, states.riv, tout,
                   (dm, fs, (q_riv_surf0, q_riv_sub0)), cfg)

    # 5) lake: freeze element states and river inflow at staged values
    st5 = states.lake
    if has_lake:
        nl = dm.lake_zmin.shape[0]
        riv1 = jnp.maximum(st4.y, 0.0)
        q_rd1 = _riv_down_frozen(dm, fs, riv1)
        to_lake = dm.riv_to_lake >= 0
        tl = jnp.where(to_lake, dm.riv_to_lake, 0)
        q_lake_rivin0 = segment_sum(
            jnp.where(to_lake, q_rd1, 0.0), tl, num_segments=nl
        )

        st5 = solve_to(f5, states.lake, tout,
                       (dm, fs, (sf1, us1, gw1, q_lake_rivin0)), cfg)

    return UncoupledStates(surf=st1, unsat=st2, gw=st3, riv=st4, lake=st5)


def _riv_down_frozen(m, fs, riv):
    """Downstream discharge at a frozen river stage (the lake-inflow side
    of Flux_RiverDown; only the to-lake entries are consumed)."""
    riv_stage = jnp.where(m.riv_bc > 0, fs.riv_ybc, riv)
    r_csa = jnp.maximum(
        riv_stage * (m.riv_bottom_width + riv_stage * m.riv_bank_slope), 0.0
    )
    r_per = jnp.maximum(
        2.0 * jnp.abs(riv_stage) * jnp.sqrt(1.0 + m.riv_bank_slope**2)
        + m.riv_bottom_width, 0.0,
    )
    r_hyd = jnp.where(r_per <= ZERO, 0.0,
                      r_csa / jnp.where(r_per <= ZERO, 1.0, r_per))
    s_out = m.riv_bed_slope + riv_stage * 2.0 / m.riv_length
    return ph.manning_equation(r_csa, m.riv_avg_rough, r_hyd, s_out)


def init_uncoupled(y0: np.ndarray, ne: int, nr: int, t0: float,
                   cfg: SolverConfig, nl: int = 0) -> UncoupledStates:
    y0 = jnp.asarray(y0)
    return UncoupledStates(
        surf=bdf_init(t0, y0[:ne], cfg),
        unsat=bdf_init(t0, y0[ne : 2 * ne], cfg),
        gw=bdf_init(t0, y0[2 * ne : 3 * ne], cfg),
        riv=bdf_init(t0, y0[3 * ne : 3 * ne + nr], cfg),
        lake=(bdf_init(t0, y0[3 * ne + nr : 3 * ne + nr + nl], cfg)
              if nl > 0 else None),
    )


class _SplitCheckpointShim:
    """Adapter giving the split driver's 5-solver state the
    ``.bdf/.buckets/.cryo/.t`` surface that ``io.checkpoint`` expects
    (the bdf slot holds a dict pytree of the five BDFStates)."""

    def __init__(self, states: UncoupledStates, buckets, t: float):
        self.bdf = {"surf": states.surf, "unsat": states.unsat,
                    "gw": states.gw, "riv": states.riv,
                    "lake": states.lake}
        self.buckets = buckets
        self.cryo = None
        self.t = t

    def states(self) -> UncoupledStates:
        return UncoupledStates(**self.bdf)


def run_project_split(project: str, base: str = ".", end_day=None,
                      verbose=True, outpath=None, calib=None, inp=None,
                      resume=None, **overrides):
    """Operator-split full run (the reference's ``-g`` driver loop,
    shud.cpp:171-357): per window, a Gauss-Seidel sweep of the five
    sub-solvers, then the FULL output stack the reference runs every step
    — ``ExportResults`` + ``FloodWarning`` + ``PrintInit``
    (shud.cpp:316-323) — via the same ``IntervalWriter`` / flood / WB /
    restart / checkpoint machinery as the implicit production driver, so
    a ``-g`` run can be flood-monitored, budget-checked, and resumed.
    ``overrides`` are Control_Data attribute overrides (e.g.
    ``solver_step=60.0``), as in the fast driver."""
    import os
    import time

    import numpy as np

    from shud_tpu.core.rhs import rhs_full
    from shud_tpu.diag.waterbalance import WaterBalance
    from shud_tpu.driver.run_fast import IntervalWriter
    from shud_tpu.driver.simulate import Simulation
    from shud_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from shud_tpu.io.output import FloodAlert, TimeLog, write_restart
    from shud_tpu.io.project import write_calib
    from shud_tpu.utils.errors import NanError

    if end_day is not None:
        overrides.setdefault("day_end", end_day)
    sim = Simulation.create(project, base=base, calib=calib,
                            **overrides) if inp is None else \
        _sim_from_inp(inp, calib, overrides)
    if outpath:
        sim.inp.paths.outpath = outpath
    cs = sim.inp.control
    md, dm = sim.md, sim.dm
    ne, nr, nl = md.num_ele, md.num_riv, md.num_lake
    paths = sim.inp.paths
    os.makedirs(paths.outpath, exist_ok=True)
    t_end = cs.end_time if end_day is None else end_day * 1440.0
    cb = bool(cs.close_boundary)

    states = init_uncoupled(np.asarray(sim.bdf.y), ne, nr, cs.start_time,
                            sim.cfg, nl=nl)
    if resume:
        shim = _SplitCheckpointShim(states, sim.buckets, sim.t)
        load_checkpoint(resume, shim)
        states = shim.states()
        sim.buckets = shim.buckets
        sim.t = float(shim.t)
        if verbose:
            print(f"resumed from {resume} at t={sim.t/1440.0:.2f} days")

    writer = IntervalWriter(sim)
    interval = writer.interval
    flood = FloodAlert(
        os.path.join(paths.outpath, f"{paths.project}.flood.csv"),
        md.riv_depth,
    )
    tlog = TimeLog(os.path.join(paths.outpath, f"{paths.project}.time.csv"))
    wb = WaterBalance(
        md, os.path.join(paths.outpath, f"{paths.project}.wb.basin.csv"))
    write_calib(sim.inp.calib,
                os.path.join(paths.outpath,
                             f"{paths.project}.cfg.calib.bak"))
    paths.save_project_file()
    if os.environ.get("SHUD_DEBUG_TABLES", "0") not in ("0", ""):
        from shud_tpu.io.debugtables import write_debug_tables

        write_debug_tables(md, sim.inp, paths.outpath)

    import jax
    import jax.numpy as jnp

    per_edge = bool(cs.dt_Qe_subx > 0 or cs.dt_Qe_surfx > 0)

    @jax.jit
    def _window_vals(y_dense, fs, cf, ic, snow):
        """Channel values at the composed split state — the same field
        set the fused driver accumulates (fused.py vals_e/_r/_l), one
        diag RHS eval per window (reference ExportResults semantics)."""
        _, d = rhs_full(dm, fs, 0.0, y_dense, close_boundary=cb)
        e_ic = d["e_ic"]
        ve = {
            "y_ic": ic, "y_snow": snow,
            "y_surf": y_dense[:ne], "y_unsat": y_dense[ne:2 * ne],
            "y_gw": y_dense[2 * ne:3 * ne],
            "prcp": cf.prcp, "net_prcp": fs.net_prcp, "etp": cf.etp,
            "eta": e_ic + d["es"] + d["eu"] + d["eg"] + d["tu"] + d["tg"],
            "rn_h": cf.rn_h, "rn_t": cf.rn_t, "rn_factor": cf.rn_factor,
            "q_rech": d["q_rech"], "q_sub_tot": d["q_sub_tot"],
            "q_surf_tot": d["q_surf_tot"], "q_e2r_sub": d["q_e2r_sub"],
            "q_e2r_surf": d["q_e2r_surf"], "q_infil": d["q_infil"],
            "q_exfil": d["q_exfil"], "e_ic": e_ic,
            "trans": d["tu"] + d["tg"],
            "evapo": d["es"] + d["eu"] + d["eg"],
        }
        if per_edge:
            for j in range(3):
                ve[f"q_esub{j}"] = d["q_esub"][:, j]
                ve[f"q_esurf{j}"] = d["q_esurf"][:, j]
        vr = {
            "q_riv_up": d["q_riv_up"], "q_riv_down": d["q_riv_down"],
            "q_riv_sub": d["q_riv_sub"], "q_riv_surf": d["q_riv_surf"],
            "y_riv": y_dense[3 * ne:3 * ne + nr],
        }
        vl = {}
        if nl > 0:
            vl = {
                "y_lake": y_dense[3 * ne + nr:],
                "lake_area": d["lake_area"],
                "q_lake_evap": d["q_lake_evap"],
                "q_lake_prcp": d["q_lake_prcp"],
                "q_lake_rivin": d["q_lake_rivin"],
                "q_lake_surf": d["q_lake_surf"],
                "q_lake_sub": d["q_lake_sub"],
                "q_lake_rivout": jnp.zeros_like(d["lake_area"]),
            }
        return ve, vr, vl

    def _dense(st: UncoupledStates):
        parts = [st.surf.y, st.unsat.y, st.gw.y, st.riv.y]
        if nl > 0:
            parts.append(st.lake.y)
        return jnp.concatenate(parts)

    def _restart(path, t, host_y, ic, snow):
        write_restart(
            path, t, ic, snow, host_y[:ne], host_y[ne:2 * ne],
            host_y[2 * ne:3 * ne], host_y[3 * ne:3 * ne + nr],
            host_y[3 * ne + nr:] if nl else None,
        )

    host0 = jax.device_get({"y": _dense(states), "ic": sim.buckets.ic_stg,
                            "snow": sim.buckets.snow})
    _restart(os.path.join(paths.outpath, f"{paths.project}.cfg.ic.bak"),
             0.0, host0["y"], host0["ic"], host0["snow"])

    from shud_tpu.utils.timectx import TimeContext

    tc = TimeContext(sim.inp.forc.start_yyyymmdd)
    wall0 = time.time()
    cpu0 = time.process_time()
    last_nfe = 0
    t = sim.t
    step = cs.solver_step
    y_host, bk_host = host0["y"], (host0["ic"], host0["snow"])
    while t < t_end - 1e-9:
        this_int = min(interval, t_end - t)
        t0, y0, bk0 = t, y_host, bk_host
        acc_e = acc_r = acc_l = None
        nwin = 0
        while t < t0 + this_int - 1e-9:
            tout = min(t + step, t0 + this_int)
            fs, cf = sim.forcing_slice(tout)
            states = advance_window_uncoupled(dm, fs, states, t, tout,
                                              sim.cfg, close_boundary=cb)
            t = tout
            y_dense = _dense(states)
            ve, vr, vl = _window_vals(y_dense, fs, cf,
                                      sim.buckets.ic_stg,
                                      sim.buckets.snow)
            # one batched fetch per window (as the per-window driver)
            host = jax.device_get({"e": ve, "r": vr, "l": vl,
                                   "y": y_dense})
            nwin += 1
            if acc_e is None:
                acc_e, acc_r, acc_l = host["e"], host["r"], host["l"]
            else:
                acc_e = {k: acc_e[k] + host["e"][k] for k in acc_e}
                acc_r = {k: acc_r[k] + host["r"][k] for k in acc_r}
                acc_l = {k: acc_l[k] + host["l"][k] for k in acc_l}
            flood.check(t, host["r"]["y_riv"], host["r"]["q_riv_down"])
        y_host = host["y"]
        bk_host = (host["e"]["y_ic"], host["e"]["y_snow"])
        mean_e = {k: v / nwin for k, v in acc_e.items()}
        mean_r = {k: v / nwin for k, v in acc_r.items()}
        mean_l = {k: v / nwin for k, v in acc_l.items()}
        writer.write(t, mean_e, mean_r, mean_l)
        wb.interval(t0, t, y0, y_host, mean_e, mean_r, buckets0=bk0,
                    buckets1=bk_host, mean_lake=mean_l if nl else None)
        nfe = sum(int(s.nfe) for s in
                  (states.surf, states.unsat, states.gw, states.riv)) \
            + (int(states.lake.nfe) if nl else 0)
        perc = 100.0 * (t - cs.start_time) / (t_end - cs.start_time)
        if verbose:
            print(f"{tc.iso(t)}\t{t/1440.0:8.2f} day\t{perc:6.2f}%\t"
                  f"{time.time()-wall0:8.2f} s\t{nfe - last_nfe}\t(split)",
                  flush=True)
        tlog.write(t, perc, time.process_time() - cpu0,
                   time.time() - wall0, nfe - last_nfe)
        last_nfe = nfe
        if int(t) % cs.update_ic_step == 0 or t >= t_end - 1e-9:
            if not np.isfinite(y_host).all():
                bad = int(np.flatnonzero(~np.isfinite(y_host))[0])
                raise NanError(
                    f"non-finite state at t={t:.1f} min (index {bad})")
            _restart(
                os.path.join(paths.outpath,
                             f"{paths.project}.cfg.ic.update"),
                t, y_host, bk_host[0], bk_host[1])
            save_checkpoint(
                os.path.join(paths.outpath, f"{paths.project}.ckpt.npz"),
                _SplitCheckpointShim(states, sim.buckets, t))
    writer.close()
    flood.close()
    tlog.close()
    wb.close()
    if verbose:
        print(f"\nFinal stats (split): nfe_total={nfe} "
              f"(surf {int(states.surf.nfe)}, unsat {int(states.unsat.nfe)},"
              f" gw {int(states.gw.nfe)}, riv {int(states.riv.nfe)}"
              + (f", lake {int(states.lake.nfe)}" if nl else "")
              + f"); wall {time.time()-wall0:.1f} s")
    return states


def _sim_from_inp(inp, calib, overrides):
    """Simulation.create for an in-memory ProjectInput (synthetic tests)."""
    import jax.numpy as jnp

    from shud_tpu.core.device import to_device
    from shud_tpu.core.landsurface import BucketState
    from shud_tpu.core.mesh import build_mesh
    from shud_tpu.driver.forcing import build_forcing
    from shud_tpu.driver.init import initial_buckets, initial_state
    from shud_tpu.driver.simulate import Simulation
    from shud_tpu.io.validate import check_input

    if calib is not None:
        inp.calib = calib
    for k, v in overrides.items():
        setattr(inp.control, k, v)
    check_input(inp)
    md = build_mesh(inp)
    dm = to_device(md)
    fr = build_forcing(inp, md)
    cs = inp.control
    cfg = SolverConfig(rtol=cs.reltol, atol=cs.abstol, h_init=cs.init_step,
                       h_max=cs.max_step)
    y0 = initial_state(inp, md)
    ic0, snow0 = initial_buckets(inp, md)
    from shud_tpu.solver.bdf import bdf_init as _bi

    return Simulation(
        inp=inp, md=md, dm=dm, fr=fr, cfg=cfg,
        bdf=_bi(cs.start_time, jnp.asarray(y0), cfg),
        buckets=BucketState(ic_stg=jnp.asarray(ic0),
                            snow=jnp.asarray(snow0)),
        t=cs.start_time,
    )
