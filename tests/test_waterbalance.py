"""Water-balance subsystem: the full 9-column basin budget
(WaterBalanceDiag.cpp:440-530 parity + lake storage beyond the reference).

Covers the terms the round-1 build hardcoded to zero: open-boundary edge
drainage (Qedge), flux-BC and source/sink injection (QBC/QSS), and lake
bathymetry storage (qhh closure).
"""

import os

import numpy as np
import pytest

from shud_tpu.diag.waterbalance import (
    WaterBalance,
    lake_toparea_np,
    lake_volume_m3,
)
from shud_tpu.utils.synthetic import make_synthetic_project


def test_lake_volume_derivative(qhh):
    """dV/dstage must equal the RHS's stage->area function A(stage)
    (chain-rule consistency: the budget closes only if the storage model
    integrates exactly the area the lake dStage/dt divides by)."""
    inp, md, dm = qhh
    rng = np.random.default_rng(0)
    for stg in rng.uniform(0.5, 8.0, 4):
        stages = np.full(md.num_lake, stg)
        eps = 1e-4
        v1 = lake_volume_m3(md, stages + eps, n=4096)
        v0 = lake_volume_m3(md, stages - eps, n=4096)
        dv = (v1 - v0) / (2 * eps)
        a = lake_toparea_np(md, stages).sum()
        assert abs(dv - a) / a < 1e-3, (stg, dv, a)


def test_wb_open_boundary_synthetic(tmp_path, monkeypatch):
    """Open-boundary (CloseBoundary=0) synthetic watershed: the basin
    budget closes to <1% only if the kinematic edge drainage Qedge is
    integrated — the round-1 build hardcoded qedge=0
    (basinBoundaryEdgeOutflow_m3min parity)."""
    monkeypatch.setenv("SHUD_WB_DIAG", "1")
    from shud_tpu.driver.run_fast import run_project_fast

    inp = make_synthetic_project(12, 6, end_day=2.0)
    inp.control.close_boundary = 0
    # start everything wet so boundary drainage actually flows
    inp.ic_gw_frac = getattr(inp, "ic_gw_frac", None)
    out = str(tmp_path / "syn.out")
    run_project_fast("synthetic", inp=inp, end_day=2.0, verbose=False,
                     outpath=out)
    rows = np.genfromtxt(os.path.join(out, "synthetic.wb.basin.csv"),
                         delimiter=",", names=True)
    rows = np.atleast_1d(rows)
    qedge = float(np.sum(rows["Qedge_m3"]))
    assert qedge > 0.0, "open boundary must drain through edges"
    res = np.abs(rows["residual_rel"])
    assert res.max() < 0.01, rows


@pytest.mark.slow
def test_wb_qhh_lakes(tmp_path, monkeypatch):
    """qhh (3 lakes, 688 lake cells): with lake bathymetry storage and
    lake P/E terms the budget closes to <1% — the round-1 build omitted
    lake storage entirely."""
    monkeypatch.setenv("SHUD_WB_DIAG", "1")
    from shud_tpu.driver.run_fast import run_project_fast

    out = str(tmp_path / "qhh.out")
    # qhh's cfg starts at day 1 (START 1) — run through day 2 for one
    # full daily interval
    run_project_fast("qhh", base="/root/reference", end_day=2.0,
                     verbose=False, outpath=out)
    rows = np.atleast_1d(np.genfromtxt(
        os.path.join(out, "qhh.wb.basin.csv"), delimiter=",", names=True))
    res = np.abs(rows["residual_rel"])
    assert res.max() < 0.01, rows


def test_wb_source_sink_terms():
    """QSS column: a constant source injected via iSS enters the budget
    (WaterBalanceDiag.cpp:480-482 parity).  Runs one interval of the
    synthetic watershed with an injected SS flux through the ForcingSlice
    and checks the quadrature picks it up exactly."""
    import jax.numpy as jnp

    from shud_tpu.core.device import to_device
    from shud_tpu.core.mesh import build_mesh
    from shud_tpu.core.rhs import rhs
    from shud_tpu.core.state import ForcingSlice

    inp = make_synthetic_project(8, 4, end_day=1.0)
    md = build_mesh(inp)
    # mark two cells as source/sink receivers
    md.i_ss[3] = 1
    md.i_ss[10] = -1
    dm = to_device(md)
    ne, nr = md.num_ele, md.num_riv
    qss_vals = np.zeros(ne)
    qss_vals[3] = 5.0  # m3/min into surface
    qss_vals[10] = -2.0  # m3/min out of groundwater
    fs = ForcingSlice(
        net_prcp=jnp.zeros(ne), prcp=jnp.zeros(ne),
        pot_evap=jnp.zeros(ne), pot_tran=jnp.zeros(ne),
        e_ic=jnp.zeros(ne), lai=jnp.zeros(ne),
        fu_surf=jnp.ones(ne), fu_sub=jnp.ones(ne),
        ele_ybc=jnp.zeros(ne), ele_qbc=jnp.zeros(ne),
        ele_qss=jnp.asarray(qss_vals),
        riv_ybc=jnp.zeros(nr), riv_qbc=jnp.zeros(nr),
    )
    rng = np.random.default_rng(1)
    y = np.concatenate([
        rng.uniform(0, 0.01, ne), rng.uniform(0, 2.0, ne),
        rng.uniform(0, 5.0, ne), rng.uniform(0, 1.0, nr),
    ])
    dy = np.asarray(rhs(dm, fs, 0.0, jnp.asarray(y)))
    # storage rate = sum over states (scaled) must equal the injected net
    # SS when all other forcings are zero... laterals redistribute only;
    # here we check the direct injection appears in the dY of the marked
    # cells with the right sign and magnitude
    dsf = dy[:ne]
    dgw = dy[2 * ne : 3 * ne]
    base = np.asarray(rhs(dm, fs._replace(ele_qss=jnp.zeros(ne)), 0.0,
                          jnp.asarray(y)))
    d_inj_sf = (dsf[3] - base[3]) * md.area[3]
    d_inj_gw = (dgw[10] - base[2 * ne + 10]) * md.area[10] * md.sy[10]
    np.testing.assert_allclose(d_inj_sf, 5.0, rtol=1e-12)
    np.testing.assert_allclose(d_inj_gw, -2.0, rtol=1e-12)
