"""Solver verification: toy-problem accuracy, and trajectory consistency of
the adaptive solver against the fixed-step truth mode on the real ccw RHS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shud_tpu.solver.bdf import SolverConfig, bdf_init, solve_to
from shud_tpu.solver.fixed import fixed_bdf1


def test_toy_stiff_accuracy():
    def f(t, y, k):
        return jnp.stack([-k * y[0] + y[1], -0.1 * y[1] + 0.05 * jnp.sin(y[0])])

    from scipy.integrate import solve_ivp

    ref = solve_ivp(
        lambda t, y: np.array([-50.0 * y[0] + y[1],
                               -0.1 * y[1] + 0.05 * np.sin(y[0])]),
        (0, 10), [1.0, 0.5], method="BDF", rtol=1e-10, atol=1e-12,
    )
    cfg = SolverConfig(rtol=1e-6, atol=1e-9, h_max=1e9, h_init=1e-4)
    st = bdf_init(0.0, jnp.array([1.0, 0.5]), cfg)
    st = solve_to(f, st, 10.0, 50.0, cfg)
    assert np.abs(np.asarray(st.y) - ref.y[:, -1]).max() < 1e-4
    assert int(st.nnifails) == 0


def test_fixed_step_matches_adaptive_linear():
    # linear stiff system: both integrators must land on the exact solution
    a = jnp.array([[-8.0, 1.0], [0.5, -3.0]])

    def f(t, y, p):
        return p @ y

    y0 = jnp.array([1.0, -0.5])
    cfg = SolverConfig(rtol=1e-7, atol=1e-10, h_max=1e9, h_init=1e-4)
    st = solve_to(f, bdf_init(0.0, y0, cfg), 2.0, a, cfg)
    _, yf = fixed_bdf1(f, y0, 0.0, a, 1e-4, 20000, 2)
    import scipy.linalg

    exact = scipy.linalg.expm(np.asarray(a) * 2.0) @ np.asarray(y0)
    assert np.abs(np.asarray(st.y) - exact).max() < 1e-5
    assert np.abs(np.asarray(yf) - exact).max() < 1e-3


@pytest.mark.slow
def test_ccw_adaptive_vs_fixed_truth(ccw):
    """Two solver windows on the real ccw problem: the adaptive solver at
    reference tolerances must stay within tolerance-class distance of a
    fine fixed-step truth trajectory."""
    from shud_tpu.core import solar as sol
    from shud_tpu.core.landsurface import cell_forcing, et_bucket_step
    from shud_tpu.core.rhs import rhs
    from shud_tpu.core.state import ForcingSlice
    from shud_tpu.driver.forcing import build_forcing
    from shud_tpu.driver.init import initial_buckets, initial_state
    from shud_tpu.core.landsurface import BucketState

    inp, md, dm = ccw
    fr = build_forcing(inp, md)
    y0 = jnp.asarray(initial_state(inp, md))
    ic0, snow0 = initial_buckets(inp, md)
    buckets = BucketState(ic_stg=jnp.asarray(ic0), snow=jnp.asarray(snow0))

    def make_fs(t):
        sv = jnp.asarray(fr.station_values(t))
        sx, sy, sz, wdt, den = [jnp.asarray(a) for a in fr.tsr_sample(t)]
        fac = sol.tsr_factor(dm.nx, dm.ny, dm.nz, sx, sy, sz, wdt, den,
                             fr.rad_factor_cap, fr.rad_cosz_min)
        cf = cell_forcing(dm, sv, fr.station_z, jnp.asarray(fr.lai_at(t)),
                          jnp.asarray(fr.mf_at(t)), fac, fr.cal)
        return cf

    def f(tt, yy, params):
        mesh, slc = params
        return rhs(mesh, slc, tt, yy)

    ones = jnp.ones_like(dm.nx)
    z = jnp.zeros
    cfg = SolverConfig(rtol=1e-4, atol=1e-4, h_max=10.0, h_init=1e-2)
    st = bdf_init(0.0, y0, cfg)
    y_fix = y0
    bk_a = bk_f = buckets
    for k in range(2):
        t = 10.0 * k
        cf = make_fs(t)
        out_a = et_bucket_step(dm, cf, bk_a, 10.0, fr.cal.c_ismax)
        bk_a = out_a.state
        fs = ForcingSlice(
            net_prcp=out_a.net_prcp, prcp=cf.prcp, pot_evap=cf.pot_evap,
            pot_tran=cf.pot_tran, e_ic=out_a.e_ic, lai=cf.lai,
            fu_surf=ones, fu_sub=ones,
            ele_ybc=z(md.num_ele), ele_qbc=z(md.num_ele),
            ele_qss=z(md.num_ele), riv_ybc=z(md.num_riv),
            riv_qbc=z(md.num_riv),
        )
        st = solve_to(f, st, t + 10.0, (dm, fs), cfg)
        _, y_fix = fixed_bdf1(f, y_fix, t, (dm, fs), 2e-2, 500, 2)

    ne = md.num_ele
    d = np.abs(np.asarray(st.y) - np.asarray(y_fix))
    assert d[2 * ne : 3 * ne].max() < 5e-4  # gw heads within tolerance class
    assert d[3 * ne :].max() < 5e-4  # river stages
    assert int(st.nnifails) == 0


def test_toy_stiff_accuracy_order3():
    """max_order=3: the BDF3 coefficients (Lagrange-derivative form) and
    cubic Hermite predictor integrate the stiff toy correctly and reach
    order 3 on smooth stretches (fewer steps than the order-2 cap at the
    same tolerance)."""
    def f(t, y, k):
        return jnp.stack([-k * y[0] + y[1],
                          -0.1 * y[1] + 0.05 * jnp.sin(y[0])])

    from scipy.integrate import solve_ivp

    ref = solve_ivp(
        lambda t, y: np.array([-50.0 * y[0] + y[1],
                               -0.1 * y[1] + 0.05 * np.sin(y[0])]),
        (0, 10), [1.0, 0.5], method="BDF", rtol=1e-10, atol=1e-12,
    )
    res = {}
    for mo in (2, 3):
        cfg = SolverConfig(rtol=1e-6, atol=1e-9, h_max=1e9, h_init=1e-4,
                           max_order=mo)
        st = bdf_init(0.0, jnp.array([1.0, 0.5]), cfg)
        st = solve_to(f, st, 10.0, 50.0, cfg)
        assert np.abs(np.asarray(st.y) - ref.y[:, -1]).max() < 1e-4, mo
        res[mo] = int(st.nsteps)
    # on a smooth problem the higher order takes fewer steps
    assert res[3] < res[2], res
