"""Forcing transform / PET / TSR / ET-bucket parity vs the oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from shud_tpu.core import solar as sol
from shud_tpu.core.landsurface import (
    BucketState,
    CalibScalars,
    cell_forcing,
    et_bucket_step,
)


def _cal(inp):
    return CalibScalars(*[
        jnp.asarray(v) for v in (
            inp.calib.ts_prcp, inp.calib.ts_sfctmp_add, inp.calib.ts_lai,
            inp.calib.ts_mf, inp.calib.et_etp, inp.calib.lc_ismax,
        )
    ])


def _forcing_at(inp, dm, t, samples):
    sx, sy, sz, wdt, den = samples
    ft = inp.forc.t_min[0]
    ki = np.searchsorted(ft, t, side="right") - 1
    fac = sol.tsr_factor(
        dm.nx, dm.ny, dm.nz,
        jnp.asarray(sx[ki]), jnp.asarray(sy[ki]), jnp.asarray(sz[ki]),
        jnp.asarray(wdt[ki]), jnp.asarray(den[ki]),
        inp.control.rad_factor_cap, inp.control.rad_cosz_min,
    )
    return cell_forcing(
        dm,
        jnp.asarray(inp.forc.data[0][ki : ki + 1]),
        jnp.asarray(inp.forc.xyz[:, 2]),
        jnp.asarray(inp.lai[np.searchsorted(inp.lai_t, t, "right") - 1]),
        jnp.asarray(inp.mf[np.searchsorted(inp.mf_t, t, "right") - 1]),
        fac, _cal(inp),
    )


@pytest.fixture(scope="module")
def ccw_samples(ccw):
    inp, md, dm = ccw
    ft = inp.forc.t_min[0]
    t1 = np.concatenate([ft[1:], [ft[-1] + (ft[-1] - ft[-2])]])
    return sol.interval_samples(
        ft, t1, inp.control.tsr_integration_step_min,
        float(inp.forc.lat[0]), float(inp.forc.lon[0]),
        inp.forc.start_yyyymmdd,
    )


def test_solar_position(golden_ccw, ccw):
    inp, _, _ = ccw
    g = golden_ccw
    ts = g["solar/t"]
    doy_tab = sol.day_of_year_table(inp.forc.start_yyyymmdd, 10)
    doy = jnp.asarray(doy_tab[(ts // 1440).astype(int)])
    c, a, d = sol.solar_position(jnp.asarray(ts), doy, 39.195, -122.71, 0.0)
    assert np.abs(np.asarray(c) - g["solar/cosz"]).max() < 1e-12
    assert np.abs(np.asarray(a) - g["solar/az"]).max() < 1e-12
    assert np.abs(np.asarray(d) - g["solar/decl"]).max() < 1e-12


FORC_MAP = {
    "t_prcp": "prcp", "t_temp": "temp", "t_rh": "rh", "t_wind": "wind",
    "t_rn": "rn", "t_lai": "lai", "t_mf": "mf", "qPotEvap": "pot_evap",
    "qPotTran": "pot_tran", "qEleETP": "etp", "ele_rn_factor": "rn_factor",
    "ele_rn_h_wm2": "rn_h", "ele_rn_t_wm2": "rn_t",
}


def test_cell_forcing_ccw(golden_ccw, ccw, ccw_samples):
    inp, md, dm = ccw
    g = golden_ccw
    for k, t in enumerate(g["times"]):
        cf = _forcing_at(inp, dm, float(t), ccw_samples)
        for ref_name, my_name in FORC_MAP.items():
            ref = g[f"forc{k}/{ref_name}"]
            mine = np.asarray(getattr(cf, my_name))
            err = np.abs(mine - ref).max()
            assert err < 1e-15 + 1e-9 * np.abs(ref).max(), (
                f"t={t} {ref_name}: {err:.3e}"
            )


def test_et_bucket_ccw(golden_ccw, ccw, ccw_samples):
    """Sequential bucket update parity (state carried between the golden
    sample times, matching how gen_golden drove the oracle)."""
    inp, md, dm = ccw
    g = golden_ccw
    dt = float(g["et_dt"])
    bs = BucketState(
        ic_stg=jnp.asarray(g["et/ic0"]), snow=jnp.asarray(g["et/snow0"])
    )
    cal = _cal(inp)
    for k, t in enumerate(g["times"]):
        cf = _forcing_at(inp, dm, float(t), ccw_samples)
        out = et_bucket_step(dm, cf, bs, dt, cal.c_ismax)
        bs = out.state
        for name, mine in [
            ("yEleSnow", out.state.snow), ("yEleIS", out.state.ic_stg),
            ("qEleNetPrep", out.net_prcp), ("qEleE_IC", out.e_ic),
        ]:
            ref = g[f"et{k}/{name}"]
            err = np.abs(np.asarray(mine) - ref).max()
            assert err < 1e-12, f"t={t} {name}: {err:.3e}"


class TestETModes:
    """ET_Mode 1/2 (Hargreaves / Priestley-Taylor).  The reference declares
    these (Model_Control.hpp:184-187; PET functions is_sm_et.cpp:3-30) but
    never wires them into tReadForcing; shud_tpu makes all three modes
    functional."""

    def test_hargreaves_forcing_columns(self):
        from shud_tpu.core.mesh import build_mesh
        from shud_tpu.driver.forcing import build_forcing
        from shud_tpu.io.project import load_project

        inp = load_project("ccw", base="/root/reference")
        inp.control.et_mode = 1
        md = build_mesh(inp)
        fr = build_forcing(inp, md)
        assert fr.et_mode == 1
        assert fr.fvals.shape[2] == 8
        tmax, tmin, h0 = fr.fvals[:, :, 5], fr.fvals[:, :, 6], fr.fvals[:, :, 7]
        assert (tmax >= tmin - 1e-12).all()
        # daily extremes bound the instantaneous temperature
        assert (fr.fvals[:, :, 1] <= tmax + 1e-9).all()
        assert (fr.fvals[:, :, 1] >= tmin - 1e-9).all()
        # extraterrestrial radiation: plausible band at ccw latitude (39 N)
        assert (h0 > 5.0).all() and (h0 < 50.0).all()

    @pytest.mark.parametrize("mode", [1, 2])
    def test_modes_produce_pet(self, mode):
        import jax.numpy as jnp

        from shud_tpu.core.device import to_device
        from shud_tpu.core.landsurface import cell_forcing
        from shud_tpu.core.mesh import build_mesh
        from shud_tpu.driver.forcing import build_forcing
        from shud_tpu.io.project import load_project

        inp = load_project("ccw", base="/root/reference")
        inp.control.et_mode = mode
        md = build_mesh(inp)
        fr = build_forcing(inp, md)
        dm = to_device(md, jnp.float64)
        # midsummer mid-afternoon LOCAL time (ccw lon -122.7 = UTC-8; the
        # forcing clock is UTC): radiation-driven PET must be positive
        t = 1440.0 * 172 + 22.0 * 60.0
        sv = jnp.asarray(fr.station_values(t))
        cf = cell_forcing(dm, sv, fr.station_z, jnp.asarray(fr.lai_at(t)),
                          jnp.asarray(fr.mf_at(t)), jnp.ones(md.num_ele),
                          fr.cal, terrain_radiation=False, et_mode=mode)
        etp = np.asarray(cf.etp)
        assert np.isfinite(etp).all()
        assert (etp >= 0).all()
        assert etp.max() > 0.0
        # PET stays within a physically plausible band (< 30 mm/day)
        assert etp.max() * 1440.0 * 1000.0 < 30.0

        # mode 0 (PM) on the same inputs differs (different formula)
        cf0 = cell_forcing(dm, sv[:, :5], fr.station_z,
                           jnp.asarray(fr.lai_at(t)),
                           jnp.asarray(fr.mf_at(t)), jnp.ones(md.num_ele),
                           fr.cal, terrain_radiation=False, et_mode=0)
        assert not np.allclose(np.asarray(cf0.etp), etp)
