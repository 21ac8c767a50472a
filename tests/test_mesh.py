"""Mesh/parameter pipeline vs the reference's exact in-memory constants.

The golden fixtures hold every derived per-entity field read directly from
the reference's data structures after initialisation (tools/gen_golden.py),
so these comparisons pin 1-based indexing, unit conversions, calibration
order, rmSinks, and geometry to 1e-12.
"""

import numpy as np
import pytest

RTOL = 1e-12

ELE_MAP = {
    "area": "area", "x": "x", "y": "y", "z_surf": "z_surf",
    "z_bottom": "z_bottom", "AquiferDepth": "aq_depth",
    "WetlandLevel": "wetland_level", "RootReachLevel": "rootreach_level",
    "MacporeLevel": "macpore_level", "FixPressure": "fix_pressure",
    "infKsatV": "inf_ksat_v", "ThetaS": "theta_s", "ThetaFC": "theta_fc",
    "ThetaR": "theta_r", "Alpha": "alpha", "Beta": "beta",
    "hAreaF": "h_area_f", "macKsatV": "mac_ksat_v", "infD": "inf_d",
    "KsatH": "ksat_h", "KsatV": "ksat_v", "Sy": "sy",
    "geo_vAreaF": "geo_v_area_f", "macKsatH": "mac_ksat_h", "macD": "mac_d",
    "VegFrac": "veg_frac", "Albedo": "albedo", "Rough": "rough",
    "RzD": "rz_d", "nx": "nx", "ny": "ny", "nz": "nz",
    "slopeAngle": "slope_angle", "aspect": "aspect",
    "depression": "depression",
}

RIV_MAP = {
    "Length": "riv_length", "BedSlope": "riv_bed_slope", "depth": "riv_depth",
    "bankslope": "riv_bank_slope", "BottomWidth": "riv_bottom_width",
    "Sinuosity": "riv_sinuosity", "rivRough": "riv_rough", "Cwr": "riv_cwr",
    "KsatH": "riv_ksat_h", "BedThick": "riv_bed_thick",
    "avgRough": "riv_avg_rough", "Dist2DownStream": "riv_dist2down",
}

SEG_MAP = {
    "length": "seg_length", "eqDistance": "seg_eq_dist", "Cwr": "seg_cwr",
    "KsatH": "seg_ksat_h",
}


def _relerr(a, b):
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    return np.max(np.abs(a - b) / (np.abs(b) + 1e-12))


@pytest.mark.parametrize("project", ["ccw", "qhh", "heihe"])
def test_element_fields(project, request):
    g = request.getfixturevalue(f"golden_{project}")
    _, md, _ = request.getfixturevalue(project)
    for ref_name, my_name in ELE_MAP.items():
        err = _relerr(getattr(md, my_name), g[f"ele/{ref_name}"])
        assert err < RTOL, f"{project} ele {ref_name}: relerr={err:.3e}"
    for j in range(3):
        for ref, mine in [
            (f"edge{j}", md.edge[:, j]),
            (f"Dist2Edge{j}", md.dist2edge[:, j]),
            (f"Dist2Nabor{j}", md.dist2nabor[:, j]),
            (f"avgRough{j}", md.avg_rough[:, j]),
        ]:
            err = _relerr(mine, g[f"ele/{ref}"])
            assert err < RTOL, f"{project} ele {ref}: relerr={err:.3e}"
        # neighbour index parity (1-based in reference; <=0 none)
        ref_nabr = g[f"ele/nabr{j}"].astype(int)
        mine = np.where(md.nabr[:, j] >= 0, md.nabr[:, j] + 1, ref_nabr)
        assert np.array_equal(
            np.where(ref_nabr > 0, ref_nabr, 0),
            np.where(md.nabr[:, j] >= 0, mine, 0),
        )


@pytest.mark.parametrize("project", ["ccw", "qhh", "heihe"])
def test_river_and_segment_fields(project, request):
    g = request.getfixturevalue(f"golden_{project}")
    _, md, _ = request.getfixturevalue(project)
    for ref_name, my_name in RIV_MAP.items():
        err = _relerr(getattr(md, my_name), g[f"riv/{ref_name}"])
        assert err < RTOL, f"{project} riv {ref_name}: relerr={err:.3e}"
    assert np.array_equal(md.riv_down_raw, g["riv/down"].astype(int))
    assert np.array_equal(md.riv_bc, g["riv/BC"].astype(int))
    for ref_name, my_name in SEG_MAP.items():
        err = _relerr(getattr(md, my_name), g[f"seg/{ref_name}"])
        assert err < RTOL, f"{project} seg {ref_name}: relerr={err:.3e}"
    assert np.array_equal(md.seg_riv + 1, g["seg/iRiv"].astype(int))
    assert np.array_equal(md.seg_ele + 1, g["seg/iEle"].astype(int))


@pytest.mark.parametrize("project", ["ccw", "qhh"])
def test_lake_topology(project, request):
    g = request.getfixturevalue(f"golden_{project}")
    _, md, _ = request.getfixturevalue(project)
    ref_tolake = g["riv/toLake"].astype(int)
    # reference NA is -9999; ours is -1
    assert np.array_equal(
        np.where(md.riv_to_lake >= 0, md.riv_to_lake, -9999),
        np.where(ref_tolake >= 0, ref_tolake, -9999),
    )
    for j in range(3):
        ref = g[f"ele/lakenabr{j}"].astype(int)  # 1-based lake id, 0 none
        assert np.array_equal(
            np.where(md.lakenabr[:, j] >= 0, md.lakenabr[:, j] + 1, 0), ref
        )


@pytest.mark.parametrize("project", ["ccw", "qhh"])
def test_initial_condition(project, request):
    g = request.getfixturevalue(f"golden_{project}")
    inp, md, _ = request.getfixturevalue(project)
    from shud_tpu.driver.init import initial_state

    y0 = initial_state(inp, md)
    assert _relerr(y0, g["y0"]) < RTOL
