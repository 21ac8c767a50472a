"""NetCDF forcing adapters + UGRID output, tested on synthesized files
(reference unit rules from NetcdfForcingProvider.cpp)."""

import os

import numpy as np
import pytest

from shud_tpu.io.ncforcing import load_netcdf_forcing, read_kv_cfg
from shud_tpu.io.netcdf import NcDataset, parse_time_units


def _write_grid_nc(path, varname, data, t_hours, units, base="2000-01-01"):
    """NetCDF-4 via h5py with CF attrs (time, lat, lon grids)."""
    import h5py

    nt, nlat, nlon = data.shape
    with h5py.File(path, "w") as f:
        t = f.create_dataset("time", data=np.asarray(t_hours, dtype="f8"))
        t.attrs["units"] = f"hours since {base} 00:00"
        t.make_scale("time")
        la = f.create_dataset("lat", data=np.linspace(39.0, 40.0, nlat))
        la.make_scale("lat")
        lo = f.create_dataset("lon", data=np.linspace(-123.0, -122.0, nlon))
        lo.make_scale("lon")
        v = f.create_dataset(varname, data=data)
        v.attrs["units"] = units
        v.dims[0].attach_scale(t)
        v.dims[1].attach_scale(la)
        v.dims[2].attach_scale(lo)


def test_parse_time_units():
    base, fac = parse_time_units("hours since 2000-01-01 00:00")
    assert fac == 60.0
    base2, fac2 = parse_time_units("days since 2000-01-02")
    assert base2 - base == 1440.0
    assert fac2 == 1440.0


def test_cmfd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    nt, nlat, nlon = 8, 3, 4
    t_hours = np.arange(nt) * 3.0
    fields = {
        "prec": (rng.uniform(0, 2e-4, (nt, nlat, nlon)), "kg m-2 s-1"),
        "temp": (rng.uniform(270, 290, (nt, nlat, nlon)), "K"),
        "shum": (rng.uniform(0.001, 0.01, (nt, nlat, nlon)), "kg/kg"),
        "srad": (rng.uniform(0, 600, (nt, nlat, nlon)), "W m-2"),
        "wind": (rng.uniform(0, 8, (nt, nlat, nlon)), "m s-1"),
        "pres": (rng.uniform(8e4, 1e5, (nt, nlat, nlon)), "Pa"),
    }
    for name, (data, units) in fields.items():
        _write_grid_nc(str(tmp_path / f"{name}_200001.nc"), name, data,
                       t_hours, units)
    cfg = tmp_path / "input" / "prj" / "forcing.cfg"
    cfg.parent.mkdir(parents=True)
    cfg.write_text(
        "PRODUCT CMFD2\n"
        f"DATA_ROOT {tmp_path}\n"
        "LAYOUT_FILE_PATTERN {var_lower}_{yyyymm}.nc\n"
        "NC_VAR_PREC prec\nNC_VAR_TEMP temp\nNC_VAR_SHUM shum\n"
        "NC_VAR_SRAD srad\nNC_VAR_WIND wind\nNC_VAR_PRES pres\n"
    )
    stations = np.array([[-122.4, 39.4, 100.0]])
    fc = load_netcdf_forcing(str(cfg), stations, 20000101, 0.0, 1440.0)
    assert len(fc.t_min[0]) == nt
    assert np.allclose(fc.t_min[0], t_hours * 60.0)
    # verify conversions at the selected grid point
    lat = np.linspace(39.0, 40.0, nlat)
    lon = np.linspace(-123.0, -122.0, nlon)
    ilat = np.argmin(np.abs(lat - 39.4))
    ilon = np.argmin(np.abs(lon + 122.4))
    prec = fields["prec"][0][:, ilat, ilon]
    temp = fields["temp"][0][:, ilat, ilon]
    shum = fields["shum"][0][:, ilat, ilon]
    pres = fields["pres"][0][:, ilat, ilon]
    exp_prcp = np.round(prec * 86400.0, 4)
    exp_prcp[exp_prcp < 1e-4] = 0.0
    assert np.allclose(fc.data[0][:, 0], exp_prcp)
    assert np.allclose(fc.data[0][:, 1], np.round(temp - 273.15, 2))
    rh = 0.263 * pres * shum / np.exp(
        17.67 * (temp - 273.15) / (temp - 29.65)
    )
    rh = np.round(np.clip(rh, 0, 100) / 100.0, 4)
    assert np.allclose(fc.data[0][:, 2], rh)


def test_era5_accumulated_decode(tmp_path):
    nt, nlat, nlon = 24, 2, 2
    t_hours = np.arange(nt, dtype=float)
    rng = np.random.default_rng(1)
    rates = rng.uniform(0, 2e-4, nt)  # m per hour
    tp = np.cumsum(rates)[:, None, None] * np.ones((1, nlat, nlon))
    ssr = np.cumsum(rng.uniform(0, 2e6, nt))[:, None, None] * np.ones(
        (1, nlat, nlon)
    )
    fields = {
        "t2m": np.full((nt, nlat, nlon), 283.15),
        "d2m": np.full((nt, nlat, nlon), 278.15),
        "u10": np.full((nt, nlat, nlon), 3.0),
        "v10": np.full((nt, nlat, nlon), 4.0),
        "tp": tp,
        "ssr": ssr,
    }
    import h5py

    path = tmp_path / "era5_20000101.nc"
    with h5py.File(path, "w") as f:
        t = f.create_dataset("time", data=t_hours)
        t.attrs["units"] = "hours since 2000-01-01 00:00"
        t.make_scale("time")
        la = f.create_dataset("lat", data=np.array([39.0, 40.0]))
        la.make_scale("lat")
        lo = f.create_dataset("lon", data=np.array([-123.0, -122.0]))
        lo.make_scale("lon")
        for name, data in fields.items():
            v = f.create_dataset(name, data=data)
            v.dims[0].attach_scale(t)
    cfg = tmp_path / "input" / "prj" / "forcing.cfg"
    cfg.parent.mkdir(parents=True)
    cfg.write_text(
        "PRODUCT ERA5\n"
        f"DATA_ROOT {tmp_path}\n"
        "LAYOUT_FILE_PATTERN era5_{yyyymmdd}.nc\n"
        "NC_VAR_T2M t2m\nNC_VAR_D2M d2m\nNC_VAR_U10 u10\nNC_VAR_V10 v10\n"
        "NC_VAR_TP tp\nNC_VAR_SSR ssr\n"
    )
    stations = np.array([[-122.5, 39.5, -9999.0]])
    fc = load_netcdf_forcing(str(cfg), stations, 20000101, 0.0, 1440.0)
    d = fc.data[0]
    # wind = hypot(3,4) = 5
    assert np.allclose(d[:, 3], 5.0)
    # precip from accumulated tp increments: rate[k+1] m/hr -> mm/day
    exp = np.round(rates[1:] * 1000.0 * 24.0, 4)
    exp[exp < 1e-4] = 0.0
    assert np.allclose(d[:-1, 0], exp)
    # RH from dewpoint Magnus: ea(5C)/es(10C)
    es = 6.112 * np.exp(17.67 * 10.0 / (10.0 + 243.5))
    ea = 6.112 * np.exp(17.67 * 5.0 / (5.0 + 243.5))
    assert abs(d[0, 2] - round(ea / es, 4)) < 1e-9


def test_gldas_roundtrip(tmp_path):
    """GLDAS per-timestep file layout (NetcdfForcingProvider.cpp GLDAS
    branches): one file per 3-hour step, kg/m2/s precip -> mm/day, RH
    from specific humidity with the CMFD formula (cpp:1500,2344)."""
    rng = np.random.default_rng(2)
    nlat, nlon = 3, 4
    nsteps = 8  # one simulated day at 3-hourly steps
    fields = {}
    for step in range(nsteps):
        fields[step] = {
            "Rainf_f_tavg": (rng.uniform(0, 2e-4, (1, nlat, nlon)),
                             "kg m-2 s-1"),
            "Tair_f_inst": (rng.uniform(260, 290, (1, nlat, nlon)), "K"),
            "Qair_f_inst": (rng.uniform(0.001, 0.01, (1, nlat, nlon)),
                            "kg kg-1"),
            "SWdown_f_tavg": (rng.uniform(0, 900, (1, nlat, nlon)),
                              "W m-2"),
            "Wind_f_inst": (rng.uniform(0, 9, (1, nlat, nlon)), "m s-1"),
            "Psurf_f_inst": (rng.uniform(8e4, 1e5, (1, nlat, nlon)), "Pa"),
        }
    import h5py

    (tmp_path / "2000" / "001").mkdir(parents=True)
    for step in range(nsteps):
        hhmm = f"{step * 3:02d}00"
        path = (tmp_path / "2000" / "001"
                / f"GLDAS_NOAH025_3H.A20000101.{hhmm}.021.nc4")
        with h5py.File(path, "w") as f:
            t = f.create_dataset("time", data=np.array([step * 3.0]))
            t.attrs["units"] = "hours since 2000-01-01 00:00"
            t.make_scale("time")
            la = f.create_dataset("lat", data=np.linspace(39.0, 40.0, nlat))
            la.make_scale("lat")
            lo = f.create_dataset("lon",
                                  data=np.linspace(-123.0, -122.0, nlon))
            lo.make_scale("lon")
            for name, (data, units) in fields[step].items():
                v = f.create_dataset(name, data=data)
                v.attrs["units"] = units
                v.dims[0].attach_scale(t)
                v.dims[1].attach_scale(la)
                v.dims[2].attach_scale(lo)
    cfg = tmp_path / "input" / "prj" / "forcing.cfg"
    cfg.parent.mkdir(parents=True)
    cfg.write_text(
        "PRODUCT GLDAS\n"
        f"DATA_ROOT {tmp_path}\n"
        "LAYOUT_FILE_PATTERN "
        "{year}/{doy}/GLDAS_NOAH025_3H.A{yyyymmdd}.{hhmm}.021.nc4\n"
        "NC_VAR_PREC Rainf_f_tavg\nNC_VAR_TEMP Tair_f_inst\n"
        "NC_VAR_SHUM Qair_f_inst\nNC_VAR_SRAD SWdown_f_tavg\n"
        "NC_VAR_WIND Wind_f_inst\nNC_VAR_PRES Psurf_f_inst\n"
    )
    stations = np.array([[-122.4, 39.4, 100.0],
                         [-122.9, 39.9, 450.0]])
    fc = load_netcdf_forcing(str(cfg), stations, 20000101, 0.0, 1440.0)
    assert fc.num_stations == 2
    # 3-hourly step-function time axis in minutes
    np.testing.assert_allclose(fc.t_min[0], np.arange(nsteps) * 180.0)
    lat = np.linspace(39.0, 40.0, nlat)
    lon = np.linspace(-123.0, -122.0, nlon)
    for s, (slon, slat, _z) in enumerate(stations):
        ilat = np.argmin(np.abs(lat - slat))
        ilon = np.argmin(np.abs(lon - slon))
        prec = np.array([fields[k]["Rainf_f_tavg"][0][0, ilat, ilon]
                         for k in range(nsteps)])
        temp = np.array([fields[k]["Tair_f_inst"][0][0, ilat, ilon]
                         for k in range(nsteps)])
        shum = np.array([fields[k]["Qair_f_inst"][0][0, ilat, ilon]
                         for k in range(nsteps)])
        pres = np.array([fields[k]["Psurf_f_inst"][0][0, ilat, ilon]
                         for k in range(nsteps)])
        wind = np.array([fields[k]["Wind_f_inst"][0][0, ilat, ilon]
                         for k in range(nsteps)])
        # kg/m2/s * 86400 -> mm/day, with AutoSHUD quantisation
        exp_prcp = np.round(prec * 86400.0, 4)
        exp_prcp[exp_prcp < 1e-4] = 0.0
        np.testing.assert_allclose(fc.data[s][:, 0], exp_prcp)
        np.testing.assert_allclose(fc.data[s][:, 1],
                                   np.round(temp - 273.15, 2))
        rh = 0.263 * pres * shum / np.exp(
            17.67 * (temp - 273.15) / (temp - 29.65)
        )
        rh = np.round(np.clip(rh, 0, 100) / 100.0, 4)
        np.testing.assert_allclose(fc.data[s][:, 2], rh)
        np.testing.assert_allclose(fc.data[s][:, 3],
                                   np.maximum(np.round(wind, 2), 0.05))


def test_ugrid_output(tmp_path, ccw):
    inp, md, _ = ccw
    from shud_tpu.io.ncoutput import UgridSink

    node_xyz = inp.nodes[:, 1:4]
    face_nodes = inp.tri[:, 1:4]
    sink = UgridSink(str(tmp_path / "out.nc"), md, "ele", node_xyz,
                     face_nodes, 20000101)
    sink.add_channel("eleygw", units="m")
    for k in range(3):
        sink.write("eleygw", 1440.0 * k, np.full(md.num_ele, float(k)))
    sink.close()
    import h5py

    with h5py.File(tmp_path / "out.nc") as f:
        assert f["eleygw"].shape == (3, md.num_ele)
        assert list(f["time"][:]) == [0.0, 1440.0, 2880.0]
        assert f["mesh_face_nodes"].shape == (md.num_ele, 3)


def test_ugrid_crs_and_lake_sink(tmp_path, qhh):
    """CRS variable (NetcdfOutputContext.cpp:446-460) and the lake sink
    (createLakeSink, NetcdfOutputContext.cpp:1203-1205) that round 1
    omitted: the crs scalar carries the WKT as spatial_ref/crs_wkt attrs,
    channels reference it via grid_mapping, and a lake-kind sink appends
    per-lake records."""
    import h5py

    from shud_tpu.io.ncoutput import UgridSink, read_ncoutput_cfg

    inp, md, dm = qhh
    wkt = 'PROJCS["WGS 84 / UTM zone 47N",GEOGCS["WGS 84"]]'
    sink = UgridSink(str(tmp_path / "lak.nc"), md, "lake",
                     start_yyyymmdd=20000101, crs_wkt=wkt)
    sink.add_channel("lakystage", units="m")
    sink.write("lakystage", 0.0, np.arange(md.num_lake, dtype=float))
    sink.write("lakystage", 1440.0, np.arange(md.num_lake, dtype=float) + 1)
    sink.close()
    with h5py.File(str(tmp_path / "lak.nc")) as f:
        assert f["crs"].attrs["spatial_ref"] == wkt
        assert f["crs"].attrs["crs_wkt"] == wkt
        assert f["lakystage"].attrs["grid_mapping"] == "crs"
        assert f["lakystage"].shape == (2, md.num_lake)
        np.testing.assert_allclose(f["time"][:], [0.0, 1440.0])

    # cfg parsing: CRS_WKT resolved relative to the cfg file's directory
    (tmp_path / "epsg.wkt").write_text(wkt)
    (tmp_path / "nc.cfg").write_text("CRS_WKT epsg.wkt\nOUT_DIR out\n")
    cfg = read_ncoutput_cfg(str(tmp_path / "nc.cfg"))
    assert cfg["CRS_WKT_TEXT"] == wkt
    assert cfg["OUT_DIR"] == "out"
