"""Post-processing toolkit (shud_tpu.analysis) and Debug_Table exports."""

import os

import numpy as np
import pytest

from shud_tpu.analysis import Run, nse, ts2daily
from shud_tpu.core.mesh import build_mesh
from shud_tpu.io.debugtables import write_debug_tables
from shud_tpu.io.output import PrintCtrl, read_dat
from shud_tpu.utils.synthetic import make_synthetic_project

REFERENCE = "/root/reference"


def test_ts2daily_means():
    t = np.arange(0, 2880, 60, dtype=float)  # 2 days hourly
    v = np.ones((48, 2))
    v[24:, :] = 3.0
    days, m = ts2daily(t, v)
    np.testing.assert_array_equal(days, [0.0, 1.0])
    np.testing.assert_allclose(m, [[1.0, 1.0], [3.0, 3.0]])


def test_nse():
    obs = np.array([1.0, 2.0, 3.0, 4.0])
    assert nse(obs, obs) == 1.0
    assert nse(np.full(4, obs.mean()), obs) == pytest.approx(0.0)
    assert nse(obs[::-1], obs) < 0.0


def test_run_readout_roundtrip(tmp_path):
    """PrintCtrl-written channel -> analysis.Run.readout."""
    out = tmp_path / "syn.out"
    pc = PrintCtrl(str(out / "syn.rivqdown"), 20000101, 1440, True, 3)
    rng = np.random.default_rng(0)
    vals = rng.uniform(0, 5, (48, 3))
    for k in range(48):
        pc.push((k + 1) * 30.0, vals[k])
    pc.close()
    run = Run("syn", inpath=str(tmp_path), outpath=str(out))
    t, q = run.readout("rivqdown")
    assert t.shape == (1,)  # one full day flushed
    # interval mean x1440 (flux scaling), left-endpoint timestamp
    np.testing.assert_allclose(q[0], vals[:48].mean(axis=0) * 1440.0)


@pytest.mark.skipif(not os.path.isdir(f"{REFERENCE}/input/ccw"),
                    reason="reference inputs unavailable")
def test_run_outlets_and_area_ccw():
    run = Run("ccw", inpath=f"{REFERENCE}/input/ccw", outpath="/nonexistent")
    assert run.area() > 1e6  # ccw is a ~80 km^2 watershed
    outs = run.outlets()
    assert len(outs) >= 1
    t_o, qo = run.obs()
    assert len(t_o) > 1000  # 10-year gauge record


def test_debug_tables(tmp_path):
    inp = make_synthetic_project(8, 6)
    md = build_mesh(inp)
    paths = write_debug_tables(md, inp, str(tmp_path))
    assert len(paths) == 2  # element + river (no lakes)
    with open(paths[0]) as f:
        header = f.readline().split("\t")
        rows = f.readlines()
    assert len(rows) == md.num_ele
    assert "KsatH" in header and "nabr0" in header
    # spot-check: area column round-trips
    i_area = header.index("area")
    a0 = float(rows[0].split("\t")[i_area])
    assert a0 == pytest.approx(float(md.area[0]), rel=1e-5)
    with open(paths[1]) as f:
        rheader = f.readline().split("\t")
        rrows = f.readlines()
    assert len(rrows) == md.num_riv
    assert "BedSlope" in rheader


def test_cma_es_quadratic():
    """CMA-ES (utils/calibrate.py) converges on a shifted quadratic."""
    import numpy as np

    from shud_tpu.utils.calibrate import cma_es

    target = np.array([1.7, 0.4, 3.1])

    def f(x):
        return float(np.sum((x - target) ** 2))

    x, fb, hist = cma_es(f, np.ones(3), sigma0=0.5, max_gen=40, seed=2)
    assert fb < 1e-3, f"best {fb} at {x}"
    assert hist[-1] <= hist[0]


def test_calib_from_vector_roundtrip():
    from shud_tpu.utils.calibrate import calib_from_vector

    gc = calib_from_vector(["geol_ksath", "soil_kinf"], [2.5, 0.7])
    assert gc.geol_ksath == 2.5 and gc.soil_kinf == 0.7


def test_published_calibration_goldens():
    """Both published ccw calibration vectors parse and respect their
    documented regimes (docs/VALIDATION.md round 4): the unconstrained
    hydrograph optimum, and the water-balance-constrained vector whose
    ET multiplier must stay inside the physical bounds it was searched
    under (et_etp in [0.5, 2.0], ts_prcp in [0.89, 1.32])."""
    import os

    from shud_tpu.io.project import read_calib

    gdir = os.path.join(os.path.dirname(__file__), "golden")
    opt = read_calib(os.path.join(gdir, "ccw.cfg.calib.opt"))
    wb = read_calib(os.path.join(gdir, "ccw.cfg.calib.wb.opt"))
    # the unconstrained optimum is the effective-parameter regime
    assert opt.et_etp > 2.0
    # the constrained vector is physical by construction
    assert 0.5 <= wb.et_etp <= 2.0
    assert 0.89 <= wb.ts_prcp <= 1.32
    for gc in (opt, wb):
        assert gc.geol_ksath > 0 and gc.soil_kinf > 0
        assert gc.riv_rough > 0 and gc.lc_rough > 0
