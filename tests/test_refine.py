"""Mesh-refinement tests (utils/refine.py).

The refiner feeds the BASELINE.json scaling config ("synthetic 10M-cell
refined mesh", SURVEY.md §7.2 step 6): it must conserve geometry (area,
centroid elevation mass), produce a conforming neighbour graph, and yield a
mesh the full RHS runs on.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from shud_tpu.core.mesh import build_mesh  # noqa: E402
from shud_tpu.io.project import load_project  # noqa: E402
from shud_tpu.utils.refine import refine_project  # noqa: E402

BASE = "/root/reference"


@pytest.fixture(scope="module")
def ccw_pair():
    inp = load_project("ccw", base=BASE)
    md0 = build_mesh(inp)
    r1 = refine_project(load_project("ccw", base=BASE), 1)
    md1 = build_mesh(r1)
    return inp, md0, r1, md1


def test_counts_and_conservation(ccw_pair):
    inp, md0, r1, md1 = ccw_pair
    ne = md0.num_ele
    assert md1.num_ele == 4 * ne
    assert md1.num_riv == md0.num_riv
    assert md1.seg_ele.shape == md0.seg_ele.shape

    # children tile the parent exactly
    child_area = md1.area.reshape(ne, 4).sum(axis=1)
    np.testing.assert_allclose(child_area, md0.area, rtol=1e-12)
    # area-weighted mean surface elevation is conserved by linear midpoint
    # interpolation (before rmSinks, which edits a handful of cells; compare
    # basin totals with a loose tolerance to absorb that)
    tot0 = float((md0.area * md0.z_surf).sum())
    tot1 = float((md1.area * md1.z_surf).sum())
    assert abs(tot1 - tot0) / abs(tot0) < 1e-4


def test_neighbour_graph_conforming(ccw_pair):
    _, _, _, md1 = ccw_pair
    nabr = md1.nabr
    n4 = md1.num_ele
    # reciprocity: if j is my neighbour on some edge, I am j's neighbour
    for i in range(0, n4, max(1, n4 // 200)):  # sample
        for j in nabr[i]:
            if j >= 0:
                assert i in nabr[j], (i, j)
    # boundary edge count: each parent boundary edge splits into 2
    inp0 = load_project("ccw", base=BASE)
    nb0 = int((np.asarray(inp0.tri)[:, 4:7] == 0).sum())
    assert int((nabr < 0).sum() - (md1.lakenabr >= 0).sum()) == 2 * nb0


def test_rhs_runs_on_refined(ccw_pair):
    _, _, r1, md1 = ccw_pair
    from shud_tpu.core.device import to_device
    from shud_tpu.core.rhs import rhs
    from shud_tpu.driver.init import initial_state

    dm = to_device(md1, jnp.float64)
    y0 = jnp.asarray(initial_state(r1, md1))
    from shud_tpu.core.state import ForcingSlice

    ne, nr = md1.num_ele, md1.num_riv
    z = jnp.zeros(ne)
    fs = ForcingSlice(
        net_prcp=z + 1e-6, prcp=z + 1e-6, pot_evap=z + 1e-7,
        pot_tran=z + 1e-7, e_ic=z, lai=z + 1.0,
        fu_surf=z + 1.0, fu_sub=z + 1.0,
        ele_ybc=z, ele_qbc=z, ele_qss=z,
        riv_ybc=jnp.zeros(nr), riv_qbc=jnp.zeros(nr),
    )
    dy = rhs(dm, fs, 0.0, y0)
    assert np.isfinite(np.asarray(dy)).all()
    assert dy.shape == y0.shape


def test_two_levels_synthetic():
    from shud_tpu.utils.synthetic import make_synthetic_project

    inp = make_synthetic_project(nx=8, ny=4)
    ne0 = inp.tri.shape[0]
    r2 = refine_project(inp, 2)
    assert r2.tri.shape[0] == 16 * ne0
    md = build_mesh(r2)
    assert md.num_ele == 16 * ne0
