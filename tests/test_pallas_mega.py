"""Whole-RHS megakernel (core/pallas_mega.py) vs the XLA RHS.

Interpret mode on the CPU backend; f32 on both sides so the only expected
differences are transcendental lowering (cbrt/pow as exp-log, <=2 ulp) and
reduction order (fixed-width gather lists vs segment_sum).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shud_tpu.core.device import to_device
from shud_tpu.core.pallas_mega import (
    build_mega_blocks,
    forcing_to_blocks,
    mega_blocks_to_device,
    rhs_mega,
    y_to_z,
    z_mask,
    z_to_y,
)
from shud_tpu.core.rhs import rhs
from shud_tpu.core.state import ForcingSlice

# interpret-mode Pallas on CPU is minutes-per-suite; the kernels are
# exercised natively on TPU by /verify and bench runs.  CI budget runs
# use `pytest -m "not slow"` (pytest.ini).
pytestmark = pytest.mark.slow

F32 = jnp.float32


def _mk_forcing(md, rng, with_bc=False):
    ne, nr = md.num_ele, md.num_riv
    z = np.zeros(ne, np.float32)

    def rpos(scale, n=ne):
        return (np.abs(rng.normal(0.0, scale, n))).astype(np.float32)

    i_bc = np.asarray(md.i_bc).copy()
    i_ss = np.asarray(md.i_ss).copy()
    riv_bc = np.asarray(md.riv_bc).copy()
    if with_bc:
        i_bc[::31] = 1
        i_bc[5::37] = -1
        i_ss[3::29] = 1
        i_ss[7::41] = -1
        riv_bc[::13] = 1
        riv_bc[1::17] = -1
    fs = ForcingSlice(
        net_prcp=rpos(2e-5), prcp=rpos(2e-5), pot_evap=rpos(5e-6),
        pot_tran=rpos(5e-6), e_ic=rpos(2e-6), lai=rpos(2.0),
        fu_surf=np.clip(rng.uniform(0.3, 1.0, ne), 0, 1).astype(np.float32),
        fu_sub=np.clip(rng.uniform(0.3, 1.0, ne), 0, 1).astype(np.float32),
        ele_ybc=rpos(1.0), ele_qbc=rng.normal(0, 1e-3, ne).astype(np.float32),
        ele_qss=rng.normal(0, 1e-3, ne).astype(np.float32),
        riv_ybc=rpos(0.5, nr), riv_qbc=rpos(1e-2, nr),
    )
    return fs, i_bc, i_ss, riv_bc


def _mk_state(md, rng):
    ne, nr, nl = md.num_ele, md.num_riv, md.num_lake
    sf = np.abs(rng.normal(0.005, 0.01, ne))
    sf[::7] = 0.0  # dry cells
    us = np.abs(rng.normal(0.1, 0.1, ne))
    us[::11] = 0.0
    gw = np.abs(rng.normal(1.5, 1.0, ne))
    gw[::13] = np.asarray(md.aq_depth)[::13] + 0.01  # gw at surface
    riv = np.abs(rng.normal(0.3, 0.2, nr))
    riv[::5] = 0.0
    parts = [sf, us, gw, riv]
    if nl > 0:
        # plausible stages above the bathymetry base
        lake = np.abs(rng.normal(5.0, 2.0, nl)) + 1.0
        parts.append(lake)
    return np.concatenate(parts).astype(np.float32)


def _setup(mesh_fixture, with_bc, seed=0):
    inp, md, _ = mesh_fixture
    rng = np.random.default_rng(seed)
    fs, i_bc, i_ss, riv_bc = _mk_forcing(md, rng, with_bc)
    if with_bc:
        import dataclasses

        md = dataclasses.replace(md, i_bc=i_bc, i_ss=i_ss, riv_bc=riv_bc)
    mb = build_mega_blocks(md)
    assert mb is not None
    mbd = mega_blocks_to_device(mb)
    dm = to_device(md, float_dtype=F32)
    y = _mk_state(md, rng)
    fs32 = ForcingSlice(*[jnp.asarray(v, F32) for v in fs])
    return md, dm, mb, mbd, fs32, y


def _run_both(md, dm, mb, mbd, fs32, y, close_boundary):
    dy_ref = np.asarray(
        rhs(dm, fs32, 0.0, jnp.asarray(y), close_boundary=close_boundary)
    )
    fcell, friv, segfu, flake = forcing_to_blocks(mbd, fs32, dm.seg_ele)
    z = y_to_z(mbd, jnp.asarray(y))
    dz = rhs_mega(mbd, fcell, friv, segfu, z,
                  close_boundary=close_boundary, flake=flake)
    dy_mega = np.asarray(z_to_y(mbd, dz))
    return dy_ref, dy_mega, dz


@pytest.mark.parametrize("with_bc", [False, True])
@pytest.mark.parametrize("close_boundary", [True, False])
def test_mega_matches_xla_ccw(ccw, with_bc, close_boundary):
    md, dm, mb, mbd, fs32, y = _setup(ccw, with_bc)
    dy_ref, dy_mega, dz = _run_both(md, dm, mb, mbd, fs32, y,
                                    close_boundary)
    scale = np.maximum(np.abs(dy_ref), 1e-7)
    rel = np.abs(dy_mega - dy_ref) / scale
    assert rel.max() < 2e-4, (
        f"max rel {rel.max():.3e} at {rel.argmax()} "
        f"(ref {dy_ref[rel.argmax()]:.6e} mega {dy_mega[rel.argmax()]:.6e})"
    )
    # padding lanes must be exactly zero (solver norm invariant)
    mask = np.asarray(z_mask(mbd))
    assert np.all(np.asarray(dz) * (1.0 - mask) == 0.0)


def test_mega_matches_xla_heihe(heihe):
    md, dm, mb, mbd, fs32, y = _setup(heihe, False)
    dy_ref, dy_mega, _ = _run_both(md, dm, mb, mbd, fs32, y, True)
    scale = np.maximum(np.abs(dy_ref), 1e-7)
    rel = np.abs(dy_mega - dy_ref) / scale
    assert rel.max() < 2e-4, f"max rel {rel.max():.3e}"


def test_mega_matches_xla_qhh(qhh):
    """Lake watershed: lake-cell overrides, bank weir/Darcy against the
    in-kernel lake-stage scalars, per-lake reductions and the bathymetry
    bucket dStage all inside the megakernel."""
    md, dm, mb, mbd, fs32, y = _setup(qhh, False)
    assert mbd.nl == md.num_lake > 0 and mbd.lb > 0
    dy_ref, dy_mega, dz = _run_both(md, dm, mb, mbd, fs32, y, True)
    scale = np.maximum(np.abs(dy_ref), 1e-7)
    rel = np.abs(dy_mega - dy_ref) / scale
    assert rel.max() < 2e-4, (
        f"max rel {rel.max():.3e} at {rel.argmax()} "
        f"(ref {dy_ref[rel.argmax()]:.6e} mega {dy_mega[rel.argmax()]:.6e})"
    )
    mask = np.asarray(z_mask(mbd))
    assert np.all(np.asarray(dz) * (1.0 - mask) == 0.0)


def test_mega_jvp_matches_xla_qhh(qhh):
    """Tangent kernel through the lake module (bank fluxes, evap clamp,
    bathymetry interp) vs jax.jvp of the XLA RHS."""
    md, dm, mb, mbd, fs32, y = _setup(qhh, False, seed=9)
    rng = np.random.default_rng(17)
    v = rng.normal(0, 1.0, y.shape[0]).astype(np.float32)

    def f_ref(yy):
        return rhs(dm, fs32, 0.0, yy, close_boundary=True)

    _, jv_ref = jax.jvp(f_ref, (jnp.asarray(y),), (jnp.asarray(v),))
    jv_ref = np.asarray(jv_ref)

    fcell, friv, segfu, flake = forcing_to_blocks(mbd, fs32, dm.seg_ele)

    def f_mega(z):
        return rhs_mega(mbd, fcell, friv, segfu, z, close_boundary=True,
                        flake=flake)

    zb = y_to_z(mbd, jnp.asarray(y))
    vb = y_to_z(mbd, jnp.asarray(v))
    _, jvb = jax.jvp(f_mega, (zb,), (vb,))
    jv_mega = np.asarray(z_to_y(mbd, jvb))

    scale = np.maximum(np.abs(jv_ref), 1e-5)
    rel = np.abs(jv_mega - jv_ref) / scale
    assert rel.max() < 5e-4, (
        f"max rel {rel.max():.3e} at {rel.argmax()} "
        f"(ref {jv_ref[rel.argmax()]:.6e} mega {jv_mega[rel.argmax()]:.6e})"
    )


@pytest.mark.parametrize("with_bc", [False, True])
def test_mega_jvp_matches_xla(ccw, with_bc):
    """Hand-derived tangent kernel vs jax.jvp of the XLA RHS."""
    md, dm, mb, mbd, fs32, y = _setup(ccw, with_bc, seed=3)
    rng = np.random.default_rng(7)
    ny = y.shape[0]
    v = rng.normal(0, 1.0, ny).astype(np.float32)

    def f_ref(yy):
        return rhs(dm, fs32, 0.0, yy, close_boundary=True)

    _, jv_ref = jax.jvp(f_ref, (jnp.asarray(y),), (jnp.asarray(v),))
    jv_ref = np.asarray(jv_ref)

    fcell, friv, segfu, flake = forcing_to_blocks(mbd, fs32, dm.seg_ele)

    def f_mega(z):
        return rhs_mega(mbd, fcell, friv, segfu, z, close_boundary=True)

    zb = y_to_z(mbd, jnp.asarray(y))
    vb = y_to_z(mbd, jnp.asarray(v))
    _, jvb = jax.jvp(f_mega, (zb,), (vb,))
    jv_mega = np.asarray(z_to_y(mbd, jvb))

    scale = np.maximum(np.abs(jv_ref), 1e-5)
    rel = np.abs(jv_mega - jv_ref) / scale
    assert rel.max() < 5e-4, (
        f"max rel {rel.max():.3e} at {rel.argmax()} "
        f"(ref {jv_ref[rel.argmax()]:.6e} mega {jv_mega[rel.argmax()]:.6e})"
    )


def test_mega_linearize_reuse(ccw):
    """jax.linearize through the custom JVP (the Newton-Krylov pattern)."""
    md, dm, mb, mbd, fs32, y = _setup(ccw, False, seed=5)
    fcell, friv, segfu, flake = forcing_to_blocks(mbd, fs32, dm.seg_ele)

    def f_mega(z):
        return rhs_mega(mbd, fcell, friv, segfu, z, close_boundary=True)

    zb = y_to_z(mbd, jnp.asarray(y))
    fy, flin = jax.linearize(f_mega, zb)
    rng = np.random.default_rng(11)
    for s in range(2):
        v = rng.normal(0, 1.0, y.shape[0]).astype(np.float32)
        vb = y_to_z(mbd, jnp.asarray(v))
        jv1 = z_to_y(mbd, flin(vb))
        _, jv2 = jax.jvp(f_mega, (zb,), (vb,))
        np.testing.assert_allclose(
            np.asarray(jv1), np.asarray(z_to_y(mbd, jv2)),
            rtol=1e-6, atol=1e-12)


def test_mega_driver_path_matches_xla_driver():
    """FusedSimulation(mega=True): the solver carries the blocked Z state
    and evaluates the megakernel (interpret mode on CPU); trajectory and
    NFE must match the XLA-RHS driver."""
    from shud_tpu.driver.fused import FusedSimulation
    from shud_tpu.utils.synthetic import make_synthetic_project

    a = FusedSimulation.create(
        "syn", inp=make_synthetic_project(8, 4, end_day=1.0),
        float_dtype=F32, mega=False, wb_exact=True)
    b = FusedSimulation.create(
        "syn", inp=make_synthetic_project(8, 4, end_day=1.0),
        float_dtype=F32, mega=True, wb_exact=True)
    assert b.use_mega
    a.advance_interval(30.0)
    b.advance_interval(30.0)
    ya, yb = a.y_np(), b.y_np()
    assert np.abs(ya - yb).max() < 2e-5
    assert int(a.bdf.nfe) == int(b.bdf.nfe)
    # quadrature accumulators ride through the z_to_y wrapper
    qa = {k: float(v) for k, v in a.bdf.quad.items()}
    qb = {k: float(v) for k, v in b.bdf.quad.items()}
    for k in qa:
        assert abs(qa[k] - qb[k]) <= 1e-4 * max(1.0, abs(qa[k]))


@pytest.mark.slow
def test_mega_driver_path_matches_xla_driver_qhh():
    """Lake watershed through the FULL solver window path: the blocked-Z
    state (incl. the lake block), the flake forcing input, and the padded
    WRMS weights must reproduce the XLA driver's trajectory and NFE."""
    from shud_tpu.driver.fused import FusedSimulation

    a = FusedSimulation.create("qhh", base="/root/reference",
                               float_dtype=F32, mega=False)
    b = FusedSimulation.create("qhh", base="/root/reference",
                               float_dtype=F32, mega=True)
    assert b.use_mega and b.mbd.nl == a.md.num_lake > 0
    a.advance_interval(30.0)
    b.advance_interval(30.0)
    ya, yb = a.y_np(), b.y_np()
    ne, nr = a.md.num_ele, a.md.num_riv
    assert np.abs(ya - yb).max() < 5e-4
    # the lake stages themselves
    assert np.abs(ya[3 * ne + nr:] - yb[3 * ne + nr:]).max() < 5e-5
    assert abs(int(a.bdf.nfe) - int(b.bdf.nfe)) <= int(0.1 * int(a.bdf.nfe))


@pytest.mark.parametrize("fixture_name", ["ccw", "qhh"])
def test_mega_diag_matches_xla(request, fixture_name):
    """rhs_mega_diag (the driver's one-launch diagnostics) vs rhs_full's
    diag dict — every accumulation field the fused driver consumes."""
    from shud_tpu.core.pallas_mega import (
        DIAG_CELL, DIAG_LAKE, DIAG_RIV, rhs_mega_diag,
    )
    from shud_tpu.core.rhs import rhs_full

    md, dm, mb, mbd, fs32, y = _setup(request.getfixturevalue(fixture_name),
                                      False, seed=2)
    _, diag_ref = rhs_full(dm, fs32, 0.0, jnp.asarray(y),
                           close_boundary=True)
    fcell, friv, segfu, flake = forcing_to_blocks(mbd, fs32, dm.seg_ele)
    z = y_to_z(mbd, jnp.asarray(y))
    diag = rhs_mega_diag(mbd, fcell, friv, segfu, z, close_boundary=True,
                         flake=flake)
    keys = DIAG_CELL + DIAG_RIV + (DIAG_LAKE if mbd.nl > 0 else ())
    for k in keys:
        ref = np.asarray(diag_ref[k], np.float32)
        got = np.asarray(diag[k])
        assert got.shape == ref.shape, k
        # net sums (q_surf_tot etc.) cancel to ~0 from O(max|ref|)-sized
        # edge fluxes, so ulp-level kernel-vs-XLA differences amplify in
        # RELATIVE terms: tolerate rtol + a field-scaled absolute term
        tol = 2e-4 * np.abs(ref) + 1e-6 * np.abs(ref).max() + 1e-9
        bad = np.abs(got - ref) > tol
        assert not bad.any(), (
            f"{k}: {bad.sum()} entries out of tolerance; worst at "
            f"{np.abs(got - ref).argmax()} "
            f"(ref {ref[np.abs(got - ref).argmax()]:.6e} "
            f"got {got[np.abs(got - ref).argmax()]:.6e})"
        )


def test_blocks_roundtrip(ccw):
    _, md, _ = ccw
    mb = build_mega_blocks(md)
    mbd = mega_blocks_to_device(mb)
    rng = np.random.default_rng(1)
    y = _mk_state(md, rng)
    zb = y_to_z(mbd, jnp.asarray(y))
    y2 = np.asarray(z_to_y(mbd, zb))
    np.testing.assert_array_equal(y.astype(np.float32), y2)
