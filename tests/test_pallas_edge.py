"""Fused Pallas edge-flux kernel vs the XLA fast path (CPU interpret mode).

The kernel (core/pallas_edge.py) must reproduce the interior + boundary
branches of ``rhs.edge_fluxes`` bitwise: the in-VMEM banded gather is an
exact index select and the flux math mirrors the XLA path op-for-op.
Covers: multi-block windows, cross-block neighbours, RCM-renumbered
unstructured ordering, both boundary modes, and the full-RHS merge
(lake-free and lake meshes).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from shud_tpu.core import rhs as R  # noqa: E402
from shud_tpu.core.device import to_device  # noqa: E402
from shud_tpu.core.mesh import build_mesh  # noqa: E402
from shud_tpu.core.pallas_edge import (build_edge_blocks,  # noqa: E402
                                       edge_blocks_to_device,
                                       edge_fluxes_pallas, graph_bandwidth)
from shud_tpu.utils.reorder import (localize_project,  # noqa: E402
                                    permute_project, rcm_permutation)
from shud_tpu.utils.synthetic import make_synthetic_project  # noqa: E402

# interpret-mode Pallas on CPU is minutes-per-suite; the kernels are
# exercised natively on TPU by /verify and bench runs.  CI budget runs
# use `pytest -m "not slow"` (pytest.ini).
pytestmark = pytest.mark.slow


def _rand_state(ne, seed=1):
    rng = np.random.default_rng(seed)
    sf = jnp.asarray(rng.uniform(0, 0.05, ne), jnp.float32)
    gw = jnp.asarray(rng.uniform(0, 8.0, ne), jnp.float32)
    us = jnp.asarray(rng.uniform(0, 1.0, ne), jnp.float32)
    return sf, gw, us


def _compare(md, min_blk=1024):
    ne = md.num_ele
    eb = build_edge_blocks(md, min_blk=min_blk)
    assert eb is not None
    dm = to_device(md, jnp.float32)
    ebd = edge_blocks_to_device(eb)
    sf, gw, us = _rand_state(ne)
    cu = R.update_element(dm, sf, us, gw)
    lake_stg = jnp.zeros((0,), jnp.float32)
    for cb in (True, False):
        qs_ref, qb_ref, _, _ = R.edge_fluxes(dm, cu, sf, gw, lake_stg, cb)
        qs_k, qb_k = edge_fluxes_pallas(ebd, sf, gw, cu.eff_kh,
                                        close_boundary=cb)
        # subsurface path has no cbrt -> gather/mask machinery must be EXACT
        np.testing.assert_array_equal(np.asarray(qb_ref), np.asarray(qb_k))
        # surface Manning uses the kernel's 2-ulp cbrt (Mosaic lacks cbrt)
        scale = float(np.abs(np.asarray(qs_ref)).max()) or 1.0
        np.testing.assert_allclose(np.asarray(qs_ref) / scale,
                                   np.asarray(qs_k) / scale, atol=2e-6)


def test_structured_multiblock():
    md = build_mesh(make_synthetic_project(48, 44))
    _compare(md)  # 4224 cells, 5 blocks of 1024


def test_rcm_reordered_unstructured():
    inp = make_synthetic_project(40, 30)
    ne = inp.tri.shape[0]
    rng = np.random.default_rng(7)
    inp = permute_project(inp, rng.permutation(ne))  # arbitrary numbering
    inp, perm = localize_project(inp)
    md = build_mesh(inp)
    assert md.roll_offsets is None  # roll shortcut impossible here
    assert graph_bandwidth(np.asarray(md.nabr)) <= 256
    _compare(md)


def test_single_block_window_aliasing():
    # whole mesh in one block: prev/self/next all alias the same cells
    md = build_mesh(make_synthetic_project(8, 8))
    _compare(md)


def test_full_rhs_merge_matches():
    """rhs() with edge_blocks installed == rhs() without, bitwise."""
    from shud_tpu.core.state import ForcingSlice

    inp = make_synthetic_project(24, 20)
    md = build_mesh(inp)
    ne, nr = md.num_ele, md.num_riv
    rng = np.random.default_rng(3)

    def mk_fs():
        z = jnp.zeros(ne, jnp.float32)
        return ForcingSlice(
            net_prcp=jnp.asarray(rng.uniform(0, 2e-5, ne), jnp.float32),
            prcp=jnp.asarray(rng.uniform(0, 2e-5, ne), jnp.float32),
            pot_evap=jnp.asarray(rng.uniform(0, 1e-6, ne), jnp.float32),
            pot_tran=jnp.asarray(rng.uniform(0, 1e-6, ne), jnp.float32),
            e_ic=jnp.asarray(rng.uniform(0, 1e-7, ne), jnp.float32),
            lai=jnp.full(ne, 2.0, jnp.float32), fu_surf=jnp.ones_like(z),
            fu_sub=jnp.ones_like(z), ele_ybc=z, ele_qbc=z, ele_qss=z,
            riv_ybc=jnp.zeros(nr, jnp.float32),
            riv_qbc=jnp.zeros(nr, jnp.float32),
        )

    fs = mk_fs()
    ny = 3 * ne + nr
    y = jnp.asarray(rng.uniform(0.0, 1.0, ny), jnp.float32)

    dy_plain = R.rhs(to_device(md, jnp.float32), fs, 0.0, y)
    md.edge_blocks = build_edge_blocks(md)
    dm2 = to_device(md, jnp.float32)
    assert dm2.edge_blocks is not None
    dy_pallas = R.rhs(dm2, fs, 0.0, y)
    a, b = np.asarray(dy_plain), np.asarray(dy_pallas)
    scale = float(np.abs(a).max()) or 1.0
    np.testing.assert_allclose(a / scale, b / scale, atol=2e-6)


def test_rcm_bandwidth_reduction():
    inp = make_synthetic_project(32, 32)
    ne = inp.tri.shape[0]
    rng = np.random.default_rng(0)
    shuffled = permute_project(inp, rng.permutation(ne))
    nabr1 = shuffled.tri[:, 4:7].astype(np.int64)
    nabr = np.where(nabr1 > 0, nabr1 - 1, -1)
    band_before = graph_bandwidth(nabr)
    perm = rcm_permutation(nabr)
    ordered = permute_project(shuffled, perm)
    nabr1 = ordered.tri[:, 4:7].astype(np.int64)
    band_after = graph_bandwidth(np.where(nabr1 > 0, nabr1 - 1, -1))
    assert band_after < band_before / 8
    assert band_after <= 4 * int(np.sqrt(ne))


def test_permute_project_preserves_physics():
    """Permuted project -> same RHS as original, mapped through the perm."""
    from shud_tpu.core.state import ForcingSlice

    inp = make_synthetic_project(16, 12)
    ne = inp.tri.shape[0]
    rng = np.random.default_rng(5)
    perm = rng.permutation(ne)
    inp_p = permute_project(inp, perm)

    md = build_mesh(inp)
    md_p = build_mesh(inp_p)
    nr = md.num_riv

    z = jnp.zeros(ne, jnp.float64)
    fs_args = dict(
        pot_evap=jnp.full(ne, 1e-6), pot_tran=jnp.full(ne, 1e-6),
        e_ic=jnp.full(ne, 1e-7),
        lai=jnp.full(ne, 2.0), fu_surf=jnp.ones(ne), fu_sub=jnp.ones(ne),
        ele_ybc=z, ele_qbc=z, ele_qss=z,
        riv_ybc=jnp.zeros(nr), riv_qbc=jnp.zeros(nr),
    )
    prcp = rng.uniform(0, 2e-5, ne)
    sf = rng.uniform(0, 0.05, ne)
    us = rng.uniform(0, 1.0, ne)
    gw = rng.uniform(0, 8.0, ne)
    riv = rng.uniform(0, 1.0, nr)

    fs = ForcingSlice(net_prcp=jnp.asarray(prcp), prcp=jnp.asarray(prcp),
                      **fs_args)
    y = jnp.concatenate([jnp.asarray(v) for v in (sf, us, gw, riv)])
    dy = np.asarray(R.rhs(to_device(md), fs, 0.0, y))

    fs_p = ForcingSlice(net_prcp=jnp.asarray(prcp[perm]),
                        prcp=jnp.asarray(prcp[perm]), **fs_args)
    y_p = jnp.concatenate([jnp.asarray(v[perm]) for v in (sf, us, gw)]
                          + [jnp.asarray(riv)])
    dy_p = np.asarray(R.rhs(to_device(md_p), fs_p, 0.0, y_p))

    for k in range(3):  # sf/us/gw blocks permute; river block identical
        np.testing.assert_allclose(
            dy[k * ne:(k + 1) * ne][perm], dy_p[k * ne:(k + 1) * ne],
            rtol=0, atol=1e-14)
    np.testing.assert_allclose(dy[3 * ne:], dy_p[3 * ne:], rtol=0, atol=1e-14)


def test_jvp_matches_xla_autodiff():
    """Hand-derived tangent kernel vs jax.jvp of the XLA path (the solver's
    Newton-Krylov J.v products run through jax.linearize)."""
    inp = make_synthetic_project(48, 44)
    md = build_mesh(inp)
    ne = md.num_ele
    eb = build_edge_blocks(md)
    dm = to_device(md, jnp.float32)
    ebd = edge_blocks_to_device(eb)
    rng = np.random.default_rng(1)
    sf = jnp.asarray(rng.uniform(0, 0.05, ne), jnp.float32)
    sf = sf.at[::7].set(0.0)  # exactly-dry cells exercise tie conventions
    gw = jnp.asarray(rng.uniform(0, 8.0, ne), jnp.float32)
    us = jnp.asarray(rng.uniform(0, 1.0, ne), jnp.float32)
    cu = R.update_element(dm, sf, us, gw)
    kh = cu.eff_kh
    lake_stg = jnp.zeros((0,), jnp.float32)
    tsf = jnp.asarray(rng.standard_normal(ne), jnp.float32)
    tgw = jnp.asarray(rng.standard_normal(ne), jnp.float32)
    tkh = jnp.asarray(rng.standard_normal(ne), jnp.float32)

    for cb in (True, False):
        def f_xla(sf_, gw_, kh_):
            qs, qb, _, _ = R.edge_fluxes(dm, cu._replace(eff_kh=kh_),
                                         sf_, gw_, lake_stg, cb)
            return qs, qb

        def f_pl(sf_, gw_, kh_):
            return edge_fluxes_pallas(ebd, sf_, gw_, kh_, close_boundary=cb)

        (qs_a, qb_a), (tqs_a, tqb_a) = jax.jvp(
            f_xla, (sf, gw, kh), (tsf, tgw, tkh))
        (qs_b, qb_b), (tqs_b, tqb_b) = jax.jvp(
            f_pl, (sf, gw, kh), (tsf, tgw, tkh))
        np.testing.assert_array_equal(np.asarray(qb_a), np.asarray(qb_b))
        scale = float(np.abs(np.asarray(qs_a)).max()) or 1.0
        np.testing.assert_allclose(np.asarray(qs_a) / scale,
                                   np.asarray(qs_b) / scale, atol=2e-6)
        # tangents differ only by f32 association order in product-rule sums
        for ta, tb in ((tqs_a, tqs_b), (tqb_a, tqb_b)):
            scale = float(jnp.max(jnp.abs(ta))) or 1.0
            np.testing.assert_allclose(np.asarray(ta) / scale,
                                       np.asarray(tb) / scale, atol=1e-6)
        # the solver's actual entry point: linearize, then apply
        _, jvp_fn = jax.linearize(f_pl, sf, gw, kh)
        tqs_l, _ = jvp_fn(tsf, tgw, tkh)
        np.testing.assert_array_equal(np.asarray(tqs_l), np.asarray(tqs_b))
