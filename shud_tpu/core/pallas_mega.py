"""Whole-RHS Pallas TPU megakernel for VMEM-resident watersheds.

On small meshes (ccw: 1147 cells, heihe: 1779) the XLA RHS is pure
kernel-launch overhead: ~40 fused HLO ops x ~2 us fixed cost each dwarf the
arithmetic (the whole state is ~100 KB).  This module collapses the ENTIRE
RHS dataflow (SURVEY §3.2 — scatter/clamp -> pointwise cell physics ->
3-edge stencil -> segment stencil -> river chain -> reductions -> assembly;
reference ``MD_update.cpp``/``MD_f.cpp``/``MD_ElementFlux.cpp``/
``MD_RiverFlux.cpp``/``MD_ET.cpp:343-404``) into ONE kernel launch:

* every entity array lives in VMEM for the kernel's duration — cells,
  rivers and segments are padded to (rows, 128) tiles and statically packed
  per entity/dtype, so the kernel takes a handful of refs;
* the unstructured neighbour/segment gathers are in-VMEM chunk sweeps over
  Mosaic's exact lane-wise ``dynamic_gather`` (the ``pallas_edge`` trick,
  but with the whole mesh resident no bandedness is required — any cell
  numbering works);
* the scatter-add reductions (the reference's serial ``PassValue``,
  ``MD_f.cpp:217-257``; ``segment_sum`` in the XLA path) are converted to
  FIXED-WIDTH gather lists built at preprocessing time: each river knows
  its <=K_r segment ids, each cell its <=K_c, each reach its <=K_up
  upstream ids — deterministic sums in ascending-index order, race-free by
  construction, no scatter hardware needed;
* the solver keeps the state in the kernel's blocked layout
  (``YBlocks``) across the entire window, so no layout conversion happens
  per evaluation.

The flux math mirrors ``shud_tpu.core.rhs.rhs_full``'s f32 fast path
op-for-op (local-datum head differences from f64-precomputed edge/segment
dz).  Transcendental differences vs XLA: cbrt/pow are evaluated as
exp(log)/Newton-polish (Mosaic has no cbrt/pow primitives), <=2 ulp.

Eligibility: f32, mesh fits in VMEM (``build_mega_blocks`` returns None
otherwise).  Lake meshes are supported (qhh runs the megakernel; the
in-kernel lake-stage branches work against f64-precomputed edge datums —
see docs/PERF.md qhh table).

A hand-derived tangent kernel (``_mega_kernel_jvp``) exposes the exact
directional derivative through ``jax.custom_jvp`` so Newton–Krylov J·v
products stay exact (solver/bdf.py), like the reference's CVODE+SPGMR but
with analytic instead of difference-quotient J·v.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np

from shud_tpu.config import EPSILON, GRAV, MAXYSURF, ZERO
from shud_tpu.core.pallas_edge import (
    _cbrt_pos,
    _dmax0,
    _flux_sub_bnd,
    _flux_sub_bnd_t,
    _flux_sub_int,
    _flux_sub_int_t,
    _flux_surface_bnd,
    _flux_surface_bnd_t,
    _flux_surface_int,
    _flux_surface_int_t,
    _lane_gather,
)

_TINY = 1.0e-30


def _pow23(x):
    t = _cbrt_pos(x)
    return t * t


def _powp(x, p):
    """x**p for x>0 via exp(p*log x) (Mosaic lowers pow the same way)."""
    return jnp.exp(p * jnp.log(x))


def _dmin(a, b, ta, tb):
    """Tangent of jnp.minimum(a, b) (JAX: 0.5/0.5 at exact ties)."""
    return jnp.where(a < b, ta, jnp.where(a == b, 0.5 * (ta + tb), tb))


def _dmax(a, b, ta, tb):
    return jnp.where(a > b, ta, jnp.where(a == b, 0.5 * (ta + tb), tb))


def _dabs(x, tx):
    """Tangent of jnp.abs (sign(0) = 0 in JAX)."""
    return jnp.sign(x) * tx


def _dsqrt_max(x, tx, floor):
    """Tangent of sqrt(maximum(x, floor)) with constant floor."""
    act = x > floor
    r = jnp.sqrt(jnp.maximum(x, floor))
    return jnp.where(act, tx / (2.0 * r), jnp.where(x == floor, 0.5 * tx / (2.0 * r), 0.0))


# ---------------------------------------------------------------------------
# static packing
# ---------------------------------------------------------------------------

CELL_F = (
    "area", "sy", "aq_depth", "inf_d", "inf_ksat_v", "ksat_v", "ksat_h",
    "mac_ksat_v", "mac_ksat_h", "mac_d", "h_area_f", "geo_v_area_f",
    "theta_s", "theta_r", "theta_fc", "beta", "veg_frac", "imp_af",
    "wetland_level", "rootreach_level", "depression", "rough",
)
# cell ints: BC/SS sign masks, validity, lake membership, then K_c
# segment-list rows
CELL_I_BASE = ("ibc_pos", "ibc_neg", "iss_pos", "iss_neg", "valid",
               "is_lake")
# lk_dzl/lk_dzb: f64-precomputed lake-bank datums (mesh.edge_lake_dzl/dzb)
EDGE_F = ("B", "dist", "ravg", "dzs", "dzb", "d2e", "lk_dzl", "lk_dzb")
EDGE_I = ("nbq", "m_int", "m_bnd", "m_lake", "lk_id")
SEG_F = ("length", "cwr", "dep_e", "zr_loc", "neg_depth", "ksat_riv",
         "bed_thick", "valid")
SEG_I = ("se_q", "sr_q")
RIV_F = ("bank_slope", "bottom_width", "length", "bed_slope", "dist2down",
         "avg_rough", "depth", "depth_dn", "s_mean", "valid")
# river ints: masks then K_r seg-list rows then K_up upstream rows
RIV_I_BASE = ("has_down", "dn_q", "crit_out", "to_lake", "lake_id",
              "bc_pos")
FORC_CELL = ("net_prcp", "pot_evap", "pot_tran", "e_ic", "lai",
             "fu_surf", "fu_sub", "ele_ybc", "ele_qbc", "ele_qss")
FORC_RIV = ("riv_ybc", "riv_qbc")

CF = {k: i for i, k in enumerate(CELL_F)}
CIB = {k: i for i, k in enumerate(CELL_I_BASE)}
EF = {k: i for i, k in enumerate(EDGE_F)}
EI = {k: i for i, k in enumerate(EDGE_I)}
SF = {k: i for i, k in enumerate(SEG_F)}
SI = {k: i for i, k in enumerate(SEG_I)}
RF = {k: i for i, k in enumerate(RIV_F)}
RIB = {k: i for i, k in enumerate(RIV_I_BASE)}
FC = {k: i for i, k in enumerate(FORC_CELL)}
FR = {k: i for i, k in enumerate(FORC_RIV)}

# diagnostics emitted by the diag kernel (rhs_mega_diag) — the per-window
# output/accumulation fields the driver needs (driver/fused.py ACCUM_*),
# matching rhs.rhs_full's diag dict entries of the same names
DIAG_CELL = ("q_rech", "q_sub_tot", "q_surf_tot", "q_e2r_sub", "q_e2r_surf",
             "q_infil", "q_exfil", "es", "eu", "eg", "tu", "tg", "e_ic")
DIAG_RIV = ("q_riv_up", "q_riv_down", "q_riv_sub", "q_riv_surf")
DIAG_LAKE = ("lake_area", "q_lake_evap", "q_lake_prcp", "q_lake_rivin",
             "q_lake_surf", "q_lake_sub")


@dataclasses.dataclass
class MegaBlocks:
    """Packed static mesh tables in the megakernel's blocked layout."""

    cb: int  # cell rows (multiple of 8); padded cells = cb*128
    rb: int  # river rows
    sb: int  # segment rows
    kc: int  # per-cell segment-list width
    kr: int  # per-river segment-list width
    kup: int  # per-river upstream-list width
    ne: int
    nr: int
    ns: int
    nl: int  # lakes (0 = no lake block in Z)
    lb: int  # lake rows in Z (0 when nl == 0, else _rows(nl))
    # static per-lake constants baked into the kernel as python floats:
    # (zmin[nl], bathy_y[nl][K], bathy_a[nl][K], num_ele[nl]) — hashable
    lake_meta: tuple

    cell_f: np.ndarray  # [len(CELL_F), cb, 128] f32
    cell_i: np.ndarray  # [len(CELL_I_BASE)+kc, cb, 128] i32
    edge_f: np.ndarray  # [len(EDGE_F), 3cb, 128] f32
    edge_i: np.ndarray  # [len(EDGE_I), 3cb, 128] i32
    seg_f: np.ndarray   # [len(SEG_F), sb, 128] f32
    seg_i: np.ndarray   # [len(SEG_I), sb, 128] i32
    riv_f: np.ndarray   # [len(RIV_F), rb, 128] f32
    riv_i: np.ndarray   # [len(RIV_I_BASE)+kr+kup, rb, 128] i32
    lake_w: np.ndarray  # [max(nl,1), cb*128] f32 lake-cell weights (1/n_l)


jax.tree_util.register_dataclass(
    MegaBlocks,
    data_fields=["cell_f", "cell_i", "edge_f", "edge_i", "seg_f", "seg_i",
                 "riv_f", "riv_i", "lake_w"],
    meta_fields=["cb", "rb", "sb", "kc", "kr", "kup", "ne", "nr", "ns",
                 "nl", "lb", "lake_meta"],
)


# The ODE state in kernel-blocked layout is ONE f32 array Z of shape
# (3*cb + rb, 128): rows [0,cb) = sf, [cb,2cb) = us, [2cb,3cb) = gw,
# [3cb,3cb+rb) = river stage; padding lanes are identically zero.  A single
# array keeps every solver vector op (axpy/dot/wrms) ONE fused XLA op —
# with a multi-leaf pytree the op count (the small-mesh bottleneck)
# multiplies by the leaf count.


def _rows(n: int, min_rows: int = 8) -> int:
    r = -(-n // 128)
    return max(min_rows, ((r + 7) // 8) * 8)


def _pad_rows(a, rows, fill=0.0, dtype=np.float32):
    out = np.full(rows * 128, fill, dtype=dtype)
    out[: len(a)] = np.asarray(a, dtype=dtype)
    return out.reshape(rows, 128)


def _pad_edge_rows(a, cb, fill=0.0, dtype=np.float32):
    """[Ne,3] -> [3*cb, 128] slot-major (row j*cb + p//128, lane p%128)."""
    ne = a.shape[0]
    out = np.full((3, cb * 128), fill, dtype=dtype)
    out[:, :ne] = np.asarray(a, dtype=dtype).T
    return out.reshape(3 * cb, 128)


def _fixed_width_lists(targets: np.ndarray, n_targets: int, pad_idx: int):
    """Invert a many-to-one map: for each target, the (sorted) source ids
    mapping to it, padded with *pad_idx* (a source slot whose value is
    guaranteed zero).  Returns [n_targets, K] int32."""
    lists: list[list[int]] = [[] for _ in range(n_targets)]
    for src, tgt in enumerate(np.asarray(targets)):
        if 0 <= tgt < n_targets:
            lists[int(tgt)].append(src)
    k = max(1, max((len(l) for l in lists), default=1))
    out = np.full((n_targets, k), pad_idx, dtype=np.int32)
    for t, l in enumerate(lists):
        out[t, : len(l)] = l
    return out


def build_mega_blocks(md, max_cells: int = 32768) -> "MegaBlocks | None":
    """Packed tables for the megakernel, or None when the mesh is not
    eligible (too large for whole-mesh VMEM residence).  Lake meshes are
    supported: the (few) lake stages ride in a dedicated Z block and the
    per-lake physics runs on in-kernel scalars."""
    ne, nr, ns, nl = md.num_ele, md.num_riv, md.num_seg, md.num_lake
    # the lake module unrolls nl python iterations (each with a K-step
    # bathymetry scan + full-array masked reductions, primal AND tangent),
    # so the static-unroll design only scales to order tens of lakes
    if ne > max_cells or nr == 0 or ns == 0 or nl > 64:
        return None
    # reserve at least one always-zero padded slot for list padding
    cb = _rows(ne)
    rb = _rows(nr if nr < _rows(nr) * 128 else nr + 1)
    sb = _rows(ns if ns < _rows(ns) * 128 else ns + 1)
    if nr >= rb * 128:
        rb += 8
    if ns >= sb * 128:
        sb += 8

    nabr = np.asarray(md.nabr)
    has_nabr = nabr >= 0

    cell_f = np.stack([
        _pad_rows(getattr(md, n), cb, fill=1.0 if n in
                  ("sy", "area", "aq_depth", "theta_s", "beta", "inf_d",
                   "rough") else 0.0)
        for n in CELL_F
    ])
    # beta=1 pad would divide by zero in n/(n-1); use 2.0
    cell_f[CF["beta"]][_pad_rows(np.ones(ne), cb).astype(bool) == False] = 2.0  # noqa: E712
    cell_f[CF["theta_r"]] = _pad_rows(md.theta_r, cb, fill=0.1)
    cell_f[CF["theta_s"]] = _pad_rows(md.theta_s, cb, fill=0.5)
    cell_f[CF["theta_fc"]] = _pad_rows(md.theta_fc, cb, fill=0.3)

    i_bc = np.asarray(md.i_bc)
    i_ss = np.asarray(md.i_ss)
    valid_c = np.zeros(cb * 128, np.int32)
    valid_c[:ne] = 1
    cseg = _fixed_width_lists(md.seg_ele, ne, pad_idx=ns)
    kc = cseg.shape[1]
    i_lake_arr = np.asarray(md.i_lake)
    cell_i = np.stack(
        [
            _pad_rows((i_bc > 0).astype(np.int32), cb, 0, np.int32),
            _pad_rows((i_bc < 0).astype(np.int32), cb, 0, np.int32),
            _pad_rows((i_ss > 0).astype(np.int32), cb, 0, np.int32),
            _pad_rows((i_ss < 0).astype(np.int32), cb, 0, np.int32),
            valid_c.reshape(cb, 128),
            _pad_rows((i_lake_arr > 0).astype(np.int32), cb, 0, np.int32),
        ]
        + [_pad_rows(cseg[:, k], cb, ns, np.int32) for k in range(kc)]
    )

    lakenb = np.asarray(md.lakenabr)
    has_lake_e = lakenb >= 0
    # build_mesh always populates these (like rhs.py/partition.py assume)
    edge_lake_dzl = np.asarray(md.edge_lake_dzl)
    edge_lake_dzb = np.asarray(md.edge_lake_dzb)
    edge_f = np.stack([
        _pad_edge_rows(md.edge, cb),
        _pad_edge_rows(np.where(has_nabr, md.dist2nabor, 1.0), cb, 1.0),
        _pad_edge_rows(np.maximum(md.avg_rough, 1e-20), cb, 1.0),
        _pad_edge_rows(md.edge_dz_surf, cb),
        _pad_edge_rows(md.edge_dz_bottom, cb),
        _pad_edge_rows(np.maximum(md.dist2edge, 1e-20), cb, 1.0),
        _pad_edge_rows(edge_lake_dzl, cb),
        _pad_edge_rows(edge_lake_dzb, cb),
    ])
    nbq = np.where(has_nabr, nabr, 0)
    edge_i = np.stack([
        _pad_edge_rows(nbq, cb, 0, np.int32),
        _pad_edge_rows(has_nabr.astype(np.int32), cb, 0, np.int32),
        _pad_edge_rows((~has_nabr).astype(np.int32), cb, 0, np.int32),
        _pad_edge_rows(has_lake_e.astype(np.int32), cb, 0, np.int32),
        _pad_edge_rows(np.where(has_lake_e, lakenb, 0), cb, 0, np.int32),
    ])

    se = np.asarray(md.seg_ele)
    sr = np.asarray(md.seg_riv)
    seg_valid = np.zeros(sb * 128, np.float32)
    seg_valid[:ns] = 1.0
    seg_f = np.stack([
        _pad_rows(md.seg_length, sb, 1.0),
        _pad_rows(md.seg_cwr, sb),
        _pad_rows(np.asarray(md.depression)[se], sb),
        _pad_rows(np.asarray(md.aq_depth)[se] - np.asarray(md.riv_depth)[sr],
                  sb),
        _pad_rows(-np.asarray(md.riv_depth)[sr], sb),
        _pad_rows(np.asarray(md.riv_ksat_h)[sr], sb),
        _pad_rows(np.maximum(np.asarray(md.riv_bed_thick)[sr], 1e-20), sb,
                  1.0),
        seg_valid.reshape(sb, 128),
    ])
    seg_i = np.stack([
        _pad_rows(se, sb, 0, np.int32),
        _pad_rows(sr, sb, 0, np.int32),
    ])

    down = np.asarray(md.riv_down)
    has_down = down >= 0
    dn = np.where(has_down, down, 0)
    bs = np.asarray(md.riv_bed_slope)
    depth = np.asarray(md.riv_depth)
    riv_valid = np.zeros(rb * 128, np.float32)
    riv_valid[:nr] = 1.0
    riv_f = np.stack([
        _pad_rows(md.riv_bank_slope, rb, 1.0),
        _pad_rows(md.riv_bottom_width, rb, 1.0),
        _pad_rows(md.riv_length, rb, 1.0),
        _pad_rows(bs, rb),
        _pad_rows(np.maximum(md.riv_dist2down, 1e-20), rb, 1.0),
        _pad_rows(np.maximum(md.riv_avg_rough, 1e-20), rb, 1.0),
        _pad_rows(depth, rb),
        _pad_rows(depth[dn], rb),
        _pad_rows(0.5 * (bs + bs[dn]), rb),
        riv_valid.reshape(rb, 128),
    ])
    rsg = _fixed_width_lists(sr, nr, pad_idx=ns)
    kr = rsg.shape[1]
    rup = _fixed_width_lists(np.where(has_down, dn, -1), nr, pad_idx=nr)
    kup = rup.shape[1]
    riv_to_lake = np.asarray(md.riv_to_lake)
    to_lake = riv_to_lake >= 0
    riv_i = np.stack(
        [
            _pad_rows(has_down.astype(np.int32), rb, 0, np.int32),
            _pad_rows(dn, rb, 0, np.int32),
            _pad_rows((np.asarray(md.riv_outlet_code) == -4).astype(np.int32),
                      rb, 0, np.int32),
            _pad_rows(to_lake.astype(np.int32), rb, 0, np.int32),
            _pad_rows(np.where(to_lake, riv_to_lake, 0), rb, 0, np.int32),
            _pad_rows((np.asarray(md.riv_bc) > 0).astype(np.int32), rb, 0,
                      np.int32),
        ]
        + [_pad_rows(rsg[:, k], rb, ns, np.int32) for k in range(kr)]
        + [_pad_rows(rup[:, k], rb, nr, np.int32) for k in range(kup)]
    )

    # per-lake static constants (baked into the kernel as python floats)
    lb = _rows(nl) if nl > 0 else 0
    lake_w = np.zeros((max(nl, 1), cb * 128), np.float32)
    if nl > 0:
        zmin = tuple(float(v) for v in np.asarray(md.lake_zmin)[:nl])
        by = tuple(tuple(float(v) for v in row)
                   for row in np.asarray(md.lake_bathy_y)[:nl])
        ba = tuple(tuple(float(v) for v in row)
                   for row in np.asarray(md.lake_bathy_a)[:nl])
        nele = tuple(int(v) for v in np.asarray(md.lake_num_ele)[:nl])
        lake_meta = (zmin, by, ba, nele)
        for li in range(nl):
            cells = np.flatnonzero(i_lake_arr == li + 1)
            lake_w[li, cells] = 1.0 / max(len(cells), 1)
    else:
        lake_meta = ()

    return MegaBlocks(
        cb=cb, rb=rb, sb=sb, kc=kc, kr=kr, kup=kup, ne=ne, nr=nr, ns=ns,
        nl=nl, lb=lb, lake_meta=lake_meta,
        cell_f=np.ascontiguousarray(cell_f, np.float32),
        cell_i=np.ascontiguousarray(cell_i, np.int32),
        edge_f=np.ascontiguousarray(edge_f, np.float32),
        edge_i=np.ascontiguousarray(edge_i, np.int32),
        seg_f=np.ascontiguousarray(seg_f, np.float32),
        seg_i=np.ascontiguousarray(seg_i, np.int32),
        riv_f=np.ascontiguousarray(riv_f, np.float32),
        riv_i=np.ascontiguousarray(riv_i, np.int32),
        lake_w=np.ascontiguousarray(lake_w, np.float32),
    )


def mega_blocks_to_device(mb: "MegaBlocks | None") -> "MegaBlocks | None":
    if mb is None:
        return None
    kw = {f: getattr(mb, f) for f in
          ("cb", "rb", "sb", "kc", "kr", "kup", "ne", "nr", "ns",
           "nl", "lb", "lake_meta")}
    for f in ("cell_f", "edge_f", "seg_f", "riv_f", "lake_w"):
        kw[f] = jnp.asarray(getattr(mb, f), jnp.float32)
    for f in ("cell_i", "edge_i", "seg_i", "riv_i"):
        kw[f] = jnp.asarray(getattr(mb, f), jnp.int32)
    return MegaBlocks(**kw)


# ---------------------------------------------------------------------------
# layout helpers (host/XLA side)
# ---------------------------------------------------------------------------


def block_cell(mb: MegaBlocks, v):
    v = jnp.asarray(v, jnp.float32)
    return jnp.pad(v, (0, mb.cb * 128 - v.shape[0])).reshape(mb.cb, 128)


def block_riv(mb: MegaBlocks, v):
    v = jnp.asarray(v, jnp.float32)
    return jnp.pad(v, (0, mb.rb * 128 - v.shape[0])).reshape(mb.rb, 128)


def block_seg(mb: MegaBlocks, v):
    v = jnp.asarray(v, jnp.float32)
    return jnp.pad(v, (0, mb.sb * 128 - v.shape[0])).reshape(mb.sb, 128)


def y_to_z(mb: MegaBlocks, y):
    """Concatenated state vector -> blocked Z array [3cb+rb+lb, 128]."""
    ne, nr, nl = mb.ne, mb.nr, mb.nl
    parts = [
        block_cell(mb, y[:ne]),
        block_cell(mb, y[ne:2 * ne]),
        block_cell(mb, y[2 * ne:3 * ne]),
        block_riv(mb, y[3 * ne:3 * ne + nr]),
    ]
    if mb.lb > 0:
        v = jnp.asarray(y[3 * ne + nr:3 * ne + nr + nl], jnp.float32)
        parts.append(
            jnp.pad(v, (0, mb.lb * 128 - nl)).reshape(mb.lb, 128))
    return jnp.concatenate(parts, axis=0)


def z_to_y(mb: MegaBlocks, z, dtype=jnp.float32):
    ne, nr, cb, rb = mb.ne, mb.nr, mb.cb, mb.rb
    parts = [
        z[0:cb].reshape(-1)[:ne],
        z[cb:2 * cb].reshape(-1)[:ne],
        z[2 * cb:3 * cb].reshape(-1)[:ne],
        z[3 * cb:3 * cb + rb].reshape(-1)[:nr],
    ]
    if mb.lb > 0:
        parts.append(z[3 * cb + rb:].reshape(-1)[:mb.nl])
    return jnp.concatenate(parts).astype(dtype)


def z_mask(mb: MegaBlocks):
    """1.0 on real entries, 0.0 on padding — the solver's ewt mask."""
    mc = np.zeros(mb.cb * 128, np.float32)
    mc[: mb.ne] = 1.0
    mr = np.zeros(mb.rb * 128, np.float32)
    mr[: mb.nr] = 1.0
    mc = mc.reshape(mb.cb, 128)
    parts = [mc, mc, mc, mr.reshape(mb.rb, 128)]
    if mb.lb > 0:
        ml = np.zeros(mb.lb * 128, np.float32)
        ml[: mb.nl] = 1.0
        parts.append(ml.reshape(mb.lb, 128))
    return jnp.asarray(np.concatenate(parts, axis=0))


# per-window, per-lake forcing scalars (rows of the flake input)
FLAKE_ROWS = 8  # fixed row count of the flake block (supports nl <= 1024)


def forcing_to_blocks(mb: MegaBlocks, fs, seg_ele):
    """Pack a ForcingSlice into the kernel's window inputs:
    (forc_cell [len(FORC_CELL), cb, 128], forc_riv [2, rb, 128],
    seg_fu_sub [sb, 128], flake [2, FLAKE_ROWS, 128]).

    ``flake`` carries the per-lake mean precip / potential open-water evap
    (the reference's per-lake P/E sums, MD_f.cpp:36-47) at flat lane
    position l; zeros for lake-free meshes."""
    fcell = jnp.stack([block_cell(mb, getattr(fs, n)) for n in FORC_CELL])
    friv = jnp.stack([block_riv(mb, getattr(fs, n)) for n in FORC_RIV])
    segfu = block_seg(mb, jnp.asarray(fs.fu_sub, jnp.float32)[seg_ele])
    if mb.nl > 0:
        w = mb.lake_w[:, :mb.ne]  # [nl, ne]
        p_l = w @ jnp.asarray(fs.prcp, jnp.float32)
        e_l = w @ jnp.asarray(fs.pot_evap, jnp.float32)
        pad = FLAKE_ROWS * 128 - mb.nl
        flake = jnp.stack([
            jnp.pad(p_l, (0, pad)).reshape(FLAKE_ROWS, 128),
            jnp.pad(e_l, (0, pad)).reshape(FLAKE_ROWS, 128),
        ])
    else:
        flake = jnp.zeros((2, FLAKE_ROWS, 128), jnp.float32)
    return fcell, friv, segfu, flake


# ---------------------------------------------------------------------------
# in-kernel gather sweeps
# ---------------------------------------------------------------------------


def _sweep_gather(srcs, idx, src_rows):
    """out_k[i,j] = srcs_k[flat idx[i,j]] for each field k.

    ``srcs``: list of [src_rows, 128] VMEM values; ``idx``: [R, 128] i32
    flat indices into the source entity.  Chunk sweep: exact lane gather
    per 128-wide source chunk + select.  Pure index select — exact."""
    lane = idx & 127
    chunk = idx >> 7
    r = idx.shape[0]
    outs = [jnp.zeros((r, 128), jnp.float32)] * len(srcs)
    for c in range(src_rows):
        sel = chunk == c
        for k, s in enumerate(srcs):
            g = _lane_gather(jnp.broadcast_to(s[c][None, :], (r, 128)), lane)
            outs[k] = jnp.where(sel, g, outs[k])
    return outs


# ---------------------------------------------------------------------------
# pointwise physics (value [+ optional tangent] forms)
# ---------------------------------------------------------------------------


def _update_element(c, sf, us, gw):
    """Mirror of rhs.update_element (Element.cpp:347-384)."""
    aqd = c["aq_depth"]
    mac_d = c["mac_d"]
    af = c["geo_v_area_f"]
    k_mx = c["ksat_h"]
    k_mac = c["mac_ksat_h"]

    below = (mac_d <= ZERO) | (gw < aqd - mac_d)
    full = (k_mac * mac_d * af + k_mx * (aqd - mac_d * af)) / aqd
    part_num = k_mac * (gw - (aqd - mac_d)) * af + k_mx * (
        aqd - mac_d + (gw - (aqd - mac_d)) * (1.0 - af))
    part = part_num / jnp.where(gw == 0.0, 1.0, gw)
    effkh = jnp.where(below, k_mx, jnp.where(gw > aqd, full, part))

    deficit_raw = aqd - gw
    kmax = c["inf_ksat_v"] * (1.0 - c["h_area_f"]) + c["mac_ksat_v"] * c["h_area_f"]
    saturated = deficit_raw <= 0.0
    deficit = jnp.maximum(deficit_raw, 0.0)
    theta_raw = us / jnp.where(saturated, 1.0, deficit) * c["theta_s"]
    theta = jnp.where(saturated, c["theta_s"], theta_raw)
    satn = jnp.where(saturated, 1.0,
                     (theta - c["theta_r"]) / (c["theta_s"] - c["theta_r"]))
    hi = satn > 0.99
    lo = satn <= ZERO
    satn_mid = jnp.clip(satn, 1e-12, 1.0 - 1e-12)
    n = c["beta"]
    p1 = n / (n - 1.0)
    p2 = (n - 1.0) / n
    inner = _powp(satn_mid, p1)
    temp = -1.0 + _powp(jnp.maximum(1.0 - inner, _TINY), p2)
    sat_kr_mid = jnp.sqrt(satn_mid) * temp * temp
    satn_f = jnp.where(hi, 1.0, jnp.where(lo, 0.0, satn))
    sat_kr = jnp.where(hi, 1.0, jnp.where(lo, 0.0, sat_kr_mid))
    theta_f = jnp.where(hi, c["theta_s"], jnp.where(lo, c["theta_r"], theta))
    return dict(effkh=effkh, deficit=deficit, satn=satn_f, sat_kr=sat_kr,
                theta=theta_f, kmax=kmax,
                _res=(below, full, part, saturated, deficit_raw, theta_raw,
                      satn, hi, lo, satn_mid, inner, temp, sat_kr_mid, theta))


def _update_element_t(c, sf, us, gw, t_us, t_gw, cu):
    (below, full, part, saturated, deficit_raw, theta_raw, satn_pre, hi, lo,
     satn_mid, inner, temp, sat_kr_mid, theta_pre) = cu["_res"]
    aqd = c["aq_depth"]
    mac_d = c["mac_d"]
    af = c["geo_v_area_f"]
    k_mac = c["mac_ksat_h"]
    k_mx = c["ksat_h"]

    # effkh tangent
    t_full = jnp.zeros_like(t_gw)
    gw_safe = jnp.where(gw == 0.0, 1.0, gw)
    part_num = part * gw_safe
    t_part_num = (k_mac * af + k_mx * (1.0 - af)) * t_gw
    t_part = jnp.where(gw == 0.0, 0.0,
                       (t_part_num * gw_safe - part_num * t_gw)
                       / (gw_safe * gw_safe))
    t_effkh = jnp.where(below, 0.0, jnp.where(gw > aqd, t_full, t_part))

    t_deficit = _dmax0(deficit_raw, -t_gw)
    den = jnp.where(saturated, 1.0, jnp.maximum(deficit_raw, 0.0))
    t_theta_raw = jnp.where(
        saturated, 0.0,
        (t_us * den - us * t_deficit) / (den * den) * c["theta_s"])
    t_theta = jnp.where(saturated, 0.0, t_theta_raw)
    t_satn = jnp.where(saturated, 0.0,
                       t_theta / (c["theta_s"] - c["theta_r"]))
    # clip(x, a, b) tangent: JAX clip passes tangent only strictly inside
    in_rng = (satn_pre >= 1e-12) & (satn_pre <= 1.0 - 1e-12)
    t_satn_mid = jnp.where(in_rng, t_satn, 0.0)
    n = c["beta"]
    p1 = n / (n - 1.0)
    p2 = (n - 1.0) / n
    t_inner = p1 * inner / satn_mid * t_satn_mid
    omi = jnp.maximum(1.0 - inner, _TINY)
    t_omi = jnp.where(1.0 - inner > _TINY, -t_inner, 0.0)
    pw2 = _powp(omi, p2)
    t_pw2 = p2 * pw2 / omi * t_omi
    t_temp = t_pw2
    t_skr_mid = (0.5 / jnp.sqrt(satn_mid)) * t_satn_mid * temp * temp \
        + jnp.sqrt(satn_mid) * 2.0 * temp * t_temp
    t_satn_f = jnp.where(hi | lo, 0.0, t_satn)
    t_sat_kr = jnp.where(hi | lo, 0.0, t_skr_mid)
    t_theta_f = jnp.where(hi | lo, 0.0, t_theta)
    return dict(effkh=t_effkh, deficit=t_deficit, satn=t_satn_f,
                sat_kr=t_sat_kr, theta=t_theta_f,
                kmax=jnp.zeros_like(t_gw))


def _et_flux(c, f, sf, us, gw, satn):
    """Mirror of rhs.et_flux (MD_ET.cpp:343-404)."""
    va = c["veg_frac"]
    vb = 1.0 - va
    pj = 1.0 - c["imp_af"]
    fc = c["theta_s"] * 0.75
    beta_s_raw = (satn * (c["theta_s"] - c["theta_r"]) - c["theta_r"]) / (
        fc - c["theta_r"])
    beta_s = jnp.clip(beta_s_raw, 0.0, 1.0)
    ibeta = 0.5 * (1.0 - jnp.cos(3.1415926 * beta_s))

    pe = f["pot_evap"]
    sf0 = jnp.maximum(0.0, sf)
    es = jnp.minimum(sf0, pe) * vb
    rem = pe - es
    some_left = es < pe
    gw_high = gw > c["wetland_level"]
    gw0 = jnp.maximum(0.0, gw)
    us0 = jnp.maximum(0.0, us)
    eg = jnp.where(some_left & gw_high, jnp.minimum(gw0, rem) * pj * vb, 0.0)
    eu = jnp.where(some_left & ~gw_high,
                   jnp.minimum(us0, ibeta * rem) * pj * vb, 0.0)

    has_veg = f["lai"] > ZERO
    ic_dom = f["e_ic"] >= f["pot_tran"]
    root_deep = gw > c["rootreach_level"]
    ptr = f["pot_tran"] - f["e_ic"]
    tg = jnp.where(has_veg & ~ic_dom & root_deep,
                   jnp.minimum(gw0, ptr) * pj * va, 0.0)
    tu = jnp.where(has_veg & ~ic_dom & ~root_deep,
                   jnp.minimum(us0, ibeta * ptr) * pj * va, 0.0)
    return dict(es=es, eu=eu, eg=eg, tu=tu, tg=tg,
                _res=(beta_s_raw, beta_s, ibeta, sf0, es, rem, some_left,
                      gw_high, gw0, us0, has_veg, ic_dom, root_deep, ptr, pe))


def _et_flux_t(c, f, sf, us, gw, t_sf, t_us, t_gw, t_satn, et):
    (beta_s_raw, beta_s, ibeta, sf0, es, rem, some_left, gw_high, gw0, us0,
     has_veg, ic_dom, root_deep, ptr, pe) = et["_res"]
    va = c["veg_frac"]
    vb = 1.0 - va
    pj = 1.0 - c["imp_af"]
    fc = c["theta_s"] * 0.75
    t_beta_raw = t_satn * (c["theta_s"] - c["theta_r"]) / (fc - c["theta_r"])
    in_rng = (beta_s_raw >= 0.0) & (beta_s_raw <= 1.0)
    t_beta = jnp.where(in_rng, t_beta_raw, 0.0)
    t_ibeta = 0.5 * jnp.sin(3.1415926 * beta_s) * 3.1415926 * t_beta

    t_sf0 = _dmax0(sf, t_sf)
    t_gw0 = _dmax0(gw, t_gw)
    t_us0 = _dmax0(us, t_us)
    t_es = _dmin(sf0, pe, t_sf0, jnp.zeros_like(t_sf)) * vb
    t_rem = -t_es
    t_eg = jnp.where(some_left & gw_high,
                     _dmin(gw0, rem, t_gw0, t_rem) * pj * vb, 0.0)
    ib_rem = ibeta * rem
    t_ib_rem = t_ibeta * rem + ibeta * t_rem
    t_eu = jnp.where(some_left & ~gw_high,
                     _dmin(us0, ib_rem, t_us0, t_ib_rem) * pj * vb, 0.0)
    t_tg = jnp.where(has_veg & ~ic_dom & root_deep,
                     _dmin(gw0, ptr, t_gw0, jnp.zeros_like(t_gw)) * pj * va,
                     0.0)
    ib_ptr = ibeta * ptr
    t_ib_ptr = t_ibeta * ptr
    t_tu = jnp.where(has_veg & ~ic_dom & ~root_deep,
                     _dmin(us0, ib_ptr, t_us0, t_ib_ptr) * pj * va, 0.0)
    return dict(es=t_es, eu=t_eu, eg=t_eg, tu=t_tu, tg=t_tg)


def _infiltration(c, cu, sf, us, gw, net_prcp):
    """Mirror of rhs.flux_infiltration (Element.cpp:271-303)."""
    aqd = c["aq_depth"]
    av = sf + net_prcp
    gw_at_surface = (gw + us > aqd) | (cu["deficit"] < us)
    qex = jnp.abs(gw + us - aqd) / aqd * cu["kmax"]

    grad = 1.0 + av / c["inf_d"]
    heavy = av > cu["kmax"]
    medium = av > c["inf_ksat_v"]
    ikv = c["inf_ksat_v"]
    haf = c["h_area_f"]
    mkv = c["mac_ksat_v"]
    effk = jnp.where(
        heavy, ikv * (1.0 - haf) + haf * mkv * cu["satn"],
        jnp.where(medium,
                  cu["sat_kr"] * ikv * (1.0 - haf) + haf * mkv * cu["satn"],
                  cu["sat_kr"] * ikv * (1.0 - haf)))
    ge = jnp.maximum(0.0, grad * effk)
    qi = jnp.minimum(av, ge)
    act = (av > 0.0) & (cu["deficit"] > c["inf_d"])
    qi = jnp.where(act, qi, 0.0)
    qi = jnp.where(gw_at_surface, 0.0, qi)
    qex = jnp.where(gw_at_surface, qex, 0.0)
    return qi, qex, (av, gw_at_surface, grad, heavy, medium, effk, ge, act)


def _infiltration_t(c, cu, tcu, sf, us, gw, t_sf, t_us, t_gw, res):
    av, gw_at_surface, grad, heavy, medium, effk, ge, act = res
    aqd = c["aq_depth"]
    t_av = t_sf
    t_qex = _dabs(gw + us - aqd, t_gw + t_us) / aqd * cu["kmax"] \
        + jnp.abs(gw + us - aqd) / aqd * tcu["kmax"]
    t_grad = t_av / c["inf_d"]
    ikv = c["inf_ksat_v"]
    haf = c["h_area_f"]
    mkv = c["mac_ksat_v"]
    t_effk = jnp.where(
        heavy, haf * mkv * tcu["satn"],
        jnp.where(medium,
                  tcu["sat_kr"] * ikv * (1.0 - haf) + haf * mkv * tcu["satn"],
                  tcu["sat_kr"] * ikv * (1.0 - haf)))
    t_ge = _dmax0(grad * effk, t_grad * effk + grad * t_effk)
    t_qi = _dmin(av, ge, t_av, t_ge)
    t_qi = jnp.where(act, t_qi, 0.0)
    t_qi = jnp.where(gw_at_surface, 0.0, t_qi)
    t_qex = jnp.where(gw_at_surface, t_qex, 0.0)
    return t_qi, t_qex


def _recharge(c, cu, us, gw):
    """Mirror of rhs.flux_recharge (Element.cpp:304-334)."""
    skip = (gw > c["aq_depth"] - c["inf_d"]) & (us < cu["deficit"])
    g_act = (cu["theta"] > c["theta_r"]) & (us > EPSILON)
    grad = jnp.where(
        g_act,
        jnp.maximum((cu["theta"] - c["theta_r"]) /
                    (c["theta_fc"] - c["theta_r"]), 0.0),
        0.0)
    ku = c["inf_ksat_v"] * cu["sat_kr"]
    denom = cu["deficit"] * c["ksat_v"] + gw * ku
    ke = ku * c["ksat_v"] * (cu["deficit"] + gw) / jnp.where(
        denom == 0.0, 1.0, denom)
    ke = jnp.where(denom == 0.0, 0.0, ke)
    zerok = (c["inf_ksat_v"] <= 0.0) | (c["ksat_v"] <= 0.0)
    qr = jnp.where(zerok, 0.0, grad * ke)
    qr = jnp.where(skip, 0.0, qr)
    return qr, (skip, g_act, grad, ku, denom, ke, zerok)


def _recharge_t(c, cu, tcu, us, gw, t_us, t_gw, res):
    skip, g_act, grad, ku, denom, ke, zerok = res
    gr_raw = (cu["theta"] - c["theta_r"]) / (c["theta_fc"] - c["theta_r"])
    t_grad = jnp.where(
        g_act, _dmax0(gr_raw, tcu["theta"] / (c["theta_fc"] - c["theta_r"])),
        0.0)
    t_ku = c["inf_ksat_v"] * tcu["sat_kr"]
    t_denom = tcu["deficit"] * c["ksat_v"] + t_gw * ku + gw * t_ku
    den_s = jnp.where(denom == 0.0, 1.0, denom)
    num = ku * c["ksat_v"] * (cu["deficit"] + gw)
    t_num = (t_ku * (cu["deficit"] + gw)
             + ku * (tcu["deficit"] + t_gw)) * c["ksat_v"]
    t_ke = jnp.where(denom == 0.0, 0.0,
                     (t_num * den_s - num * t_denom) / (den_s * den_s))
    t_qr = jnp.where(zerok, 0.0, t_grad * ke + grad * t_ke)
    return jnp.where(skip, 0.0, t_qr)


def _weir_local(seg_isf, rstage, dep_e, zj, cwr, width):
    """weir_flow_jtoi in the local-datum form used by the RHS fast path:
    zi = zbank = 0, yi = seg_isf, zj = -riv_depth, yj = rstage."""
    hi = seg_isf
    hj = rstage + zj
    dh = hj - hi
    y0 = hi  # hi - zbank with zbank = 0
    y_pos = jnp.where(hi > 0.0, dh, y0)
    c_pos = (y0 > 0.0) & (rstage > dep_e)
    sq_pos = jnp.sqrt(2.0 * GRAV * jnp.maximum(y_pos, _TINY))
    q_pos = jnp.where(c_pos, cwr * sq_pos * width * y_pos * 60.0, 0.0)
    y_neg = jnp.where(hj > 0.0, -dh, y0)
    c_neg = (y0 > 0.0) & (seg_isf > dep_e)
    sq_neg = jnp.sqrt(2.0 * GRAV * jnp.maximum(y_neg, _TINY))
    q_neg = jnp.where(c_neg, -cwr * sq_neg * width * y_neg * 60.0, 0.0)
    q = jnp.where(dh > 0.0, q_pos, q_neg)
    return q, (hi, hj, dh, y0, y_pos, c_pos, sq_pos, y_neg, c_neg, sq_neg)


def _weir_local_t(t_isf, t_rstage, cwr, width, res):
    hi, hj, dh, y0, y_pos, c_pos, sq_pos, y_neg, c_neg, sq_neg = res
    t_hi = t_isf
    t_hj = t_rstage
    t_dh = t_hj - t_hi
    t_y0 = t_hi
    t_ypos = jnp.where(hi > 0.0, t_dh, t_y0)
    t_sqpos = jnp.where(y_pos > _TINY,
                        2.0 * GRAV * t_ypos / (2.0 * sq_pos), 0.0)
    t_qpos = jnp.where(c_pos,
                       cwr * (t_sqpos * y_pos + sq_pos * t_ypos) * width
                       * 60.0, 0.0)
    t_yneg = jnp.where(hj > 0.0, -t_dh, t_y0)
    t_sqneg = jnp.where(y_neg > _TINY,
                        2.0 * GRAV * t_yneg / (2.0 * sq_neg), 0.0)
    t_qneg = jnp.where(c_neg,
                       -cwr * (t_sqneg * y_neg + sq_neg * t_yneg) * width
                       * 60.0, 0.0)
    return jnp.where(dh > 0.0, t_qpos, t_qneg)


def _r2e_local(rstage, zr_loc, gw_e, kh_e, k_riv, length, d_riv):
    """flux_r2e_gw in local-datum form (ze = 0, zr = aq_depth - riv_depth)."""
    k = 0.5 * (kh_e + k_riv)
    he = gw_e
    hr = rstage + zr_loc
    dh = hr - he
    g = dh / d_riv
    a_r2e = jnp.where(he > zr_loc, (rstage + (he - zr_loc)) * 0.5 * length,
                      rstage * length)
    q_r2e = jnp.where(rstage < EPSILON, 0.0, a_r2e * k * g)
    a_e2r = (rstage + (he - zr_loc)) * 0.5 * length
    q_e2r = jnp.where(gw_e > ZERO, a_e2r * k * g, 0.0)
    q = jnp.where(dh > ZERO, q_r2e, jnp.where(dh < -ZERO, q_e2r, 0.0))
    zerok = (kh_e < ZERO) | (k_riv < ZERO)
    q = jnp.where(zerok, 0.0, q)
    return q, (k, he, hr, dh, g, a_r2e, q_r2e, a_e2r, q_e2r, zerok)


def _r2e_local_t(rstage, zr_loc, gw_e, t_rstage, t_gw_e, t_kh_e,
                 length, d_riv, res):
    k, he, hr, dh, g, a_r2e, q_r2e, a_e2r, q_e2r, zerok = res
    t_k = 0.5 * t_kh_e
    t_he = t_gw_e
    t_dh = t_rstage - t_he
    t_g = t_dh / d_riv
    t_ar2e = jnp.where(he > zr_loc, (t_rstage + t_he) * 0.5 * length,
                       t_rstage * length)
    t_qr2e = jnp.where(rstage < EPSILON, 0.0,
                       t_ar2e * k * g + a_r2e * (t_k * g + k * t_g))
    t_ae2r = (t_rstage + t_he) * 0.5 * length
    t_qe2r = jnp.where(gw_e > ZERO,
                       t_ae2r * k * g + a_e2r * (t_k * g + k * t_g), 0.0)
    t_q = jnp.where(dh > ZERO, t_qr2e, jnp.where(dh < -ZERO, t_qe2r, 0.0))
    return jnp.where(zerok, 0.0, t_q)


def _manning(area, rough, r, s):
    q_pos = jnp.sqrt(jnp.maximum(jnp.abs(s), _TINY)) * area * _pow23(r) / rough
    return jnp.where(s > 0, q_pos, -q_pos), q_pos


def _manning_t(area, rough, r, s, t_area, t_r, t_s, q_pos):
    abs_s = jnp.abs(s)
    sq = jnp.sqrt(jnp.maximum(abs_s, _TINY))
    t_abs = _dabs(s, t_s)
    t_sq = jnp.where(abs_s > _TINY, t_abs / (2.0 * sq), 0.0)
    p23 = _pow23(r)
    t_p23 = jnp.where(r > _TINY, (2.0 / 3.0) * t_r / _cbrt_pos(r), 0.0)
    t_qpos = (t_sq * area * p23 + sq * t_area * p23 + sq * area * t_p23) / rough
    return jnp.where(s > 0, t_qpos, -t_qpos)


def _da_to_dy(da, w_top, s):
    """Citardauq form 2·da/(w + sqrt(w² + 4s·da)) — cancellation-free
    (mirrors physics.fun_da_to_dy)."""
    s_abs = jnp.abs(s)
    cc = w_top * w_top + 4.0 * s_abs * da
    sq = jnp.sqrt(jnp.maximum(cc, _TINY))
    denom = w_top + sq
    den_s = jnp.where(denom <= 0.0, 1.0, denom)
    quad = jnp.where(cc < ZERO, -w_top / (2.0 * s_abs), 2.0 * da / den_s)
    EPS_SLOPE = 0.05e-6
    dy = jnp.where(s_abs < EPS_SLOPE, da / w_top, quad)
    return jnp.where(da == 0.0, 0.0, dy), (s_abs, cc, sq, den_s, quad)


def _da_to_dy_t(da, w_top, s, t_da, t_wtop, res):
    s_abs, cc, sq, den_s, quad = res
    t_cc = 2.0 * w_top * t_wtop + 4.0 * s_abs * t_da
    t_sq = jnp.where(cc > _TINY, t_cc / (2.0 * sq), 0.0)
    t_den = t_wtop + t_sq
    t_quad = jnp.where(
        cc < ZERO, -t_wtop / (2.0 * s_abs),
        (2.0 * t_da * den_s - 2.0 * da * t_den) / (den_s * den_s))
    EPS_SLOPE = 0.05e-6
    t_dy = jnp.where(s_abs < EPS_SLOPE,
                     (t_da * w_top - da * t_wtop) / (w_top * w_top), t_quad)
    return jnp.where(da == 0.0, 0.0, t_dy)


# ---------------------------------------------------------------------------
# the megakernel
# ---------------------------------------------------------------------------


def _mega_core(close_boundary, meta, cF, cI, eF, eI, sF, sI, rF, rI,
               fC, fR, segfu, fL, sf_raw, us, gw_raw, rv_raw, lk_raw,
               tans=None, want_diag=False):
    """The full RHS dataflow on VMEM-resident values.

    With ``tans=(t_sf, t_us, t_gw, t_rv, t_lk)`` returns the directional
    derivative (recomputing the primal in-register); else the primal.
    Mirrors ``rhs.rhs_full``'s f32 fast path stage-for-stage (incl. the
    lake module when nl > 0: lake-cell overrides, bank weir/Darcy against
    the in-kernel lake-stage scalars, per-lake masked-sum reductions, and
    the bathymetry bucket dStage — MD_Lake.cpp / MD_f.cpp:44-47,180-191).

    ``want_diag`` (primal only): additionally returns the driver's
    per-window diagnostic fields (DIAG_CELL/DIAG_RIV/DIAG_LAKE blocks),
    mirroring ``rhs.rhs_full``'s diag dict — so one extra kernel launch
    replaces the whole XLA diagnostics RHS in the fused driver.
    """
    cb, rb, sb, kc, kr, kup, lb, nl, lake_meta = meta
    c = {n: cF[i] for n, i in CF.items()}
    f = {n: fC[i] for n, i in FC.items()}
    with_t = tans is not None
    if with_t:
        t_sf, t_us, t_gw_raw, t_rv, t_lk = tans

    ibc_pos = cI[CIB["ibc_pos"]] > 0
    ibc_neg = cI[CIB["ibc_neg"]] > 0
    iss_pos = cI[CIB["iss_pos"]] > 0
    iss_neg = cI[CIB["iss_neg"]] > 0
    valid_c = cI[CIB["valid"]] > 0

    # --- lake-stage scalars (nl is tiny; static python loop) ---
    if nl > 0:
        is_lake_c = cI[CIB["is_lake"]] > 0
        zmin_t, bathy_y_t, bathy_a_t, _nele_t = lake_meta
        ii = jax.lax.broadcasted_iota(jnp.int32, (lb, 128), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (lb, 128), 1)
        lflat = ii * 128 + jj
        stg_l = [jnp.sum(jnp.where(lflat == li, lk_raw, 0.0))
                 for li in range(nl)]
        if with_t:
            t_stg_l = [jnp.sum(jnp.where(lflat == li, t_lk, 0.0))
                       for li in range(nl)]

    # --- f_update: BC overrides (MD_update.cpp:102-189) ---
    gw = jnp.where(ibc_pos, f["ele_ybc"], gw_raw)
    riv_bcpos = rI[RIB["bc_pos"]] > 0
    rstage = jnp.where(riv_bcpos, fR[FR["riv_ybc"]], rv_raw)
    if with_t:
        t_gw = jnp.where(ibc_pos, 0.0, t_gw_raw)
        t_rst = jnp.where(riv_bcpos, 0.0, t_rv)

    # --- river trapezoid geometry (River.cpp:49-62) ---
    bs = rF[RF["bank_slope"]]
    bw = rF[RF["bottom_width"]]
    topw_raw = rstage * bs * 2.0 + bw
    r_topw = jnp.maximum(topw_raw, 0.0)
    csa_raw = rstage * (bw + rstage * bs)
    r_csa = jnp.maximum(csa_raw, 0.0)
    per_raw = 2.0 * jnp.abs(rstage) * jnp.sqrt(1.0 + bs * bs) + bw
    r_per = jnp.maximum(per_raw, 0.0)
    if with_t:
        t_topw = _dmax0(topw_raw, t_rst * bs * 2.0)
        t_csa = _dmax0(csa_raw, t_rst * (bw + 2.0 * rstage * bs))
        t_per = _dmax0(per_raw, 2.0 * _dabs(rstage, t_rst)
                       * jnp.sqrt(1.0 + bs * bs))

    # --- pointwise cell physics ---
    cu = _update_element(c, sf_raw, us, gw)
    if nl > 0:
        # lake-cell overrides (updateLakeElement, Element.cpp:373-383).
        # Only effkh is observable through neighbour gathers; the vertical
        # fluxes below are zeroed and the lake cells' own dY rows are
        # forced to 0 at assembly, exactly like the XLA path.
        cu["effkh"] = jnp.where(is_lake_c, c["ksat_h"], cu["effkh"])
    et = _et_flux(c, f, sf_raw, us, gw, cu["satn"])
    qi0, qex0, res_inf = _infiltration(c, cu, sf_raw, us, gw, f["net_prcp"])
    q_infil = qi0 * f["fu_surf"]
    q_exfil = qex0 * f["fu_surf"]
    qr0, res_rech = _recharge(c, cu, us, gw)
    q_rech = qr0 * f["fu_sub"]
    if nl > 0:
        q_infil = jnp.where(is_lake_c, 0.0, q_infil)
        q_exfil = jnp.where(is_lake_c, 0.0, q_exfil)
        q_rech = jnp.where(is_lake_c, 0.0, q_rech)
    if with_t:
        tcu = _update_element_t(c, sf_raw, us, gw, t_us, t_gw, cu)
        if nl > 0:
            tcu["effkh"] = jnp.where(is_lake_c, 0.0, tcu["effkh"])
        tet = _et_flux_t(c, f, sf_raw, us, gw, t_sf, t_us, t_gw,
                         tcu["satn"], et)
        t_qi0, t_qex0 = _infiltration_t(c, cu, tcu, sf_raw, us, gw,
                                        t_sf, t_us, t_gw, res_inf)
        t_qinf = t_qi0 * f["fu_surf"]
        t_qexf = t_qex0 * f["fu_surf"]
        t_qrech = _recharge_t(c, cu, tcu, us, gw, t_us, t_gw, res_rech) \
            * f["fu_sub"]
        if nl > 0:
            t_qinf = jnp.where(is_lake_c, 0.0, t_qinf)
            t_qexf = jnp.where(is_lake_c, 0.0, t_qexf)
            t_qrech = jnp.where(is_lake_c, 0.0, t_qrech)

    # --- 3-edge lateral stencil (MD_ElementFlux.cpp:35-156) ---
    nbq = eI[EI["nbq"]]
    m_int = eI[EI["m_int"]] > 0
    m_bnd = eI[EI["m_bnd"]] > 0
    B = eF[EF["B"]]
    dist = eF[EF["dist"]]
    ravg = eF[EF["ravg"]]
    dzs = eF[EF["dzs"]]
    dzb = eF[EF["dzb"]]
    d2e = eF[EF["d2e"]]

    def rep3(v):
        return jnp.concatenate([v, v, v], axis=0)

    dep3 = rep3(c["depression"])
    rcell3 = rep3(c["rough"])
    isf = rep3(jnp.maximum(sf_raw, 0.0))
    gw3 = rep3(gw)
    kh3 = rep3(cu["effkh"])
    if with_t:
        t_isf = rep3(_dmax0(sf_raw, t_sf))
        t_gw3 = rep3(t_gw)
        t_kh3 = rep3(tcu["effkh"])
        nsf_raw, ngw, nkh, t_nsf_raw, t_ngw, t_nkh = _sweep_gather(
            [sf_raw, gw, cu["effkh"], t_sf, t_gw, tcu["effkh"]], nbq, cb)
        t_nsf = _dmax0(nsf_raw, t_nsf_raw)
    else:
        nsf_raw, ngw, nkh = _sweep_gather(
            [sf_raw, gw, cu["effkh"]], nbq, cb)
    nsf = jnp.maximum(nsf_raw, 0.0)

    q_int, res_si = _flux_surface_int(isf, nsf, dzs, dist, B, ravg, dep3)
    q_sub_int, res_bi = _flux_sub_int(gw3, ngw, kh3, nkh, dzb, dist, B)
    if close_boundary:
        q_esurf = jnp.where(m_int, q_int, 0.0)
        q_esub0 = jnp.where(m_int, q_sub_int, 0.0)
    else:
        q_bnd, res_sb = _flux_surface_bnd(isf, d2e, B, rcell3, dep3)
        q_sub_bnd, res_bb = _flux_sub_bnd(gw3, kh3, d2e, dep3)
        q_esurf = jnp.where(m_int, q_int, jnp.where(m_bnd, q_bnd, 0.0))
        q_esub0 = jnp.where(m_int, q_sub_int,
                            jnp.where(m_bnd, q_sub_bnd, 0.0))
    if with_t:
        tq_int = _flux_surface_int_t(isf, nsf, t_isf, t_nsf, res_si,
                                     dist, B, ravg, dep3)
        tq_sub_int = _flux_sub_int_t(gw3, ngw, t_gw3, t_ngw, t_kh3, t_nkh,
                                     res_bi, dist, B)
        if close_boundary:
            t_qesurf = jnp.where(m_int, tq_int, 0.0)
            t_qesub0 = jnp.where(m_int, tq_sub_int, 0.0)
        else:
            tq_bnd = _flux_surface_bnd_t(isf, t_isf, res_sb, d2e, B,
                                         rcell3, dep3)
            tq_sub_bnd = _flux_sub_bnd_t(gw3, kh3, t_gw3, t_kh3, res_bb,
                                         d2e)
            t_qesurf = jnp.where(m_int, tq_int,
                                 jnp.where(m_bnd, tq_bnd, 0.0))
            t_qesub0 = jnp.where(m_int, tq_sub_int,
                                 jnp.where(m_bnd, tq_sub_bnd, 0.0))

    # --- lake-bank branch (weir + Darcy against the lake stage;
    #     MD_ElementFlux.cpp:46-53,122; rhs.edge_fluxes lake masks) ---
    if nl > 0:
        m_lake_e = eI[EI["m_lake"]] > 0
        lkq = eI[EI["lk_id"]]
        lake_e = jnp.zeros_like(isf)
        for li in range(nl):
            lake_e = jnp.where(lkq == li, stg_l[li], lake_e)
        lake_nsf = jnp.maximum(lake_e, 0.0)
        dzl_e = eF[EF["lk_dzl"]]
        hi0 = lake_nsf + dzl_e  # y0 = yi + (zi - zbank), f64-precomputed dz
        dh_w = isf - hi0
        y_pos = jnp.where(hi0 > 0.0, dh_w, hi0)
        sq_pos = jnp.sqrt(2.0 * GRAV * jnp.maximum(y_pos, _TINY))
        c_pos = (hi0 > 0.0) & (isf > 0.01)
        q_pos = jnp.where(c_pos, 0.6 * sq_pos * B * y_pos * 60.0, 0.0)
        y_neg = jnp.where(isf > 0.0, -dh_w, hi0)
        sq_neg = jnp.sqrt(2.0 * GRAV * jnp.maximum(y_neg, _TINY))
        c_neg = (hi0 > 0.0) & (lake_nsf > 0.01)
        q_neg = jnp.where(c_neg, -0.6 * sq_neg * B * y_neg * 60.0, 0.0)
        q_surf_lk = jnp.where(dh_w > 0.0, q_pos, q_neg)

        dzbl_e = eF[EF["lk_dzb"]]
        dh_lk = (gw3 - lake_e) + dzbl_e
        ymean_lk = 0.5 * (jnp.maximum(gw3, 0.0) + jnp.maximum(lake_e, 0.0))
        kmean_lk = 0.5 * (kh3 + nkh)
        q_sub_lk = kmean_lk * (dh_lk / dist) * ymean_lk * B
        cut_lk = ((dh_lk > 0.0) & (gw3 <= 0.02)) | (
            (dh_lk < 0.0) & (lake_e <= 0.02))
        q_sub_lk = jnp.where(cut_lk, 0.0, q_sub_lk)

        q_esurf = jnp.where(m_lake_e, q_surf_lk, q_esurf)
        q_esub0 = jnp.where(m_lake_e, q_sub_lk, q_esub0)
        # per-lake bank totals use the UNSCALED sub flux (reference
        # asymmetry: fu_sub multiplies the cell side only)
        q_lk_surf_e = jnp.where(m_lake_e, q_surf_lk, 0.0)
        q_lk_sub_e = jnp.where(m_lake_e, q_sub_lk, 0.0)
        if with_t:
            t_lake_e = jnp.zeros_like(isf)
            for li in range(nl):
                t_lake_e = jnp.where(lkq == li, t_stg_l[li], t_lake_e)
            t_nsf_lk = _dmax0(lake_e, t_lake_e)
            t_hi0 = t_nsf_lk
            t_dh_w = t_isf - t_hi0
            t_y_pos = jnp.where(hi0 > 0.0, t_dh_w, t_hi0)
            t_sq_pos = jnp.where(y_pos > _TINY,
                                 2.0 * GRAV * t_y_pos / (2.0 * sq_pos), 0.0)
            t_q_pos = jnp.where(
                c_pos, 0.6 * (t_sq_pos * y_pos + sq_pos * t_y_pos) * B
                * 60.0, 0.0)
            t_y_neg = jnp.where(isf > 0.0, -t_dh_w, t_hi0)
            t_sq_neg = jnp.where(y_neg > _TINY,
                                 2.0 * GRAV * t_y_neg / (2.0 * sq_neg), 0.0)
            t_q_neg = jnp.where(
                c_neg, -0.6 * (t_sq_neg * y_neg + sq_neg * t_y_neg) * B
                * 60.0, 0.0)
            t_q_surf_lk = jnp.where(dh_w > 0.0, t_q_pos, t_q_neg)

            t_dh_lk = t_gw3 - t_lake_e
            t_ymean_lk = 0.5 * (_dmax0(gw3, t_gw3)
                                + _dmax0(lake_e, t_lake_e))
            t_kmean_lk = 0.5 * (t_kh3 + t_nkh)
            t_q_sub_lk = (t_kmean_lk * (dh_lk / dist) * ymean_lk
                          + kmean_lk * (t_dh_lk / dist) * ymean_lk
                          + kmean_lk * (dh_lk / dist) * t_ymean_lk) * B
            t_q_sub_lk = jnp.where(cut_lk, 0.0, t_q_sub_lk)

            t_qesurf = jnp.where(m_lake_e, t_q_surf_lk, t_qesurf)
            t_qesub0 = jnp.where(m_lake_e, t_q_sub_lk, t_qesub0)
            t_lk_surf_e = jnp.where(m_lake_e, t_q_surf_lk, 0.0)
            t_lk_sub_e = jnp.where(m_lake_e, t_q_sub_lk, 0.0)

    fu_sub3 = rep3(f["fu_sub"])
    q_esub = q_esub0 * fu_sub3
    if with_t:
        t_qesub = t_qesub0 * fu_sub3

    def slot_sum(v):
        return v[0:cb] + v[cb:2 * cb] + v[2 * cb:3 * cb]

    # --- segment stencil (MD_RiverFlux.cpp:65-126) ---
    a_cell = sf_raw - q_infil + q_exfil
    se_q = sI[SI["se_q"]]
    sr_q = sI[SI["sr_q"]]
    if with_t:
        t_acell = t_sf - t_qinf + t_qexf
        sfe_raw, gwe, khe, t_sfe_raw, t_gwe, t_khe = _sweep_gather(
            [a_cell, gw, cu["effkh"], t_acell, t_gw, tcu["effkh"]],
            se_q, cb)
        (rstage_s, t_rst_s) = _sweep_gather([rstage, t_rst], sr_q, rb)
    else:
        sfe_raw, gwe, khe = _sweep_gather(
            [a_cell, gw, cu["effkh"]], se_q, cb)
        (rstage_s,) = _sweep_gather([rstage], sr_q, rb)
    seg_isf = jnp.maximum(0.0, sfe_raw)
    seg_valid = sF[SF["valid"]]
    q_seg_surf, res_w = _weir_local(
        seg_isf, rstage_s, sF[SF["dep_e"]], sF[SF["neg_depth"]],
        sF[SF["cwr"]], sF[SF["length"]])
    q_seg_surf = q_seg_surf * seg_valid
    q_r2e, res_r2e = _r2e_local(
        rstage_s, sF[SF["zr_loc"]], gwe, khe, sF[SF["ksat_riv"]],
        sF[SF["length"]], sF[SF["bed_thick"]])
    q_seg_sub = q_r2e * segfu * seg_valid
    if with_t:
        t_seg_isf = _dmax0(sfe_raw, t_sfe_raw)
        t_qseg_surf = _weir_local_t(t_seg_isf, t_rst_s, sF[SF["cwr"]],
                                    sF[SF["length"]], res_w) * seg_valid
        t_qseg_sub = _r2e_local_t(
            rstage_s, sF[SF["zr_loc"]], gwe, t_rst_s, t_gwe, t_khe,
            sF[SF["length"]], sF[SF["bed_thick"]], res_r2e) \
            * segfu * seg_valid

    # --- river chain (Flux_RiverDown, MD_RiverFlux.cpp:5-63) ---
    dn_q = rI[RIB["dn_q"]]
    if with_t:
        rstage_dn, t_rst_dn = _sweep_gather([rstage, t_rst], dn_q, rb)
    else:
        (rstage_dn,) = _sweep_gather([rstage], dn_q, rb)
    s_down = ((rstage - rF[RF["depth"]]) - (rstage_dn - rF[RF["depth_dn"]])
              ) / rF[RF["dist2down"]] + rF[RF["s_mean"]]
    per_z = r_per <= ZERO
    r_hyd = jnp.where(per_z, 0.0, r_csa / jnp.where(per_z, 1.0, r_per))
    q_down_int, qp_d = _manning(r_csa, rF[RF["avg_rough"]], r_hyd, s_down)
    s_out = rF[RF["bed_slope"]] + rstage * 2.0 / rF[RF["length"]]
    q_out_zdg, qp_z = _manning(r_csa, rF[RF["avg_rough"]], r_hyd, s_out)
    rs_fl = jnp.maximum(rstage, 1e-30)
    sq_g = jnp.sqrt(GRAV * rs_fl)
    q_out_crit = r_csa * sq_g * 60.0
    has_down = rI[RIB["has_down"]] > 0
    to_lake = rI[RIB["to_lake"]] > 0
    crit = rI[RIB["crit_out"]] > 0
    riv_valid = rF[RF["valid"]]
    q_riv_down = jnp.where(
        to_lake, q_out_zdg,
        jnp.where(has_down, q_down_int,
                  jnp.where(crit, q_out_crit, q_out_zdg))) * riv_valid
    if with_t:
        t_sdown = (t_rst - t_rst_dn) / rF[RF["dist2down"]]
        t_rhyd = jnp.where(
            per_z, 0.0,
            (t_csa * r_per - r_csa * t_per)
            / jnp.where(per_z, 1.0, r_per * r_per))
        t_qdown_int = _manning_t(r_csa, rF[RF["avg_rough"]], r_hyd, s_down,
                                 t_csa, t_rhyd, t_sdown, qp_d)
        t_sout = t_rst * 2.0 / rF[RF["length"]]
        t_qzdg = _manning_t(r_csa, rF[RF["avg_rough"]], r_hyd, s_out,
                            t_csa, t_rhyd, t_sout, qp_z)
        t_sqg = jnp.where(rstage > 1e-30, GRAV * t_rst / (2.0 * sq_g), 0.0)
        t_qcrit = (t_csa * sq_g + r_csa * t_sqg) * 60.0
        t_qriv_down = jnp.where(
            to_lake, t_qzdg,
            jnp.where(has_down, t_qdown_int,
                      jnp.where(crit, t_qcrit, t_qzdg))) * riv_valid

    # --- reductions (PassValue equivalents, fixed-width gather lists) ---
    nrb = len(RIB)
    ncb = len(CIB)
    if with_t:
        srcs_seg = [q_seg_surf, q_seg_sub, t_qseg_surf, t_qseg_sub]
    else:
        srcs_seg = [q_seg_surf, q_seg_sub]
    q_riv_surf = jnp.zeros((rb, 128), jnp.float32)
    q_riv_sub = jnp.zeros((rb, 128), jnp.float32)
    t_qriv_surf = jnp.zeros((rb, 128), jnp.float32)
    t_qriv_sub = jnp.zeros((rb, 128), jnp.float32)
    for k in range(kr):
        g = _sweep_gather(srcs_seg, rI[nrb + k], sb)
        q_riv_surf = q_riv_surf + g[0]
        q_riv_sub = q_riv_sub + g[1]
        if with_t:
            t_qriv_surf = t_qriv_surf + g[2]
            t_qriv_sub = t_qriv_sub + g[3]

    e2r_surf = jnp.zeros((cb, 128), jnp.float32)
    e2r_sub = jnp.zeros((cb, 128), jnp.float32)
    t_e2r_surf = jnp.zeros((cb, 128), jnp.float32)
    t_e2r_sub = jnp.zeros((cb, 128), jnp.float32)
    for k in range(kc):
        g = _sweep_gather(srcs_seg, cI[ncb + k], sb)
        e2r_surf = e2r_surf - g[0]
        e2r_sub = e2r_sub - g[1]
        if with_t:
            t_e2r_surf = t_e2r_surf - g[2]
            t_e2r_sub = t_e2r_sub - g[3]

    if with_t:
        srcs_riv = [q_riv_down, t_qriv_down]
    else:
        srcs_riv = [q_riv_down]
    q_riv_up = jnp.zeros((rb, 128), jnp.float32)
    t_qriv_up = jnp.zeros((rb, 128), jnp.float32)
    for k in range(kup):
        g = _sweep_gather(srcs_riv, rI[nrb + kr + k], rb)
        q_riv_up = q_riv_up - g[0]
        if with_t:
            t_qriv_up = t_qriv_up - g[1]

    # --- lake bucket dStage (MD_f.cpp:44-47,180-191; Lake.cpp:toparea) ---
    # per-lake scalar reductions over the bank-edge and river buffers;
    # both the primal and (when with_t) the tangent are accumulated, since
    # the tangent needs the primal scalars (clamps, 1/area quotient).
    dlake_blk = None
    t_dlake_blk = None
    diag_lake = {}
    if nl > 0 and want_diag:
        diag_lake = {k: jnp.zeros((lb, 128), jnp.float32) for k in DIAG_LAKE}
    if nl > 0:
        rlake_id = rI[RIB["lake_id"]]
        q_rl = jnp.where(to_lake, q_riv_down, 0.0)
        if with_t:
            t_q_rl = jnp.where(to_lake, t_qriv_down, 0.0)
        dlake_blk = jnp.zeros((lb, 128), jnp.float32)
        if with_t:
            t_dlake_blk = jnp.zeros((lb, 128), jnp.float32)
        for li in range(nl):
            p_li = jnp.sum(jnp.where(lflat == li, fL[0], 0.0))
            e_li = jnp.sum(jnp.where(lflat == li, fL[1], 0.0))
            avail = p_li + stg_l[li]
            inner = jnp.minimum(e_li, avail)
            evap = jnp.maximum(0.0, inner)
            surf_li = jnp.sum(jnp.where(lkq == li, q_lk_surf_e, 0.0))
            sub_li = jnp.sum(jnp.where(lkq == li, q_lk_sub_e, 0.0))
            rivin_li = jnp.sum(jnp.where(rlake_id == li, q_rl, 0.0))
            # piecewise-linear stage->area (sequential scan, Lake.cpp:59-78)
            yi = bathy_y_t[li]
            ai = bathy_a_t[li]
            yq = stg_l[li] + zmin_t[li]
            ta = jnp.asarray(ai[0], jnp.float32)
            done = yq <= yi[0]
            if with_t:
                t_yq = t_stg_l[li]
                t_ta = jnp.zeros((), jnp.float32)
            for i in range(1, len(yi)):
                below = yq < yi[i]
                eq = yi[i] == yq
                denom = jnp.where(eq, 1.0, yi[i] - yq)
                u = ai[i] - ta
                v = (yq - yi[i - 1]) / denom
                interp = u * v + ta
                new_ta = jnp.where(below, interp, ai[i])
                if with_t:
                    t_denom = jnp.where(eq, 0.0, -t_yq)
                    t_v = (t_yq * denom - (yq - yi[i - 1]) * t_denom) \
                        / (denom * denom)
                    t_interp = -t_ta * v + u * t_v + t_ta
                    t_new = jnp.where(below, t_interp, 0.0)
                    t_ta = jnp.where(done, t_ta, t_new)
                ta = jnp.where(done, ta, new_ta)
                done = done | below
            inflow = rivin_li + sub_li + surf_li
            dl = p_li - evap + inflow / ta
            dlake_blk = dlake_blk + jnp.where(lflat == li, dl, 0.0)
            if want_diag:
                sel_l = lflat == li
                for k, v in (("lake_area", ta), ("q_lake_evap", evap),
                             ("q_lake_prcp", p_li),
                             ("q_lake_rivin", rivin_li),
                             ("q_lake_surf", surf_li),
                             ("q_lake_sub", sub_li)):
                    diag_lake[k] = diag_lake[k] + jnp.where(sel_l, v, 0.0)
            if with_t:
                t_inner = _dmin(e_li, avail, jnp.zeros((), jnp.float32),
                                t_stg_l[li])
                t_evap = _dmax0(inner, t_inner)
                t_surf_li = jnp.sum(jnp.where(lkq == li, t_lk_surf_e, 0.0))
                t_sub_li = jnp.sum(jnp.where(lkq == li, t_lk_sub_e, 0.0))
                t_rivin_li = jnp.sum(jnp.where(rlake_id == li, t_q_rl, 0.0))
                t_inflow = t_rivin_li + t_sub_li + t_surf_li
                t_dl = -t_evap + (t_inflow * ta - inflow * t_ta) / (ta * ta)
                t_dlake_blk = t_dlake_blk + jnp.where(lflat == li, t_dl, 0.0)

    # --- assembly (f_applyDY, MD_f.cpp:52-215) ---
    area = c["area"]
    q_surf_tot = e2r_surf + slot_sum(q_esurf)
    q_sub_tot = e2r_sub + slot_sum(q_esub)
    if not with_t:
        dsf = f["net_prcp"] - q_infil + q_exfil - q_surf_tot / area \
            - et["es"]
        dus = q_infil - q_rech - et["eu"] - et["tu"]
        dgw = q_rech - q_exfil - q_sub_tot / area - et["eg"] - et["tg"]
        dgw = jnp.where(ibc_pos, 0.0, dgw)
        dgw = dgw + jnp.where(ibc_neg, f["ele_qbc"] / area, 0.0)
        dsf = dsf + jnp.where(iss_pos, f["ele_qss"] / area, 0.0)
        dgw = dgw + jnp.where(iss_neg, f["ele_qss"] / area, 0.0)
        dus = dus / c["sy"]
        dgw = dgw / c["sy"]
        if nl > 0:
            # lake cells carry no cell ODE (f_applyDY lake override)
            valid_nl = valid_c & ~is_lake_c
        else:
            valid_nl = valid_c
        dsf = jnp.where(valid_nl, dsf, 0.0)
        dus = jnp.where(valid_nl, dus, 0.0)
        dgw = jnp.where(valid_nl, dgw, 0.0)

        da_raw = (-q_riv_up - q_riv_surf - q_riv_sub - q_riv_down
                  + fR[FR["riv_qbc"]]) / rF[RF["length"]]
        d_area = jnp.maximum(da_raw, -r_csa)
        driv, _ = _da_to_dy(d_area, r_topw, bs)
        driv = jnp.where(riv_bcpos, 0.0, driv) * riv_valid
        if not want_diag:
            return dsf, dus, dgw, driv, dlake_blk
        # --- diagnostics (rhs_full's diag dict, driver accumulation set).
        # Lake-cell zeroing mirrors rhs_full lines 416-439: vertical/ET
        # terms and the cells' own lateral sums are zero on lake cells
        # (their dY rows are excluded anyway; only the reported means
        # care).
        pj = 1.0 - c["imp_af"]
        va = c["veg_frac"]
        has_veg = f["lai"] > ZERO
        ic_dom = f["e_ic"] >= f["pot_tran"]
        e_ic_out = jnp.where(
            has_veg, jnp.where(ic_dom, f["pot_tran"] * pj * va, f["e_ic"]),
            0.0)
        d_es, d_eu, d_eg = et["es"], et["eu"], et["eg"]
        d_tu, d_tg = et["tu"], et["tg"]
        own_surf = slot_sum(q_esurf)
        own_sub = slot_sum(q_esub)
        if nl > 0:
            d_es = jnp.where(is_lake_c, 0.0, d_es)
            d_eu = jnp.where(is_lake_c, 0.0, d_eu)
            d_eg = jnp.where(is_lake_c, 0.0, d_eg)
            d_tu = jnp.where(is_lake_c, 0.0, d_tu)
            d_tg = jnp.where(is_lake_c, 0.0, d_tg)
            e_ic_out = jnp.where(is_lake_c, 0.0, e_ic_out)
            own_surf = jnp.where(is_lake_c, 0.0, own_surf)
            own_sub = jnp.where(is_lake_c, 0.0, own_sub)
        diag_cell = {
            "q_rech": q_rech, "q_sub_tot": e2r_sub + own_sub,
            "q_surf_tot": e2r_surf + own_surf,
            "q_e2r_sub": e2r_sub, "q_e2r_surf": e2r_surf,
            "q_infil": q_infil, "q_exfil": q_exfil,
            "es": d_es, "eu": d_eu, "eg": d_eg, "tu": d_tu, "tg": d_tg,
            "e_ic": e_ic_out,
        }
        diag_riv = {
            "q_riv_up": q_riv_up, "q_riv_down": q_riv_down,
            "q_riv_sub": q_riv_sub, "q_riv_surf": q_riv_surf,
        }
        return dsf, dus, dgw, driv, dlake_blk, (diag_cell, diag_riv,
                                                diag_lake)

    t_dsf = -t_qinf + t_qexf - (t_e2r_surf + slot_sum(t_qesurf)) / area \
        - tet["es"]
    t_dus = t_qinf - t_qrech - tet["eu"] - tet["tu"]
    t_dgw = t_qrech - t_qexf - (t_e2r_sub + slot_sum(t_qesub)) / area \
        - tet["eg"] - tet["tg"]
    t_dgw = jnp.where(ibc_pos, 0.0, t_dgw)
    t_dus = t_dus / c["sy"]
    t_dgw = t_dgw / c["sy"]
    if nl > 0:
        valid_nl = valid_c & ~is_lake_c
    else:
        valid_nl = valid_c
    t_dsf = jnp.where(valid_nl, t_dsf, 0.0)
    t_dus = jnp.where(valid_nl, t_dus, 0.0)
    t_dgw = jnp.where(valid_nl, t_dgw, 0.0)

    da_raw = (-q_riv_up - q_riv_surf - q_riv_sub - q_riv_down
              + fR[FR["riv_qbc"]]) / rF[RF["length"]]
    t_da_raw = (-t_qriv_up - t_qriv_surf - t_qriv_sub - t_qriv_down
                ) / rF[RF["length"]]
    d_area = jnp.maximum(da_raw, -r_csa)
    t_darea = _dmax(da_raw, -r_csa, t_da_raw, -t_csa)
    _, res_dy = _da_to_dy(d_area, r_topw, bs)
    t_driv = _da_to_dy_t(d_area, r_topw, bs, t_darea, t_topw, res_dy)
    t_driv = jnp.where(riv_bcpos, 0.0, t_driv) * riv_valid
    return t_dsf, t_dus, t_dgw, t_driv, t_dlake_blk


def _split_z(z, cb, rb):
    return (z[0:cb], z[cb:2 * cb], z[2 * cb:3 * cb],
            z[3 * cb:3 * cb + rb], z[3 * cb + rb:])


def _mega_kernel(close_boundary, meta,
                 cf_ref, ci_ref, ef_ref, ei_ref, sf_ref, si_ref, rf_ref,
                 ri_ref, fc_ref, fr_ref, segfu_ref, fl_ref, z_ref, out_ref):
    cb, rb = meta[0], meta[1]
    ysf, yus, ygw, yrv, ylk = _split_z(z_ref[...], cb, rb)
    dsf, dus, dgw, drv, dlk = _mega_core(
        close_boundary, meta,
        cf_ref[...], ci_ref[...], ef_ref[...], ei_ref[...],
        sf_ref[...], si_ref[...], rf_ref[...], ri_ref[...],
        fc_ref[...], fr_ref[...], segfu_ref[...], fl_ref[...],
        ysf, yus, ygw, yrv, ylk)
    parts = [dsf, dus, dgw, drv] + ([dlk] if dlk is not None else [])
    out_ref[...] = jnp.concatenate(parts, axis=0)


def _mega_diag_kernel(close_boundary, meta,
                      cf_ref, ci_ref, ef_ref, ei_ref, sf_ref, si_ref,
                      rf_ref, ri_ref, fc_ref, fr_ref, segfu_ref, fl_ref,
                      z_ref, out_ref):
    cb, rb = meta[0], meta[1]
    ysf, yus, ygw, yrv, ylk = _split_z(z_ref[...], cb, rb)
    _, _, _, _, _, (dc, dr, dl) = _mega_core(
        close_boundary, meta,
        cf_ref[...], ci_ref[...], ef_ref[...], ei_ref[...],
        sf_ref[...], si_ref[...], rf_ref[...], ri_ref[...],
        fc_ref[...], fr_ref[...], segfu_ref[...], fl_ref[...],
        ysf, yus, ygw, yrv, ylk, want_diag=True)
    parts = ([dc[k] for k in DIAG_CELL] + [dr[k] for k in DIAG_RIV]
             + ([dl[k] for k in DIAG_LAKE] if dl else []))
    out_ref[...] = jnp.concatenate(parts, axis=0)


def _mega_kernel_jvp(close_boundary, meta,
                     cf_ref, ci_ref, ef_ref, ei_ref, sf_ref, si_ref, rf_ref,
                     ri_ref, fc_ref, fr_ref, segfu_ref, fl_ref, z_ref,
                     tz_ref, out_ref):
    cb, rb = meta[0], meta[1]
    ysf, yus, ygw, yrv, ylk = _split_z(z_ref[...], cb, rb)
    tsf, tus, tgw, trv, tlk = _split_z(tz_ref[...], cb, rb)
    odsf, odus, odgw, odrv, odlk = _mega_core(
        close_boundary, meta,
        cf_ref[...], ci_ref[...], ef_ref[...], ei_ref[...],
        sf_ref[...], si_ref[...], rf_ref[...], ri_ref[...],
        fc_ref[...], fr_ref[...], segfu_ref[...], fl_ref[...],
        ysf, yus, ygw, yrv, ylk, tans=(tsf, tus, tgw, trv, tlk))
    parts = [odsf, odus, odgw, odrv] + ([odlk] if odlk is not None else [])
    out_ref[...] = jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _interpret_default() -> bool:
    return jax.devices()[0].platform != "tpu"


def _statics(mb: MegaBlocks):
    return (mb.cell_f, mb.cell_i, mb.edge_f, mb.edge_i, mb.seg_f, mb.seg_i,
            mb.riv_f, mb.riv_i)


def _out_shape(mb: MegaBlocks):
    return jax.ShapeDtypeStruct((3 * mb.cb + mb.rb + mb.lb, 128),
                                jnp.float32)


def _meta(mb: MegaBlocks):
    return (mb.cb, mb.rb, mb.sb, mb.kc, mb.kr, mb.kup, mb.lb, mb.nl,
            mb.lake_meta)


def _compiler_params(mb: MegaBlocks):
    """Mosaic params: the tangent kernel's live primal+tangent
    intermediates overflow the 16 MiB default scoped-vmem limit on larger
    meshes (qhh); raise the cap (v5e has ~128 MiB VMEM/core)."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.custom_jvp, nondiff_argnums=(6, 7))
def _mega_call(mb, fcell, friv, segfu, flake, z, close_boundary, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = functools.partial(_mega_kernel, close_boundary, _meta(mb))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=_out_shape(mb),
            interpret=interpret,
            compiler_params=_compiler_params(mb),
        )(*_statics(mb), fcell, friv, segfu, flake, z)
    return out


@_mega_call.defjvp
def _mega_call_jvp(close_boundary, interpret, primals, tangents):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mb, fcell, friv, segfu, flake, z = primals
    t_z = tangents[5]
    # mesh tables and the frozen forcing slice are constants during a
    # solver window; their tangents are ignored (same caveat as
    # pallas_edge — do not differentiate w.r.t. forcing through this op)
    primal_out = _mega_call(mb, fcell, friv, segfu, flake, z,
                            close_boundary, interpret)

    kern = functools.partial(_mega_kernel_jvp, close_boundary, _meta(mb))
    with jax.enable_x64(False):
        t_out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=_out_shape(mb),
            interpret=interpret,
            compiler_params=_compiler_params(mb),
        )(*_statics(mb), fcell, friv, segfu, flake, z, t_z)
    return primal_out, t_out


def rhs_mega(mb: MegaBlocks, fcell, friv, segfu, z,
             close_boundary: bool = True,
             interpret: "bool | None" = None,
             flake=None):
    """dZ/dt in blocked layout — the whole RHS as ONE kernel launch.

    ``fcell/friv/segfu/flake`` from :func:`forcing_to_blocks` (frozen per
    solver window); ``z`` the blocked state from :func:`y_to_z`.
    Differentiable in ``z`` via the hand-derived tangent kernel; padding
    lanes of the output are identically zero.
    """
    if interpret is None:
        interpret = _interpret_default()
    if flake is None:
        if mb.nl > 0:
            raise ValueError(
                "lake mesh requires the flake input from forcing_to_blocks "
                "(per-lake precip/evap); omitting it would silently drop "
                "the lakes' P and E terms")
        flake = jnp.zeros((2, FLAKE_ROWS, 128), jnp.float32)
    return _mega_call(mb, fcell, friv, segfu, flake, z, close_boundary,
                      interpret)


def rhs_mega_diag(mb: MegaBlocks, fcell, friv, segfu, z,
                  close_boundary: bool = True,
                  interpret: "bool | None" = None,
                  flake=None):
    """Per-window diagnostic fields as ONE kernel launch (not
    differentiated): a dict of flat f32 arrays keyed by
    DIAG_CELL ([ne]) + DIAG_RIV ([nr]) + DIAG_LAKE ([nl], lake meshes),
    matching ``rhs.rhs_full``'s diag entries of the same names.  Replaces
    the driver's XLA diagnostics RHS (the ~40-op chain that dominated
    small-mesh wall time — docs/PERF.md)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = _interpret_default()
    if flake is None:
        if mb.nl > 0:
            raise ValueError(
                "lake mesh requires the flake input from forcing_to_blocks")
        flake = jnp.zeros((2, FLAKE_ROWS, 128), jnp.float32)
    nlake_f = len(DIAG_LAKE) if mb.nl > 0 else 0
    rows = len(DIAG_CELL) * mb.cb + len(DIAG_RIV) * mb.rb + nlake_f * mb.lb
    kern = functools.partial(_mega_diag_kernel, close_boundary, _meta(mb))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            interpret=interpret,
            compiler_params=_compiler_params(mb),
        )(*_statics(mb), fcell, friv, segfu, flake, z)
    diag = {}
    off = 0
    for k in DIAG_CELL:
        diag[k] = out[off:off + mb.cb].reshape(-1)[:mb.ne]
        off += mb.cb
    for k in DIAG_RIV:
        diag[k] = out[off:off + mb.rb].reshape(-1)[:mb.nr]
        off += mb.rb
    if mb.nl > 0:
        for k in DIAG_LAKE:
            diag[k] = out[off:off + mb.lb].reshape(-1)[:mb.nl]
            off += mb.lb
    return diag
