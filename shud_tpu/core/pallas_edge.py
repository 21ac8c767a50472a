"""Fused Pallas TPU kernel for the lateral edge-flux stencil.

This is the TPU-native replacement for the reference's per-element 3-edge
loops ``fun_Ele_surface`` / ``fun_Ele_sub`` (MD_ElementFlux.cpp:35-156): one
kernel performs the neighbour gather *and* the full diffusive-wave surface +
Darcy subsurface flux law, writing per-edge discharges without ever
materialising gathered neighbour fields in HBM.

Why a kernel at all: XLA lowers the unstructured neighbour gather
(``stacked[nabr]``) to a generic scatter/gather loop that is ~15-40x off
HBM-bandwidth speed-of-light at 1M+ cells.  The mesh, however, is static and
(after locality ordering) *banded*: every neighbour of a cell in block ``b``
lives in blocks ``b-1..b+1``.  The kernel exploits this:

* each grid step ``b`` DMAs three consecutive cell blocks (prev/self/next) of
  the dynamic fields (sf, gw, effKH) into VMEM — purely sequential HBM
  traffic, no gather;
* the per-edge neighbour lookup becomes an in-VMEM gather, implemented as a
  sweep over 128-lane window chunks using Mosaic's exact lane-wise
  ``dynamic_gather`` (``jnp.take_along_axis`` along the lane axis) + select.
  Cost per edge is O(window/128) cheap VPU ops instead of a random HBM access;
* the flux laws are evaluated in-register and only the two per-edge discharge
  arrays leave VMEM.

Bit-exactness: the gather is exact (index select, no arithmetic); the flux
math mirrors ``shud_tpu.core.rhs.edge_fluxes``'s fast path op-for-op, so CPU
interpret mode matches the XLA path bitwise and the TPU build differs only in
transcendental rounding (sqrt/cbrt), ~1 ulp.

The kernel covers the interior-neighbour and open-boundary branches; the
lake-bank branch (a handful of cells, MD_ElementFlux.cpp:46-53,122-137) is
computed by the caller in XLA and merged by mask, preserving the reference's
branch priority (lake > neighbour > boundary).

Requires a cell numbering with graph bandwidth <= block size (structured
refinements and RCB/BFS-ordered meshes qualify; ``locality_order`` in
``shud_tpu.parallel.partition`` produces one).  f32 only (Mosaic has no f64);
head-difference accuracy comes from the f64-precomputed edge dz arrays, the
same local-datum trick the XLA f32 fast path uses (docs/PERF.md).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from shud_tpu.config import MAXYSURF

_TINY = 1.0e-30  # matches physics._TINY


# ---------------------------------------------------------------------------
# preprocessing: blocked static geometry
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class EdgeBlocks:
    """Static per-edge data in TPU-blocked layout.

    Cells are grouped into ``nb`` contiguous blocks of ``blk`` (multiple of
    128); block ``b`` reads dynamic fields of blocks ``b-1, b, b+1`` (clamped)
    — preprocessing asserts every neighbour falls in that window.

    Per-edge arrays are ``[nb, 3*bc, 128]`` with row ``j*bc + (p//128)`` and
    lane ``p%128`` holding edge slot ``j`` of within-block cell ``p``
    (slot-major rows).  ``bc = blk // 128``.
    """

    blk: int
    nb: int
    bc: int
    num_ele: int  # unpadded

    nbq: np.ndarray        # [nb,3bc,128] i32 window-local neighbour index
    edge: np.ndarray       # [nb,3bc,128] f32 edge length
    dist: np.ndarray       # [nb,3bc,128] f32 dist2nabor (1.0 on non-interior)
    rough_avg: np.ndarray  # [nb,3bc,128] f32 avg Manning roughness
    dzs: np.ndarray        # [nb,3bc,128] f32 z_surf_i - z_surf_nb
    dzb: np.ndarray        # [nb,3bc,128] f32 z_bottom_i - z_bottom_nb
    m_int: np.ndarray      # [nb,3bc,128] i32 1 = interior-neighbour edge
    m_bnd: np.ndarray      # [nb,3bc,128] i32 1 = open-boundary edge
    dist2edge: np.ndarray  # [nb,3bc,128] f32 centroid-to-edge distance
    dep: np.ndarray        # [nb,bc,128]  f32 depression threshold
    rough_cell: np.ndarray # [nb,bc,128]  f32 cell Manning roughness
    used: np.ndarray = None  # [nb, k_hi-k_lo+1] i32: 1 if the block has
                             # any gathered edge at that row shift — the
                             # sweep lax.cond-skips unused shifts per block
    use_skip: bool = False   # static build-time decision (see
                             # _skip_worthwhile): skip only pays when the
                             # shared shift range is wide and sparse

    # gather row-shift range: every gathered edge's window row lies within
    # [own_row + k_lo, own_row + k_hi] (own_row = bc + position chunk).
    # The kernels sweep only these k_hi-k_lo+1 aligned shifts — O(band/128)
    # — instead of all 3*bc window chunks.
    k_lo: int = -1
    k_hi: int = 1


jax.tree_util.register_dataclass(
    EdgeBlocks,
    data_fields=["nbq", "edge", "dist", "rough_avg", "dzs", "dzb", "m_int",
                 "m_bnd", "dist2edge", "dep", "rough_cell", "used"],
    meta_fields=["blk", "nb", "bc", "num_ele", "k_lo", "k_hi", "use_skip"],
)


def graph_bandwidth(nabr: np.ndarray) -> int:
    """Max |neighbour - self| over real edges of a [Ne,3] adjacency."""
    ne = nabr.shape[0]
    has = nabr >= 0
    if not has.any():
        return 0
    d = np.abs(nabr - np.arange(ne)[:, None])
    return int(d[has].max())


def build_edge_blocks_arrays(
    ne: int,
    nabr: np.ndarray,       # [Ne,3] 0-based kernel-visible adjacency; -1 =
                            # not gathered by the kernel (boundary/remote/lake)
    m_int: np.ndarray,      # [Ne,3] bool: evaluate the interior law
    m_bnd: np.ndarray,      # [Ne,3] bool: evaluate the open-boundary law
    edge_len: np.ndarray, dist2nabor: np.ndarray, avg_rough: np.ndarray,
    dz_surf: np.ndarray, dz_bottom: np.ndarray, dist2edge: np.ndarray,
    depression: np.ndarray, rough: np.ndarray,
    min_blk: int = 512, max_blk: int = 8192,
    force_blk: "int | None" = None,
) -> "EdgeBlocks | None":
    """Array-level core of :func:`build_edge_blocks`.

    Callers supply the adjacency the kernel should gather through (interior
    edges only) plus the interior/boundary law masks; edges with both masks
    False (lake banks, cross-shard halo edges, padding) come out as 0 and
    are merged by the caller.  ``force_blk`` pins the block size so several
    shards of one partition share a single kernel shape."""
    nabr = np.asarray(nabr)
    gathered = np.asarray(m_int, bool)
    band = graph_bandwidth(np.where(gathered, nabr, -1))
    # Mosaic requires the (sublane, lane) dims of every block to be
    # (multiple of 8, 128) -> cell blocks are multiples of 8*128 = 1024
    blk = max(int(min_blk), band, 1024)
    blk = ((blk + 1023) // 1024) * 1024
    if force_blk is not None:
        if force_blk < blk:
            return None
        blk = int(force_blk)
    if blk > max_blk:
        return None
    nb = max(1, -(-ne // blk))
    bc = blk // 128
    npad = nb * blk

    def pad_cell(a, fill=0.0, dtype=np.float32):
        out = np.full(npad, fill, dtype=dtype)
        out[:ne] = np.asarray(a, dtype=dtype)
        return out

    def pad_edge(a, fill=0.0, dtype=np.float32):
        out = np.full((npad, 3), fill, dtype=dtype)
        out[:ne] = np.asarray(a, dtype=dtype)
        return out

    def blk_edge(a):
        # [npad,3] -> [nb, 3*bc, 128] slot-major rows
        return np.ascontiguousarray(
            a.reshape(nb, bc, 128, 3).transpose(0, 3, 1, 2)
            .reshape(nb, 3 * bc, 128)
        )

    def blk_cell(a):
        return np.ascontiguousarray(a.reshape(nb, bc, 128))

    # window-local neighbour index: window of block b holds positions
    # [0,blk)=prev block, [blk,2blk)=self, [2blk,3blk)=next, so the window
    # origin is cell (b-1)*blk — deliberately NOT clamped at b=0: the prev
    # ref then holds a duplicate of block 0 that no index points into
    cell_block = np.arange(ne) // blk
    win_start = (cell_block - 1) * blk
    q = np.where(gathered, nabr - win_start[:, None], 0)
    bad = gathered & ((q < 0) | (q >= 3 * blk))
    if bad.any():
        return None  # numbering not banded enough for this blk
    nbq = pad_edge(q, 0, np.int32)

    # aligned row-shift range of the gather sweep: window row of the
    # neighbour minus the cell's own window row (bc + position chunk)
    prow = (np.arange(ne) % blk) // 128
    shift = (q >> 7) - bc - prow[:, None]
    if gathered.any():
        k_lo = int(shift[gathered].min())
        k_hi = int(shift[gathered].max())
    else:
        k_lo, k_hi = 0, 0
    # per-block used-shift mask: most blocks touch only a few of the
    # [k_lo, k_hi] shifts (RCM numbering keeps neighbours near the
    # diagonal); the kernels skip the empty iterations per block
    used = np.zeros((nb, k_hi - k_lo + 1), np.int32)
    gi, gj = np.nonzero(gathered)
    if len(gi):
        used[cell_block[gi], shift[gi, gj] - k_lo] = 1

    return EdgeBlocks(
        blk=blk, nb=nb, bc=bc, num_ele=ne, k_lo=k_lo, k_hi=k_hi,
        nbq=blk_edge(nbq),
        edge=blk_edge(pad_edge(edge_len)),
        dist=blk_edge(pad_edge(np.where(gathered, dist2nabor, 1.0))),
        rough_avg=blk_edge(pad_edge(np.maximum(avg_rough, 1e-20))),
        dzs=blk_edge(pad_edge(dz_surf)),
        dzb=blk_edge(pad_edge(dz_bottom)),
        m_int=blk_edge(pad_edge(np.asarray(m_int, np.int32), 0, np.int32)),
        m_bnd=blk_edge(pad_edge(np.asarray(m_bnd, np.int32), 0, np.int32)),
        dist2edge=blk_edge(pad_edge(np.maximum(dist2edge, 1e-20))),
        dep=blk_cell(pad_cell(depression)),
        rough_cell=blk_cell(pad_cell(np.maximum(rough, 1e-20))),
        used=used, use_skip=_skip_worthwhile(used, k_lo, k_hi),
    )


def build_edge_blocks(md, min_blk: int = 512,
                      max_blk: int = 8192) -> "EdgeBlocks | None":
    """Blocked static tables for the Pallas edge kernel, or None when the
    mesh's numbering bandwidth exceeds *max_blk* (caller falls back to the
    XLA gather path; reorder with ``locality_order`` first for large
    unstructured meshes)."""
    nabr = np.asarray(md.nabr)
    has_nabr = nabr >= 0
    has_lake = np.asarray(md.lakenabr) >= 0
    return build_edge_blocks_arrays(
        md.num_ele, nabr,
        m_int=has_nabr & ~has_lake,
        m_bnd=~has_nabr & ~has_lake,
        edge_len=md.edge, dist2nabor=md.dist2nabor, avg_rough=md.avg_rough,
        dz_surf=md.edge_dz_surf, dz_bottom=md.edge_dz_bottom,
        dist2edge=md.dist2edge, depression=md.depression, rough=md.rough,
        min_blk=min_blk, max_blk=max_blk,
    )


def edge_blocks_to_device(eb: "EdgeBlocks | None") -> "EdgeBlocks | None":
    if eb is None:
        return None
    kw = {f: getattr(eb, f)
          for f in ("blk", "nb", "bc", "num_ele", "k_lo", "k_hi",
                    "use_skip")}
    for f in ("nbq", "m_int", "m_bnd", "used"):
        kw[f] = jnp.asarray(getattr(eb, f), jnp.int32)
    for f in ("edge", "dist", "rough_avg", "dzs", "dzb", "dist2edge",
              "dep", "rough_cell"):
        kw[f] = jnp.asarray(getattr(eb, f), jnp.float32)
    return EdgeBlocks(**kw)


# ---------------------------------------------------------------------------
# flux law (+ hand-derived tangent), shared by the primal and JVP kernels
# ---------------------------------------------------------------------------


def _cbrt_pos(x):
    """cbrt for x >= 0 with the x<=TINY floor folded in (Mosaic has no cbrt
    primitive): exp(log/3) seed + one Newton polish — <=2 ulp of true cbrt
    over the physical range (validated in tests/test_pallas_edge.py)."""
    xf = jnp.maximum(x, _TINY)
    t = jnp.exp(jnp.log(xf) * (1.0 / 3.0))
    return (2.0 * t + xf / (t * t)) * (1.0 / 3.0)


def _pow23(x):
    t = _cbrt_pos(x)
    return t * t


def _dmax0(x, tx):
    """Tangent of ``jnp.maximum(x, 0.0)`` (JAX convention: 0.5 at ties)."""
    return jnp.where(x > 0.0, tx, jnp.where(x == 0.0, 0.5 * tx, 0.0))


def _flux_surface_int(isf, nsf, dzs, dist, B, ravg, dep3):
    """Interior diffusive-wave surface flux; returns (q_int, residuals)."""
    dh = (isf - nsf) + dzs
    up1 = jnp.where(isf > dep3, isf, 0.0)
    up2 = jnp.where(nsf > dep3, nsf, 0.0)
    w = jnp.where(dh > 0.0, up1, up2)
    ymean = jnp.minimum(w, MAXYSURF)
    s = dh / dist
    sqrt_s = jnp.sqrt(jnp.maximum(jnp.abs(s), _TINY))
    p23 = _pow23(ymean)
    q_pos = sqrt_s * (ymean * B) * p23 / ravg
    q = jnp.where(s > 0, q_pos, -q_pos)
    q = jnp.where((s > 0) & (isf <= 0.0), 0.0, q)
    q = jnp.where((s < 0) & (nsf <= 0.0), 0.0, q)
    q = jnp.where(ymean <= 0.0, 0.0, q)
    return q, (dh, w, ymean, s, sqrt_s, p23)


def _flux_surface_int_t(isf, nsf, t_isf, t_nsf, res, dist, B, ravg, dep3):
    """Tangent of `_flux_surface_int`, mirroring JAX autodiff semantics
    (where selects the active branch; maximum averages at exact ties)."""
    dh, w, ymean, s, sqrt_s, p23 = res
    t_dh = t_isf - t_nsf
    t_up1 = jnp.where(isf > dep3, t_isf, 0.0)
    t_up2 = jnp.where(nsf > dep3, t_nsf, 0.0)
    t_w = jnp.where(dh > 0.0, t_up1, t_up2)
    t_ym = jnp.where(w < MAXYSURF, t_w,
                     jnp.where(w == MAXYSURF, 0.5 * t_w, 0.0))
    t_s = t_dh / dist
    t_abs_s = jnp.where(s >= 0.0, t_s, -t_s)
    t_sqrt_s = jnp.where(jnp.abs(s) > _TINY, t_abs_s / (2.0 * sqrt_s), 0.0)
    t_p23 = jnp.where(
        ymean > _TINY,
        (2.0 / 3.0) * t_ym / _cbrt_pos(ymean),
        0.0,
    )
    cross = ymean * B
    t_qpos = (t_sqrt_s * cross * p23
              + sqrt_s * (t_ym * B * p23 + cross * t_p23)) / ravg
    t_q = jnp.where(s > 0, t_qpos, -t_qpos)
    t_q = jnp.where((s > 0) & (isf <= 0.0), 0.0, t_q)
    t_q = jnp.where((s < 0) & (nsf <= 0.0), 0.0, t_q)
    t_q = jnp.where(ymean <= 0.0, 0.0, t_q)
    return t_q


def _flux_surface_bnd(isf, d2e, B, rcell3, dep3):
    sb = isf / d2e * 0.5
    isf5 = _cbrt_pos(isf * isf * isf * isf * isf)
    qb = jnp.sqrt(jnp.maximum(sb, 0.0)) * isf5 * B / rcell3
    q = jnp.where((isf > dep3) & (sb > 0.0), qb, 0.0)
    return q, (sb, isf5)


def _flux_surface_bnd_t(isf, t_isf, res, d2e, B, rcell3, dep3):
    sb, isf5 = res
    t_sb = t_isf / d2e * 0.5
    sqrt_sb = jnp.sqrt(jnp.maximum(sb, 0.0))
    t_sqrt_sb = jnp.where(sb > 0.0, t_sb / (2.0 * sqrt_sb), 0.0)
    # d cbrt(u)/du = 1/(3 cbrt(u)^2), u = isf^5; guarded to the active
    # region (isf > dep3 > 0) by the outer select
    u4 = isf * isf * isf * isf
    t_isf5 = jnp.where(
        isf > 0.0, 5.0 * u4 * t_isf / (3.0 * isf5 * isf5), 0.0)
    t_qb = (t_sqrt_sb * isf5 + sqrt_sb * t_isf5) * B / rcell3
    return jnp.where((isf > dep3) & (sb > 0.0), t_qb, 0.0)


def _flux_sub_int(gw3, ngw, kh3, nkh, dzb, dist, B):
    dh_s = (gw3 - ngw) + dzb
    ymean_s = 0.5 * (jnp.maximum(gw3, 0.0) + jnp.maximum(ngw, 0.0))
    grad_s = dh_s / dist
    kmean = 0.5 * (kh3 + nkh)
    q = kmean * grad_s * ymean_s * B
    cut = ((dh_s > 0.0) & (gw3 <= 0.02)) | ((dh_s < 0.0) & (ngw <= 0.02))
    q = jnp.where(cut, 0.0, q)
    return q, (dh_s, ymean_s, grad_s, kmean, cut)


def _flux_sub_int_t(gw3, ngw, t_gw3, t_ngw, t_kh3, t_nkh, res, dist, B):
    dh_s, ymean_s, grad_s, kmean, cut = res
    t_dh = t_gw3 - t_ngw
    t_ym = 0.5 * (_dmax0(gw3, t_gw3) + _dmax0(ngw, t_ngw))
    t_grad = t_dh / dist
    t_km = 0.5 * (t_kh3 + t_nkh)
    t_q = (t_km * grad_s * ymean_s + kmean * t_grad * ymean_s
           + kmean * grad_s * t_ym) * B
    return jnp.where(cut, 0.0, t_q)


def _flux_sub_bnd(gw3, kh3, d2e, dep3):
    grad_b = gw3 / d2e * 0.5
    act = (gw3 > dep3 * 10.0) & (grad_b > 0.0)
    return jnp.where(act, kh3 * grad_b, 0.0), (grad_b, act)


def _flux_sub_bnd_t(gw3, kh3, t_gw3, t_kh3, res, d2e):
    grad_b, act = res
    t_gradb = t_gw3 / d2e * 0.5
    return jnp.where(act, t_kh3 * grad_b + kh3 * t_gradb, 0.0)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


_LANE_GATHER_DN = jax.lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,))


def _lane_gather(x, idx):
    """out[i,j] = x[i, idx[i,j]] — the form Mosaic lowers to its exact
    lane-wise ``dynamic_gather``.  Direct lax.gather (not take_along_axis)
    so indices stay int32 under jax_enable_x64 (Mosaic has no 64-bit)."""
    return jax.lax.gather(
        x, idx[..., None], _LANE_GATHER_DN, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _window_gather_chunks(bc, nbq, parts):
    """Fallback sweep over all 3*bc window chunks (the pre-round-3 form;
    select with SHUD_EDGE_SWEEP=chunks).  Same exact semantics as
    `_window_gather`, O(bc) more VPU work."""
    lane = nbq & 127
    chunk = nbq >> 7
    e3 = 3 * bc
    nf = len(parts[0])
    outs = [jnp.zeros((e3, 128), jnp.float32)] * nf
    for c in range(3 * bc):
        srcs = parts[c // bc]
        r = c % bc
        sel = chunk == c
        for k in range(nf):
            g = _lane_gather(
                jnp.broadcast_to(srcs[k][r, :][None, :], (e3, 128)), lane)
            outs[k] = jnp.where(sel, g, outs[k])
    return outs


def _window_gather(bc, k_lo, k_hi, nbq, parts, used_ref=None):
    """In-VMEM banded gather via an aligned row-shift sweep.

    ``parts`` = 3 tuples (prev/self/next) of field refs; returns one gathered
    [3*bc, 128] array per field — a pure index select, exact.

    Every gathered edge's neighbour lies within [k_lo, k_hi] window rows of
    its cell's own row (the graph-bandwidth bound, computed at build time),
    so the sweep runs k_hi-k_lo+1 iterations — O(band/128) — instead of the
    3*bc full window chunks of the naive formulation.  For shift s the
    operand is the STATIC window slice win[bc+s : bc+s+bc] replicated per
    edge slot, so each iteration is one cheap aligned slice + one lane-wise
    ``dynamic_gather`` + one select."""
    import os

    if os.environ.get("SHUD_EDGE_SWEEP", "") == "chunks":
        return _window_gather_chunks(bc, nbq, parts)
    e3 = 3 * bc
    lane = nbq & 127
    # own window row of each output element: bc + its position chunk
    prow = jax.lax.broadcasted_iota(jnp.int32, (e3, 128), 0) % bc
    shift = (nbq >> 7) - bc - prow
    nf = len(parts[0])
    wins = [
        jnp.concatenate([parts[0][k][...], parts[1][k][...],
                         parts[2][k][...]], axis=0)
        for k in range(nf)
    ]
    outs = tuple(jnp.zeros((e3, 128), jnp.float32) for _ in range(nf))
    for s in range(k_lo, k_hi + 1):
        def sweep(o, s=s):
            sel = shift == s
            new = []
            for k in range(nf):
                rows = wins[k][bc + s : bc + s + bc]  # [bc,128] static
                op = jnp.concatenate([rows, rows, rows], axis=0)
                g = _lane_gather(op, lane)
                new.append(jnp.where(sel, g, o[k]))
            return tuple(new)

        if used_ref is None:
            outs = sweep(outs)
        else:
            # skip blocks with no gathered edge at this shift (per-block
            # band mask, computed at build time)
            from jax.experimental import pallas as pl

            outs = jax.lax.cond(used_ref[pl.program_id(0), s - k_lo] != 0,
                                sweep, lambda o: o, outs)
    return list(outs)


def _rep3(v):
    return jnp.concatenate([v, v, v], axis=0)


def _edge_kernel(close_boundary: bool, bc: int, k_lo: int, k_hi: int,
                 use_skip: bool,
                 nbq_ref, used_ref, edge_ref, dist_ref, ravg_ref, dzs_ref,
                 dzb_ref, mint_ref, mbnd_ref, d2e_ref,
                 dep_ref, rcell_ref,
                 sf_p, sf_s, sf_n, gw_p, gw_s, gw_n, kh_p, kh_s, kh_n,
                 qs_ref, qb_ref):
    nbq = nbq_ref[0]

    nsf_raw, ngw, nkh = _window_gather(
        bc, k_lo, k_hi, nbq,
        ((sf_p, gw_p, kh_p), (sf_s, gw_s, kh_s), (sf_n, gw_n, kh_n)),
        used_ref if use_skip else None)

    isf = _rep3(jnp.maximum(sf_s[...], 0.0))
    gw3 = _rep3(gw_s[...])
    kh3 = _rep3(kh_s[...])
    dep3 = _rep3(dep_ref[...])
    rcell3 = _rep3(rcell_ref[...])
    nsf = jnp.maximum(nsf_raw, 0.0)

    B = edge_ref[0]
    dist = dist_ref[0]
    ravg = ravg_ref[0]
    dzs = dzs_ref[0]
    dzb = dzb_ref[0]
    m_int = mint_ref[0] > 0
    m_bnd = mbnd_ref[0] > 0
    d2e = d2e_ref[0]

    q_int, _ = _flux_surface_int(isf, nsf, dzs, dist, B, ravg, dep3)
    q_sub_int, _ = _flux_sub_int(gw3, ngw, kh3, nkh, dzb, dist, B)

    if close_boundary:
        q_surf = jnp.where(m_int, q_int, 0.0)
        q_sub = jnp.where(m_int, q_sub_int, 0.0)
    else:
        q_bnd, _ = _flux_surface_bnd(isf, d2e, B, rcell3, dep3)
        q_sub_bnd, _ = _flux_sub_bnd(gw3, kh3, d2e, dep3)
        q_surf = jnp.where(m_int, q_int, jnp.where(m_bnd, q_bnd, 0.0))
        q_sub = jnp.where(m_int, q_sub_int,
                          jnp.where(m_bnd, q_sub_bnd, 0.0))

    qs_ref[0] = q_surf
    qb_ref[0] = q_sub


def _mask_max0(x):
    """d/dx of ``jnp.maximum(x, 0.0)`` as a multiplier (0.5 at ties)."""
    return jnp.where(x > 0.0, 1.0, jnp.where(x == 0.0, 0.5, 0.0))


def _edge_kernel_coeff(close_boundary: bool, bc: int, k_lo: int,
                       k_hi: int, use_skip: bool,
                       nbq_ref, used_ref, edge_ref, dist_ref, ravg_ref,
                       dzs_ref, dzb_ref, mint_ref, mbnd_ref, d2e_ref,
                       dep_ref, rcell_ref,
                       sf_p, sf_s, sf_n, gw_p, gw_s, gw_n, kh_p, kh_s, kh_n,
                       qs_ref, qb_ref,
                       si_ref, sj_ref, g1_ref, g2_ref, ki_ref, kj_ref):
    """Primal + linearisation-coefficient kernel.

    The edge-flux tangent is LINEAR in the six raw per-edge tangents
    (t_sf_i, t_sf_j, t_gw_i, t_gw_j, t_kh_i, t_kh_j); this kernel folds
    every branch mask / chain-rule factor of the hand tangent
    (`_flux_*_t`) into six per-edge coefficients so each Krylov J·v
    becomes a sparse multiply-add (`_edge_kernel_apply`) instead of
    re-evaluating the full flux law:

        tqs = S_i t_sf_i + S_j t_sf_j
        tqb = G1 t_gw_i + G2 t_gw_j + K_i t_kh_i + K_j t_kh_j

    ``jax.linearize`` hoists this kernel to the primal pass (its inputs are
    primal-only), so Newton pays it once per iteration while the m Krylov
    products run only the cheap apply kernel."""
    nbq = nbq_ref[0]

    nsf_raw, ngw, nkh = _window_gather(
        bc, k_lo, k_hi, nbq,
        ((sf_p, gw_p, kh_p), (sf_s, gw_s, kh_s), (sf_n, gw_n, kh_n)))

    sf_self = sf_s[...]
    isf = _rep3(jnp.maximum(sf_self, 0.0))
    m_i = _rep3(_mask_max0(sf_self))  # d isf / d sf_i
    gw3 = _rep3(gw_s[...])
    kh3 = _rep3(kh_s[...])
    dep3 = _rep3(dep_ref[...])
    rcell3 = _rep3(rcell_ref[...])
    nsf = jnp.maximum(nsf_raw, 0.0)
    m_j = _mask_max0(nsf_raw)  # d nsf / d sf_j

    B = edge_ref[0]
    dist = dist_ref[0]
    ravg = ravg_ref[0]
    dzs = dzs_ref[0]
    dzb = dzb_ref[0]
    m_int = mint_ref[0] > 0
    m_bnd = mbnd_ref[0] > 0
    d2e = d2e_ref[0]

    # ---- surface interior: primal + coefficients -------------------------
    q_int, (dh, w, ymean, s, sqrt_s, p23) = _flux_surface_int(
        isf, nsf, dzs, dist, B, ravg, dep3)
    cross = ymean * B
    # gate: exactly the zero-selects of `_flux_surface_int_t`
    gate = jnp.where((s > 0) & (isf <= 0.0), 0.0, 1.0)
    gate = jnp.where((s < 0) & (nsf <= 0.0), 0.0, gate)
    gate = jnp.where(ymean <= 0.0, 0.0, gate)
    sgn_q = jnp.where(s > 0, 1.0, -1.0)  # t_q = ±t_qpos
    sgn_s = jnp.where(s >= 0.0, 1.0, -1.0)  # t_abs_s = ±t_s
    # a: coefficient of t_dh (through sqrt_s); b: coefficient of t_w
    # (through ymean -> p23 and cross)
    a = jnp.where(
        jnp.abs(s) > _TINY,
        sgn_s / (2.0 * sqrt_s * dist) * cross * p23 / ravg,
        0.0,
    )
    c_p = jnp.where(ymean > _TINY, (2.0 / 3.0) / _cbrt_pos(ymean), 0.0)
    m_ym = jnp.where(w < MAXYSURF, 1.0,
                     jnp.where(w == MAXYSURF, 0.5, 0.0))
    b = sqrt_s * (B * p23 + cross * c_p) / ravg * m_ym
    u_i = jnp.where(dh > 0.0, jnp.where(isf > dep3, 1.0, 0.0), 0.0)
    u_j = jnp.where(dh > 0.0, 0.0, jnp.where(nsf > dep3, 1.0, 0.0))
    gs = gate * sgn_q
    s_i_int = gs * (a + b * u_i) * m_i
    s_j_int = gs * (-a + b * u_j) * m_j

    # ---- subsurface interior: primal + coefficients ----------------------
    q_sub_int, (dh_s, ymean_s, grad_s, kmean, cut) = _flux_sub_int(
        gw3, ngw, kh3, nkh, dzb, dist, B)
    live = jnp.where(cut, 0.0, 1.0)
    dmg_i = _mask_max0(gw3)
    dmg_j = _mask_max0(ngw)
    km_ym_d = kmean * ymean_s / dist
    half_kg = 0.5 * kmean * grad_s
    g1_int = live * B * (km_ym_d + half_kg * dmg_i)
    g2_int = live * B * (-km_ym_d + half_kg * dmg_j)
    k_sym = live * B * 0.5 * grad_s * ymean_s
    k_i_int = k_sym
    k_j_int = k_sym

    if close_boundary:
        qs_ref[0] = jnp.where(m_int, q_int, 0.0)
        qb_ref[0] = jnp.where(m_int, q_sub_int, 0.0)
        zi = jnp.zeros_like(s_i_int)
        si_ref[0] = jnp.where(m_int, s_i_int, zi)
        sj_ref[0] = jnp.where(m_int, s_j_int, zi)
        g1_ref[0] = jnp.where(m_int, g1_int, zi)
        g2_ref[0] = jnp.where(m_int, g2_int, zi)
        ki_ref[0] = jnp.where(m_int, k_i_int, zi)
        kj_ref[0] = jnp.where(m_int, k_j_int, zi)
    else:
        # ---- open-boundary branches (kinematic drainage) ------------------
        q_bnd, (sb, isf5) = _flux_surface_bnd(isf, d2e, B, rcell3, dep3)
        act_s = (isf > dep3) & (sb > 0.0)
        sqrt_sb = jnp.sqrt(jnp.maximum(sb, 0.0))
        c_sqrt_sb = jnp.where(sb > 0.0, 0.5 / (d2e * 2.0 * sqrt_sb), 0.0)
        u4 = isf * isf * isf * isf
        c_isf5 = jnp.where(isf > 0.0, 5.0 * u4 / (3.0 * isf5 * isf5), 0.0)
        s_b = jnp.where(
            act_s,
            (c_sqrt_sb * isf5 + sqrt_sb * c_isf5) * B / rcell3,
            0.0,
        ) * m_i

        q_sub_bnd, (grad_b, act_b) = _flux_sub_bnd(gw3, kh3, d2e, dep3)
        g1_bnd = jnp.where(act_b, kh3 * 0.5 / d2e, 0.0)
        k_i_bnd = jnp.where(act_b, grad_b, 0.0)

        qs_ref[0] = jnp.where(m_int, q_int, jnp.where(m_bnd, q_bnd, 0.0))
        qb_ref[0] = jnp.where(m_int, q_sub_int,
                              jnp.where(m_bnd, q_sub_bnd, 0.0))
        zi = jnp.zeros_like(s_i_int)
        si_ref[0] = jnp.where(m_int, s_i_int,
                              jnp.where(m_bnd, s_b, zi))
        sj_ref[0] = jnp.where(m_int, s_j_int, zi)
        g1_ref[0] = jnp.where(m_int, g1_int,
                              jnp.where(m_bnd, g1_bnd, zi))
        g2_ref[0] = jnp.where(m_int, g2_int, zi)
        ki_ref[0] = jnp.where(m_int, k_i_int,
                              jnp.where(m_bnd, k_i_bnd, zi))
        kj_ref[0] = jnp.where(m_int, k_j_int, zi)


def _edge_kernel_apply(bc: int, k_lo: int, k_hi: int, use_skip: bool,
                       nbq_ref, used_ref, si_ref, sj_ref, g1_ref, g2_ref,
                       ki_ref, kj_ref,
                       tsf_p, tsf_s, tsf_n, tgw_p, tgw_s, tgw_n,
                       tkh_p, tkh_s, tkh_n,
                       tqs_ref, tqb_ref):
    """J·v apply: gather the three tangent fields through the banded window
    and form the per-edge multiply-add with the precomputed coefficients —
    no flux-law recompute, no transcendentals.  This is what each Krylov
    vector inside Newton executes (solver/bdf.py)."""
    nbq = nbq_ref[0]

    tnsf, tngw, tnkh = _window_gather(
        bc, k_lo, k_hi, nbq,
        ((tsf_p, tgw_p, tkh_p), (tsf_s, tgw_s, tkh_s),
         (tsf_n, tgw_n, tkh_n)), used_ref if use_skip else None)

    t_sf3 = _rep3(tsf_s[...])
    t_gw3 = _rep3(tgw_s[...])
    t_kh3 = _rep3(tkh_s[...])

    tqs_ref[0] = si_ref[0] * t_sf3 + sj_ref[0] * tnsf
    tqb_ref[0] = (g1_ref[0] * t_gw3 + g2_ref[0] * tngw
                  + ki_ref[0] * t_kh3 + kj_ref[0] * tnkh)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _interpret_default() -> bool:
    return jax.devices()[0].platform != "tpu"


def _specs(eb, pl):
    nb, bc = eb.nb, eb.bc
    e_spec = pl.BlockSpec((1, 3 * bc, 128), lambda i: (i, 0, 0))
    f_prev = pl.BlockSpec((bc, 128), lambda i: (jnp.maximum(i - 1, 0), 0))
    f_self = pl.BlockSpec((bc, 128), lambda i: (i, 0))
    f_next = pl.BlockSpec((bc, 128),
                          lambda i: (jnp.minimum(i + 1, nb - 1), 0))
    return e_spec, f_prev, f_self, f_next


def _used_spec(eb, pl):
    """Per-block used-shift mask block (scalar memory: the values gate
    scf.if conditions, which Mosaic requires to be scalar reads)."""
    from jax.experimental.pallas import tpu as pltpu

    # whole [nb, nsh] table in scalar memory (Mosaic rejects partial
    # blocks whose dims are neither 8/128-divisible nor the full array);
    # kernels index rows by pl.program_id(0)
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _blocks_used_stats(eb):
    """(mean, max) used shifts per block — the expected sweep saving."""
    u = np.asarray(_eb_used(eb))
    return float(u.sum(-1).mean()), int(u.sum(-1).max())


def _skip_worthwhile(used, k_lo, k_hi) -> bool:
    """BUILD-TIME decision (stored as the static EdgeBlocks.use_skip meta
    field).  MEASURED AND REFUTED on the real chip (docs/PERF.md): even
    on the 1M-cell mesh with k=[-6,6] and only 3.97 of 13 shifts used
    per block on average, gating each shift behind lax.cond REGRESSES
    the kernel (0.921 vs 0.839 ms same-day no-skip baseline) — Mosaic's
    per-shift conditionals cost more than the skipped gather+selects.
    Default off everywhere; SHUD_EDGE_SKIP=1 re-enables the sparse
    heuristic for future hardware/compiler revisions."""
    import os

    if os.environ.get("SHUD_EDGE_SKIP", "0") in ("0", ""):
        return False
    if used is None:
        return False
    nsh = k_hi - k_lo + 1
    if nsh < 6:
        return False
    return float(np.asarray(used).sum(-1).mean()) <= 0.5 * nsh


def _cells(eb, v):
    npad = eb.nb * eb.blk
    v = jnp.asarray(v, jnp.float32)
    return jnp.pad(v, (0, npad - v.shape[0])).reshape(eb.nb * eb.bc, 128)


def _unblk(eb, a):
    nb, bc, ne = eb.nb, eb.bc, eb.num_ele
    return (a.reshape(nb, 3, bc, 128).transpose(0, 2, 3, 1)
            .reshape(nb * eb.blk, 3)[:ne])


def _eb_used(eb):
    """Per-block used-shift mask operand.

    Only the ``use_skip`` sweep reads it; otherwise pass a single dummy
    row — the full [nb, nsh] table lives in SMEM (scalar memory, 1 MiB)
    and at 10M cells (nb~3.4k, 37 shifts) it no longer fits, which used
    to fail compilation even though the values were never read."""
    if not getattr(eb, "use_skip", False):
        return jnp.ones((1, eb.k_hi - eb.k_lo + 1), jnp.int32)
    u = getattr(eb, "used", None)  # getattr: pre-round-4 pickled caches
    if u is None:
        return jnp.ones((eb.nb, eb.k_hi - eb.k_lo + 1), jnp.int32)
    return jnp.asarray(u, jnp.int32)


def _static_args(eb):
    return (eb.nbq, _eb_used(eb),
            eb.edge, eb.dist, eb.rough_avg, eb.dzs, eb.dzb,
            eb.m_int, eb.m_bnd, eb.dist2edge,
            eb.dep.reshape(eb.nb * eb.bc, 128),
            eb.rough_cell.reshape(eb.nb * eb.bc, 128))


@functools.partial(jax.custom_jvp, nondiff_argnums=(4, 5))
def _edge_pallas_core(eb, sf, gw, effkh, close_boundary, interpret):
    from jax.experimental import pallas as pl

    nb, bc = eb.nb, eb.bc
    e_spec, f_prev, f_self, f_next = _specs(eb, pl)
    sf_b, gw_b, kh_b = _cells(eb, sf), _cells(eb, gw), _cells(eb, effkh)

    kern = functools.partial(_edge_kernel, close_boundary, bc,
                             eb.k_lo, eb.k_hi,
                             getattr(eb, 'use_skip', False))
    u_spec = _used_spec(eb, pl)
    # Mosaic cannot lower 64-bit index/scalar types; scope out the global
    # jax_enable_x64 while tracing the kernel (all operands are 32-bit)
    with jax.enable_x64(False):
        qs, qb = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[e_spec, u_spec] + [e_spec] * 8 + [f_self, f_self]
            + [f_prev, f_self, f_next] * 3,
            out_specs=(e_spec, e_spec),
            out_shape=(
                jax.ShapeDtypeStruct((nb, 3 * bc, 128), jnp.float32),
                jax.ShapeDtypeStruct((nb, 3 * bc, 128), jnp.float32),
            ),
            interpret=interpret,
        )(*_static_args(eb),
          sf_b, sf_b, sf_b, gw_b, gw_b, gw_b, kh_b, kh_b, kh_b)
    return qs, qb


def _edge_pallas_coeff(eb, sf, gw, effkh, close_boundary, interpret):
    """Primal fluxes + the six per-edge linearisation coefficient blocks."""
    from jax.experimental import pallas as pl

    nb, bc = eb.nb, eb.bc
    e_spec, f_prev, f_self, f_next = _specs(eb, pl)
    sf_b, gw_b, kh_b = _cells(eb, sf), _cells(eb, gw), _cells(eb, effkh)

    kern = functools.partial(_edge_kernel_coeff, close_boundary,
                             bc, eb.k_lo, eb.k_hi,
                             getattr(eb, 'use_skip', False))
    u_spec = _used_spec(eb, pl)
    eshape = jax.ShapeDtypeStruct((nb, 3 * bc, 128), jnp.float32)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[e_spec, u_spec] + [e_spec] * 8 + [f_self, f_self]
            + [f_prev, f_self, f_next] * 3,
            out_specs=(e_spec,) * 8,
            out_shape=(eshape,) * 8,
            interpret=interpret,
        )(*_static_args(eb),
          sf_b, sf_b, sf_b, gw_b, gw_b, gw_b, kh_b, kh_b, kh_b)
    qs, qb = out[0], out[1]
    coeffs = out[2:]
    return (qs, qb), coeffs


def _edge_pallas_apply(eb, coeffs, tsf, tgw, tkh, interpret):
    """tangent = J·v through the precomputed coefficient blocks."""
    from jax.experimental import pallas as pl

    nb, bc = eb.nb, eb.bc
    e_spec, f_prev, f_self, f_next = _specs(eb, pl)
    tsf_b, tgw_b, tkh_b = _cells(eb, tsf), _cells(eb, tgw), _cells(eb, tkh)

    kern = functools.partial(_edge_kernel_apply, bc,
                             eb.k_lo, eb.k_hi,
                             getattr(eb, 'use_skip', False))
    u_spec = _used_spec(eb, pl)
    eshape = jax.ShapeDtypeStruct((nb, 3 * bc, 128), jnp.float32)
    with jax.enable_x64(False):
        tqs, tqb = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[e_spec, u_spec] + [e_spec] * 6
            + [f_prev, f_self, f_next] * 3,
            out_specs=(e_spec, e_spec),
            out_shape=(eshape, eshape),
            interpret=interpret,
        )(jnp.asarray(eb.nbq, jnp.int32), _eb_used(eb), *coeffs,
          tsf_b, tsf_b, tsf_b, tgw_b, tgw_b, tgw_b, tkh_b, tkh_b, tkh_b)
    return tqs, tqb


@_edge_pallas_core.defjvp
def _edge_pallas_core_jvp(close_boundary, interpret, primals, tangents):
    eb, sf, gw, effkh = primals
    _, tsf, tgw, tkh = tangents
    # primal + coefficients in one fused pass (primal-only inputs, so
    # jax.linearize hoists it out of the per-J·v tangent function); the
    # tangent is the cheap sparse apply
    primal_out, coeffs = _edge_pallas_coeff(eb, sf, gw, effkh,
                                            close_boundary, interpret)
    tangent_out = _edge_pallas_apply(eb, coeffs, tsf, tgw, tkh, interpret)
    return primal_out, tangent_out


@functools.partial(jax.jit, static_argnames=("close_boundary", "interpret"))
def edge_fluxes_pallas(eb: EdgeBlocks, sf, gw, effkh,
                       close_boundary: bool = True,
                       interpret: "bool | None" = None):
    """Fused surface+subsurface edge fluxes.

    Returns ``(q_surf[Ne,3], q_sub[Ne,3])`` f32 — identical semantics to the
    interior+boundary branches of ``rhs.edge_fluxes``; lake-bank edges are
    emitted as 0 (mask-merged by the caller).  Differentiable via hand-derived
    linearisation-coefficient kernels (``_edge_kernel_coeff`` +
    ``_edge_kernel_apply``): Newton's ``jax.linearize`` computes the six
    per-edge coefficients once, and each Krylov J·v runs only the sparse
    apply kernel.
    """
    if interpret is None:
        interpret = _interpret_default()
    qs, qb = _edge_pallas_core(eb, sf, gw, effkh, close_boundary, interpret)
    return _unblk(eb, qs), _unblk(eb, qb)


def _row_sum(eb, a):
    """Per-cell sum over the 3 edge slots, computed IN the kernel's blocked
    layout [nb, 3*bc, 128] -> [Ne].  The logical [Ne, 3] view (minor dim 3)
    forces XLA relayout copies of every 12.6 MB flux array on TPU — the
    dominant cost of the composed sharded RHS before round 4 (docs/PERF.md
    "Composed sharded RHS"); reducing in blocked space never materialises
    it."""
    nb, bc = eb.nb, eb.bc
    return (a.reshape(nb, 3, bc, 128).sum(axis=1)
            .reshape(nb * eb.blk)[: eb.num_ele])


@functools.partial(jax.jit, static_argnames=("close_boundary", "interpret"))
def edge_fluxes_pallas_rowsum(eb: EdgeBlocks, sf, gw, effkh,
                              close_boundary: bool = True,
                              interpret: "bool | None" = None):
    """Fused edge fluxes reduced to per-cell row sums ``(q_surf_row[Ne],
    q_sub_row[Ne])`` — the only form the solver hot path needs (the dY
    assembly consumes SUM over a cell's 3 edges; per-edge arrays are a
    diagnostics-only output).  Differentiable: the tangent is the sparse
    apply kernel's blocked output reduced the same way."""
    if interpret is None:
        interpret = _interpret_default()
    qs, qb = _edge_pallas_core(eb, sf, gw, effkh, close_boundary, interpret)
    return _row_sum(eb, qs), _row_sum(eb, qb)
