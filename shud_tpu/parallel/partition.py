"""Mesh domain decomposition for multi-chip execution.

The reference's only parallelism is OpenMP threads over flat arrays
(``src/ModelData/MD_f_omp.cpp``); there is no distributed mode to port.  The
TPU design follows SURVEY §5.7: partition the unstructured cell graph into P
spatially-compact blocks (recursive coordinate bisection on centroids),
shard every cell-axis array over a 1-D device mesh, and exchange one ghost
ring of dynamic per-cell values per RHS evaluation.  Rivers, segments-to-
river reductions and lakes are replicated/psum'd (Nriv << Ncell).

Static neighbour quantities (z_surf, z_bottom, rough) are pre-baked into
per-edge arrays so only (sf, gw, effKH) travel in the halo.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from shud_tpu.core.mesh import MeshData


def rcb_partition(x: np.ndarray, y: np.ndarray, p: int) -> np.ndarray:
    """Recursive coordinate bisection -> part id per cell.  p must be a
    power of two; parts are balanced to within one cell."""
    assert p & (p - 1) == 0, "P must be a power of two"
    n = len(x)
    part = np.zeros(n, dtype=np.int64)

    def split(idx, lo, hi):
        if hi - lo == 1:
            part[idx] = lo
            return
        xs, ys = x[idx], y[idx]
        if xs.max() - xs.min() >= ys.max() - ys.min():
            key = xs
        else:
            key = ys
        order = np.argsort(key, kind="stable")
        half = len(idx) // 2
        mid = (lo + hi) // 2
        split(idx[order[:half]], lo, mid)
        split(idx[order[half:]], mid, hi)

    split(np.arange(n), 0, p)
    return part


@dataclasses.dataclass
class ShardedMesh:
    """Per-shard mesh arrays, leading axis = shard (P)."""

    p: int
    np_cells: int  # padded cells per shard
    ns_seg: int  # padded segments per shard
    b_ghost: int  # padded export slots per shard
    num_ele: int  # total active cells
    num_riv: int
    num_lake: int

    # permutation: new global id -> old id, and inverse
    perm: np.ndarray
    inv_perm: np.ndarray
    old_to_shard: np.ndarray  # [Ne] owner shard per original cell id
    old_to_slot: np.ndarray  # [Ne] local slot per original cell id
    valid: np.ndarray  # [P, Np] bool

    # per-cell params (all [P, Np])
    cell: dict
    # per-edge static neighbour data ([P, Np, 3])
    edge: dict
    # per-shard segment arrays ([P, Sp])
    seg: dict
    # river arrays (replicated, [Nr])
    riv: dict
    # halo tables
    export_idx: np.ndarray  # [P, B] local slots each shard exports
    nb_shard: np.ndarray  # [P, Np, 3] owner shard of each neighbour (-1 local/none)
    nb_slot: np.ndarray  # [P, Np, 3] slot in export buffer (remote) or local slot
    # lakes (replicated small tables + sharded per-edge lake ids)
    lake: dict = dataclasses.field(default_factory=dict)


_CELL_FIELDS = [
    "area", "z_surf", "z_bottom", "aq_depth", "wetland_level",
    "rootreach_level", "macpore_level", "inf_ksat_v", "theta_s", "theta_fc",
    "theta_r", "alpha", "beta", "h_area_f", "mac_ksat_v", "inf_d", "ksat_h",
    "ksat_v", "geo_v_area_f", "mac_ksat_h", "mac_d", "sy", "veg_frac",
    "albedo", "rough", "rz_d", "imp_af", "depression", "fix_pressure",
    "wind_h", "nx", "ny", "nz",
]
_CELL_INT_FIELDS = ["i_bc", "i_ss", "i_lake", "i_forc", "i_lc", "i_mf"]
_EDGE_FIELDS = ["edge", "dist2edge", "dist2nabor", "avg_rough"]
_RIV_FIELDS = [
    "riv_down", "riv_outlet_code", "riv_to_lake", "riv_bc", "riv_length",
    "riv_bed_slope", "riv_depth", "riv_bank_slope", "riv_bottom_width",
    "riv_rough", "riv_cwr", "riv_ksat_h", "riv_bed_thick", "riv_avg_rough",
    "riv_dist2down",
]


def build_sharded_mesh(md: MeshData, p: int) -> ShardedMesh:
    ne = md.num_ele
    part = rcb_partition(md.x, md.y, p)
    # new ordering: cells sorted by (part, old index)
    perm = np.lexsort((np.arange(ne), part))  # new -> old
    inv_perm = np.empty(ne, dtype=np.int64)
    inv_perm[perm] = np.arange(ne)
    sizes = np.bincount(part, minlength=p)
    np_cells = int(sizes.max())

    # map old cell id -> (shard, local slot)
    shard_of = part[perm]  # by new id
    local_slot = np.empty(ne, dtype=np.int64)
    offs = np.zeros(p + 1, dtype=np.int64)
    offs[1:] = np.cumsum(sizes)
    for q in range(p):
        local_slot[offs[q] : offs[q + 1]] = np.arange(sizes[q])
    old_to_shard = np.empty(ne, dtype=np.int64)
    old_to_slot = np.empty(ne, dtype=np.int64)
    old_to_shard[perm] = shard_of
    old_to_slot[perm] = local_slot

    valid = np.zeros((p, np_cells), dtype=bool)
    for q in range(p):
        valid[q, : sizes[q]] = True

    def scatter_cell(arr, fill=0.0):
        out = np.full((p, np_cells), fill, dtype=np.asarray(arr).dtype)
        out[old_to_shard, old_to_slot] = np.asarray(arr)
        return out

    cell = {f: scatter_cell(getattr(md, f)) for f in _CELL_FIELDS}
    for f in _CELL_INT_FIELDS:
        cell[f] = scatter_cell(getattr(md, f), fill=0)
    # benign padding: avoid /0 in padded lanes
    for f in ["area", "sy", "aq_depth", "inf_d", "theta_s", "rough",
              "fix_pressure", "wind_h", "beta", "theta_fc"]:
        cell[f] = np.where(valid, cell[f], 1.0)
    cell["beta"] = np.where(valid, cell["beta"], 2.0)
    cell["theta_r"] = np.where(valid, cell["theta_r"], 0.1)
    cell["theta_s"] = np.where(valid, cell["theta_s"], 0.5)
    cell["theta_fc"] = np.where(valid, cell["theta_fc"], 0.375)
    cell["valid"] = valid

    edge = {f: np.zeros((p, np_cells, 3)) for f in _EDGE_FIELDS}
    for f in _EDGE_FIELDS:
        edge[f][old_to_shard, old_to_slot] = getattr(md, f)
    edge["dist2nabor"] = np.where(edge["dist2nabor"] == 0.0, 1.0,
                                  edge["dist2nabor"])
    edge["dist2edge"] = np.where(edge["dist2edge"] == 0.0, 1.0,
                                 edge["dist2edge"])
    edge["avg_rough"] = np.where(edge["avg_rough"] == 0.0, 1.0,
                                 edge["avg_rough"])
    # static per-edge elevation differences (local-datum form shared with
    # the single-chip fast path)
    has_nb = md.nabr >= 0
    for name, src in [("dz_surf", md.edge_dz_surf),
                      ("dz_bottom", md.edge_dz_bottom)]:
        buf = np.zeros((p, np_cells, 3))
        buf[old_to_shard, old_to_slot] = src
        edge[name] = buf
    hasnb_buf = np.zeros((p, np_cells, 3), dtype=bool)
    hasnb_buf[old_to_shard, old_to_slot] = has_nb
    edge["has_nb"] = hasnb_buf

    # ---- halo tables (native C++ pass; Python fallback inside) ----
    from shud_tpu import native

    export_idx, b_ghost, nb_shard_flat, nb_slot_flat = native.ghost_tables(
        md.nabr, old_to_shard, old_to_slot, p
    )
    nb_shard = np.full((p, np_cells, 3), -1, dtype=np.int64)
    nb_slot = np.zeros((p, np_cells, 3), dtype=np.int64)
    nb_shard[old_to_shard, old_to_slot] = nb_shard_flat
    nb_slot[old_to_shard, old_to_slot] = nb_slot_flat

    # ---- segments per shard (vectorised fill) ----
    seg_shard = old_to_shard[md.seg_ele]
    seg_sizes = np.bincount(seg_shard, minlength=p)
    ns_seg = max(1, int(seg_sizes.max()))
    order = np.argsort(seg_shard, kind="stable")
    seg_q = seg_shard[order]
    # position within shard = running index per shard
    seg_j = np.arange(md.num_seg) - np.concatenate(
        [[0], np.cumsum(seg_sizes)]
    )[seg_q]
    seg = {
        "ele_slot": np.zeros((p, ns_seg), dtype=np.int64),
        "riv": np.zeros((p, ns_seg), dtype=np.int64),
        "length": np.zeros((p, ns_seg)),
        "cwr": np.zeros((p, ns_seg)),
        "valid": np.zeros((p, ns_seg), dtype=bool),
    }
    seg["ele_slot"][seg_q, seg_j] = old_to_slot[md.seg_ele[order]]
    seg["riv"][seg_q, seg_j] = md.seg_riv[order]
    seg["length"][seg_q, seg_j] = md.seg_length[order]
    seg["cwr"][seg_q, seg_j] = md.seg_cwr[order]
    seg["valid"][seg_q, seg_j] = True

    riv = {f: np.asarray(getattr(md, f)) for f in _RIV_FIELDS}

    lake = {}
    if md.num_lake > 0:
        lakenabr = np.full((p, np_cells, 3), -1, dtype=np.int64)
        lakenabr[old_to_shard, old_to_slot] = md.lakenabr
        dzl = np.zeros((p, np_cells, 3))
        dzl[old_to_shard, old_to_slot] = md.edge_lake_dzl
        dzb = np.zeros((p, np_cells, 3))
        dzb[old_to_shard, old_to_slot] = md.edge_lake_dzb
        lake = {
            "lakenabr": lakenabr,
            "dzl": dzl,
            "dzb": dzb,
            "zmin": np.asarray(md.lake_zmin),
            "bathy_y": np.asarray(md.lake_bathy_y),
            "bathy_a": np.asarray(md.lake_bathy_a),
            "num_ele": np.asarray(md.lake_num_ele),
        }

    return ShardedMesh(
        p=p, np_cells=np_cells, ns_seg=ns_seg, b_ghost=b_ghost,
        num_ele=ne, num_riv=md.num_riv, num_lake=md.num_lake,
        perm=perm, inv_perm=inv_perm, old_to_shard=old_to_shard,
        old_to_slot=old_to_slot, valid=valid,
        cell=cell, edge=edge, seg=seg, riv=riv,
        export_idx=export_idx, nb_shard=nb_shard, nb_slot=nb_slot,
        lake=lake,
    )


def shard_state(sm: ShardedMesh, y: np.ndarray) -> dict:
    """Split a global concat state vector into the sharded pytree."""
    ne, nr = sm.num_ele, sm.num_riv
    nl = sm.num_lake
    sf, us, gw = y[:ne], y[ne : 2 * ne], y[2 * ne : 3 * ne]
    riv = y[3 * ne : 3 * ne + nr]
    lake = y[3 * ne + nr :]

    def to_blocks(v):
        out = np.zeros((sm.p, sm.np_cells))
        out[sm.old_to_shard, sm.old_to_slot] = v
        return out

    return {
        "sf": to_blocks(sf), "us": to_blocks(us), "gw": to_blocks(gw),
        "riv": riv.copy(), "lake": lake.copy(),
    }


def unshard_state(sm: ShardedMesh, ys: dict) -> np.ndarray:
    def from_blocks(b):
        b = np.asarray(b)
        return b[sm.old_to_shard, sm.old_to_slot]

    return np.concatenate([
        from_blocks(ys["sf"]), from_blocks(ys["us"]), from_blocks(ys["gw"]),
        np.asarray(ys["riv"]), np.asarray(ys["lake"]),
    ])
