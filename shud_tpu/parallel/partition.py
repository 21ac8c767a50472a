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
    # static neighbour values baked per edge
    has_nb = md.nabr >= 0
    nb_old = np.where(has_nb, md.nabr, 0)
    for name, src in [("nb_z_surf", md.z_surf), ("nb_z_bottom", md.z_bottom)]:
        v = np.where(has_nb, src[nb_old], 0.0)
        buf = np.zeros((p, np_cells, 3))
        buf[old_to_shard, old_to_slot] = v
        edge[name] = buf
    hasnb_buf = np.zeros((p, np_cells, 3), dtype=bool)
    hasnb_buf[old_to_shard, old_to_slot] = has_nb
    edge["has_nb"] = hasnb_buf

    # ---- halo tables ----
    # neighbour (shard, slot) per edge
    nb_shard_full = np.where(has_nb, old_to_shard[nb_old], -1)
    nb_slot_full = np.where(has_nb, old_to_slot[nb_old], 0)
    my_shard = np.repeat(old_to_shard[:, None], 3, axis=1)
    is_remote = has_nb & (nb_shard_full != my_shard)

    # exports: for each shard, the set of its cells referenced remotely
    exports = [set() for _ in range(p)]
    for i in range(ne):
        for j in range(3):
            if is_remote[i, j]:
                owner = nb_shard_full[i, j]
                exports[owner].add(int(nb_slot_full[i, j]))
    b_ghost = max(1, max(len(s) for s in exports))
    export_idx = np.zeros((p, b_ghost), dtype=np.int64)
    export_pos = [dict() for _ in range(p)]
    for q in range(p):
        lst = sorted(exports[q])
        export_idx[q, : len(lst)] = lst
        for k, slot in enumerate(lst):
            export_pos[q][slot] = k

    # per-edge halo reference: -1 shard => local (use nb_slot as local slot)
    nb_shard = np.full((p, np_cells, 3), -1, dtype=np.int64)
    nb_slot = np.zeros((p, np_cells, 3), dtype=np.int64)
    for i in range(ne):
        q = old_to_shard[i]
        s = old_to_slot[i]
        for j in range(3):
            if not has_nb[i, j]:
                nb_shard[q, s, j] = -1
                nb_slot[q, s, j] = 0
            elif is_remote[i, j]:
                owner = nb_shard_full[i, j]
                nb_shard[q, s, j] = owner
                nb_slot[q, s, j] = export_pos[owner][int(nb_slot_full[i, j])]
            else:
                nb_shard[q, s, j] = -1
                nb_slot[q, s, j] = nb_slot_full[i, j]
    # distinguish "no neighbour" from "local neighbour" via has_nb flag
    # (both use nb_shard == -1)

    # ---- segments per shard ----
    seg_shard = old_to_shard[md.seg_ele]
    seg_sizes = np.bincount(seg_shard, minlength=p)
    ns_seg = max(1, int(seg_sizes.max()))
    seg = {
        "ele_slot": np.zeros((p, ns_seg), dtype=np.int64),
        "riv": np.zeros((p, ns_seg), dtype=np.int64),
        "length": np.zeros((p, ns_seg)),
        "cwr": np.zeros((p, ns_seg)),
        "valid": np.zeros((p, ns_seg), dtype=bool),
    }
    fill = np.zeros(p, dtype=np.int64)
    for k in range(md.num_seg):
        q = seg_shard[k]
        j = fill[q]
        fill[q] += 1
        seg["ele_slot"][q, j] = old_to_slot[md.seg_ele[k]]
        seg["riv"][q, j] = md.seg_riv[k]
        seg["length"][q, j] = md.seg_length[k]
        seg["cwr"][q, j] = md.seg_cwr[k]
        seg["valid"][q, j] = True

    riv = {f: np.asarray(getattr(md, f)) for f in _RIV_FIELDS}

    return ShardedMesh(
        p=p, np_cells=np_cells, ns_seg=ns_seg, b_ghost=b_ghost,
        num_ele=ne, num_riv=md.num_riv, num_lake=md.num_lake,
        perm=perm, inv_perm=inv_perm, valid=valid,
        cell=cell, edge=edge, seg=seg, riv=riv,
        export_idx=export_idx, nb_shard=nb_shard, nb_slot=nb_slot,
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
        flat_new = v[sm.perm]  # ordered by (shard, slot)
        pos = 0
        sizes = sm.valid.sum(axis=1)
        for q in range(sm.p):
            out[q, : sizes[q]] = flat_new[pos : pos + sizes[q]]
            pos += sizes[q]
        return out

    return {
        "sf": to_blocks(sf), "us": to_blocks(us), "gw": to_blocks(gw),
        "riv": riv.copy(), "lake": lake.copy(),
    }


def unshard_state(sm: ShardedMesh, ys: dict) -> np.ndarray:
    sizes = sm.valid.sum(axis=1)

    def from_blocks(b):
        b = np.asarray(b)
        flat_new = np.concatenate([b[q, : sizes[q]] for q in range(sm.p)])
        out = np.empty(sm.num_ele)
        out[sm.perm] = flat_new
        return out

    return np.concatenate([
        from_blocks(ys["sf"]), from_blocks(ys["us"]), from_blocks(ys["gw"]),
        np.asarray(ys["riv"]), np.asarray(ys["lake"]),
    ])
