"""Sharded RHS: the full dY/dt under ``shard_map`` domain decomposition.

Each device owns one contiguous cell block; one halo exchange of
(sf, gw, effKH) per RHS evaluation rides the ICI via ``all_gather`` of the
packed boundary exports (the structural counterpart of context-parallel halo
exchange); rivers are computed replicated, with ``psum`` completing the
segment→river scatter-reduction that the reference does serially in
``PassValue`` (MD_f.cpp:217-257).  The only other global communication is
the solver's dot products — identical communication structure to CVODE+MPI
if it existed, but over ICI collectives.

Physics is shared with the single-chip path (``shud_tpu.core.rhs``
elementwise kernels); parity is enforced by the sharded-vs-unsharded
equivalence test (tests/test_sharding.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.ops import segment_sum
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shud_tpu.config import GRAV, MAXYSURF, ZERO
from shud_tpu.core import physics as ph
from shud_tpu.core.rhs import (
    CellUpdate,
    _lake_toparea,
    et_flux,
    flux_infiltration,
    flux_recharge,
    lake_cell_update,
    update_element,
)
from shud_tpu.parallel.partition import ShardedMesh

AXIS = "shards"


class _CellView:
    """Adapter presenting per-shard cell dicts with MeshData attribute names
    so the core elementwise kernels run unchanged on local blocks."""

    _MAP = {
        "aq_depth": "aq_depth", "mac_d": "mac_d", "mac_ksat_h": "mac_ksat_h",
        "geo_v_area_f": "geo_v_area_f", "ksat_h": "ksat_h",
        "inf_ksat_v": "inf_ksat_v", "mac_ksat_v": "mac_ksat_v",
        "h_area_f": "h_area_f", "theta_s": "theta_s", "theta_r": "theta_r",
        "theta_fc": "theta_fc", "beta": "beta", "inf_d": "inf_d",
        "ksat_v": "ksat_v", "veg_frac": "veg_frac", "imp_af": "imp_af",
        "wetland_level": "wetland_level", "rootreach_level": "rootreach_level",
        "sy": "sy", "area": "area", "z_surf": "z_surf",
        "z_bottom": "z_bottom", "depression": "depression",
        "rough": "rough", "i_bc": "i_bc", "i_ss": "i_ss", "i_lake": "i_lake",
    }

    def __init__(self, cell: dict):
        self._cell = cell

    def __getattr__(self, name):
        try:
            return self._cell[self._MAP[name]]
        except KeyError as e:
            raise AttributeError(name) from e


def _local_rhs(sm_static, cell, edge, seg, riv, lake_tbl, halo_tables, t,
               y_local, ghost_all, fs_local, fs_riv, close_boundary: bool,
               my_shard):
    """RHS for one shard's block.  ``ghost_all``: [P, B, 3] gathered exports
    of (sf, gw, effkh)."""
    sf, us, gw_raw = y_local["sf"], y_local["us"], y_local["gw"]
    riv_y = y_local["riv"]
    lake_stg = y_local["lake"]
    nl = lake_stg.shape[0]
    m = _CellView(cell)
    valid = cell["valid"]

    gw = jnp.where(m.i_bc > 0, fs_local["ele_ybc"], gw_raw)
    riv_stage = jnp.where(riv["riv_bc"] > 0, fs_riv["riv_ybc"], riv_y)

    # river geometry (replicated)
    r_topw = jnp.maximum(
        riv_stage * riv["riv_bank_slope"] * 2.0 + riv["riv_bottom_width"], 0.0
    )
    r_csa = jnp.maximum(
        riv_stage * (riv["riv_bottom_width"] + riv_stage * riv["riv_bank_slope"]),
        0.0,
    )
    r_per = jnp.maximum(
        2.0 * jnp.abs(riv_stage) * jnp.sqrt(1.0 + riv["riv_bank_slope"] ** 2)
        + riv["riv_bottom_width"],
        0.0,
    )

    cu = update_element(m, sf, us, gw)
    if nl > 0:
        cu = lake_cell_update(m, cu)
        is_lake_cell = m.i_lake > 0
    es, eu, eg, tu, tg, e_ic_out, _ = et_flux(
        m, fs_local["fs"], sf, us, gw, cu.satn
    )
    qi, qex = flux_infiltration(m, cu, sf, us, gw, fs_local["fs"].net_prcp)
    q_infil = qi * fs_local["fs"].fu_surf
    q_exfil = qex * fs_local["fs"].fu_surf
    q_rech = flux_recharge(m, cu, us, gw) * fs_local["fs"].fu_sub
    if nl > 0:
        q_infil = jnp.where(is_lake_cell, 0.0, q_infil)
        q_exfil = jnp.where(is_lake_cell, 0.0, q_exfil)
        q_rech = jnp.where(is_lake_cell, 0.0, q_rech)
        es = jnp.where(is_lake_cell, 0.0, es)
        eu = jnp.where(is_lake_cell, 0.0, eu)
        eg = jnp.where(is_lake_cell, 0.0, eg)
        tu = jnp.where(is_lake_cell, 0.0, tu)
        tg = jnp.where(is_lake_cell, 0.0, tg)

    # ---- neighbour values via halo ----
    nb_shard = halo_tables["nb_shard"]  # [Np,3]
    nb_slot = halo_tables["nb_slot"]
    has_nb = edge["has_nb"]
    remote = nb_shard >= 0
    shard_ix = jnp.where(remote, nb_shard, 0)
    local_ix = jnp.where(remote, 0, nb_slot)

    def nb_value(local_arr, ghost_col):
        loc = local_arr[local_ix]
        rem = ghost_all[shard_ix, nb_slot, ghost_col]
        return jnp.where(remote, rem, loc)

    nsf = jnp.maximum(nb_value(sf, 0), 0.0)
    gw_nb = nb_value(gw, 1)
    effkh_nb = nb_value(cu.eff_kh, 2)

    isf = jnp.maximum(sf, 0.0)[:, None]
    z = m.z_surf[:, None]
    B = edge["edge"]
    dist = edge["dist2nabor"]

    dh = (isf - nsf) + edge["dz_surf"]
    up1 = jnp.where(isf > m.depression[:, None], isf, 0.0)
    up2 = jnp.where(nsf > m.depression[:, None], nsf, 0.0)
    ymean = jnp.where(dh > 0.0, jnp.broadcast_to(up1, up2.shape), up2)
    ymean = jnp.minimum(ymean, MAXYSURF)
    s = dh / dist
    q_int = ph.manning_equation(ymean * B, edge["avg_rough"], ymean, s)
    q_int = jnp.where((s > 0) & (isf <= 0.0), 0.0, q_int)
    q_int = jnp.where((s < 0) & (nsf <= 0.0), 0.0, q_int)
    q_int = jnp.where(ymean <= 0.0, 0.0, q_int)

    # lake-bank branches (weir + darcy against the replicated lake stage)
    if nl > 0:
        lakenb = lake_tbl["lakenabr"]  # [Np,3] 0-based, -1 none
        has_lk = lakenb >= 0
        lki = jnp.where(has_lk, lakenb, 0)
        lake_nsf = jnp.maximum(lake_stg[lki], 0.0)
        # local-datum form (same as the single-chip fast path): the
        # km-scale elevation is cancelled in f64 at partition build
        q_surf_lake = ph.weir_flow_jtoi_local(
            lake_nsf + lake_tbl["dzl"], isf, lake_nsf, 0.6, B, 0.01,
        )
    if close_boundary:
        q_bnd = jnp.zeros_like(B)
    else:
        sb = isf / edge["dist2edge"] * 0.5
        isf5 = jnp.cbrt(jnp.maximum(isf, 1e-30) ** 5)
        qb = jnp.sqrt(jnp.maximum(sb, 1e-30)) * isf5 * B / m.rough[:, None]
        q_bnd = jnp.where((isf > m.depression[:, None]) & (sb > 0.0), qb, 0.0)
    if nl > 0:
        q_esurf = jnp.where(has_lk, q_surf_lake,
                            jnp.where(has_nb, q_int, q_bnd))
    else:
        q_esurf = jnp.where(has_nb, q_int, q_bnd)

    gw_col = gw[:, None]
    zb = m.z_bottom[:, None]
    dh_s = (gw_col - gw_nb) + edge["dz_bottom"]
    ymean_s = ph.avg_y_gw(gw_col, gw_nb)
    grad_s = dh_s / dist
    kmean = 0.5 * (cu.eff_kh[:, None] + effkh_nb)
    q_sub_int = kmean * grad_s * ymean_s * B
    q_sub_int = jnp.where(
        ((dh_s > 0.0) & (gw_col <= 0.02)) | ((dh_s < 0.0) & (gw_nb <= 0.02)),
        0.0, q_sub_int,
    )
    if close_boundary:
        q_sub_bnd = jnp.zeros_like(B)
    else:
        grad_b = gw_col / edge["dist2edge"] * 0.5
        q_sub_bnd = jnp.where(
            (gw_col > m.depression[:, None] * 10.0) & (grad_b > 0.0),
            cu.eff_kh[:, None] * grad_b, 0.0,
        )
    if nl > 0:
        dh_lk = (gw_col - lake_stg[lki]) + lake_tbl["dzb"]
        ymean_lk = ph.avg_y_gw(gw_col, lake_stg[lki])
        kmean_lk = 0.5 * (cu.eff_kh[:, None] + effkh_nb)
        q_sub_lake = kmean_lk * (dh_lk / dist) * ymean_lk * B
        q_sub_lake = jnp.where(
            ((dh_lk > 0.0) & (gw_col <= 0.02))
            | ((dh_lk < 0.0) & (lake_stg[lki] <= 0.02)),
            0.0, q_sub_lake,
        )
        q_esub0 = jnp.where(has_lk, q_sub_lake,
                            jnp.where(has_nb, q_sub_int, q_sub_bnd))
    else:
        q_esub0 = jnp.where(has_nb, q_sub_int, q_sub_bnd)
    q_esub = q_esub0 * fs_local["fs"].fu_sub[:, None]
    if nl > 0:
        q_lake_surf_e = jnp.where(has_lk & ~is_lake_cell[:, None], q_esurf, 0.0)
        q_lake_sub_e = jnp.where(has_lk & ~is_lake_cell[:, None], q_esub0, 0.0)
        q_esurf = jnp.where(is_lake_cell[:, None], 0.0, q_esurf)
        q_esub = jnp.where(is_lake_cell[:, None], 0.0, q_esub)

    # ---- segments (local elements, replicated rivers) ----
    se = seg["ele_slot"]
    sr = seg["riv"]
    sval = seg["valid"]
    zs_e = m.z_surf[se]
    seg_isf = jnp.maximum(0.0, sf[se] - q_infil[se] + q_exfil[se])
    q_seg_surf = ph.weir_flow_jtoi(
        zs_e, seg_isf, zs_e - riv["riv_depth"][sr], riv_stage[sr],
        zs_e, seg["cwr"], seg["length"], m.depression[se],
    )
    q_seg_sub = ph.flux_r2e_gw(
        riv_stage[sr], zs_e - riv["riv_depth"][sr], gw[se], m.z_bottom[se],
        cu.eff_kh[se], riv["riv_ksat_h"][sr], seg["length"],
        riv["riv_bed_thick"][sr],
    ) * fs_local["fs"].fu_sub[se]
    q_seg_surf = jnp.where(sval, q_seg_surf, 0.0)
    q_seg_sub = jnp.where(sval, q_seg_sub, 0.0)

    nr = riv_stage.shape[0]
    np_cells = sf.shape[0]
    q_riv_surf = jax.lax.psum(
        segment_sum(q_seg_surf, sr, num_segments=nr), AXIS
    )
    q_riv_sub = jax.lax.psum(
        segment_sum(q_seg_sub, sr, num_segments=nr), AXIS
    )
    q_e2r_surf = segment_sum(-q_seg_surf, se, num_segments=np_cells)
    q_e2r_sub = segment_sum(-q_seg_sub, se, num_segments=np_cells)

    # ---- river chain (replicated compute) ----
    down = riv["riv_down"]
    has_down = down >= 0
    dn = jnp.where(has_down, down, 0)
    s_mean = 0.5 * (riv["riv_bed_slope"] + riv["riv_bed_slope"][dn])
    s_down = (
        (riv_stage - riv["riv_depth"]) - (riv_stage[dn] - riv["riv_depth"][dn])
    ) / riv["riv_dist2down"] + s_mean
    r_hyd = jnp.where(r_per <= ZERO, 0.0,
                      r_csa / jnp.where(r_per <= ZERO, 1.0, r_per))
    q_down_int = ph.manning_equation(r_csa, riv["riv_avg_rough"], r_hyd, s_down)
    s_out = riv["riv_bed_slope"] + riv_stage * 2.0 / riv["riv_length"]
    q_out_zdg = ph.manning_equation(r_csa, riv["riv_avg_rough"], r_hyd, s_out)
    q_out_crit = r_csa * jnp.sqrt(GRAV * jnp.maximum(riv_stage, 1e-30)) * 60.0
    to_lake = riv["riv_to_lake"] >= 0
    q_riv_down = jnp.where(
        to_lake, q_out_zdg,
        jnp.where(has_down, q_down_int,
                  jnp.where(riv["riv_outlet_code"] == -4, q_out_crit,
                            q_out_zdg)),
    )
    q_riv_up = segment_sum(
        jnp.where(has_down, -q_riv_down, 0.0), dn, num_segments=nr
    )

    # ---- assembly ----
    area = m.area
    q_surf_tot = q_e2r_surf + q_esurf.sum(axis=1)
    q_sub_tot = q_e2r_sub + q_esub.sum(axis=1)
    fs = fs_local["fs"]
    dsf = fs.net_prcp - q_infil + q_exfil - q_surf_tot / area - es
    dus = q_infil - q_rech - eu - tu
    dgw = q_rech - q_exfil - q_sub_tot / area - eg - tg
    dgw = jnp.where(m.i_bc > 0, 0.0, dgw)
    dgw = dgw + jnp.where(m.i_bc < 0, fs_local["ele_qbc"] / area, 0.0)
    dsf = dsf + jnp.where(m.i_ss > 0, fs_local["ele_qss"] / area, 0.0)
    dgw = dgw + jnp.where(m.i_ss < 0, fs_local["ele_qss"] / area, 0.0)
    dus = dus / m.sy
    dgw = dgw / m.sy
    if nl > 0:
        dsf = jnp.where(is_lake_cell, 0.0, dsf)
        dus = jnp.where(is_lake_cell, 0.0, dus)
        dgw = jnp.where(is_lake_cell, 0.0, dgw)
    dsf = jnp.where(valid, dsf, 0.0)
    dus = jnp.where(valid, dus, 0.0)
    dgw = jnp.where(valid, dgw, 0.0)

    d_area = (
        -q_riv_up - q_riv_surf - q_riv_sub - q_riv_down + fs_riv["riv_qbc"]
    ) / riv["riv_length"]
    d_area = jnp.maximum(d_area, -r_csa)
    driv = ph.fun_da_to_dy(d_area, r_topw, riv["riv_bank_slope"])
    driv = jnp.where(riv["riv_bc"] > 0, 0.0, driv)

    # ---- lake stage (replicated; psum over shards, MD_f.cpp:180-191) ----
    if nl > 0:
        lk_cell = jnp.where(is_lake_cell, m.i_lake - 1, 0)
        inv_nele = 1.0 / jnp.maximum(
            lake_tbl["num_ele"].astype(dsf.dtype), 1.0
        )
        q_lake_evap = jax.lax.psum(segment_sum(
            jnp.where(is_lake_cell & valid,
                      fs.pot_evap * inv_nele[lk_cell], 0.0),
            lk_cell, num_segments=nl), AXIS)
        q_lake_prcp = jax.lax.psum(segment_sum(
            jnp.where(is_lake_cell & valid,
                      fs.prcp * inv_nele[lk_cell], 0.0),
            lk_cell, num_segments=nl), AXIS)
        q_lake_evap = jnp.maximum(
            0.0, jnp.minimum(q_lake_evap, q_lake_prcp + lake_stg)
        )
        q_lake_surf = jax.lax.psum(segment_sum(
            q_lake_surf_e.ravel(), lki.ravel(), num_segments=nl), AXIS)
        q_lake_sub = jax.lax.psum(segment_sum(
            q_lake_sub_e.ravel(), lki.ravel(), num_segments=nl), AXIS)
        tl = jnp.where(to_lake, riv["riv_to_lake"], 0)
        q_lake_rivin = segment_sum(
            jnp.where(to_lake, q_riv_down, 0.0), tl, num_segments=nl
        )

        class _LakeView:
            lake_zmin = lake_tbl["zmin"]
            lake_bathy_y = lake_tbl["bathy_y"]
            lake_bathy_a = lake_tbl["bathy_a"]

        lake_area = _lake_toparea(_LakeView, lake_stg)
        dlake = q_lake_prcp - q_lake_evap + (
            q_lake_rivin + q_lake_sub + q_lake_surf
        ) / lake_area
    else:
        dlake = jnp.zeros_like(y_local["lake"])

    return {"sf": dsf, "us": dus, "gw": dgw, "riv": driv, "lake": dlake}


def make_sharded_rhs(sm: ShardedMesh, devices=None, close_boundary=True):
    """Build (mesh, rhs_fn, device_arrays).

    ``rhs_fn(t, y, params)`` takes the sharded state pytree
    {sf,us,gw:[P,Np], riv:[Nr], lake:[Nl]} and returns dY in the same
    layout; cell blocks are sharded over the device mesh axis, river/lake
    replicated."""
    if devices is None:
        devices = np.array(jax.devices()[: sm.p])
    mesh = Mesh(devices, (AXIS,))

    f64 = jnp.float64
    cell = {
        k: jnp.asarray(v, dtype=f64 if v.dtype.kind == "f" else jnp.int32)
        for k, v in sm.cell.items()
    }
    cell["valid"] = jnp.asarray(sm.cell["valid"])
    edge = {}
    for k, v in sm.edge.items():
        if v.dtype.kind == "b":
            edge[k] = jnp.asarray(v)
        else:
            edge[k] = jnp.asarray(v, dtype=f64)
    seg = {
        "ele_slot": jnp.asarray(sm.seg["ele_slot"], dtype=jnp.int32),
        "riv": jnp.asarray(sm.seg["riv"], dtype=jnp.int32),
        "length": jnp.asarray(sm.seg["length"], dtype=f64),
        "cwr": jnp.asarray(sm.seg["cwr"], dtype=f64),
        "valid": jnp.asarray(sm.seg["valid"]),
    }
    riv = {
        k: jnp.asarray(
            v, dtype=f64 if v.dtype.kind == "f" else jnp.int32
        )
        for k, v in sm.riv.items()
    }
    halo = {
        "nb_shard": jnp.asarray(sm.nb_shard, dtype=jnp.int32),
        "nb_slot": jnp.asarray(sm.nb_slot, dtype=jnp.int32),
        "export_idx": jnp.asarray(sm.export_idx, dtype=jnp.int32),
    }
    lake_tbl = {}
    if sm.num_lake > 0:
        lake_tbl = {
            "lakenabr": jnp.asarray(sm.lake["lakenabr"], dtype=jnp.int32),
            "dzl": jnp.asarray(sm.lake["dzl"], dtype=f64),
            "dzb": jnp.asarray(sm.lake["dzb"], dtype=f64),
            "zmin": jnp.asarray(sm.lake["zmin"], dtype=f64),
            "bathy_y": jnp.asarray(sm.lake["bathy_y"], dtype=f64),
            "bathy_a": jnp.asarray(sm.lake["bathy_a"], dtype=f64),
            "num_ele": jnp.asarray(sm.lake["num_ele"], dtype=jnp.int32),
        }

    shard_specs = {
        "cell": {k: P(AXIS) for k in cell},
        "edge": {k: P(AXIS) for k in edge},
        "seg": {k: P(AXIS) for k in seg},
        "riv": {k: P() for k in riv},
        "halo": {"nb_shard": P(AXIS), "nb_slot": P(AXIS),
                 "export_idx": P(AXIS)},
        "lake": {k: (P(AXIS) if k in ("lakenabr", "dzl", "dzb") else P())
                 for k in lake_tbl},
    }
    y_spec = {"sf": P(AXIS), "us": P(AXIS), "gw": P(AXIS),
              "riv": P(), "lake": P()}
    fs_cell_spec = P(AXIS)

    try:
        from jax import shard_map as _shard_map

        def shard_map(f, **kw):  # jax>=0.8 renamed check_rep -> check_vma
            kw["check_vma"] = kw.pop("check_rep", False)
            return _shard_map(f, **kw)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def rhs_fn(t, y, params):
        (cellp, edgep, segp, rivp, halop, lakep, fs_cell, fs_rivp) = params

        def body(cell_l, edge_l, seg_l, riv_l, halo_l, lake_l, fsc_l, fsr_l,
                 y_l, t_l):
            # strip the leading size-1 shard axis from sharded blocks
            cell_1 = {k: v[0] for k, v in cell_l.items()}
            edge_1 = {k: v[0] for k, v in edge_l.items()}
            seg_1 = {k: v[0] for k, v in seg_l.items()}
            halo_1 = {k: v[0] for k, v in halo_l.items()}
            lake_1 = {
                k: (v[0] if k in ("lakenabr", "dzl", "dzb") else v)
                for k, v in lake_l.items()
            }
            y_1 = {
                "sf": y_l["sf"][0], "us": y_l["us"][0], "gw": y_l["gw"][0],
                "riv": y_l["riv"], "lake": y_l["lake"],
            }
            fsc_1 = {k: v[0] for k, v in fsc_l.items()}
            # recompute effkh for exports (same as update_element's)
            from shud_tpu.core.rhs import update_element as _ue

            m1 = _CellView(cell_1)
            gw_bc = jnp.where(m1.i_bc > 0, fsc_1["ele_ybc"], y_1["gw"])
            cu_l = _ue(m1, y_1["sf"], y_1["us"], gw_bc)
            exp_ix = halo_1["export_idx"]
            exports = jnp.stack(
                [y_1["sf"][exp_ix], gw_bc[exp_ix], cu_l.eff_kh[exp_ix]],
                axis=-1,
            )  # [B, 3]
            ghost_all = jax.lax.all_gather(exports, AXIS)  # [P, B, 3]

            from shud_tpu.core.state import ForcingSlice

            fs_obj = ForcingSlice(**{
                k: fsc_1[k] for k in (
                    "net_prcp", "prcp", "pot_evap", "pot_tran", "e_ic",
                    "lai", "fu_surf", "fu_sub",
                )
            }, ele_ybc=fsc_1["ele_ybc"], ele_qbc=fsc_1["ele_qbc"],
               ele_qss=fsc_1["ele_qss"],
               riv_ybc=fsr_l["riv_ybc"], riv_qbc=fsr_l["riv_qbc"])
            fs_local = {
                "fs": fs_obj, "ele_ybc": fsc_1["ele_ybc"],
                "ele_qbc": fsc_1["ele_qbc"], "ele_qss": fsc_1["ele_qss"],
            }
            dy = _local_rhs(
                None, cell_1, edge_1, seg_1, riv_l, lake_1, halo_1, t_l,
                y_1, ghost_all, fs_local, fsr_l, close_boundary,
                jax.lax.axis_index(AXIS),
            )
            return {
                "sf": dy["sf"][None], "us": dy["us"][None],
                "gw": dy["gw"][None], "riv": dy["riv"],
                "lake": dy["lake"],
            }

        return shard_map(
            body, mesh=mesh,
            in_specs=(
                shard_specs["cell"], shard_specs["edge"], shard_specs["seg"],
                shard_specs["riv"], shard_specs["halo"],
                shard_specs["lake"],
                {k: fs_cell_spec for k in fs_cell},
                {"riv_ybc": P(), "riv_qbc": P()},
                y_spec, P(),
            ),
            out_specs=y_spec,
            check_rep=False,
        )(cellp, edgep, segp, rivp, halop, lake_tbl, fs_cell, fs_rivp, y,
          jnp.asarray(t))

    params = (cell, edge, seg, riv, halo, lake_tbl)
    return mesh, rhs_fn, params
