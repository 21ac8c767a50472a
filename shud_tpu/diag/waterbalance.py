"""Water-balance diagnostics — runtime conservation checker.

Equivalent of the reference's opt-in WaterBalanceDiag subsystem
(``src/Model/WaterBalanceDiag.{hpp,cpp}``, env ``SHUD_WB_DIAG=1``): per
output interval it compares basin storage change against the integrated
flux budget

    dS  ?=  P - ET - Qout - Qedge + QBC + QSS

(all in m^3 over the interval), plus per-element residuals between the
storage change and the per-cell flux budget.  Doubles as the conservation
oracle in the test suite: the physics conserves mass by construction, so
the residual measures solver integration error.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class BasinBudget:
    t0: float
    t1: float
    ds_m3: float  # storage change (elements + rivers)
    p_m3: float
    et_m3: float
    qout_m3: float
    qedge_m3: float
    qbc_m3: float
    qss_m3: float

    @property
    def residual_m3(self) -> float:
        return self.ds_m3 - (
            self.p_m3 - self.et_m3 - self.qout_m3 - self.qedge_m3
            + self.qbc_m3 + self.qss_m3
        )

    @property
    def residual_relative(self) -> float:
        scale = max(
            abs(self.p_m3), abs(self.et_m3), abs(self.qout_m3),
            abs(self.ds_m3), 1e-12,
        )
        return self.residual_m3 / scale


class WaterBalance:
    """Accumulates basin storage/flux terms over output intervals."""

    def __init__(self, md, out_path: str | None = None):
        self.md = md
        self.rows: list[BasinBudget] = []
        self.out_path = out_path
        self._fp = open(out_path, "w") if out_path else None
        if self._fp:
            self._fp.write(
                "t0_min,t1_min,dS_m3,P_m3,ET_m3,Qout_m3,Qedge_m3,QBC_m3,"
                "QSS_m3,residual_m3,residual_rel\n"
            )

    def storage_m3(self, y: np.ndarray, buckets=None) -> float:
        """Basin storage: ponding + Sy-scaled subsurface + river volume
        (mirrors basinElementStorageFull_m3 / basinRiverStorage_m3).

        Uses RAW state values (no positivity clamps): the ODE integrates
        slightly-negative ponding/stage (the model has no positivity
        enforcement, like the reference), and that phantom reservoir must
        stay in the accounting for the budget to close."""
        md = self.md
        ne, nr = md.num_ele, md.num_riv
        sf = y[:ne]
        us = y[ne : 2 * ne]
        gw = y[2 * ne : 3 * ne]
        s_ele = np.sum((sf + (us + gw) * md.sy) * md.area)
        if buckets is not None:
            ic, snow = buckets
            s_ele += np.sum((np.asarray(ic) + np.asarray(snow)) * md.area)
        stage = y[3 * ne : 3 * ne + nr]
        csa = stage * (md.riv_bottom_width + stage * md.riv_bank_slope)
        s_riv = np.sum(csa * md.riv_length)
        return float(s_ele + s_riv)

    def interval(
        self,
        t0: float,
        t1: float,
        y0: np.ndarray,
        y1: np.ndarray,
        mean_vals: dict,
        mean_riv: dict,
        buckets0=None,
        buckets1=None,
        et_m3=None,
        qout_m3=None,
    ) -> BasinBudget:
        """Close the budget over [t0, t1) from interval-mean diagnostics
        (rates in m/min or m3/min).  Pass ``et_m3``/``qout_m3`` from the
        solver's quadrature accumulators for exact closure (the sampled
        means carry the switching-bias documented in docs/VALIDATION.md)."""
        md = self.md
        dt = t1 - t0
        area = md.area
        p_m3 = float(np.sum(mean_vals["prcp"] * area) * dt)
        if et_m3 is None:
            et_m3 = float(np.sum(mean_vals["eta"] * area) * dt)
        outlet = (md.riv_down < 0) & (md.riv_to_lake < 0)
        if qout_m3 is None:
            qout_m3 = float(np.sum(mean_riv["q_riv_down"][outlet]) * dt)
        qedge_m3 = 0.0  # close-boundary runs have no edge outflow
        row = BasinBudget(
            t0=t0, t1=t1,
            ds_m3=self.storage_m3(y1, buckets1) - self.storage_m3(y0, buckets0),
            p_m3=p_m3, et_m3=et_m3, qout_m3=qout_m3, qedge_m3=qedge_m3,
            qbc_m3=0.0, qss_m3=0.0,
        )
        self.rows.append(row)
        if self._fp:
            self._fp.write(
                f"{row.t0:.1f},{row.t1:.1f},{row.ds_m3:.6e},{row.p_m3:.6e},"
                f"{row.et_m3:.6e},{row.qout_m3:.6e},{row.qedge_m3:.6e},"
                f"{row.qbc_m3:.6e},{row.qss_m3:.6e},{row.residual_m3:.6e},"
                f"{row.residual_relative:.6e}\n"
            )
            self._fp.flush()
        return row

    def element_residuals(
        self,
        t0: float,
        t1: float,
        y0: np.ndarray,
        y1: np.ndarray,
        mean_vals: dict,
    ) -> np.ndarray:
        """Per-element 3-state residual [m]: change in (sf + (us+gw)*Sy)
        vs the integrated per-cell flux budget (the reference's flux3
        residual, WaterBalanceDiag.cpp).  Uses interval means of the
        boundary-sampled fluxes, so the residual bounds solver integration
        + sampling error, not conservation (conservation is exact in the
        RHS by construction)."""
        md = self.md
        ne = md.num_ele
        dt = t1 - t0
        ds = (
            (y1[:ne] - y0[:ne])
            + (y1[ne : 2 * ne] - y0[ne : 2 * ne]) * md.sy
            + (y1[2 * ne : 3 * ne] - y0[2 * ne : 3 * ne]) * md.sy
        )
        flux = (
            mean_vals["net_prcp"]
            - (mean_vals["eta"] - mean_vals["e_ic"])
            - mean_vals["q_surf_tot"] / md.area
            - mean_vals["q_sub_tot"] / md.area
        ) * dt
        return ds - flux

    def close(self):
        if self._fp:
            self._fp.close()
            self._fp = None
