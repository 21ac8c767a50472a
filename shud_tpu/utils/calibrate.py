"""Calibration interface — the reference's autocalibration hooks.

The reference exposes ``globalCal::copy(varname[], x[])`` for CMA-ES-style
optimisers (``ModelConfigure.cpp:368-375``; CLI hook ``-e dir_cmaes``).
Equivalent here: build a Calib from (names, values), run a short simulation,
and score it against observations — everything jit-reusable since only the
calibration scalars change (same shapes -> no recompilation)."""

from __future__ import annotations

import numpy as np

from shud_tpu.io.project import Calib, _CALIB_KEYS


def calib_from_vector(names: list[str], x: np.ndarray,
                      base: Calib | None = None) -> Calib:
    """globalCal::copy equivalent: apply (name, value) pairs onto a Calib."""
    import dataclasses

    gc = dataclasses.replace(base) if base is not None else Calib()
    for name, val in zip(names, x):
        key = name.lower()
        if key not in _CALIB_KEYS:
            raise KeyError(f"unknown calibration key {name!r}")
        setattr(gc, _CALIB_KEYS[key], float(val))
    return gc


def run_with_calib(project: str, base_dir: str, gc: Calib, end_day: float,
                   float_dtype=None):
    """Run a simulation with the given calibration; returns the
    FusedSimulation (daily outlet discharge in the caller's hands via
    advance_interval)."""
    import jax.numpy as jnp

    from shud_tpu.driver.fused import FusedSimulation

    if float_dtype is None:
        float_dtype = jnp.float64
    return FusedSimulation.create(project, base=base_dir, calib=gc,
                                  float_dtype=float_dtype, day_end=end_day)


def nse(sim_q: np.ndarray, obs_q: np.ndarray) -> float:
    """Nash-Sutcliffe efficiency (the rSHUD objective)."""
    obs = np.asarray(obs_q, dtype=float)
    sim = np.asarray(sim_q, dtype=float)
    m = np.isfinite(obs) & np.isfinite(sim)
    obs, sim = obs[m], sim[m]
    denom = np.sum((obs - obs.mean()) ** 2)
    if denom <= 0:
        return -np.inf
    return 1.0 - np.sum((sim - obs) ** 2) / denom
