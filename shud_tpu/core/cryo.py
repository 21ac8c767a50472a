"""Cryosphere / permafrost module (``cryosphere=1``).

Ports the reference's accumulated-temperature machinery
(``src/classes/AccTemperature.hpp``): per cell, a running mean of daily-mean
air temperature over ~7-day (surface) and ~28-day (subsurface) windows; the
frozen fractions ``fu_Surf``/``fu_Sub = 1 - FrozenFraction(acc, max, min)``
(``functions.hpp:191-201``) multiply infiltration, recharge and lateral
subsurface fluxes (``MD_ET.cpp:301-311``).

State is a fixed-length ring buffer per window; the day-flush semantics
mirror ``_AccTemp::push`` exactly, including the quirk that the very first
sample immediately flushes as a full "day" (Time_start initialised to
-9999).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from shud_tpu.core.landsurface import frozen_fraction


class AccTempState(NamedTuple):
    ring: jnp.ndarray  # [maxlen, Ne] daily means (zero until filled)
    size: jnp.ndarray  # scalar int, entries in the ring (<= maxlen)
    head: jnp.ndarray  # scalar int, next write slot
    acc: jnp.ndarray  # [Ne] running sum of the ring entries
    acc_day: jnp.ndarray  # [Ne] within-day accumulator
    n_day: jnp.ndarray  # scalar int, samples in the current day
    time_start: jnp.ndarray  # scalar, start of the current day [min]


def acc_temp_init(ne: int, maxlen: int, dtype=jnp.float64) -> AccTempState:
    return AccTempState(
        ring=jnp.zeros((maxlen, ne), dtype=dtype),
        size=jnp.zeros((), jnp.int32),
        head=jnp.zeros((), jnp.int32),
        acc=jnp.zeros(ne, dtype=dtype),
        acc_day=jnp.zeros(ne, dtype=dtype),
        n_day=jnp.zeros((), jnp.int32),
        time_start=jnp.full((), -9999.0, dtype=dtype),
    )


def acc_temp_push(st: AccTempState, temp, t_now) -> AccTempState:
    """Per forcing step: accumulate; flush a daily mean when a day has
    elapsed (AccTemperature.hpp:push)."""
    maxlen = st.ring.shape[0]
    acc_day = st.acc_day + temp
    n_day = st.n_day + 1
    flush = (t_now - st.time_start) >= 1440.0

    day_mean = acc_day / n_day.astype(acc_day.dtype)
    full = st.size >= maxlen
    evicted = st.ring[st.head]
    new_acc = st.acc + day_mean - jnp.where(full, evicted, 0.0)
    new_ring = st.ring.at[st.head].set(day_mean)
    new_head = (st.head + 1) % maxlen
    new_size = jnp.minimum(st.size + 1, maxlen)

    return AccTempState(
        ring=jnp.where(flush, new_ring, st.ring),
        size=jnp.where(flush, new_size, st.size),
        head=jnp.where(flush, new_head, st.head),
        acc=jnp.where(flush, new_acc, st.acc),
        acc_day=jnp.where(flush, jnp.zeros_like(acc_day), acc_day),
        n_day=jnp.where(flush, 0, n_day),
        time_start=jnp.where(flush, t_now, st.time_start),
    )


def acc_temp_mean(st: AccTempState):
    n = jnp.maximum(st.size, 1).astype(st.acc.dtype)
    return st.acc / n


class CryoState(NamedTuple):
    surf: AccTempState
    sub: AccTempState


def cryo_init(ne: int, surf_days: int = 7, sub_days: int = 28,
              dtype=jnp.float64) -> CryoState:
    return CryoState(
        surf=acc_temp_init(ne, surf_days, dtype),
        sub=acc_temp_init(ne, sub_days, dtype),
    )


def cryo_step(cs: CryoState, temp, t_now, surf_max=-1.0, surf_min=-5.0,
              sub_max=-3.0, sub_min=-10.0):
    """Push this step's temperature; return (new_state, fu_surf, fu_sub)
    (MD_ET.cpp:296-311)."""
    surf = acc_temp_push(cs.surf, temp, t_now)
    sub = acc_temp_push(cs.sub, temp, t_now)
    fu_surf = 1.0 - frozen_fraction(acc_temp_mean(surf), surf_max, surf_min)
    fu_sub = 1.0 - frozen_fraction(acc_temp_mean(sub), sub_max, sub_min)
    return CryoState(surf=surf, sub=sub), fu_surf, fu_sub
