"""State and forcing-slice pytrees.

The global ODE state vector matches the reference layout
(``src/Model/Macros.hpp:21-26``):
``Y = [sf(Ne), us(Ne), gw(Ne), riv(Nr), lake(Nl)]``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ForcingSlice(NamedTuple):
    """Per-cell land-surface quantities held fixed during one solver
    interval (refreshed by the driver at each forcing/ET step, mirroring
    ``updateforcing``/``ET`` in the reference driver ``shud.cpp:91-155``)."""

    net_prcp: jnp.ndarray  # qEleNetPrep [m/min]
    prcp: jnp.ndarray  # qElePrep [m/min] (lake budget)
    pot_evap: jnp.ndarray  # qPotEvap [m/min]
    pot_tran: jnp.ndarray  # qPotTran [m/min]
    e_ic: jnp.ndarray  # qEleE_IC [m/min] (canopy-interception evap)
    lai: jnp.ndarray  # t_lai
    fu_surf: jnp.ndarray  # unfrozen surface fraction
    fu_sub: jnp.ndarray  # unfrozen subsurface fraction
    ele_ybc: jnp.ndarray  # Dirichlet GW head per cell (0 unless i_bc > 0)
    ele_qbc: jnp.ndarray  # fixed GW flux per cell [m3/min] (i_bc < 0)
    ele_qss: jnp.ndarray  # source/sink per cell [m3/min]
    riv_ybc: jnp.ndarray  # fixed river stage (riv_bc > 0)
    riv_qbc: jnp.ndarray  # fixed river inflow [m3/min] (riv_bc < 0)


def split_y(y, ne: int, nr: int, nl: int):
    sf = y[:ne]
    us = y[ne : 2 * ne]
    gw = y[2 * ne : 3 * ne]
    riv = y[3 * ne : 3 * ne + nr]
    lake = y[3 * ne + nr : 3 * ne + nr + nl]
    return sf, us, gw, riv, lake


def join_y(sf, us, gw, riv, lake):
    return jnp.concatenate([sf, us, gw, riv, lake])
