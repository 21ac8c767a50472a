#!/usr/bin/env python3
"""Measure BDF order-2 (default) vs order-3 on the real watersheds.

Produces the docs/VALIDATION.md "BDF order" table: NFE / step counts and
the max trajectory difference at the reference tolerances over N days.
The reference leaves CVODE at its default order cap of 5
(cvode_config.cpp:149-197); this records why shud_tpu caps at 2.

    python tools/bdf_order_measure.py [days]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")


def main():
    days = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from shud_tpu.driver.simulate import Simulation
    from shud_tpu.solver.bdf import bdf_init

    def run(project, order):
        # day_end=6: heihe's full config end exceeds its forcing coverage
        sim = Simulation.create(project, base="/root/reference",
                                day_end=days + 1.0)
        sim.cfg = sim.cfg._replace(max_order=order)
        sim.bdf = bdf_init(sim.t, sim.bdf.y, sim.cfg)
        t0 = time.time()
        sim.run(t_end=sim.inp.control.start_time + days * 1440.0)
        wall = time.time() - t0
        return (np.asarray(sim.bdf.y), int(sim.bdf.nfe),
                int(sim.bdf.nsteps), wall)

    for project in ["ccw", "heihe"]:
        y2, nfe2, ns2, w2 = run(project, 2)
        y3, nfe3, ns3, w3 = run(project, 3)
        d = np.abs(y2 - y3).max()
        print(f"{project}: order2 nfe={nfe2} nsteps={ns2} wall={w2:.0f}s | "
              f"order3 nfe={nfe3} nsteps={ns3} wall={w3:.0f}s | "
              f"dNFE={100*(nfe3-nfe2)/nfe2:+.1f}% max|dy|={d:.2e}")


if __name__ == "__main__":
    main()
