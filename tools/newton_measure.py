#!/usr/bin/env python3
"""Measure Newton/predictor economy variants at equal trajectory error.

VERDICT r2 item 3 asked for CVODE-style Jacobian amortisation
("modified Newton: freeze the linearization", SUNDIALS behaviour behind
cvode_config.cpp:149-197).  In the matrix-free form this solver uses,
re-linearising per Newton iteration costs exactly what a frozen-Jacobian
("chord") iteration would: either way each iteration is 1 primal RHS (the
residual) + krylov_m J-v products, and ``jax.linearize``'s primal pass IS
the residual evaluation — there is no separate Jacobian setup to amortise
(CVODE's dqjac/psetup savings do not exist without a stored Jacobian or
preconditioner).  The measurable CVODE trick that DOES transfer is the
predictor: CVODE predicts from the Nordsieck history alone, while the
round-2 solver spent one extra RHS eval per step attempt on the Hermite
predictor slope (bdf.py fy0).  ``SolverConfig.history_predictor`` removes
that eval; this tool measures NFE/steps/wall and the trajectory deviation
on the real watersheds, plus the newton_iters x krylov_m grid (VERDICT
item 9) at ccw scale.

    python tools/newton_measure.py [days]
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

    def run(project, **cfg_over):
        sim = Simulation.create(project, base="/root/reference",
                                day_end=days + 1.0)
        sim.cfg = sim.cfg._replace(**cfg_over)
        sim.bdf = bdf_init(sim.t, sim.bdf.y, sim.cfg)
        t0 = time.time()
        sim.run(t_end=sim.inp.control.start_time + days * 1440.0)
        wall = time.time() - t0
        return (np.asarray(sim.bdf.y), int(sim.bdf.nfe),
                int(sim.bdf.nsteps), int(sim.bdf.nnifails), wall)

    for project in ["ccw", "heihe"]:
        y0, nfe0, ns0, nf0, w0 = run(project)
        print(f"{project}: baseline (Hermite pred, ni=3 m=3)   "
              f"nfe={nfe0} nsteps={ns0} ncfn={nf0} wall={w0:.0f}s")
        for label, over in [
            ("history predictor (ni=3 m=3)",
             dict(history_predictor=True)),
            ("hist pred + m=5", dict(history_predictor=True, krylov_m=5)),
            ("hist pred + ni=2", dict(history_predictor=True,
                                      newton_iters=2)),
            ("m=5", dict(krylov_m=5)),
            ("ni=2", dict(newton_iters=2)),
            ("ni=4 m=5", dict(newton_iters=4, krylov_m=5)),
        ]:
            y, nfe, ns, nf, w = run(project, **over)
            d = np.abs(y - y0).max()
            print(f"{project}: {label:32s} nfe={nfe} nsteps={ns} "
                  f"ncfn={nf} wall={w:.0f}s "
                  f"dNFE={100*(nfe-nfe0)/nfe0:+.1f}% max|dy|={d:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
