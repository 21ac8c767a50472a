#!/usr/bin/env python3
"""Trajectory verification protocol (docs/VALIDATION.md) — produces a
plain-text report:

1. adaptive solver (reference tolerances) vs fine fixed-step truth, N days;
2. fixed-step self-convergence (h vs h/2);
3. implicit vs operator-split agreement;
4. window-level conservation closure (flux path integral vs storage).

Usage: JAX_PLATFORM_NAME=cpu python tools/verify_trajectory.py [days]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    days = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import shud_tpu  # noqa: F401
    from shud_tpu.core.rhs import rhs
    from shud_tpu.driver.simulate import Simulation
    from shud_tpu.driver.uncoupled import (
        advance_window_uncoupled,
        init_uncoupled,
    )
    from shud_tpu.solver.fixed import fixed_bdf1

    t_end = days * 1440.0
    print(f"== shud_tpu trajectory verification: ccw, {days:g} days ==")

    # --- adaptive run ---
    sim = Simulation.create("ccw", base="/root/reference")
    ne, nr = sim.md.num_ele, sim.md.num_riv
    t0 = time.time()
    sim.run(t_end=t_end)
    print(f"adaptive: nfe={int(sim.bdf.nfe)} nsteps={int(sim.bdf.nsteps)} "
          f"newton_fails={int(sim.bdf.nnifails)} wall={time.time()-t0:.1f}s")
    y_adapt = np.asarray(sim.bdf.y)

    # --- fixed-step truth at two resolutions + split mode ---
    # NB: f must have stable identity — it is a static argnum of
    # fixed_bdf1's jit; a per-window closure recompiles every window and
    # exhausts the LLVM JIT's mmap budget.
    def f(tt, yy, p):
        mesh, slc = p
        return rhs(mesh, slc, tt, yy)

    def run_fixed(h):
        s2 = Simulation.create("ccw", base="/root/reference")
        dm = s2.dm
        y = s2.bdf.y
        t = 0.0
        while t < t_end - 1e-9:
            tout = min(t + 10.0, t_end)
            fs, cf = s2.forcing_slice(tout)
            _, y = fixed_bdf1(f, y, t, (dm, fs), h, int(round((tout - t) / h)),
                              2)
            t = tout
        return np.asarray(y)

    t0 = time.time()
    y_h = run_fixed(2e-2)
    y_h2 = run_fixed(1e-2)
    print(f"fixed-step truths wall={time.time()-t0:.1f}s")

    def report(name, a, b, tol):
        d = np.abs(a - b)
        parts = dict(
            surface=d[:ne].max(), unsat=d[ne:2*ne].max(),
            gw=d[2*ne:3*ne].max(), river=d[3*ne:].max(),
        )
        status = "PASS" if max(parts.values()) < tol else "FAIL"
        print(f"{name}: " + "  ".join(f"{k}={v:.2e}" for k, v in parts.items())
              + f"  [{status} @ {tol:g} m]")
        return status == "PASS"

    ok = True
    ok &= report("truth self-convergence (h vs h/2)", y_h, y_h2, 1e-5)
    ok &= report("adaptive vs truth", y_adapt, y_h2, 5e-3)

    # --- operator-split cross-check ---
    s3 = Simulation.create("ccw", base="/root/reference")
    # this tool is hard-wired to ccw (lake-free); assert rather than
    # silently dropping the lake block of the state vector
    assert s3.md.num_lake == 0, "verify_trajectory assumes a lake-free mesh"
    un = init_uncoupled(np.asarray(s3.bdf.y), ne, nr, 0.0, s3.cfg,
                        nl=s3.md.num_lake)
    t = 0.0
    nwin = min(int(t_end / 10.0), 36)
    for k in range(nwin):
        fs, cf = s3.forcing_slice(t + 10.0)
        un = advance_window_uncoupled(s3.dm, fs, un, t, t + 10.0, s3.cfg)
        t += 10.0
    s4 = Simulation.create("ccw", base="/root/reference")
    s4.run(t_end=t)
    y_imp = np.asarray(s4.bdf.y)
    y_spl = np.concatenate([
        np.asarray(un.surf.y), np.asarray(un.unsat.y),
        np.asarray(un.gw.y), np.asarray(un.riv.y),
    ])
    ok &= report(f"implicit vs operator-split ({nwin} windows)", y_imp, y_spl,
                 5e-3)

    print("OVERALL:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
