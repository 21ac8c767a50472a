#!/usr/bin/env python3
"""Benchmark: ccw watershed solver throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "cell_steps_per_s_ccw", "value": N, "unit": "cell-steps/s",
   "vs_baseline": R}

cell-steps/s = NumEle x NFE / wall, the throughput proxy the reference logs
per screen interval (SURVEY §5.1: nFCall / prj.time.csv).  The reference
publishes no numbers (BASELINE.json `published: {}`); `vs_baseline`
therefore anchors on the measured single-core C++ reference RHS evaluation
throughput (the dominant cost of the reference's CVODE run) when the oracle
library is available, else on a recorded constant from the build machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference C++ RHS throughput measured on this machine's CPU (single
# core, ccw mesh): ~1147 cells / 0.20 ms per f-eval.  Kept as a fallback
# when /tmp/oracle is absent.
CPP_CELL_EVALS_PER_S_FALLBACK = 5.7e6

N_DAYS = 20  # simulated days per timed batch (after 1 warmup day)
# 20-day batches are the production protocol (driver/run_fast.py
# dispatches multi-day chunks); 5-day batches under-reported the
# sustained rate by ~25% (dispatch overhead amortises with batch
# size — docs/PERF.md "How we time").


def measure_cpp_baseline() -> float:
    try:
        import numpy as np

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        cwd = os.getcwd()
        from tools.oracle import Oracle

        o = Oracle("ccw")
        y = o.y0()
        o.update_forcing(0.0)
        o.et(0.0, 10.0)
        o.f(0.0, y)
        # best-of-chunks minimises contention bias from other host processes
        best_dt = float("inf")
        for _ in range(6):
            t0 = time.time()
            n = 50
            for _ in range(n):
                o.f(0.0, y)
            best_dt = min(best_dt, (time.time() - t0) / n)
        os.chdir(cwd)
        # never report a baseline slower than the recorded idle-machine
        # number — a loaded host must not inflate vs_baseline
        return max(o.ne / best_dt, CPP_CELL_EVALS_PER_S_FALLBACK)
    except Exception:
        return CPP_CELL_EVALS_PER_S_FALLBACK


def _measure():
    import jax
    import jax.numpy as jnp

    import shud_tpu  # noqa: F401
    from shud_tpu.driver.fused import FusedSimulation

    base = "/root/reference" if os.path.isdir("/root/reference/input/ccw") else "."
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    # f32 fast path on TPU (local-datum head differences keep mm-scale
    # gradient accuracy; see docs/VALIDATION.md); f64 elsewhere
    fdtype = jnp.float32 if on_tpu else jnp.float64

    sim = FusedSimulation.create("ccw", base=base, float_dtype=fdtype)
    ne = sim.md.num_ele

    # warmup (compile + first simulated day); synchronisation must be a
    # HOST FETCH — on the axon backend block_until_ready returns before the
    # computation finishes
    out = sim.advance_interval(1440.0)
    _ = int(sim.bdf.nfe)

    # The shared TPU tunnel shows intermittent 10-60x contention stalls;
    # take the best of a few repeats to measure the machine, not the noise —
    # and RECORD every repeat so the JSON carries the variance (VERDICT r3
    # item 6: one unreproducible number is no number).
    vals = []
    repeats = 5  # >=5 recorded repeats (VERDICT r4 item 4): the tunnel's
    # intermittent contention stalls need more samples than 3 to separate
    # the machine from the noise
    for _ in range(repeats):
        nfe0 = int(sim.bdf.nfe)
        t0 = time.time()
        for _ in range(N_DAYS):
            out = sim.advance_interval(1440.0)
        nfe = int(sim.bdf.nfe) - nfe0  # host fetch = true sync
        wall = time.time() - t0
        vals.append(ne * nfe / wall)
    return vals


def main():
    baseline = measure_cpp_baseline()

    # The TPU tunnel shows occasional transient outages (backend errors or
    # indefinite stalls).  Run the measurement in a FRESH subprocess with a
    # timeout and retry — a wedged jax backend cannot be recovered
    # in-process, and one outage must not lose the round's recorded metric.
    import subprocess

    best = None
    vals = []
    for attempt in range(3):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--measure"],
                capture_output=True, text=True, timeout=900,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in r.stdout.splitlines():
                if line.startswith("MEASURED "):
                    vals = [float(v) for v in line.split()[1:]]
                    best = max(vals)
            if best is not None:
                break
            print(f"bench attempt {attempt + 1} produced no measurement; "
                  f"stderr tail: {r.stderr[-500:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench attempt {attempt + 1} timed out", file=sys.stderr)
        time.sleep(30 * (attempt + 1))
    if best is None:
        raise SystemExit("bench failed after retries")

    print(json.dumps({
        "metric": "cell_steps_per_s_ccw",
        "value": round(best, 1),
        "unit": "cell-steps/s",
        "vs_baseline": round(best / baseline, 4),
        "repeats": [round(v, 1) for v in vals],
        "spread_pct": round(100.0 * (max(vals) - min(vals)) / max(vals), 1)
        if len(vals) > 1 else 0.0,
        "protocol": "20-day dispatch batches (sustained production "
                    "protocol), best of 5 recorded repeats; NFE x NumEle / "
                    "wall, host-fetch synchronised",
    }))


if __name__ == "__main__":
    if "--measure" in sys.argv:
        print("MEASURED " + " ".join("%.6g" % v for v in _measure()))
    else:
        main()
