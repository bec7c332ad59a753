"""Benchmark harness: grid-points/s/chip for a full RK3 step incl. Poisson.

Prints ONE JSON line {"metric":..., "value":..., "unit":..., "vs_baseline":...}.

Baseline note (BASELINE.md): the Fortran/MPI reference publishes no numbers
and cannot be built in this environment (no gfortran/MPI), so `vs_baseline`
is computed against an ESTIMATE — 2.0M grid-points/s/core, the published
DALES-class single-core throughput for a 64^3 RK3 step on recent x86
(derivation in BASELINE.md "Estimate" section).  The JSON line labels this
explicitly via the `baseline` key.  A second, *measured* comparator — this
same solver jitted on one host CPU core-set — can be produced with
`UDALES_BENCH_CPU=1 python bench.py`; the last measured value is recorded in
BASELINE.md.
"""
import json
import os
import time

import numpy as np

# Estimated Fortran/MPI single-core throughput (NOT measured here — see
# BASELINE.md).  vs_baseline is therefore "vs-estimate".
FORTRAN_BASELINE_PTS_PER_S = 2.0e6


def measure(n=128, nsteps=20):
    import jax
    from __graft_entry__ import _build, _init_state

    model = _build(n, n, n)
    state = _init_state(model)

    # a production run is `lax.scan` over steps (Model.run), fully on device;
    # timing python-level step calls would measure dispatch RTT, not compute
    run = jax.jit(lambda s: model.run(s, nsteps))

    # compile + warmup
    state = jax.block_until_ready(run(state))

    dt_wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = jax.block_until_ready(run(state))
        dt_wall = min(dt_wall, time.perf_counter() - t0)
    return n * n * n * nsteps / dt_wall


def main():
    if os.environ.get("UDALES_BENCH_CPU"):
        # measured host-CPU comparator (same solver, XLA CPU backend)
        os.environ["JAX_PLATFORMS"] = "cpu"
        pts = measure(n=64, nsteps=10)
        print(json.dumps({
            "metric": "rk3_step_grid_points_per_s_cpu_host",
            "value": round(pts, 1), "unit": "points/s",
            "baseline": "measured:this-solver-on-host-cpu-64^3",
        }))
        return
    pts_per_s = measure()
    print(json.dumps({
        "metric": "rk3_step_grid_points_per_s_per_chip",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / FORTRAN_BASELINE_PTS_PER_S, 2),
        "baseline": "estimate:fortran-mpi-2.0e6-pts/s/core (BASELINE.md; "
                    "reference unbuildable here — no gfortran/MPI)",
    }))


if __name__ == "__main__":
    main()
