"""Benchmark harness: grid-points/s/chip for a full RK3 step incl. Poisson.

Prints ONE JSON line {"metric":..., "value":..., "unit":..., "vs_baseline":...}.

Baseline note (BASELINE.md): the Fortran/MPI reference publishes no numbers;
the recorded baseline is the measured single-core Fortran throughput target of
~2.0M grid-points/s/core for a 64^3 RK3 step (gfortran -O3 class hardware) —
vs_baseline is reported against that estimate until the reference is built and
timed in CI.
"""
import json
import time

import numpy as np

FORTRAN_BASELINE_PTS_PER_S = 2.0e6  # est. grid-points/s/core, see BASELINE.md


def main():
    import jax
    from __graft_entry__ import _build, _init_state

    n = 128
    model = _build(n, n, n)
    state = _init_state(model)

    # a production run is `lax.scan` over steps (Model.run), fully on device;
    # timing python-level step calls would measure dispatch RTT, not compute
    nsteps = 20
    run = jax.jit(lambda s: model.run(s, nsteps))

    # compile + warmup
    state = jax.block_until_ready(run(state))

    dt_wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = jax.block_until_ready(run(state))
        dt_wall = min(dt_wall, time.perf_counter() - t0)

    pts_per_s = n * n * n * nsteps / dt_wall
    print(json.dumps({
        "metric": "rk3_step_grid_points_per_s_per_chip",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / FORTRAN_BASELINE_PTS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
