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
    step = jax.jit(model.step)

    # compile + warmup
    state = jax.block_until_ready(step(state))
    state = jax.block_until_ready(step(state))

    nsteps = 20
    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = step(state)
    jax.block_until_ready(state.c.u)
    dt_wall = time.perf_counter() - t0

    pts_per_s = n * n * n * nsteps / dt_wall
    print(json.dumps({
        "metric": "rk3_step_grid_points_per_s_per_chip",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / FORTRAN_BASELINE_PTS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
