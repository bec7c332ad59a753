"""Ad-hoc phase timing of the RK3 step on the real TPU (not committed-critical).

Times: full step, poisson solve alone, one substep without poisson.
"""
import time
import jax
from __graft_entry__ import _build, _init_state


def timeit(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out)
    return (time.perf_counter() - t0) / n


def main():
    n = 128
    model = _build(n, n, n)
    state = _init_state(model)
    step = jax.jit(model.step)
    t_step = timeit(step, state)
    print(f"full step      : {t_step*1e3:8.2f} ms")

    # poisson alone: build the same inputs the substep builds
    from udales_tpu.ops import subgrid as sgs
    from udales_tpu.run import _velocity_ghosts

    ps = model.pois

    def pois_only(s):
        rhs = s.m.u * 0.01  # shape-representative RHS
        return ps.solve(rhs)

    try:
        jp = jax.jit(pois_only)
        t_p = timeit(jp, state)
        print(f"poisson (x3/step ~ {3*t_p*1e3:6.2f} ms): {t_p*1e3:8.2f} ms each")
    except Exception as e:
        print("poisson-only timing skipped:", type(e).__name__, e)

    def closure_only(s):
        # times the closure on s.m (start-of-step fields); the real substep
        # evaluates on s.c — identical shapes/cost, so this is representative
        g = _velocity_ghosts(s.m, model.cfg, model.grid)
        from udales_tpu.run import thermodynamics
        th = thermodynamics(s.m, model.cfg, model.grid,
                            model.ibm.masks if model.ibm else None)
        return sgs.closure(g, model.grid, model.cfg, e12=s.m.e12,
                           dthvdz=th.dthvdz, thl=s.m.thl, thvs=288.0)

    t_c = timeit(jax.jit(closure_only), state)
    print(f"closure+thermo : {t_c*1e3:8.2f} ms")

    def substep_only(s):
        return model.substep(s, 1)

    t_ss = timeit(jax.jit(substep_only), state)
    print(f"one substep    : {t_ss*1e3:8.2f} ms (x3 = {3*t_ss*1e3:.2f})")


if __name__ == "__main__":
    main()
