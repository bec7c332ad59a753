"""Device-time phase profiling of the RK3 step via scan-repetition.

The axon TPU tunnel adds ~25 ms round-trip latency per dispatched
executable, so timing a jitted function call-by-call measures RTT, not
device time.  This tool wraps each phase in a `lax.scan` of K iterations
inside ONE jit (with a carried data dependence so XLA cannot hoist the
loop-invariant body) and reports seconds-per-iteration, which converges
to true device time for K >> 1.

Usage: python prof_scan.py [N] [K]
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from __graft_entry__ import _build, _init_state


def scan_time(fn, state, K=30, repeats=3):
    """fn: State -> pytree.  Returns best device-seconds per call.

    The body perturbs the input by a carried epsilon (so XLA cannot hoist
    it out of the loop) and reduces over EVERY output leaf (so XLA cannot
    dead-code-eliminate any part of the phase)."""
    def body(carry, _):
        s, acc = carry
        s2 = s.replace(c=dataclasses.replace(s.c, u=s.c.u + acc))
        out = fn(s2)
        tot = sum(jnp.sum(leaf).astype(jnp.float32)
                  for leaf in jax.tree_util.tree_leaves(out)
                  if hasattr(leaf, "dtype")
                  and jnp.issubdtype(leaf.dtype, jnp.floating))
        acc2 = (tot * 1e-10).astype(s.c.u.dtype)
        return (s, acc2), None

    @jax.jit
    def loop(st):
        z = jnp.zeros((), st.c.u.dtype)
        (s, acc), _ = jax.lax.scan(body, (st, z), None, length=K)
        return acc

    jax.block_until_ready(loop(state))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(state))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def chain_time(step, state, K=30, repeats=3):
    """True chained cost of a State->State function under lax.scan."""
    @jax.jit
    def loop(st):
        def body(s, _):
            return step(s), None
        out, _ = jax.lax.scan(body, st, None, length=K)
        return out

    jax.block_until_ready(loop(state))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(state))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    model = _build(n, n, n)
    state = _init_state(model)
    cfg, grid = model.cfg, model.grid

    from udales_tpu.ops import advection as adv
    from udales_tpu.ops import subgrid as sgs
    from udales_tpu.ops.boundary import make_ghosts
    from udales_tpu.ops.pallas_stencil import fused_diff_mom
    from udales_tpu.ops.thermo import thermodynamics
    from udales_tpu.run import _velocity_ghosts
    from udales_tpu.ibm.bottom import bottom_tendencies

    # -- full step (the ground truth: real chained scan) --------------------
    t_step = chain_time(model.step, state, K)
    print(f"full RK3 step      : {t_step*1e3:8.3f} ms   "
          f"({n**3 / t_step / 1e6:7.1f} M pts/s)")

    # -- phases -------------------------------------------------------------
    def ph_gvel(s):
        return _velocity_ghosts(s.c, cfg, grid)

    def ph_thermo(s):
        return thermodynamics(s.c, cfg, grid, None)

    def ph_closure(s):
        g = ph_gvel(s)
        th = ph_thermo(s)
        return sgs.closure(g, grid, cfg, e12=s.c.e12, dthvdz=th.dthvdz,
                           thl=s.c.thl, thvs=288.0)

    def _full_ghosts(s):
        ekm, ekh, _ = ph_closure(s)
        return make_ghosts(s.c, ekm, ekh, cfg, grid)

    def ph_ghosts(s):
        return _full_ghosts(s)

    def ph_adv(s):
        g = _full_ghosts(s)
        return (adv.adv_u(g, grid), adv.adv_v(g, grid), adv.adv_w(g, grid))

    def ph_diff(s):
        g = _full_ghosts(s)
        return fused_diff_mom(g, grid)

    def ph_bottom(s):
        g = _full_ghosts(s)
        return bottom_tendencies(g, cfg, grid, 0)

    def ph_pois(s):
        rhs = (s.c.u - jnp.roll(s.c.u, 1, 0)) * grid.dxi
        return model.pois.solve(rhs)

    def ph_project(s):
        rk3coef = s.dt / 3.0
        return model._project(s.c.u * 0.0, s.c.v * 0.0, s.c.w * 0.0,
                              s.m, rk3coef, pres=s.pres)

    phases = [
        ("vel ghosts", ph_gvel, None),
        ("thermodynamics", ph_thermo, None),
        ("closure (cum)", ph_closure, None),
        ("full ghosts (cum)", ph_ghosts, None),
        ("adv u+v+w", ph_adv, ph_ghosts),
        ("fused diffusion", ph_diff, ph_ghosts),
        ("bottom wallfn", ph_bottom, ph_ghosts),
        ("poisson solve", ph_pois, None),
        ("project (cum)", ph_project, None),
    ]
    base_cache = {}
    for name, fn, base in phases:
        t = scan_time(fn, state, K)
        base_cache[fn] = t
        extra = ""
        if base is not None and base in base_cache:
            extra = f"  (incr {1e3*(t - base_cache[base]):+7.3f} ms)"
        print(f"{name:19s}: {t*1e3:8.3f} ms{extra}")
    print(f"note: one full step = 3 substeps; phases above are per-substep "
          f"costs evaluated standalone")


if __name__ == "__main__":
    main()
