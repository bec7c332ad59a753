"""Long-horizon neutral-ABL validation on the TPU chip (example-001 class).

Runs O(10^4) RK3 steps of a pressure-driven neutral ABL (periodic x/y,
log-law wall functions at the floor, Vreman SGS) in chunked lax.scans and
asserts the three statements an LES user would demand:

  1. no NaN and bounded velocities over the whole run,
  2. statistical stationarity: resolved TKE drift over the last quarter
     of the run is small compared to its mean,
  3. the time-averaged streamwise profile recovers the log law
     u(z)/u* = (1/kappa) ln(z/z0) within a stated envelope in the
     surface layer, with u* fixed by the imposed momentum balance
     u*^2 = -dpdx * zsize at equilibrium.

Usage: python validate_abl.py [N] [CHUNKS] [CHUNK]   (64, 40, 500)
Writes a summary table to stdout; docs/validation.md records the numbers.
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build, _init_state

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nchunks = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    dpdx = 2.5e-4                      # u* = sqrt(dpdx*zsize) = 0.1265
    model = _build(n, n, n)
    model.dpdxl = jnp.full(n, -dpdx, jnp.float32)
    grid = model.grid
    zsize = float(grid.zh[-1])
    ustar = float(np.sqrt(dpdx * zsize))
    z0 = model.cfg.bc.z0
    state = _init_state(model, amp=0.1)

    @jax.jit
    def run_chunk(s):
        def body(st, _):
            return model.step(st), None
        s, _ = jax.lax.scan(body, s, None, length=chunk)
        uprof = jnp.mean(s.c.u, axis=(0, 1))
        ke = 0.5 * jnp.mean(s.c.u ** 2 + s.c.v ** 2
                            + 0.5 * (s.c.w[..., 1:] + s.c.w[..., :-1]) ** 2)
        up = s.c.u - jnp.mean(s.c.u, axis=(0, 1))
        vp = s.c.v - jnp.mean(s.c.v, axis=(0, 1))
        tke = 0.5 * jnp.mean(up ** 2 + vp ** 2)
        return s, (uprof, ke, tke, jnp.abs(s.c.u).max(), s.timee, s.dt)

    profs, kes, tkes = [], [], []
    t0 = time.time()
    for i in range(nchunks):
        state, (uprof, ke, tke, umax, timee, dt) = run_chunk(state)
        jax.block_until_ready(state.c.u)
        profs.append(np.asarray(uprof))
        kes.append(float(ke))
        tkes.append(float(tke))
        assert np.isfinite(profs[-1]).all(), f"NaN at chunk {i}"
        assert float(umax) < 50 * ustar / 0.4, f"runaway at chunk {i}"
        if i % 5 == 0 or i == nchunks - 1:
            print(f"chunk {i:3d}: t={float(timee):9.1f}s dt={float(dt):.3f} "
                  f"KE={kes[-1]:.5f} TKE={tkes[-1]:.5f} "
                  f"umax={float(umax):.3f}", flush=True)
    wall = time.time() - t0
    nsteps = nchunks * chunk
    print(f"\n{nsteps} steps, {wall:.0f}s wall "
          f"({n ** 3 * nsteps / wall / 1e6:.0f} M pts/s sustained)")

    # stationarity of resolved TKE over the last quarter
    q = nchunks // 4
    tq = np.asarray(tkes[-q:])
    drift = abs(tq[-1] - tq[0]) / tq.mean()
    rms = tq.std() / tq.mean()
    print(f"TKE last quarter: mean={tq.mean():.5f} drift={drift * 100:.1f}% "
          f"rms={rms * 100:.1f}%")
    assert rms < 0.30, "resolved TKE not statistically stationary"

    # log-law recovery on the last-quarter mean profile
    ubar = np.mean(profs[-q:], axis=0)
    zc = np.asarray(grid.zf)
    kappa = 0.41
    sel = (zc > 2.5 * float(grid.dzf[0])) & (zc < 0.4 * zsize)
    ulog = ustar / kappa * np.log(zc[sel] / z0)
    rel = (ubar[sel] - ulog) / ulog
    # effective von-Karman constant from a least-squares fit in the layer
    A = np.polyfit(np.log(zc[sel] / z0), ubar[sel], 1)
    kappa_eff = ustar / A[0]
    print(f"log-layer ({sel.sum()} levels): max |u-ulog|/ulog = "
          f"{np.abs(rel).max() * 100:.1f}%  kappa_eff = {kappa_eff:.3f}")
    for z, u, ul in zip(zc[sel], ubar[sel], ulog):
        print(f"  z={z:5.1f}  u={u:7.4f}  loglaw={ul:7.4f}  "
              f"{(u / ul - 1) * 100:+5.1f}%")
    assert np.abs(rel).max() < 0.15, "log-law envelope exceeded"
    assert 0.32 < kappa_eff < 0.52, kappa_eff
    print("\nVALIDATION PASSED")


if __name__ == "__main__":
    main()
