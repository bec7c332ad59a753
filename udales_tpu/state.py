"""Prognostic state pytrees.

The reference keeps three module-level copies of every prognostic field
(um/u0/up, modfields.f90:422) plus diagnostics. Here state is a pure pytree:

  - ``Fields``: one set of prognostic fields at a single time level
      u   (nx, ny, nz)    x-velocity at x-faces (xh[i], yf[j], zf[k])
      v   (nx, ny, nz)    y-velocity at y-faces
      w   (nx, ny, nz+1)  z-velocity at z-faces (w[...,0]=bottom, w[...,nz]=top)
      thl (nx, ny, nz)    liquid potential temperature
      qt  (nx, ny, nz)    total humidity
      e12 (nx, ny, nz)    sqrt(subgrid TKE)
      sv  (nsv, nx, ny, nz) passive scalars
  - ``State``: full RK3 carry = start-of-step fields (``m``, reference um),
      current substep fields (``c``, reference u0), accumulated pressure
      ``pres`` (reference pres0), timestep ``dt``, elapsed ``timee``.

The RK3 update is u0 = um + rk3coef * up (reference modtstep.f90:171-340).
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

import jax
import jax.numpy as jnp

from .grid import Grid


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Fields:
    u: Any
    v: Any
    w: Any
    thl: Any
    qt: Any
    e12: Any
    sv: Any  # (nsv, nx, ny, nz); nsv may be 0
    bx: Any = None  # XPlanes outlet state for open-x runs (ops/openbc.py)
    by: Any = None  # YPlanes outlet state for open-y runs (ops/openbc.py)

    def map(self, fn):
        return jax.tree.map(fn, self)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class State:
    m: Fields        # start-of-full-step fields (reference um, vm, ...)
    c: Fields        # current substep fields (reference u0, v0, ...)
    pres: Any        # accumulated modified pressure (reference pres0)
    dt: Any          # adaptive timestep (traced scalar)
    timee: Any       # elapsed simulation time (traced scalar)
    fac: Any = None  # FacetState for energy-balance runs (ibm/eb.py)
    ctl: Any = None  # Controller state (ifixuinf=2 free-stream controller)
    ibmp: Any = None  # static IBM dense wall-function parameter stacks
                      # (IBM.params()); carried in State so the large arrays
                      # enter jit as arguments, not embedded HLO constants
    facstats: Any = None  # FacStats accumulators for lwritefac runs
    ig: Any = None   # InletGen rescale-recycle state (ops/inletgen.py)
    taud: Any = None  # wall-stress diagnostics dict (tau_x/y/z, thl_flux)
                      # for fielddump tx/ty/tz/hf codes (modibm.f90:1185)
    drv: Any = None  # DriverWindow: rolling precursor-replay chunk
                     # (lchunkread streaming, io/driverstream.py)

    def replace(self, **kw):
        return replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FacStats:
    """lwritefac facet-diagnostic accumulators (modibm.f90:114-127,
    1246-1280): dt-weighted running sums of facet-area-averaged wall stress,
    pressure, and heat-transfer coefficients, normalized by the elapsed
    interval and written to fac.<exp>.nc every dtfac."""
    tau_x: Any   # (nfcts,) sum dt * <tau_x>_facet
    tau_y: Any
    tau_z: Any
    pres: Any
    pres2: Any
    htc: Any
    cth: Any
    tlast: Any   # scalar: time of the last fac write


def zero_facstats(nfcts: int, dtype) -> FacStats:
    z = lambda: jnp.zeros(nfcts, dtype)
    return FacStats(tau_x=z(), tau_y=z(), tau_z=z(), pres=z(), pres2=z(),
                    htc=z(), cth=z(), tlast=jnp.zeros((), dtype))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Ctl:
    """Free-stream controller state (ifixuinf=2, modforces.fixuinf2 +
    modtstep.f90:194-200): running-average free stream, its rate dgdt, and
    the accumulated dpdx offset."""
    freestreamav: Any
    dgdt: Any
    dpdx_shift: Any


def zero_fields(grid: Grid, nsv: int = 0, dtype=None) -> Fields:
    dtype = dtype or grid.dtype
    nx, ny, nz = grid.shape
    z3 = lambda: jnp.zeros((nx, ny, nz), dtype)
    return Fields(
        u=z3(), v=z3(), w=jnp.zeros((nx, ny, nz + 1), dtype),
        thl=z3(), qt=z3(), e12=z3(),
        sv=jnp.zeros((nsv, nx, ny, nz), dtype),
    )


def profile_fields(grid: Grid, uprof, vprof, thlprof, qtprof, e12prof,
                   svprof=None, dtype=None) -> Fields:
    """Cold-start initialization from vertical profiles
    (reference modstartup.f90:1155-1184)."""
    dtype = dtype or grid.dtype
    nx, ny, nz = grid.shape
    tile = lambda p: jnp.broadcast_to(
        jnp.asarray(p, dtype)[None, None, :], (nx, ny, nz))
    nsv = 0 if svprof is None else svprof.shape[0]
    sv = (jnp.zeros((0, nx, ny, nz), dtype) if nsv == 0 else
          jnp.broadcast_to(jnp.asarray(svprof, dtype)[:, None, None, :],
                           (nsv, nx, ny, nz)))
    return Fields(
        u=tile(uprof), v=tile(vprof),
        w=jnp.zeros((nx, ny, nz + 1), dtype),
        thl=tile(thlprof), qt=tile(qtprof), e12=tile(e12prof), sv=sv,
    )


def randomize(fields: Fields, key, amplitude: float, krand: int) -> Fields:
    """Add zero-mean uniform perturbations to u, v, w in levels [0, krand)
    (reference modstartup.f90:1212-1224, randomize_field:2367).

    Each level's perturbation is de-meaned, as the reference subtracts the
    instantaneous slab mean of the random numbers."""
    def perturb(f, key, nzlim):
        shp = f.shape
        r = jax.random.uniform(key, shp, f.dtype, -1.0, 1.0)
        r = r - r.mean(axis=(0, 1), keepdims=True)
        mask = (jnp.arange(shp[2]) < nzlim)[None, None, :]
        return f + amplitude * r * mask
    k1, k2, k3 = jax.random.split(key, 3)
    return replace(
        fields,
        u=perturb(fields.u, k1, krand),
        v=perturb(fields.v, k2, krand),
        w=perturb(fields.w, k3, krand),
    )


def initial_state(grid: Grid, fields: Fields, dt0: float = 1.0,
                  dtype=None, fac=None) -> State:
    dtype = dtype or grid.dtype
    nx, ny, nz = grid.shape
    return State(
        m=fields, c=fields,
        pres=jnp.zeros((nx, ny, nz), dtype),
        dt=jnp.asarray(dt0, dtype),
        timee=jnp.asarray(0.0, dtype),
        fac=fac,
    )
