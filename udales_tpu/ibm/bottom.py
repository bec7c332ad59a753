"""Domain-floor wall functions (`bottom`, src/modibm.f90:1997-2099).

Active when lbottom=.true. (floor not covered by facets).  The reference
pattern per lowest cell: cancel the ghost-based SGS diffusion across the floor
face, then subtract the log-law stress.  With this package's ghost convention
(u ghost below floor = 0, scalar ghosts zero-flux) the cancellation term for
momentum equals +u0*emom*dzhi*dzfi and the scalar diffusion through the floor
face is already zero, so only the wall-function fluxes are applied on top.
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ..config import (BCBOTM_WF, BCBOTM_WFNEUTRAL, BCBOT_FLUX, BCBOT_WF,
                      Config, const)
from ..grid import Grid
from .wallfn import UMIN, ctm_neutral, unom, unoh


def bottom_tendencies(g, cfg: Config, grid: Grid, nsv: int = 0):
    """Tendency contributions for (u, v, thl, qt, sv) at the lowest level.

    `g` is a Ghosts pytree. Returns dense (nx,ny,nz) arrays that are zero
    except at k=0 (plus the face-shaped zeros for w which is untouched)."""
    nx, ny, nz = grid.shape
    dt = g.u.dtype
    z3 = lambda: jnp.zeros((nx, ny, nz), dt)
    du, dv, dthl, dqt = z3(), z3(), z3(), z3()
    dsv = jnp.zeros((nsv, nx, ny, nz), dt)
    if not cfg.walls.lbottom:
        return du, dv, dthl, dqt, dsv

    z0 = cfg.bc.z0 if cfg.bc.z0 > 0 else 0.03
    z0h = cfg.bc.z0h if cfg.bc.z0h > 0 else z0 / 10.0
    thls = cfg.bc.thls if cfg.bc.thls > 0 else 288.0
    # metrics as Python floats: numpy f64 scalars are strong-typed and
    # would promote the f32 scatter updates below to f64
    delta = 0.5 * float(grid.dzf[0])
    logdz = jnp.log(jnp.asarray(delta / z0, dt))
    logzh = jnp.log(jnp.asarray(z0 / z0h, dt))
    sqdz = jnp.sqrt(jnp.asarray(delta / z0, dt))
    dzfi0 = float(grid.dzfi[0])
    dzhi0 = float(grid.dzhi[0])
    dzhiq0 = float(grid.dzhiq[0])
    dzf_g = [float(grid.dzf_g[0]), float(grid.dzf_g[1])]  # [0]=ghost, [1]=k0

    # interior slices at k=0 (ghost offset 1 in x/y and k)
    u0 = g.u[1:-1, 1:-1, 1]
    v0 = g.v[1:-1, 1:-1, 1]
    thl0 = g.thl[1:-1, 1:-1, 1]
    ekm0 = g.ekm[1:-1, 1:-1, 1]
    ekm_g = g.ekm[1:-1, 1:-1, 0]  # mirrored ghost 2*numol - ekm

    # ---- u component (wfuno case 91, modwallfunctions.f90:97-113) -------
    v_at_u = 0.25 * (g.v[1:-1, 1:-1, 1] + g.v[0:-2, 1:-1, 1]
                     + g.v[1:-1, 2:, 1] + g.v[0:-2, 2:, 1])
    utangInt = jnp.maximum(UMIN, u0 ** 2 + v_at_u ** 2)
    if cfg.bc.BCbotm == BCBOTM_WFNEUTRAL:
        ctm = ctm_neutral(logdz)
    else:
        thl_at_u = 0.5 * (g.thl[1:-1, 1:-1, 1] + g.thl[0:-2, 1:-1, 1])
        dT = thl_at_u - thls
        Ribl0 = const.grav * delta * dT * 2.0 / ((2.0 * thls) * utangInt)
        ctm = unom(logdz, logzh, sqdz, Ribl0, cfg.walls.prandtlturb)
    tau_u = jnp.sign(u0) * jnp.abs(u0) * jnp.sqrt(utangInt) * ctm
    emom_u = (dzf_g[0] * (ekm0 + g.ekm[0:-2, 1:-1, 1])
              + dzf_g[1] * (ekm_g + g.ekm[0:-2, 1:-1, 0])) * dzhiq0
    du = du.at[:, :, 0].add(u0 * emom_u * dzhi0 * dzfi0 - tau_u * dzfi0)

    # ---- v component ----------------------------------------------------
    u_at_v = 0.25 * (g.u[1:-1, 1:-1, 1] + g.u[1:-1, 0:-2, 1]
                     + g.u[2:, 0:-2, 1] + g.u[2:, 1:-1, 1])
    utangInt_v = jnp.maximum(UMIN, u_at_v ** 2 + v0 ** 2)
    if cfg.bc.BCbotm == BCBOTM_WFNEUTRAL:
        ctm_v = ctm_neutral(logdz)
    else:
        thl_at_v = 0.5 * (g.thl[1:-1, 1:-1, 1] + g.thl[1:-1, 0:-2, 1])
        dT_v = thl_at_v - thls
        Ribl0_v = const.grav * delta * dT_v * 2.0 / ((2.0 * thls) * utangInt_v)
        ctm_v = unom(logdz, logzh, sqdz, Ribl0_v,
                         cfg.walls.prandtlturb)
    tau_v = jnp.sign(v0) * jnp.abs(v0) * jnp.sqrt(utangInt_v) * ctm_v
    eomm_v = (dzf_g[0] * (ekm0 + g.ekm[1:-1, 0:-2, 1])
              + dzf_g[1] * (ekm_g + g.ekm[1:-1, 0:-2, 0])) * dzhiq0
    dv = dv.at[:, :, 0].add(v0 * eomm_v * dzhi0 * dzfi0 - tau_v * dzfi0)

    # ---- temperature ----------------------------------------------------
    if cfg.physics.ltempeq:
        if cfg.bc.BCbotT == BCBOT_WF:
            # wfuno case 92 (modwallfunctions.f90:133-162)
            u_at_c = 0.5 * (g.u[1:-1, 1:-1, 1] + g.u[2:, 1:-1, 1])
            v_at_c = 0.5 * (g.v[1:-1, 1:-1, 1] + g.v[1:-1, 2:, 1])
            uInt = jnp.maximum(UMIN, u_at_c ** 2 + v_at_c ** 2)
            dT_c = thl0 - thls
            Ribl0_c = const.grav * delta * dT_c / (thls * uInt)
            flux, _ = unoh(logdz, logzh, sqdz, uInt, dT_c, Ribl0_c,
                           cfg.walls.prandtlturb)
            dthl = dthl.at[:, :, 0].add(-flux * dzfi0)
        else:  # fixed flux (BCbotT_flux)
            wtsurf = cfg.bc.wtsurf if cfg.bc.wtsurf > -900 else 0.0
            dthl = dthl.at[:, :, 0].add(-wtsurf * dzfi0)

    if cfg.physics.lmoist and cfg.bc.BCbotq == BCBOT_FLUX:
        wqsurf = cfg.bc.wqsurf if cfg.bc.wqsurf > -900 else 0.0
        dqt = dqt.at[:, :, 0].add(wqsurf * dzfi0)

    return du, dv, dthl, dqt, dsv
