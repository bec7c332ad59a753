"""Boundary conditions as functional ghost-cell construction.

Replaces the in-place BC application of the reference (modboundary.f90:115-389
`boundary`, :434 `closurebc`, :1494 `fluxtop`, :1509 `valuetop`) with pure
functions that attach ghost planes to interior arrays.  Periodic wraps double
as the halo exchange (see ops/halo.py).

Only periodic lateral BCs are implemented so far (BCxm=BCym=1, the default and
the configuration of reference examples 001/002/101/102); profile/driver
inlets extend the `lateral_*` hooks.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..config import (BCTOPM_FREESLIP, BCTOPM_NOSLIP, BCTOPM_PRESSURE,
                      BCTOP_FLUX, BCTOP_VALUE, BC_PERIODIC, Config, const)
from ..grid import Grid
from ..state import Fields
from .halo import pad_axis, pad_periodic_xy, take_k


def _pad_xy(f, h, cfg: Config):
    if cfg.bc.BCxm == BC_PERIODIC and cfg.bc.BCym == BC_PERIODIC:
        return pad_periodic_xy(f, h)
    raise NotImplementedError("non-periodic lateral BCs: driver/profile inlets")


def ghost_u(u, cfg: Config, h: int = 1):
    """u ghosts: bottom ghost 0 (reference leaves um(kb-1)=0 from initfields,
    giving the molecular no-slip stress with the mirrored ekm of closurebc);
    top per BCtopm: freeslip/pressure -> zero-gradient, noslip -> 2*Uinf-u."""
    if cfg.bc.BCtopm == BCTOPM_NOSLIP:
        top = 2.0 * cfg.bc.Uinf - take_k(u, -1)
    else:
        top = take_k(u, -1)
    g = pad_axis(u, 2, jnp.zeros_like(take_k(u, 0)), top)
    return _pad_xy(g, h, cfg)


def ghost_v(v, cfg: Config, h: int = 1):
    if cfg.bc.BCtopm == BCTOPM_NOSLIP:
        top = 2.0 * cfg.bc.Vinf - take_k(v, -1)
    else:
        top = take_k(v, -1)
    g = pad_axis(v, 2, jnp.zeros_like(take_k(v, 0)), top)
    return _pad_xy(g, h, cfg)


def ghost_w(w, cfg: Config, h: int = 1):
    """w is a face array (nx,ny,nz+1); bottom/top faces are enforced
    impermeable here (modboundary.f90:165-166, 177)."""
    w = w.at[..., 0].set(0.0)
    if cfg.bc.BCtopm != BCTOPM_PRESSURE:
        w = w.at[..., -1].set(0.0)
    return _pad_xy(w, h, cfg)


def _scalar_top_ghost(f, ekh, grid: Grid, flux: float, value: float, mode: int):
    """fluxtop / valuetop ghost plane (modboundary.f90:1494-1519)."""
    if mode == BCTOP_VALUE:
        return 2.0 * value - take_k(f, -1)
    if flux == 0.0:
        return take_k(f, -1)
    dzh_top = grid.dzh[-1]
    dzf_ke = grid.dzf[-1]
    # ekh(ke+1)=ekh(ke), dzf(ke+1)=dzf(ke) after closurebc
    denom = dzf_ke * ekh[..., -1:]
    return take_k(f, -1) + flux * (dzh_top ** 2) / denom


def ghost_thl(thl, ekh, cfg: Config, grid: Grid, h: int = 1):
    top = _scalar_top_ghost(thl, ekh, grid, cfg.bc.wttop, cfg.bc.thl_top,
                            cfg.bc.BCtopT)
    g = pad_axis(thl, 2, take_k(thl, 0), top)
    return _pad_xy(g, h, cfg)


def ghost_qt(qt, ekh, cfg: Config, grid: Grid, h: int = 1):
    top = _scalar_top_ghost(qt, ekh, grid, cfg.bc.wqtop, cfg.bc.qt_top,
                            cfg.bc.BCtopq)
    g = pad_axis(qt, 2, take_k(qt, 0), top)
    return _pad_xy(g, h, cfg)


def ghost_e12(e12, cfg: Config, h: int = 1):
    """e12 bottom ghost = e12(kb) (modibm.f90:2010); top = e12min for
    freeslip/pressure tops (modboundary.f90:180-181)."""
    if cfg.bc.BCtopm in (BCTOPM_FREESLIP, BCTOPM_PRESSURE):
        top = jnp.full_like(take_k(e12, -1), const.e12min)
    else:
        top = take_k(e12, -1)
    g = pad_axis(e12, 2, take_k(e12, 0), top)
    return _pad_xy(g, h, cfg)


def ghost_scalar_kappa(c, cfg: Config, h: int = 2, hk: int = 2):
    """Scalar ghosts for the kappa scheme: halo 2 in x/y and 2 ghost cells in k
    (reference ihc=jhc=khc=2, modglobal.f90:602-608; top ghosts replicate,
    modboundary.f90:211-213, 1530-1535)."""
    bot = take_k(c, 0)
    top = take_k(c, -1)
    g = c
    for _ in range(hk):
        g = pad_axis(g, 2, bot, top)
    return _pad_xy(g, h, cfg)


def ghost_ek(ekm, ekh, cfg: Config, grid: Grid, h: int = 1):
    """closurebc (modboundary.f90:434-505): mirror-to-molecular at the bottom
    wall, zero-gradient (freeslip/pressure) or mirror (noslip) at the top;
    periodic laterally."""
    numol = const.numol
    numolh = const.numol * const.prandtlmoli
    bot_m = 2.0 * numol - take_k(ekm, 0)
    bot_h = 2.0 * numolh - take_k(ekh, 0)
    if cfg.bc.BCtopm == BCTOPM_NOSLIP:
        top_m = 2.0 * numol - take_k(ekm, -1)
        top_h = 2.0 * numolh - take_k(ekh, -1)
    else:
        top_m = take_k(ekm, -1)
        top_h = take_k(ekh, -1)
    gm = _pad_xy(pad_axis(ekm, 2, bot_m, top_m), h, cfg)
    gh = _pad_xy(pad_axis(ekh, 2, bot_h, top_h), h, cfg)
    return gm, gh


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Ghosts:
    """All ghosted views needed by one tendency evaluation."""
    u: Any     # (nx+2h, ny+2h, nz+2)
    v: Any
    w: Any     # (nx+2h, ny+2h, nz+1)  faces
    thl: Any
    qt: Any
    e12: Any
    sv: Any    # (nsv, nx+4, ny+4, nz+4) kappa-ghosted
    ekm: Any
    ekh: Any


def make_ghosts(f: Fields, ekm, ekh, cfg: Config, grid: Grid,
                h: int = 1) -> Ghosts:
    gm, gh = ghost_ek(ekm, ekh, cfg, grid, h)
    gsv = (jax.vmap(lambda c: ghost_scalar_kappa(c, cfg))(f.sv)
           if f.sv.shape[0] > 0 else f.sv)
    return Ghosts(
        u=ghost_u(f.u, cfg, h),
        v=ghost_v(f.v, cfg, h),
        w=ghost_w(f.w, cfg, h),
        thl=ghost_thl(f.thl, ekh, cfg, grid, h),
        qt=ghost_qt(f.qt, ekh, cfg, grid, h),
        e12=ghost_e12(f.e12, cfg, h),
        sv=gsv,
        ekm=gm,
        ekh=gh,
    )
