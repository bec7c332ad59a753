"""Boundary conditions as functional ghost-cell construction.

Replaces the in-place BC application of the reference (modboundary.f90:115-389
`boundary`, :434 `closurebc`, :1494 `fluxtop`, :1509 `valuetop`) with pure
functions that attach ghost planes to interior arrays.  Periodic wraps double
as the halo exchange (see ops/halo.py).

Lateral x BCs: periodic (default) or open (profile/driver inlet + convective
outlet, modboundary.f90:688-996).  For open-x, ghost planes come from an
`openx` context dict {"inlet": {...interior-k planes...}, "bx": XPlanes}
built per-substep (see ops/openbc.py); y stays periodic (as in the
reference's supported configurations).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import (BCTOPM_FREESLIP, BCTOPM_NOSLIP, BCTOPM_PRESSURE,
                      BCTOP_FLUX, BCTOP_VALUE, BC_DRIVER, BC_PERIODIC,
                      BC_PROFILE, Config, const)
from ..grid import Grid
from ..state import Fields
from .halo import pad_axis, pad_periodic_xy, take_k


def _assemble(gk, h, lo_plane, hi_plane):
    """Pad y periodically, then attach explicit x ghost planes (already
    k-ghosted, shape (ny, nzg))."""
    gy = jnp.pad(gk, ((0, 0), (h, h), (0, 0)), mode="wrap")
    lo = jnp.pad(lo_plane, ((h, h), (0, 0)), mode="wrap")
    hi = jnp.pad(hi_plane, ((h, h), (0, 0)), mode="wrap")
    return jnp.concatenate([*([lo[None]] * h), gy, *([hi[None]] * h)],
                           axis=0)


def _assemble_y(gk, h, lo_plane, hi_plane):
    """Pad x periodically, then attach explicit y ghost planes (already
    k-ghosted, shape (nx, nzg)) — the open-y mirror of _assemble."""
    gx = jnp.pad(gk, ((h, h), (0, 0), (0, 0)), mode="wrap")
    lo = jnp.pad(lo_plane, ((h, h), (0, 0)), mode="wrap")
    hi = jnp.pad(hi_plane, ((h, h), (0, 0)), mode="wrap")
    return jnp.concatenate([*([lo[:, None]] * h), gx,
                            *([hi[:, None]] * h)], axis=1)


def _assemble_xy(gk, h, xlo, xhi, ylo, yhi):
    """Both directions open: attach the x ghost planes first, then the y
    planes (edge-extended across the new x ghosts) fill the y ghosts
    including the corners — the reference's ordering (modboundary.f90:
    96-103 applies the x BC before the y BC, and the y loops run over the
    full x extent including ghosts)."""
    gx = jnp.concatenate([*([xlo[None]] * h), gk, *([xhi[None]] * h)],
                         axis=0)
    ylo_e = jnp.pad(ylo, ((h, h), (0, 0)), mode="edge")
    yhi_e = jnp.pad(yhi, ((h, h), (0, 0)), mode="edge")
    return jnp.concatenate([*([ylo_e[:, None]] * h), gx,
                            *([yhi_e[:, None]] * h)], axis=1)


def _dispatch(gk, h, cfg, xlo=None, xhi=None, ylo=None, yhi=None):
    """Assemble ghosts from whichever open-boundary planes exist; periodic
    wrap in any direction without planes."""
    if xlo is not None and ylo is not None:
        return _assemble_xy(gk, h, xlo, xhi, ylo, yhi)
    if xlo is not None:
        return _assemble(gk, h, xlo, xhi)
    if ylo is not None:
        return _assemble_y(gk, h, ylo, yhi)
    return pad_periodic_xy(gk, h)


# --- per-field k-ghost rules (shared by interior arrays and x planes) ------

def _kg_u(u, cfg):
    if cfg.bc.BCtopm == BCTOPM_NOSLIP:
        top = 2.0 * cfg.bc.Uinf - take_k(u, -1)
    else:
        top = take_k(u, -1)
    return pad_axis(u, u.ndim - 1, jnp.zeros_like(take_k(u, 0)), top)


def _kg_v(v, cfg):
    if cfg.bc.BCtopm == BCTOPM_NOSLIP:
        top = 2.0 * cfg.bc.Vinf - take_k(v, -1)
    else:
        top = take_k(v, -1)
    return pad_axis(v, v.ndim - 1, jnp.zeros_like(take_k(v, 0)), top)


def _kg_scalar(f, top):
    return pad_axis(f, f.ndim - 1, take_k(f, 0), top)


# --- ghost builders --------------------------------------------------------

def ghost_u(u, cfg: Config, h: int = 1, openx=None, openy=None):
    """u ghosts: bottom ghost 0 (reference leaves um(kb-1)=0 from initfields,
    giving the molecular no-slip stress with the mirrored ekm of closurebc);
    top per BCtopm; x per BCxm (profile inlet ghost 2u(ib)-u(ib+1),
    modboundary.f90:699; driver ghost = driver plane :732; outlet face from
    the prognostic XPlanes). Open-y: ymi_profile (:1017-1045)."""
    gk = _kg_u(u, cfg)
    xlo = xhi = ylo = yhi = None
    if openx is not None:
        if cfg.bc.BCxm == BC_PROFILE:
            xlo = 2.0 * gk[0] - gk[1]
        else:  # driver: ghost = inlet plane (== u[0], which is hard-set)
            xlo = gk[0]
        xhi = _kg_u(openx["bx"].u, cfg)
    if openy is not None:
        uprof_k = _kg_u(jnp.broadcast_to(openy["inlet"]["u"],
                                         (u.shape[0], u.shape[2])), cfg)
        ylo = 2.0 * uprof_k - gk[:, 0]
        yhi = _kg_u(openy["by"].u, cfg)
    return _dispatch(gk, h, cfg, xlo, xhi, ylo, yhi)


def ghost_v(v, cfg: Config, h: int = 1, openx=None, openy=None):
    gk = _kg_v(v, cfg)
    xlo = xhi = ylo = yhi = None
    if openx is not None:
        if cfg.bc.BCxm == BC_PROFILE:
            vprof_k = _kg_v(jnp.broadcast_to(
                openx["inlet"]["v"], v.shape[1:]), cfg)
            xlo = 2.0 * vprof_k - gk[0]
        else:
            xlo = _kg_v(openx["inlet"]["v"], cfg)
        xhi = _kg_v(openx["bx"].v, cfg)
    if openy is not None:
        # ymi_profile: v(jb)=vprof pinned in the update; ghost extrapolates
        ylo = 2.0 * gk[:, 0] - gk[:, 1]
        yhi = _kg_v(openy["by"].v, cfg)
    return _dispatch(gk, h, cfg, xlo, xhi, ylo, yhi)


def ghost_w(w, cfg: Config, h: int = 1, openx=None, openy=None):
    """w is a face array (nx,ny,nz+1); bottom/top faces enforced impermeable
    (modboundary.f90:165-166, 177) except the pressure top BC where the top
    face is prognostic."""
    w = w.at[..., 0].set(0.0)
    if cfg.bc.BCtopm != BCTOPM_PRESSURE:
        w = w.at[..., -1].set(0.0)
    xlo = xhi = ylo = yhi = None
    if openx is not None:
        if cfg.bc.BCxm == BC_PROFILE:
            xlo = -w[0]           # modboundary.f90:703
        else:
            xlo = openx["inlet"]["w"]
        xhi = openx["bx"].w
    if openy is not None:
        ylo = -w[:, 0]
        yhi = openy["by"].w
    return _dispatch(w, h, cfg, xlo, xhi, ylo, yhi)


def _scalar_top_ghost(f, ekh, grid: Grid, flux: float, value: float, mode: int):
    """fluxtop / valuetop ghost plane (modboundary.f90:1494-1519)."""
    if mode == BCTOP_VALUE:
        return 2.0 * value - take_k(f, -1)
    if flux == 0.0:
        return take_k(f, -1)
    dzh_top = grid.dzh[-1]
    dzf_ke = grid.dzf[-1]
    denom = dzf_ke * ekh[..., -1:]
    return take_k(f, -1) + flux * (dzh_top ** 2) / denom


def ghost_thl(thl, ekh, cfg: Config, grid: Grid, h: int = 1, openx=None,
              openy=None):
    top = _scalar_top_ghost(thl, ekh, grid, cfg.bc.wttop, cfg.bc.thl_top,
                            cfg.bc.BCtopT)
    gk = _kg_scalar(thl, top)
    xlo = xhi = ylo = yhi = None
    if openx is not None:
        # profile inlet: ghost = thlprof (modboundary.f90:778-783);
        # driver: plane
        inl = openx["inlet"]["thl"]
        xlo = _kg_scalar(inl, inl[..., -1:])
        xhi = _kg_scalar(openx["bx"].thl, openx["bx"].thl[..., -1:])
    if openy is not None:
        # yTi_profile (modboundary.f90:1048-1062): ghost = 2 prof - thl(jb)
        prof_k = _kg_scalar(jnp.broadcast_to(openy["inlet"]["thl"],
                                             (thl.shape[0], thl.shape[2])),
                            openy["inlet"]["thl"][..., -1:])
        ylo = 2.0 * prof_k - gk[:, 0]
        yhi = _kg_scalar(openy["by"].thl, openy["by"].thl[..., -1:])
    return _dispatch(gk, h, cfg, xlo, xhi, ylo, yhi)


def ghost_qt(qt, ekh, cfg: Config, grid: Grid, h: int = 1, openx=None,
             openy=None):
    top = _scalar_top_ghost(qt, ekh, grid, cfg.bc.wqtop, cfg.bc.qt_top,
                            cfg.bc.BCtopq)
    gk = _kg_scalar(qt, top)
    xlo = xhi = ylo = yhi = None
    if openx is not None:
        if cfg.bc.BCxq == BC_PROFILE:
            prof_k = _kg_scalar(jnp.broadcast_to(openx["inlet"]["qt"],
                                                 qt.shape[1:]),
                                openx["inlet"]["qt"][..., -1:])
            xlo = 2.0 * prof_k - gk[0]
        else:
            inl = openx["inlet"]["qt"]
            xlo = _kg_scalar(inl, inl[..., -1:])
        xhi = _kg_scalar(openx["bx"].qt, openx["bx"].qt[..., -1:])
    if openy is not None:
        prof_k = _kg_scalar(jnp.broadcast_to(openy["inlet"]["qt"],
                                             (qt.shape[0], qt.shape[2])),
                            openy["inlet"]["qt"][..., -1:])
        ylo = 2.0 * prof_k - gk[:, 0]
        yhi = _kg_scalar(openy["by"].qt, openy["by"].qt[..., -1:])
    return _dispatch(gk, h, cfg, xlo, xhi, ylo, yhi)


def ghost_e12(e12, cfg: Config, h: int = 1, openx=None, openy=None):
    if cfg.bc.BCtopm in (BCTOPM_FREESLIP, BCTOPM_PRESSURE):
        top = jnp.full_like(take_k(e12, -1), const.e12min)
    else:
        top = take_k(e12, -1)
    gk = _kg_scalar(e12, top)
    xlo = xhi = ylo = yhi = None
    if openx is not None:
        xlo = gk[0]   # driver: extrapolate from interior (modboundary:757)
        xhi = _kg_scalar(openx["bx"].e12, openx["bx"].e12[..., -1:])
    if openy is not None:
        ylo = gk[:, 0]
        yhi = _kg_scalar(openy["by"].e12, openy["by"].e12[..., -1:])
    return _dispatch(gk, h, cfg, xlo, xhi, ylo, yhi)


def ghost_scalar_kappa(c, cfg: Config, h: int = 2, hk: int = 2, openx=None,
                       openy=None, sv_index: int = 0):
    """Scalar ghosts for the kappa scheme: halo 2 in x/y and 2 ghost cells
    in k (reference ihc=jhc=khc=2)."""
    bot = take_k(c, 0)
    top = take_k(c, -1)
    g = c
    for _ in range(hk):
        g = pad_axis(g, 2, bot, top)

    def kg2(p):
        """(n, nz) plane -> (n, nz+2*hk) with replicated k ghosts."""
        q = p
        for _ in range(hk):
            q = pad_axis(q, q.ndim - 1, q[..., :1], q[..., -1:])
        return q
    xlo = xhi = ylo = yhi = None
    if openx is not None:
        inl = openx["inlet"]["sv"][sv_index]
        if cfg.bc.BCxs == BC_PROFILE:
            xlo = 2.0 * kg2(inl) - kg2(c[0])
        else:
            xlo = kg2(inl)
        xhi = kg2(openx["bx"].sv[sv_index])
    if openy is not None:
        # ysi_profile (modboundary.f90:1065-1097)
        inl = openy["inlet"]["sv"][sv_index]
        ylo = 2.0 * kg2(inl) - kg2(c[:, 0])
        yhi = kg2(openy["by"].sv[sv_index])
    return _dispatch(g, h, cfg, xlo, xhi, ylo, yhi)


def ghost_ek(ekm, ekh, cfg: Config, grid: Grid, h: int = 1, openx=None,
             openy=None):
    """closurebc (modboundary.f90:434-505)."""
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
    gkm = pad_axis(ekm, 2, bot_m, top_m)
    gkh = pad_axis(ekh, 2, bot_h, top_h)
    # zero-gradient at any inflow/outflow (modboundary.f90:467-475)
    def mk(gk):
        xlo = gk[0] if openx is not None else None
        xhi = gk[-1] if openx is not None else None
        ylo = gk[:, 0] if openy is not None else None
        yhi = gk[:, -1] if openy is not None else None
        return _dispatch(gk, h, cfg, xlo, xhi, ylo, yhi)
    return mk(gkm), mk(gkh)


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
                h: int = 1, openx=None, openy=None) -> Ghosts:
    gm, gh = ghost_ek(ekm, ekh, cfg, grid, h, openx, openy)
    nsv = f.sv.shape[0]
    if nsv > 0:
        gsv = jnp.stack([ghost_scalar_kappa(f.sv[n], cfg, openx=openx,
                                            openy=openy, sv_index=n)
                         for n in range(nsv)])
    else:
        gsv = f.sv
    return Ghosts(
        u=ghost_u(f.u, cfg, h, openx, openy),
        v=ghost_v(f.v, cfg, h, openx, openy),
        w=ghost_w(f.w, cfg, h, openx, openy),
        thl=ghost_thl(f.thl, ekh, cfg, grid, h, openx, openy),
        qt=ghost_qt(f.qt, ekh, cfg, grid, h, openx, openy),
        e12=ghost_e12(f.e12, cfg, h, openx, openy),
        sv=gsv,
        ekm=gm,
        ekh=gh,
    )
