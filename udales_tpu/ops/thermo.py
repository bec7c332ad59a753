"""Thermodynamics: saturation adjustment, hydrostatics, virtual temperature.

Re-derivations of src/modthermodynamics.f90:
  - thermo (:434-504): all-or-nothing saturation adjustment (Tetens)
  - diagfld (:241-350) / fromztop (:364-424): hydrostatic base profiles
  - calc_halflev (:508-538), calthv (:130-235): half-level interpolation,
    theta_v and d(theta_v)/dz for buoyancy and the SGS closure.

Slab averages are IBM-mask aware (avexy_ibm semantics, src/modmpi.f90:621-662):
all-solid slabs yield the sentinel -999 exactly as the reference does.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..config import Config, const
from ..grid import Grid


def avexy_masked(f, mask, sentinel=-999.0):
    """Mask-weighted slab (x,y) average per level (modmpi.f90:621-662).
    `mask` is 0/1 fluid indicator broadcastable to f."""
    cnt = jnp.sum(mask, axis=(0, 1))
    s = jnp.sum(f * mask, axis=(0, 1))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), sentinel)


def slab_mean(f):
    return jnp.mean(f, axis=(0, 1))


def ql_sat_adjust(thl, qt, pressure, exner, lqlnr: bool = False):
    """All-or-nothing liquid water (modthermodynamics.f90:478-501), or the
    Newton-Raphson temperature iteration when ``lqlnr`` (:449-476)."""
    tl = jnp.maximum(thl * exner, 100.0)
    if lqlnr:
        return _ql_newton_raphson(tl, qt, pressure)
    es = const.es0 * jnp.exp(const.at * (tl - const.tmelt) / (tl - const.bt))
    qsl = const.ep * es / (pressure - (1.0 - const.ep) * es)
    b1 = const.rlv ** 2 / (tl ** 2 * const.cp * const.rv)
    qs = qsl * (1.0 + b1 * qt) / (1.0 + b1 * qsl)
    return jnp.maximum(qt - qs, 0.0)


def _ql_newton_raphson(tl, qt, pressure):
    """Vectorized Newton-Raphson saturation temperature
    (modthermodynamics.f90:449-476): iterate T until the relative update
    drops below 1e-5 everywhere (the reference converges per point; a
    global while_loop is at least as accurate)."""
    def qsat(T):
        es = const.es0 * jnp.exp(const.at * (T - const.tmelt)
                                 / (T - const.bt))
        return const.ep * es / (pressure - (1.0 - const.ep) * es)

    def body(carry):
        T, _, it = carry
        qs = qsat(T)
        Tn = T - (T + (const.rlv / const.cp) * qs - tl
                  - (const.rlv / const.cp) * qt) \
            / (1.0 + (const.rlv ** 2 * qs) / (const.rv * const.cp * T ** 2))
        err = jnp.max(jnp.abs(Tn - T) / Tn)
        return Tn, err, it + 1

    def cond(carry):
        _, err, it = carry
        return (err > 1e-5) & (it < 50)

    T0 = tl
    T, _, _ = jax.lax.while_loop(
        cond, body, (T0, jnp.asarray(1.0, tl.dtype), 0))
    return jnp.maximum(qt - qsat(T), 0.0)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ThermoDiag:
    """Diagnostics consumed by the dynamical core."""
    thv0h: Any    # virtual potential temperature at half levels (nx,ny,nz+1)
    thvh: Any     # slab-mean thv at half levels (nz+1,)
    dthvdz: Any   # vertical thv gradient at cell centres (nx,ny,nz)
    ql0: Any      # liquid water (nx,ny,nz) (zeros when dry)
    presf: Any    # hydrostatic pressure, full levels (nz+1,)
    presh: Any    # half levels (nz+1,)
    exnf: Any
    exnh: Any
    rhobf: Any    # (nz,) base density at full levels (1 for Boussinesq)
    thl0av: Any   # slab-average thl (nz,)
    u0av: Any     # slab-average u (nz,)
    v0av: Any
    qt0av: Any


def hydrostatic_profiles(th0av_e, qt0av_e, ql0av_e, grid: Grid, cfg: Config,
                         thvs: float, ps: float):
    """fromztop (modthermodynamics.f90:364-424): pressures at full/half levels
    from hydrostatic balance, iterated twice as in diagfld (:310-318).

    Inputs are extended profiles of length nz+1 (levels kb..ke+kh)."""
    nz = grid.ktot
    rdocp = const.rd / const.cp
    dzf = grid.j("dzf_g")          # dzf_g[k+1] = dzf[k]
    dzh = grid.j("dzh")            # (nz+1,)
    zf0 = grid.zf[0]

    def one_pass(th0av):
        # half-level theta/qt/ql for k=1..nz (kb+1..ke+kh)
        dzf_k = dzf[2: nz + 2]       # dzf[k] for k=1..nz (ghost at top)
        dzf_km = dzf[1: nz + 1]      # dzf[k-1]
        thetah = (th0av[1:] * dzf_km + th0av[:-1] * dzf_k) / (2.0 * dzh[1:])
        qth = (qt0av_e[1:] * dzf_km + qt0av_e[:-1] * dzf_k) / (2.0 * dzh[1:])
        qlh = (ql0av_e[1:] * dzf_km + ql0av_e[:-1] * dzf_k) / (2.0 * dzh[1:])
        thvh_half = thetah * (1.0 + (const.rv / const.rd - 1.0) * qth
                              - const.rv / const.rd * qlh)
        # full-level pressures (cumulative in k)
        g_cp = const.grav * (const.pref0 ** rdocp) / const.cp
        p0 = ps ** rdocp - g_cp * zf0 / thvs
        incr = -g_cp * dzh[1:] / thvh_half
        pf_kappa = p0 + jnp.concatenate(
            [jnp.zeros(1, incr.dtype), jnp.cumsum(incr)])
        presf = pf_kappa ** (1.0 / rdocp)
        # half-level pressures
        thvf = th0av * (1.0 + (const.rv / const.rd - 1.0) * qt0av_e
                        - const.rv / const.rd * ql0av_e)
        incr_h = -g_cp * dzf[1: nz + 1] / thvf[:-1]
        ph_kappa = ps ** rdocp + jnp.concatenate(
            [jnp.zeros(1, incr_h.dtype), jnp.cumsum(incr_h)])
        presh = ph_kappa ** (1.0 / rdocp)
        # thvh with surface value
        thvh = jnp.concatenate([jnp.asarray([thvs], thvh_half.dtype), thvh_half])
        return presf, presh, thvh, thvf

    # pass 1 with exner from thls-based guess (diagfld:291-293)
    presf, presh, _, _ = one_pass(th0av_e)
    exnf = (presf / const.pref0) ** rdocp
    th0av2 = th0av_e  # th0av recomputed with ql; dry runs unchanged
    if cfg.physics.lmoist:
        th0av2 = th0av_e  # caller folds ql into th0av_e already
    presf, presh, thvh_prof, thvf = one_pass(th0av2)
    exnf = (presf / const.pref0) ** rdocp
    exnh = (presh / const.pref0) ** rdocp
    dt = th0av_e.dtype
    return (presf.astype(dt), presh.astype(dt), exnf.astype(dt),
            exnh.astype(dt), thvf.astype(dt))


def thermodynamics(c, cfg: Config, grid: Grid, masks=None) -> ThermoDiag:
    """Full thermodynamics pass (modthermodynamics.f90:57-122).

    `c` is a Fields pytree (current substep). `masks` optionally provides IBM
    fluid masks (IIc, IIu, IIv, IIw as 0/1 arrays); defaults to all-fluid."""
    nx, ny, nz = grid.shape
    dt = c.thl.dtype
    ones = jnp.ones((nx, ny, nz), dt)
    IIc = masks.c if masks is not None else ones
    IIu = masks.u if masks is not None else ones
    IIv = masks.v if masks is not None else ones
    IIw = masks.w if masks is not None else jnp.ones((nx, ny, nz + 1), dt)

    thls = cfg.bc.thls if cfg.bc.thls > 0 else 288.0
    # surface humidity (modsurfdata.f90:64; sentinel -1 treated as dry)
    qts = cfg.bc.qts if cfg.bc.qts > 0 else 0.0
    thvs = thls * (1.0 + (const.rv / const.rd - 1.0) * qts)
    ps = cfg.physics.ps

    # slab averages (diagfld:259-302)
    u0av = avexy_masked(c.u, IIu)
    v0av = avexy_masked(c.v, IIv)
    thl0av = avexy_masked(c.thl, IIc)
    qt0av = avexy_masked(c.qt, IIc)

    # extended (ke+kh) profiles: zero-gradient top ghost
    ext = lambda p: jnp.concatenate([p, p[-1:]])
    thl0av_e, qt0av_e = ext(thl0av), ext(qt0av)

    # first-guess exner (diagfld:291): linear in z with thls
    zf_e = jnp.concatenate([grid.j("zf"),
                            jnp.asarray([grid.zf_top], dt)])
    exnf_guess = 1.0 - const.grav * zf_e / (const.cp * thls)

    if cfg.physics.lmoist:
        # need presf for saturation; use the dry hydrostatic profile first
        presf, presh, exnf, exnh, _ = hydrostatic_profiles(
            thl0av_e, qt0av_e, jnp.zeros_like(qt0av_e), grid, cfg, thvs, ps)
        ql0 = ql_sat_adjust(c.thl, c.qt, presf[None, None, :nz],
                            exnf[None, None, :nz], cfg.dynamics.lqlnr)
        ql0av = ext(avexy_masked(ql0, IIc))
        th0av_e = thl0av_e + (const.rlv / const.cp) * ql0av / exnf
        presf, presh, exnf, exnh, _ = hydrostatic_profiles(
            th0av_e, qt0av_e, ql0av, grid, cfg, thvs, ps)
    else:
        ql0 = jnp.zeros((nx, ny, nz), dt)
        ql0av = jnp.zeros(nz + 1, dt)
        th0av_e = thl0av_e
        presf, presh, exnf, exnh, _ = hydrostatic_profiles(
            th0av_e, qt0av_e, ql0av, grid, cfg, thvs, ps)

    # half-level fields (calc_halflev:508-538): k=0 overridden with surface
    dzf_g = grid.j("dzf_g"); dzh = grid.j("dzh")
    def halflev(f, surf):
        dzf_k = dzf_g[2: nz + 2][None, None, :]   # dzf[k], k=1..nz (top ghost)
        dzf_km = dzf_g[1: nz + 1][None, None, :]  # dzf[k-1]
        f_e = jnp.concatenate([f, f[..., -1:]], axis=-1)  # top ghost replicate
        fh = (f_e[..., 1:] * dzf_km + f_e[..., :-1] * dzf_k) / (
            2.0 * dzh[1:][None, None, :])
        return jnp.concatenate(
            [jnp.full((nx, ny, 1), surf, dt), fh], axis=-1)

    thl0h = halflev(c.thl, thls)
    qt0h = halflev(c.qt, qts)

    if cfg.physics.lmoist:
        ql0h = ql_sat_adjust(thl0h, qt0h, presh[None, None, :],
                             exnh[None, None, :], cfg.dynamics.lqlnr)
        # calthv moist branch (:142-200)
        thv0h = (thl0h + const.rlv * ql0h / (const.cp * exnh[None, None, :])) \
            * (1.0 + (const.rv / const.rd - 1.0) * qt0h
               - const.rv / const.rd * ql0h)
        dthvdz = _dthvdz_moist(c, ql0, grid, exnf[:nz])
    else:
        thv0h = thl0h
        dthvdz = _dthvdz_dry(c.thl, grid)

    # thvh slab average with IIw mask + lowest-level overrides
    # (modthermodynamics.f90:77-93)
    thvh = avexy_masked(thv0h, IIw)
    th0av_i = th0av_e[:nz]
    qt_ = qt0av; ql_ = ql0av[:nz]
    ov = lambda k: th0av_i[k] * (1.0 + (const.rv / const.rd - 1.0) * qt_[k]
                                 - const.rv / const.rd * ql_[k])
    thvh = thvh.at[0].set(ov(0))
    thvh = jnp.where(
        (jnp.abs(thvh[1]) < const.eps1) & (jnp.arange(nz + 1) == 1),
        ov(1), thvh)

    rhobf = jnp.ones(nz, dt)
    return ThermoDiag(
        thv0h=thv0h, thvh=thvh, dthvdz=dthvdz, ql0=ql0,
        presf=presf, presh=presh, exnf=exnf, exnh=exnh, rhobf=rhobf,
        thl0av=thl0av, u0av=u0av, v0av=v0av, qt0av=qt0av,
    )


def _dthvdz_dry(thl, grid: Grid):
    """calthv dry branch (modthermodynamics.f90:202-231): centred gradient,
    zero at the lowest level, floored at +/- eps1."""
    nz = grid.ktot
    dzh = grid.j("dzh")
    thl_e = jnp.concatenate([thl[..., :1], thl, thl[..., -1:]], axis=-1)
    denom = (dzh[1:] + dzh[:-1])[None, None, :]
    d = (thl_e[..., 2:] - thl_e[..., :-2]) / denom
    d = d.at[..., 0].set(0.0)
    return jnp.where(jnp.abs(d) < const.eps1,
                     jnp.sign(d) * const.eps1 + (d == 0) * const.eps1, d)


def _dthvdz_moist(c, ql0, grid: Grid, exnf):
    """calthv moist branch (modthermodynamics.f90:153-200)."""
    nz = grid.ktot
    dzh = grid.j("dzh")
    ext = lambda f: jnp.concatenate([f[..., :1], f, f[..., -1:]], axis=-1)
    thl_e, qt_e = ext(c.thl), ext(c.qt)
    dth = thl_e[..., 2:] - thl_e[..., :-2]
    dq = qt_e[..., 2:] - qt_e[..., :-2]
    eps_I = 1.0 / const.ep - 1.0
    a_dry = 1.0 + eps_I * c.qt
    b_dry = eps_I * c.thl
    del_dry = a_dry * dth + b_dry * dq
    temp = c.thl * exnf[None, None, :] + (const.rlv / const.cp) * ql0
    qs = c.qt - ql0
    a_moist = ((1.0 - c.qt + qs / const.ep * (1.0 + const.rlv
                / (const.rv * temp)))
               / (1.0 + const.rlv ** 2 * qs
                  / (const.cp * const.rv * temp ** 2)))
    b_moist = a_moist * const.rlv / const.cp - temp
    c_liquid = a_dry * const.rlv / const.cp - c.thl / const.ep
    del_sat = a_moist * dth + b_moist * dq
    zf = grid.j("zf")
    zf_e = jnp.concatenate([zf[:1], zf, jnp.asarray([grid.zf_top], zf.dtype)])
    chi = 2.0 * const.chi_half * (zf_e[1:-1] - zf_e[:-2])[None, None, :] / (
        dzh[:-1] + dzh[1:])[None, None, :]
    chi_sat = c_liquid * ql0 / jnp.where(
        jnp.abs(del_dry - del_sat) < 1e-30, 1e-30, del_dry - del_sat)
    dthv = jnp.where((ql0 > 0) & (chi < chi_sat), del_sat, del_dry)
    d = dthv / (dzh[1:] + dzh[:-1])[None, None, :]
    d = d.at[..., 0].set(0.0)
    return jnp.where(jnp.abs(d) < const.eps1,
                     jnp.sign(d) * const.eps1 + (d == 0) * const.eps1, d)
