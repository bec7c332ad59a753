"""Body forces, large-scale forcings, damping, and flow-rate corrections.

Re-derivations of src/modforces.f90:
  - forces (:46-133): large-scale pressure gradient + buoyancy on w
  - coriolis / lprofforc (:600-717)
  - masscorr (:328-497): fixed volume-flow-rate correction (luvolflowr path)
  - nudge (:826-859), and modboundary.f90 grwdamp (:1447-1491).
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ..config import Config, const
from ..grid import Grid
from .stencil import kvec, sh, shw
from .thermo import avexy_masked


def forces(g, grid: Grid, cfg: Config, dpdxl, dpdyl, thv0h=None, thvh=None,
           thlpcar=None):
    """Return (du, dv, dw) tendencies (modforces.f90:46-133).

    dpdxl/dpdyl are (nz,) profiles; buoyancy uses half-level thv.  The w
    tendency is zero at the lowest interior level (wp(kb)=0, :125)."""
    nx, ny, nz = grid.shape
    du = -jnp.broadcast_to(dpdxl[None, None, :], (nx, ny, nz))
    dv = -jnp.broadcast_to(dpdyl[None, None, :], (nx, ny, nz))
    dw = jnp.zeros((nx, ny, nz + 1), du.dtype)
    if cfg.physics.lbuoyancy:
        # interior faces 1..nz-1 (k=kb+1..ke)
        b = const.grav * (thv0h[..., 1:nz] - thvh[None, None, 1:nz]) \
            / thvh[None, None, 1:nz]
        dw = dw.at[..., 1:nz].set(b)
    return du, dv, dw


def coriolis(g, grid: Grid, cfg: Config, ug=None, vg=None):
    """Coriolis force or geostrophic profile forcing
    (modforces.f90:600-717)."""
    nx, ny, nz = grid.shape
    S = partial(sh, nx=nx, ny=ny, nz=nz, h=1, hk=1)
    Sw = partial(shw, nx=nx, ny=ny, nz=nz, h=1)
    import math
    phi = cfg.physics.xlat * math.pi / 180.0
    omega = 7.292e-5
    om22 = 2.0 * omega * math.cos(phi)
    om23 = 2.0 * omega * math.sin(phi)
    u, v, w = g.u, g.v, g.w
    if cfg.physics.lcoriol:
        du = ((S(v, 0, 0, 0) + S(v, 0, 1, 0) + S(v, -1, 0, 0) + S(v, -1, 1, 0))
              * om23 * 0.25
              - (Sw(w, 0, 0, 0) + Sw(w, 0, 0, 1) + Sw(w, -1, 0, 1)
                 + Sw(w, -1, 0, 0)) * om22 * 0.25)
        dv = -(S(u, 0, 0, 0) + S(u, 0, -1, 0) + S(u, 1, -1, 0)
               + S(u, 1, 0, 0)) * om23 * 0.25
        # w-faces 1..nz-1 (k=kb+1..ke)
        nf = nz - 1
        dzf = grid.j("dzf_g")
        dzf_km = kvec(dzf, 1, nf)
        dzf_k = kvec(dzf, 2, nf)
        dzh_k = kvec(grid.j("dzh"), 1, nf)
        C = lambda A, di, dk: A[1 + di: 1 + di + nx, 1: 1 + ny,
                                1 + dk: 1 + dk + nf]
        dwf = ((dzf_km * (C(u, 0, 1) + C(u, 1, 1))
                + dzf_k * (C(u, 0, 0) + C(u, 1, 0))) / dzh_k) * om22 * 0.25
        dw = jnp.concatenate(
            [jnp.zeros((nx, ny, 1), du.dtype), dwf,
             jnp.zeros((nx, ny, 1), du.dtype)], axis=2)
        return du, dv, dw
    if cfg.physics.lprofforc:
        du = om23 * (ug[None, None, :] - S(u, 0, 0, 0))
        dv = jnp.zeros((nx, ny, nz), du.dtype)
        dw = jnp.zeros((nx, ny, nz + 1), du.dtype)
        return du, dv, dw
    z3 = jnp.zeros((nx, ny, nz), g.u.dtype)
    return z3, z3, jnp.zeros((nx, ny, nz + 1), g.u.dtype)


def grwdamp(c, grid: Grid, cfg: Config, u0av, v0av, thl0av, qt0av,
            ug=None, vg=None):
    """Sponge-layer gravity-wave damping (modboundary.f90:38-62, 1447-1491).
    Returns tendencies for (u, v, w, thl, qt)."""
    import numpy as np
    nx, ny, nz = grid.shape
    igrw = cfg.physics.igrw_damp
    zero = (jnp.zeros((nx, ny, nz), c.u.dtype),
            jnp.zeros((nx, ny, nz), c.u.dtype),
            jnp.zeros((nx, ny, nz + 1), c.u.dtype),
            jnp.zeros((nx, ny, nz), c.u.dtype),
            jnp.zeros((nx, ny, nz), c.u.dtype))
    if igrw == 0:
        return zero
    # tsc profile (initboundary:45-59), rnu0 = 2.75e-3
    rnu0 = 2.75e-3
    # lowest sponge level: &DOMAIN ksp (1-based as in the reference) or the
    # default ksp = kb-1 + max(min(3*kmax/4, kmax-15), 1) (modboundary.f90:47)
    ksp1 = cfg.domain.ksp if cfg.domain.ksp > 0 else \
        max(min(3 * nz // 4, nz - 15), 1)
    ksp = max(ksp1 - 1, 0)  # 0-based
    zf = grid.zf
    zspb, zspt = zf[ksp], zf[nz - 1]
    tsc = np.zeros(nz)
    tsc[ksp:] = rnu0 * np.sin(
        0.5 * np.pi * (zf[ksp:] - zspb) / (zspt - zspb)) ** 2
    tsc = jnp.asarray(tsc, c.u.dtype)[None, None, :]
    tscw = jnp.concatenate([tsc[..., :1] * 0, tsc], axis=2)

    if igrw == 2:
        uref, vref = ug[None, None, :], vg[None, None, :]
    else:
        uref, vref = u0av[None, None, :], v0av[None, None, :]
    du = -(c.u - uref) * tsc
    dv = -(c.v - vref) * tsc
    dw = -c.w * tscw
    dthl = -(c.thl - thl0av[None, None, :]) * tsc
    dqt = -(c.qt - qt0av[None, None, :]) * tsc
    if igrw == 1 and cfg.physics.lcoriol:
        fac = (1.0 / (cfg.physics.geodamptime * rnu0)) * tsc
        du = du - (c.u - ug[None, None, :]) * fac
        dv = dv - (c.v - vg[None, None, :]) * fac
    return du, dv, dw, dthl, dqt


def masscorr_uvol(up, um, grid: Grid, cfg: Config, rk3coef, IIu, IIus=None):
    """Fixed volume-flow-rate correction, luvolflowr path
    (modforces.f90:394-422): uniform udef added so that the volume-averaged
    provisional u matches uflowrate."""
    nz = grid.ktot
    uvol = avexy_masked(up, IIu)
    uvolold = avexy_masked(um, IIu)
    dzf = grid.j("dzf_g")[1: nz + 1]
    zh_top = grid.zh[-1]
    uoutflow = rk3coef * jnp.sum(uvol * dzf) / zh_top
    uflowrateold = jnp.sum(uvolold * dzf) / zh_top
    udef = cfg.physics.uflowrate - (uoutflow + uflowrateold)
    return up + (udef / rk3coef).astype(up.dtype)


def masscorr_vvol(vp, vm, grid: Grid, cfg: Config, rk3coef, IIv, IIvs=None):
    nz = grid.ktot
    vvol = avexy_masked(vp, IIv)
    vvolold = avexy_masked(vm, IIv)
    dzf = grid.j("dzf_g")[1: nz + 1]
    zh_top = grid.zh[-1]
    voutflow = rk3coef * jnp.sum(vvol * dzf) / zh_top
    vflowrateold = jnp.sum(vvolold * dzf) / zh_top
    vdef = cfg.physics.vflowrate - (voutflow + vflowrateold)
    return vp + (vdef / rk3coef).astype(vp.dtype)


def nudge_top(c, grid: Grid, cfg: Config, unudge, vnudge, thlnudge, qtnudge,
              u0av=None, v0av=None, thl0av=None, qt0av=None):
    """Relax the SLAB MEAN to the profiles for levels k >= nnudge
    (modforces.f90:826-859): the tendency is uniform across each slab."""
    nx, ny, nz = grid.shape
    n = cfg.physics.nnudge
    z3 = jnp.zeros((nx, ny, nz), c.u.dtype)
    if n <= 0:
        return z3, z3, z3, z3
    mask = (jnp.arange(nz) >= n).astype(c.u.dtype)
    tnudgei = 1.0 / cfg.physics.tnudge
    prof = lambda av, ref: (-mask * (av - ref) * tnudgei)[None, None, :]
    du = prof(u0av, unudge) + z3
    dv = prof(v0av, vnudge) + z3
    dthl = prof(thl0av, thlnudge) + z3
    dqt = prof(qt0av, qtnudge) + z3
    return du, dv, dthl, dqt


def lstend(c, grid: Grid, cfg: Config, whls, u0av, v0av, thl0av, qt0av,
           sv0av, dqtdtls=None):
    """Large-scale subsidence tendencies (modforces.f90:719-824): upwinded
    w_ls d(phi)/dz using slab-average profiles; horizontal LS gradients are
    zero unless provided. Returns slab-uniform tendencies
    (du, dv, dthl, dqt, dsv profiles of shape (nz,) / (nsv, nz))."""
    nz = grid.ktot
    dzh = jnp.asarray(grid.j("dzh"))

    def subs(av):
        # downwind scheme (modforces.f90:792-814); lowest level only takes
        # the downward branch (:769-781)
        dn = whls[1:] * (jnp.concatenate([av[1:], av[-1:]]) - av) \
            / dzh[1:]                                  # whls(k+1) branch
        up_ = whls[:nz] * (av - jnp.concatenate([av[:1], av[:-1]])) \
            / jnp.maximum(dzh[:nz], 1e-30)             # whls(k) branch
        s = jnp.where(whls[1:] < 0, dn, up_)
        s0 = jnp.where(whls[1] < 0, dn[0], 0.0)
        return -jnp.concatenate([s0[None], s[1:]])

    dthl = subs(thl0av)
    dqt = subs(qt0av)
    if dqtdtls is not None:
        dqt = dqt + dqtdtls
    if cfg.physics.lmomsubs:
        du = subs(u0av)
        dv = subs(v0av)
    else:
        du = jnp.zeros(nz, dthl.dtype)
        dv = jnp.zeros(nz, dthl.dtype)
    dsv = (jnp.stack([subs(sv0av[n]) for n in range(sv0av.shape[0])])
           if sv0av.shape[0] else sv0av[:, 0, :] if sv0av.ndim == 3
           else jnp.zeros((0, nz), dthl.dtype))
    return du, dv, dthl, dqt, dsv


def fixuinf1(c, grid: Grid, cfg: Config, dt, u0av, v0av):
    """Free-stream velocity controller mode 1 (modforces.f90:220-288):
    uniform correction -(1/dt)(u0av(ke) - Uinf) applied on the last
    substep."""
    du = -(u0av[-1] - cfg.bc.Uinf) / dt
    dv = (-(v0av[-1] - cfg.bc.Vinf) / dt) if cfg.physics.lvinf else 0.0
    return du, dv


def periodic_eb_corr(grid: Grid, cfg: Config, tot_Tflux, tot_qflux, dtype):
    """Heat-buildup volume sink for periodic EB runs
    (modforces.f90:861-951, Grylls 2021). Returns (dthl, dqt) profiles."""
    nz = grid.ktot
    xlen, ylen = grid.xlen, grid.ylen
    frac = cfg.eb.fraction
    sinkbase = cfg.eb.sinkbase
    H_proj = tot_Tflux / (xlen * ylen)
    E_proj = tot_qflux / (xlen * ylen)
    abl_h = grid.zh[-1] / frac
    M = nz - (sinkbase + 1) + 1
    R_t = H_proj / abl_h * nz / M
    R_q = E_proj / abl_h * nz / M
    phi_t = (1 - frac) * tot_Tflux / (xlen * ylen * grid.dzf[-1])
    phi_q = (1 - frac) * tot_qflux / (xlen * ylen * grid.dzf[-1])
    k = jnp.arange(nz)
    # Fortran k = sinkbase+1 .. ke (1-based) == 0-based k >= sinkbase
    above = (k >= sinkbase).astype(dtype)
    top = (k == nz - 1).astype(dtype)
    return R_t * above + phi_t * top, R_q * above + phi_q * top


def shifted_pbcs(c, grid: Grid, cfg: Config, rk3coef, u0av, ds: float):
    """Spanwise-shift nudging near the outlet half of the domain
    (modforces.f90:953-980), used with shifted periodic BCs."""
    import numpy as np
    nx, ny, nz = grid.shape
    ih = nx // 2
    xh = grid.xh
    vsx = np.zeros(nx)
    vsx[ih + 1:] = (0.5 * np.pi * ds / (0.5 * grid.xlen)
                    * np.sin(np.pi * (xh[ih + 1: nx] - xh[ih])
                             / (0.5 * grid.xlen)))
    vs = jnp.asarray(vsx, c.u.dtype)[:, None, None] \
        * u0av[None, None, :]
    dyj = lambda f: (f - jnp.roll(f, 1, axis=1)) * grid.dyi
    du = -vs * dyj(c.u)
    dv = -vs * dyj(c.v)
    dw = -jnp.concatenate([vs, vs[:, :, -1:]], axis=2) * dyj(c.w)
    return du, dv, dw
