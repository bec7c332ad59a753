"""Advection operators (2nd-order central, kappa flux-limited, 1st upwind).

Vectorized re-derivations of the reference stencils:
  - advecu_2nd / advecv_2nd / advecw_2nd: src/modadvection.f90:158-314
    (the embedded -grad(pres0) term is applied separately in the step assembly)
  - advecc_2nd: src/modadvection.f90:103-155
  - advecc_kappa + rlim limiter: src/modadvection.f90:316-421
  - advecc_upw: src/modadvection.f90:423-503

All functions take ghosted arrays (see ops/stencil.py) and return the interior
tendency contribution (to be added to the running tendency).
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ..grid import Grid
from .stencil import kvec, sh, shw


def adv_u(g, grid: Grid):
    """d(uu)/dx + d(vu)/dy + d(wu)/dz at u-points (modadvection.f90:158-211)."""
    nx, ny, nz = grid.shape
    S = partial(sh, nx=nx, ny=ny, nz=nz, h=1, hk=1)
    Sw = partial(shw, nx=nx, ny=ny, nz=nz, h=1)
    u, v, w = g.u, g.v, g.w
    uc = S(u, 0, 0, 0)
    dzf = grid.j("dzf_g"); dzhi = grid.j("dzhi")
    dzf_k = kvec(dzf, 1, nz); dzf_kp = kvec(dzf, 2, nz); dzf_km = kvec(dzf, 0, nz)
    dzhi_k = kvec(dzhi, 0, nz); dzhi_kp = kvec(dzhi, 1, nz)
    dzfi5 = kvec(grid.j("dzfi5"), 0, nz)

    horiz = (
        ((uc + S(u, 1, 0, 0)) * (uc + S(u, 1, 0, 0))
         - (uc + S(u, -1, 0, 0)) * (uc + S(u, -1, 0, 0))) * grid.dxiq
        + ((uc + S(u, 0, 1, 0)) * (S(v, 0, 1, 0) + S(v, -1, 1, 0))
           - (uc + S(u, 0, -1, 0)) * (S(v, 0, 0, 0) + S(v, -1, 0, 0))) * grid.dyiq
    )
    vert = (
        (S(u, 0, 0, 1) * dzf_k + uc * dzf_kp) * dzhi_kp
        * (Sw(w, 0, 0, 1) + Sw(w, -1, 0, 1))
        - (uc * dzf_km + S(u, 0, 0, -1) * dzf_k) * dzhi_k
        * (Sw(w, 0, 0, 0) + Sw(w, -1, 0, 0))
    ) * 0.5 * dzfi5
    return -(horiz + vert)


def adv_v(g, grid: Grid):
    """(modadvection.f90:215-268)."""
    nx, ny, nz = grid.shape
    S = partial(sh, nx=nx, ny=ny, nz=nz, h=1, hk=1)
    Sw = partial(shw, nx=nx, ny=ny, nz=nz, h=1)
    u, v, w = g.u, g.v, g.w
    vc = S(v, 0, 0, 0)
    dzf = grid.j("dzf_g"); dzhi = grid.j("dzhi")
    dzf_k = kvec(dzf, 1, nz); dzf_kp = kvec(dzf, 2, nz); dzf_km = kvec(dzf, 0, nz)
    dzhi_k = kvec(dzhi, 0, nz); dzhi_kp = kvec(dzhi, 1, nz)
    dzfi5 = kvec(grid.j("dzfi5"), 0, nz)

    horiz = (
        ((S(u, 1, 0, 0) + S(u, 1, -1, 0)) * (vc + S(v, 1, 0, 0))
         - (S(u, 0, 0, 0) + S(u, 0, -1, 0)) * (vc + S(v, -1, 0, 0))) * grid.dxiq
        + ((S(v, 0, 1, 0) + vc) * (vc + S(v, 0, 1, 0))
           - (S(v, 0, -1, 0) + vc) * (vc + S(v, 0, -1, 0))) * grid.dyiq
    )
    vert = (
        (Sw(w, 0, 0, 1) + Sw(w, 0, -1, 1))
        * (S(v, 0, 0, 1) * dzf_k + vc * dzf_kp) * dzhi_kp
        - (Sw(w, 0, 0, 0) + Sw(w, 0, -1, 0))
        * (S(v, 0, 0, -1) * dzf_k + vc * dzf_km) * dzhi_k
    ) * 0.5 * dzfi5
    return -(horiz + vert)


def adv_w(g, grid: Grid):
    """(modadvection.f90:273-314). Returns a face-shaped (nx,ny,nz+1) tendency
    with zeros at the bottom/top faces (not advanced by the reference)."""
    nx, ny, nz = grid.shape
    u, v, w = g.u, g.v, g.w
    h = 1
    # interior faces kf = 1..nz-1
    nf = nz - 1
    wf = lambda di, dj, dk: w[h + di: h + di + nx, h + dj: h + dj + ny,
                              1 + dk: 1 + dk + nf]
    # cell-centred u/v with k ghost offset: cell index (1+dk) maps ghost
    uc = lambda di, dk: g.u[h + di: h + di + nx, h: h + ny, 1 + dk: 1 + dk + nf]
    ucj = lambda di, dj, dk: g.u[h + di: h + di + nx, h + dj: h + dj + ny,
                                 1 + dk: 1 + dk + nf]
    vcj = lambda di, dj, dk: g.v[h + di: h + di + nx, h + dj: h + dj + ny,
                                 1 + dk: 1 + dk + nf]
    dzf = grid.j("dzf_g")
    # face kf: cell above = kf, cell below = kf-1
    dzf_km = kvec(dzf, 1, nf)      # dzf[kf-1]: ghost index 1+(kf-1), kf starts 1
    dzf_k = kvec(dzf, 2, nf)       # dzf[kf]
    dzhi_k = kvec(grid.j("dzhi"), 1, nf)
    dzhiq_k = kvec(grid.j("dzhiq"), 1, nf)

    wc = wf(0, 0, 0)
    term_x = (
        (wf(1, 0, 0) + wc) * (dzf_km * ucj(1, 0, 1) + dzf_k * ucj(1, 0, 0))
        - (wc + wf(-1, 0, 0)) * (dzf_km * ucj(0, 0, 1) + dzf_k * ucj(0, 0, 0))
    ) * grid.dxiq * dzhi_k
    term_y = (
        (wf(0, 1, 0) + wc) * (dzf_km * vcj(0, 1, 1) + dzf_k * vcj(0, 1, 0))
        - (wc + wf(0, -1, 0)) * (dzf_km * vcj(0, 0, 1) + dzf_k * vcj(0, 0, 0))
    ) * grid.dyiq * dzhi_k
    term_z = (
        (wc + wf(0, 0, 1)) * (wc + wf(0, 0, 1))
        - (wc + wf(0, 0, -1)) * (wc + wf(0, 0, -1))
    ) * dzhiq_k
    tend = -(term_x + term_y + term_z)
    zeros = jnp.zeros((nx, ny, 1), tend.dtype)
    return jnp.concatenate([zeros, tend, zeros], axis=2)


def adv_c2(gc, g, grid: Grid):
    """Cell-centred 2nd-order central advection (modadvection.f90:103-155).
    `gc` is the ghosted scalar (h=1, 1 k-ghost); `g` supplies u, v, w."""
    nx, ny, nz = grid.shape
    S = partial(sh, nx=nx, ny=ny, nz=nz, h=1, hk=1)
    Sw = partial(shw, nx=nx, ny=ny, nz=nz, h=1)
    u, v, w = g.u, g.v, g.w
    c = S(gc, 0, 0, 0)
    dzf = grid.j("dzf_g"); dzhi = grid.j("dzhi")
    dzf_k = kvec(dzf, 1, nz); dzf_kp = kvec(dzf, 2, nz); dzf_km = kvec(dzf, 0, nz)
    dzhi_k = kvec(dzhi, 0, nz); dzhi_kp = kvec(dzhi, 1, nz)
    dzfi5 = kvec(grid.j("dzfi5"), 0, nz)
    horiz = (
        (S(u, 1, 0, 0) * (S(gc, 1, 0, 0) + c)
         - S(u, 0, 0, 0) * (S(gc, -1, 0, 0) + c)) * grid.dxi5
        + (S(v, 0, 1, 0) * (S(gc, 0, 1, 0) + c)
           - S(v, 0, 0, 0) * (S(gc, 0, -1, 0) + c)) * grid.dyi5
    )
    vert = (
        Sw(w, 0, 0, 1) * (S(gc, 0, 0, 1) * dzf_k + c * dzf_kp) * dzhi_kp
        - Sw(w, 0, 0, 0) * (S(gc, 0, 0, -1) * dzf_k + c * dzf_km) * dzhi_k
    ) * dzfi5
    return -(horiz + vert)


def _rlim(d1, d2, eps1=1.0e-10):
    """Kappa-scheme flux limiter (modadvection.f90:410-421)."""
    ri = (d2 + eps1) / (d1 + eps1)
    phir = jnp.maximum(0.0, jnp.minimum(2.0 * ri,
                       jnp.minimum(1.0 / 3.0 + 2.0 / 3.0 * ri, 2.0)))
    return 0.5 * phir * d1


def adv_kappa(gc, g, grid: Grid):
    """Flux-limited kappa scheme for scalars (modadvection.f90:316-407).

    `gc` has halo 2 in x/y and 2 k-ghosts (Ghosts.sv layout):
    gc[2+i, 2+j, 2+k] == c[i,j,k].  Velocities from `g` (halo 1)."""
    nx, ny, nz = grid.shape
    h, hk = 2, 2
    dt = gc.dtype

    # --- x faces: i = 0..nx (face i between cells i-1 and i) ---------------
    # cell view helper: C(di) -> (nx+1, ny, nz) slab over faces
    Cx = lambda di: gc[h + di - 1: h + di + nx, h: h + ny, hk: hk + nz]
    ux = g.u[1: 2 + nx, 1: 1 + ny, 1: 1 + nz]  # u at faces 0..nx
    d1p = (Cx(0) - Cx(-1)) * grid.dxi
    d2p = (Cx(1) - Cx(0)) * grid.dxi
    d1m = (Cx(1) - Cx(2)) * grid.dxi
    d2m = (Cx(0) - Cx(1)) * grid.dxi
    pos = ux > 0
    cf = jnp.where(pos, Cx(0), Cx(1))
    d1 = jnp.where(pos, d1p, d1m)
    d2 = jnp.where(pos, d2p, d2m)
    cf = cf + grid.dx * _rlim(d1, d2)
    Fx = cf * ux
    tend = (Fx[:-1] - Fx[1:]) * grid.dxi

    # --- y faces ----------------------------------------------------------
    Cy = lambda dj: gc[h: h + nx, h + dj - 1: h + dj + ny, hk: hk + nz]
    vy = g.v[1: 1 + nx, 1: 2 + ny, 1: 1 + nz]
    d1p = Cy(0) - Cy(-1)
    d2p = Cy(1) - Cy(0)
    d1m = Cy(1) - Cy(2)
    d2m = Cy(0) - Cy(1)
    pos = vy > 0
    cf = jnp.where(pos, Cy(0), Cy(1))
    d1 = jnp.where(pos, d1p, d1m)
    d2 = jnp.where(pos, d2p, d2m)
    cf = cf + _rlim(d1, d2)
    Fy = cf * vy
    tend = tend + (Fy[:, :-1] - Fy[:, 1:]) * grid.dyi

    # --- z faces (stretched; modadvection.f90:383-404) --------------------
    # faces kf = 1..nz (bottom face kb flux not formed; w=0 there).
    nf = nz
    Cz = lambda dk: gc[h: h + nx, h: h + ny, hk + dk: hk + dk + nf]
    wz = g.w[1: 1 + nx, 1: 1 + ny, 1: 1 + nz]  # faces 1..nz
    dzhci = grid.j("dzhci_g")   # face metric, index map: face kf -> kf+1
    dzfc = grid.j("dzfc_g")     # cell metric, index map: cell k -> k+2
    dzfci = grid.j("dzfci_g")
    fhm = kvec(dzhci, 1, nf)     # dzhci(k-1) at face kf -> index kf
    fh0 = kvec(dzhci, 2, nf)     # dzhci(k)
    fhp = kvec(dzhci, 3, nf)     # dzhci(k+1)
    fc = kvec(dzfc, 3, nf)       # dzfc(k): cell above face kf (cell kf)
    d1p = (Cz(0) - Cz(-1)) * fhm
    d2p = (Cz(1) - Cz(0)) * fh0
    d1m = (Cz(1) - Cz(2)) * fhp
    d2m = (Cz(0) - Cz(1)) * fh0
    pos = wz > 0
    cf = jnp.where(pos, Cz(0), Cz(1))
    d1 = jnp.where(pos, d1p, d1m)
    d2 = jnp.where(pos, d2p, d2m)
    cf = cf + fc * _rlim(d1, d2)
    Fz = cf * wz                       # faces 1..nz
    Fz = jnp.concatenate([jnp.zeros_like(Fz[..., :1]), Fz], axis=2)  # face 0
    dzfci_k = kvec(dzfci, 2, nz)
    tend = tend + (Fz[..., :-1] - Fz[..., 1:]) * dzfci_k
    return tend.astype(dt)


def adv_upw(gc, g, grid: Grid):
    """First-order upwind for scalars (modadvection.f90:423-503)."""
    nx, ny, nz = grid.shape
    h, hk = 2, 2
    Cx = lambda di: gc[h + di - 1: h + di + nx, h: h + ny, hk: hk + nz]
    ux = g.u[1: 2 + nx, 1: 1 + ny, 1: 1 + nz]
    Fx = jnp.where(ux > 0, Cx(0), Cx(1)) * ux
    tend = (Fx[:-1] - Fx[1:]) * grid.dxi
    Cy = lambda dj: gc[h: h + nx, h + dj - 1: h + dj + ny, hk: hk + nz]
    vy = g.v[1: 1 + nx, 1: 2 + ny, 1: 1 + nz]
    Fy = jnp.where(vy > 0, Cy(0), Cy(1)) * vy
    tend = tend + (Fy[:, :-1] - Fy[:, 1:]) * grid.dyi
    Cz = lambda dk: gc[h: h + nx, h: h + ny, hk + dk: hk + dk + nz]
    wz = g.w[1: 1 + nx, 1: 1 + ny, 1: 1 + nz]
    Fz = jnp.where(wz > 0, Cz(0), Cz(1)) * wz
    Fz = jnp.concatenate([jnp.zeros_like(Fz[..., :1]), Fz], axis=2)
    tend = tend + (Fz[..., :-1] - Fz[..., 1:]) * kvec(grid.j("dzfci_g"), 2, nz)
    return tend
