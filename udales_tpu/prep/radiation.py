"""Radiation preprocessing: facet-facet view factors, sky view factors, and
direct shortwave with shading.

Replaces View3D (tools/View3D, C) and directShortwave.f90
(tools/python/fortran/, 727 LoC).  View factors use subdivided
differential-area sums with centroid-ray occlusion (embarrassingly parallel
over facet pairs); shortwave uses Moller-Trumbore any-hit shading rays.
Solar position follows tools/python/udprep/solar.py (NOAA approximation).
"""
from __future__ import annotations

import numpy as np

from .geom import ray_hits
from .stl import triangle_areas


def _subdivide(tris, levels: int = 1):
    """Split each triangle into 4^levels subtriangles; returns
    (sub_tris (m,3,3), parent_ids (m,))."""
    cur = tris
    parents = np.arange(len(tris))
    for _ in range(levels):
        A, B, C = cur[:, 0], cur[:, 1], cur[:, 2]
        ab, bc, ca = (A + B) / 2, (B + C) / 2, (C + A) / 2
        cur = np.concatenate([
            np.stack([A, ab, ca], axis=1),
            np.stack([ab, B, bc], axis=1),
            np.stack([ca, bc, C], axis=1),
            np.stack([ab, bc, ca], axis=1)], axis=0)
        parents = np.tile(parents, 4)
    return cur, parents


def view_factors(tris, normals, subdiv: int = 1, occlusion: bool = True):
    """Approximate facet-facet view-factor matrix F (nf, nf) with
    F[i,j] = fraction of radiation leaving facet i arriving at j, and the
    sky view factor svf = 1 - sum_j F[i,j].

    Method: subdivide facets into patches, sum the differential kernel
    cos(th_i) cos(th_j) dA_i dA_j / (pi r^2) over patch pairs with a
    centre-to-centre visibility ray, then normalise rows to at most 1."""
    nf = len(tris)
    sub, parent = _subdivide(tris, subdiv)
    cen = sub.mean(axis=1)                      # (m,3)
    area = triangle_areas(sub)
    nrm = normals[parent]
    m = len(sub)

    # pairwise kernel (m,m) — fine for a few thousand patches
    d = cen[None, :, :] - cen[:, None, :]       # i -> j
    r2 = np.einsum("ijk,ijk->ij", d, d)
    r = np.sqrt(np.maximum(r2, 1e-30))
    ct_i = np.einsum("ijk,ik->ij", d, nrm) / r
    ct_j = -np.einsum("ijk,jk->ij", d, nrm) / r
    K = np.where((ct_i > 0) & (ct_j > 0) & (r2 > 1e-12),
                 ct_i * ct_j / (np.pi * np.maximum(r2, 1e-12)), 0.0)

    if occlusion and nf > 1:
        vis = np.ones((m, m), bool)
        pairs = np.argwhere(K > 0)
        if len(pairs):
            orig = cen[pairs[:, 0]] + 1e-6 * nrm[pairs[:, 0]]
            dirs = cen[pairs[:, 1]] - cen[pairs[:, 0]]
            lens = np.linalg.norm(dirs, axis=1)
            dirs = dirs / np.maximum(lens[:, None], 1e-30)
            blocked = _segment_blocked(orig, dirs, lens, tris,
                                       pairs, parent)
            vis[pairs[:, 0], pairs[:, 1]] = ~blocked
        K = K * vis

    # patch-pair contributions -> facet-pair view factors
    # F_ij = (1/A_i) sum_{p in i} sum_{q in j} K_pq dA_p dA_q
    weighted = K * area[:, None] * area[None, :]
    F = np.zeros((nf, nf))
    w = np.zeros(nf)
    pi = np.broadcast_to(parent[:, None], K.shape)
    pj = np.broadcast_to(parent[None, :], K.shape)
    np.add.at(F, (pi, pj), weighted)
    np.add.at(w, parent, area)
    F = F / np.maximum(w[:, None], 1e-30)
    # clip rows to the enclosure property
    rs = F.sum(axis=1)
    over = rs > 1.0
    F[over] = F[over] / rs[over, None]
    svf = np.clip(1.0 - F.sum(axis=1), 0.0, 1.0)
    return F, svf


def _segment_blocked(orig, dirs, lens, tris, pairs, parent):
    """Visibility test for patch-centre segments, ignoring the two facets
    the segment connects."""
    from .geom import ray_hits as _rh
    n = len(orig)
    blocked = np.zeros(n, bool)
    # exclusion handled by shortening the segment at both ends
    t0 = 1e-4 * lens
    out = np.zeros(n, bool)
    chunk = 4096
    A, B, C = tris[:, 0], tris[:, 1], tris[:, 2]
    e1, e2 = B - A, C - A
    for s in range(0, n, chunk):
        o = orig[s:s + chunk][:, None, :]
        d = dirs[s:s + chunk][:, None, :]
        L = lens[s:s + chunk]
        pvec = np.cross(d, e2[None])
        det = np.einsum("ntk,tk->nt", pvec, e1)
        ok = np.abs(det) > 1e-14
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o - A[None]
        u = np.einsum("ntk,ntk->nt", tvec, pvec) * inv
        qvec = np.cross(tvec, e1[None])
        v = np.einsum("ntk,ntk->nt", qvec, d) * inv
        t = np.einsum("ntk,tk->nt", qvec, e2) * inv
        hit = (ok & (u >= -1e-10) & (v >= -1e-10) & (u + v <= 1 + 1e-10)
               & (t > 1e-4 * L[:, None]) & (t < (1 - 1e-4) * L[:, None]))
        # ignore the source and target facets themselves
        pi = parent[pairs[s:s + chunk, 0]]
        pj = parent[pairs[s:s + chunk, 1]]
        hit[np.arange(len(pi)), pi] = False
        hit[np.arange(len(pj)), pj] = False
        out[s:s + chunk] = hit.any(axis=1)
    return out


def solar_direction(zenith_deg: float, azimuth_deg: float):
    """Unit vector pointing TOWARD the sun. Azimuth measured clockwise from
    north (+y), zenith from vertical (solar.py conventions)."""
    z = np.radians(zenith_deg)
    a = np.radians(azimuth_deg)
    return np.array([np.sin(z) * np.sin(a), np.sin(z) * np.cos(a),
                     np.cos(z)])


def direct_shortwave(tris, normals, sun_dir, I_dir: float,
                     subdiv: int = 2, use_native: bool | None = None
                     ) -> np.ndarray:
    """Facet-averaged direct solar irradiance [W/m^2] with shading
    (directShortwave.f90 semantics): per sub-patch, the patch receives
    I_dir * max(0, n . s) unless a shading ray toward the sun hits any
    facet.

    Dispatches to the OpenMP C++ kernel (native/radiation.cpp) when it
    builds — the pure-numpy path is O(n_patches x n_facets) and takes
    minutes beyond ~1000 facets (use_native=False forces it; a warning is
    emitted on large pure-numpy runs)."""
    if use_native is None:
        use_native = len(tris) * 4 ** subdiv > 4096
    if use_native:
        try:
            from . import native
            native.get_radiation_lib()
            return native.direct_shortwave(tris, normals, sun_dir, I_dir,
                                           subdiv=subdiv)
        except Exception:
            pass
    if len(tris) > 1000:
        import warnings
        warnings.warn(
            f"pure-numpy direct_shortwave on {len(tris)} facets — expect "
            f"minutes; the native kernel (g++) is strongly recommended")
    sub, parent = _subdivide(tris, subdiv)
    cen = sub.mean(axis=1)
    area = triangle_areas(sub)
    nrm = normals[parent]
    cosi = np.einsum("ik,k->i", nrm, sun_dir)
    lit = cosi > 0
    shaded = np.zeros(len(sub), bool)
    idx = np.flatnonzero(lit)
    if len(idx):
        orig = cen[idx] + 1e-5 * nrm[idx]
        shaded[idx] = ray_hits(orig, sun_dir, tris, tmin=1e-5,
                               exclude=parent[idx])
    flux = np.where(lit & ~shaded, I_dir * np.maximum(cosi, 0.0), 0.0)
    out = np.zeros(len(tris))
    w = np.zeros(len(tris))
    np.add.at(out, parent, flux * area)
    np.add.at(w, parent, area)
    return out / np.maximum(w, 1e-30)


def direct_shortwave_veg(tris, normals, sun_dir, I_dir: float,
                         lad_ext, spacing, subdiv: int = 2,
                         step: float | None = None,
                         blockers=None, periodic_xy: bool = True):
    """Facet direct irradiance with Beer-Lambert vegetation attenuation
    (udprep/directshortwave.py:465-469 semantics: per-cell optical depth
    tau = lad*dec*ds along the ray; the udales_tpu caller passes the
    combined extinction field ``lad_ext = lad*dec`` on the solver grid).

    lad_ext: (itot, jtot, ktot) combined extinction [1/m]; spacing =
    (dx, dy, dz) of that grid.  The march samples the field at `step`
    intervals (default min(spacing)/2) from each sub-patch centroid toward
    the sun, wrapping x/y when periodic_xy.  If `blockers` (triangles) is
    given, facet shading is applied on top via any-hit rays."""
    sun_dir = np.asarray(sun_dir, float)
    dx, dy, dz = spacing
    ni, nj, nk = lad_ext.shape
    if step is None:
        step = min(dx, dy, dz) / 2.0
    sub, parent = _subdivide(tris, subdiv)
    cen = sub.mean(axis=1)
    area = triangle_areas(sub)
    nrm = normals[parent]
    cosi = np.einsum("ik,k->i", nrm, sun_dir)
    lit = cosi > 0
    shaded = np.zeros(len(sub), bool)
    if blockers is not None and len(blockers):
        idx = np.flatnonzero(lit)
        if len(idx):
            orig = cen[idx] + 1e-5 * nrm[idx]
            shaded[idx] = ray_hits(orig, sun_dir, blockers, tmin=1e-5)
    # optical depth: march up to the top of the vegetated volume
    zmax = nk * dz
    up = max(sun_dir[2], 1e-6)
    nsmp = int(np.ceil((zmax / up) / step)) + 1
    tau = np.zeros(len(cen))
    tvals = (np.arange(nsmp) + 0.5) * step
    for c0 in range(0, len(cen), 4096):
        c = cen[c0:c0 + 4096]
        pos = c[:, None, :] + tvals[None, :, None] * sun_dir[None, None, :]
        i = np.floor(pos[..., 0] / dx).astype(int)
        j = np.floor(pos[..., 1] / dy).astype(int)
        k = np.floor(pos[..., 2] / dz).astype(int)
        if periodic_xy:
            i %= ni
            j %= nj
        else:
            i = np.clip(i, 0, ni - 1)
            j = np.clip(j, 0, nj - 1)
        valid = (k >= 0) & (k < nk)
        ext = np.where(valid, lad_ext[i, j, np.clip(k, 0, nk - 1)], 0.0)
        tau[c0:c0 + 4096] = ext.sum(axis=1) * step
    flux = np.where(lit & ~shaded,
                    I_dir * np.maximum(cosi, 0.0) * np.exp(-tau), 0.0)
    out = np.zeros(len(tris))
    w = np.zeros(len(tris))
    np.add.at(out, parent, flux * area)
    np.add.at(w, parent, area)
    return out / np.maximum(w, 1e-30)


def net_shortwave(tris, normals, sun_dir, I_dir, D_diff, svf, albedo):
    """netsw.inp contents: absorbed shortwave per facet
    = (1 - albedo) * (direct + svf * diffuse) (udprep radiation chain)."""
    S = direct_shortwave(tris, normals, sun_dir, I_dir)
    return (1.0 - albedo) * (S + svf * D_diff)
