"""Long-tail physics subsystems: chemistry, scalar sources, purifiers,
heat pumps, vegetation.

Re-derivations of src/modchem.f90, src/modscalsource.f90,
src/modpurifiers.f90, src/heatpump.f90, src/vegetation.f90.  The reference's
sparse point loops become dense precomputed source fields (scalar sources,
vegetation drag) or small masked box updates (purifiers, heat pumps) —
everything jit-compatible with static geometry baked at load time.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, const
from .grid import Grid
from .io.inputs import read_sparse_ijk

# molar masses of the NO-NO2-O3 null cycle (modchem.f90)
M_NO, M_NO2, M_O3 = 30.006, 46.005, 47.997


def chem_update(sv, dt, cfg: Config, IIc):
    """Fully-implicit backward-Euler NO-NO2-O3 null cycle applied to sv0 once
    per full step (modchem.f90:29-77). sv is (nsv>=3, nx, ny, nz)."""
    k1 = cfg.chem.k1
    JNO2 = cfg.chem.JNO2
    no = IIc * sv[0] / M_NO
    no2 = IIc * sv[1] / M_NO2
    o3 = IIc * sv[2] / M_O3
    num = dt * (-k1 * no * o3 + JNO2 * no2)
    den = 1.0 + ((no + o3) * k1 + JNO2) * dt
    d = num / den
    sv = sv.at[0].set(M_NO * (sv[0] / M_NO + d))
    sv = sv.at[1].set(M_NO2 * (sv[1] / M_NO2 - d))
    sv = sv.at[2].set(M_O3 * (sv[2] / M_O3 + d))
    return sv


# ---------------------------------------------------------------------------
# Scalar sources (Gaussian point / line plumes)
# ---------------------------------------------------------------------------

class ScalarSources:
    """Precomputed dense source fields (modscalsource.f90:385-484): the
    per-timestep tendency is a constant field, so it is evaluated once."""

    def __init__(self, field):
        self.field = field  # (nsv, nx, ny, nz)

    @classmethod
    def build(cls, cfg: Config, grid: Grid, points=None, lines=None):
        """points: (nsv, nsrc, 5) rows [xS yS zS SS sigS];
        lines: (nsv, nsrc, 8) rows [xSb ySb zSb xSe ySe zSe SS sigS]."""
        nx, ny, nz = grid.shape
        nsv = cfg.scalars.nsv
        X = grid.xf[:, None, None]
        Y = grid.yf[None, :, None]
        Z = grid.zf[None, None, :]
        dzfi = grid.dzfi[None, None, :]
        out = np.zeros((nsv, nx, ny, nz))
        fac = grid.dxi * grid.dyi * dzfi
        if points is not None:
            for n in range(nsv):
                for (xS, yS, zS, SS, sigS) in points[n]:
                    ra2 = (X - xS) ** 2 + (Y - yS) ** 2 + (Z - zS) ** 2
                    src = np.where(ra2 <= 9 * sigS ** 2,
                                   SS * np.exp(-ra2 / (2 * sigS ** 2)), 0.0)
                    out[n] += fac * src
        if lines is not None:
            from scipy.special import erf
            for n in range(nsv):
                for (xb, yb, zb, xe, ye, ze, SS, sigS) in lines[n]:
                    lx, ly, lz = xe - xb, ye - yb, ze - zb
                    L2 = lx * lx + ly * ly + lz * lz
                    t = ((X - xb) * lx + (Y - yb) * ly + (Z - zb) * lz) / L2
                    tc = np.clip(t, 0.0, 1.0)
                    ra2 = ((X - (xb + tc * lx)) ** 2
                           + (Y - (yb + tc * ly)) ** 2
                           + (Z - (zb + tc * lz)) ** 2)
                    inside = ra2 <= 9 * sigS ** 2
                    amp = (np.sqrt(2 * np.pi) * SS * sigS
                           * np.exp(-ra2 / (2 * sigS ** 2))
                           * erf(np.sqrt(np.maximum(
                               9 * sigS ** 2 - ra2, 0.0)
                               / (2 * sigS ** 2))))
                    out[n] += fac * np.where(inside, amp, 0.0)
        return cls(jnp.asarray(out, grid.dtype))

    @classmethod
    def load(cls, case_dir: str | Path, expnr: str, cfg: Config, grid: Grid):
        case_dir = Path(case_dir)
        nsv = cfg.scalars.nsv
        pts = lns = None
        if cfg.scalars.lscasrc and cfg.scalars.nscasrc > 0:
            pts = [np.loadtxt(case_dir / f"scalarsourcep.inp.{n+1}.{expnr}",
                              skiprows=2, ndmin=2) for n in range(nsv)]
        if cfg.scalars.lscasrcl and cfg.scalars.nscasrcl > 0:
            lns = [np.loadtxt(case_dir / f"scalarsourcel.inp.{n+1}.{expnr}",
                              skiprows=2, ndmin=2) for n in range(nsv)]
        return cls.build(cfg, grid, pts, lns)


# ---------------------------------------------------------------------------
# Purifiers
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Purifier:
    """One box purifier (modpurifiers.f90): 0-based inclusive cell bounds and
    flow direction code ipu (1..6 handled: +-x, +-y, +-z)."""
    il: int; iu: int; jl: int; ju: int; kl: int; ku: int; ipu: int


class Purifiers:
    def __init__(self, cfg: Config, grid: Grid, purifs):
        self.cfg = cfg
        self.grid = grid
        self.purifs = purifs

    @classmethod
    def load(cls, case_dir, expnr, cfg, grid):
        d = np.loadtxt(Path(case_dir) / f"purifs.inp.{expnr}", skiprows=2,
                       ndmin=2).astype(int)
        ps = [Purifier(r[0] - 1, r[1] - 1, r[2] - 1, r[3] - 1, r[4] - 1,
                       r[5] - 1, r[6]) for r in d]
        return cls(cfg, grid, ps)

    def apply(self, m, c, du, dv, dw, dsv):
        """Enforce purifier flow rates on m/c fields (tendencies zeroed so
        the integration preserves them) and scrub scalars
        (modpurifiers.f90:63-268, cases 1-6). Efficiencies: epu for sv1,
        0.7 for sv2, 0.65 for sv4 (reference hard-codes these)."""
        cfg, g = self.cfg, self.grid
        Qpu, epu = cfg.purifs.Qpu, cfg.purifs.epu
        dy = g.dy
        for p in self.purifs:
            niy = p.ju - p.jl + 1
            hz = g.zh[p.ku + 1] - g.zh[p.kl]
            wx = g.xh[p.iu + 1] - g.xh[p.il]
            if p.ipu in (1, 2):
                Apu = niy * dy * hz
                dpu = wx
                vel = Qpu / Apu * (1 if p.ipu == 1 else -1)
                m = dataclasses.replace(m, u=m.u.at[
                    p.il:p.iu + 2, p.jl:p.ju + 1, p.kl:p.ku + 1].set(vel))
                c = dataclasses.replace(c, u=c.u.at[
                    p.il:p.iu + 2, p.jl:p.ju + 1, p.kl:p.ku + 1].set(vel))
                du = du.at[p.il:p.iu + 2, p.jl:p.ju + 1,
                           p.kl:p.ku + 1].set(0.0)
                inlet_i = p.il - 1 if p.ipu == 1 else min(p.iu + 1,
                                                          g.itot - 1)
                intake = m.sv[:, inlet_i, p.jl:p.ju + 1, p.kl:p.ku + 1]
                intake = intake[:, None, :, :]
            elif p.ipu in (3, 4):
                Apu = wx * hz
                dpu = niy * dy
                vel = Qpu / Apu * (1 if p.ipu == 3 else -1)
                m = dataclasses.replace(m, v=m.v.at[
                    p.il:p.iu + 1, p.jl:p.ju + 2, p.kl:p.ku + 1].set(vel))
                c = dataclasses.replace(c, v=c.v.at[
                    p.il:p.iu + 1, p.jl:p.ju + 2, p.kl:p.ku + 1].set(vel))
                dv = dv.at[p.il:p.iu + 1, p.jl:p.ju + 2,
                           p.kl:p.ku + 1].set(0.0)
                inlet_j = p.jl - 1 if p.ipu == 3 else min(p.ju + 1,
                                                          g.jtot - 1)
                intake = m.sv[:, p.il:p.iu + 1, inlet_j, p.kl:p.ku + 1]
                intake = intake[:, :, None, :]
            else:  # 5, 6: vertical
                Apu = niy * dy * wx
                dpu = hz
                vel = Qpu / Apu * (1 if p.ipu == 5 else -1)
                m = dataclasses.replace(m, w=m.w.at[
                    p.il:p.iu + 1, p.jl:p.ju + 1, p.kl:p.ku + 2].set(vel))
                c = dataclasses.replace(c, w=c.w.at[
                    p.il:p.iu + 1, p.jl:p.ju + 1, p.kl:p.ku + 2].set(vel))
                dw = dw.at[p.il:p.iu + 1, p.jl:p.ju + 1,
                           p.kl:p.ku + 2].set(0.0)
                inlet_k = p.kl - 1 if p.ipu == 5 else min(p.ku + 1,
                                                          g.ktot - 1)
                intake = m.sv[:, p.il:p.iu + 1, p.jl:p.ju + 1, inlet_k]
                intake = intake[:, :, :, None]
            if dsv.shape[0] > 0:
                effs = [epu, 0.7, 0.0, 0.65] + [0.0] * 16
                intake_b = jnp.broadcast_to(
                    intake, (dsv.shape[0], p.iu - p.il + 1,
                             p.ju - p.jl + 1, p.ku - p.kl + 1))
                for n in range(dsv.shape[0]):
                    e = effs[n] if n < len(effs) else 0.0
                    if e == 0.0:
                        continue
                    dsv = dsv.at[n, p.il:p.iu + 1, p.jl:p.ju + 1,
                                 p.kl:p.ku + 1].add(
                        -(Qpu / Apu) * e * intake_b[n] / dpu)
        return m, c, du, dv, dw, dsv


# ---------------------------------------------------------------------------
# Heat pumps
# ---------------------------------------------------------------------------

class HeatPumps:
    """Point heat extractors + exhaust momentum source (heatpump.f90)."""

    def __init__(self, cfg: Config, grid: Grid, ijk):
        self.cfg = cfg
        self.grid = grid
        self.ijk = ijk  # (n,3) 0-based
        n = max(len(ijk), 1)
        self.thl_dot = cfg.heatpump.QH_dot_hp / (len(ijk) * const.rhoa
                                                 * const.cp) if len(ijk) else 0.0
        self.w_exhaust = (cfg.heatpump.Q_dot_hp / len(ijk)
                          * grid.dxi * grid.dyi) if len(ijk) else 0.0

    @classmethod
    def load(cls, case_dir, expnr, cfg, grid):
        pts = read_sparse_ijk(Path(case_dir) / f"heatpump.inp.{expnr}")
        # reference skips one extra header line (2 headers total)
        return cls(cfg, grid, pts)

    def apply(self, m, c, dw, dthl):
        g = self.grid
        i = jnp.asarray(self.ijk[:, 0])
        j = jnp.asarray(self.ijk[:, 1])
        k = jnp.asarray(self.ijk[:, 2])
        if self.cfg.heatpump.lfan_hp:
            # wm/w0 := exhaust velocity, wp := 0 (heatpump.f90:78-82)
            m = dataclasses.replace(
                m, w=m.w.at[i, j, k + 1].set(self.w_exhaust))
            c = dataclasses.replace(
                c, w=c.w.at[i, j, k + 1].set(self.w_exhaust))
            dw = dw.at[i, j, k + 1].set(0.0)
        dzfi = jnp.asarray(g.j("dzfi"))[k]
        dthl = dthl.at[i, j, k].add(
            -self.thl_dot * g.dxi * g.dyi * dzfi)
        return m, c, dw, dthl


# ---------------------------------------------------------------------------
# Vegetation
# ---------------------------------------------------------------------------

class Vegetation:
    """Canopy drag + energy balance + scalar deposition (vegetation.f90).

    Dense formulation: cell-centred lad*cd is face-averaged once at load;
    runtime cost is three masked elementwise sweeps."""

    def __init__(self, cfg: Config, grid: Grid, lad, dcoef, ud, lsize, rs,
                 dec=None, sveg=None):
        self.cfg = cfg
        self.grid = grid
        fdt = grid.dtype
        self.lad = jnp.asarray(lad, fdt)       # (nx,ny,nz) leaf area density
        dc = np.asarray(dcoef)
        # face averages (vegetation.f90:255-268); periodic wrap
        dcx = 0.5 * (dc + np.roll(dc, 1, axis=0))
        dcy = 0.5 * (dc + np.roll(dc, 1, axis=1))
        dcz = np.zeros(dc.shape[:2] + (dc.shape[2] + 1,))
        dcz[:, :, 1:-1] = 0.5 * (dc[:, :, 1:] + dc[:, :, :-1])
        dcz[:, :, 0] = 0.0
        self.dcoef_u = jnp.asarray(dcx, fdt)
        self.dcoef_v = jnp.asarray(dcy, fdt)
        self.dcoef_w = jnp.asarray(dcz, fdt)
        self.ud = jnp.asarray(ud, fdt)         # deposition velocity field
        self.lsize = jnp.asarray(np.maximum(lsize, 1e-6), fdt)
        self.rs = jnp.asarray(np.maximum(rs, 1e-6), fdt)
        self.sveg = None if sveg is None else jnp.asarray(sveg, fdt)
        self.has_canopy = bool((np.asarray(dcoef) > 0).any())

    @classmethod
    def load(cls, case_dir, expnr, cfg, grid):
        """veg.inp (sparse ijk with point ids), veg_params.inp
        (id lad cd ud dec lsize rs), optional sveg.inp (absorbed SW)."""
        case_dir = Path(case_dir)
        nx, ny, nz = grid.shape
        pts = np.loadtxt(case_dir / f"veg.inp.{expnr}", skiprows=1,
                         dtype=np.int64, ndmin=2)
        params = np.loadtxt(case_dir / f"veg_params.inp.{expnr}", skiprows=1,
                            ndmin=2)
        # veg.inp rows: i j k [id]; params rows: id lad cd ud dec lsize rs
        if pts.shape[1] >= 4:
            ids = pts[:, 3]
        else:
            ids = np.ones(len(pts), np.int64)
        pmap = {int(r[0]): r for r in params}
        lad = np.zeros((nx, ny, nz))
        dcoef = np.zeros((nx, ny, nz))
        ud = np.zeros((nx, ny, nz))
        lsize = np.zeros((nx, ny, nz))
        rs = np.zeros((nx, ny, nz))
        for (i, j, k), pid in zip(pts[:, :3] - 1, ids):
            r = pmap.get(int(pid), params[0])
            lad[i, j, k] = r[1]
            dcoef[i, j, k] = r[1] * r[2]
            ud[i, j, k] = r[3]
            lsize[i, j, k] = r[5]
            rs[i, j, k] = r[6]
        svp_path = case_dir / f"sveg.inp.{expnr}"
        sveg = None
        if svp_path.exists():
            sv = np.zeros((nx, ny, nz))
            vals = np.loadtxt(svp_path, skiprows=1, ndmin=2)
            sv[pts[:, 0] - 1, pts[:, 1] - 1, pts[:, 2] - 1] = vals[:, -1]
            sveg = sv
        return cls(cfg, grid, lad, dcoef, ud, lsize, rs, sveg=sveg)

    def forcing(self, m, grid: Grid, cfg: Config, du, dv, dw, dthl, dqt,
                dsv):
        """vegetation_forcing (vegetation.f90:351-437 + sveg EB :500-540)."""
        import jax.numpy as jnp
        from .ops.halo import pad_periodic_xy
        nx, ny, nz = grid.shape

        # quadratic drag at faces with the reference's cross-interpolations
        gu = pad_periodic_xy(m.u, 1)
        gv = pad_periodic_xy(m.v, 1)
        gw = pad_periodic_xy(m.w, 1)
        wext = jnp.concatenate([gw, gw[:, :, -1:]], axis=2)  # face nz+1 pad
        # u faces
        v_at_u = 0.25 * (gv[1:-1, 1:-1, :] + gv[1:-1, 2:, :]
                         + gv[:-2, 1:-1, :] + gv[:-2, 2:, :])
        w_at_u = 0.25 * (gw[1:-1, 1:-1, :-1] + gw[1:-1, 1:-1, 1:]
                         + gw[:-2, 1:-1, :-1] + gw[:-2, 1:-1, 1:])
        spd_u = jnp.sqrt(m.u ** 2 + v_at_u ** 2 + w_at_u ** 2)
        du = du - self.dcoef_u * m.u * spd_u
        # v faces
        u_at_v = 0.25 * (gu[1:-1, 1:-1, :] + gu[2:, 1:-1, :]
                         + gu[1:-1, :-2, :] + gu[2:, :-2, :])
        w_at_v = 0.25 * (gw[1:-1, 1:-1, :-1] + gw[1:-1, 1:-1, 1:]
                         + gw[1:-1, :-2, :-1] + gw[1:-1, :-2, 1:])
        spd_v = jnp.sqrt(m.v ** 2 + u_at_v ** 2 + w_at_v ** 2)
        dv = dv - self.dcoef_v * m.v * spd_v
        # w faces (interior)
        uc = jnp.concatenate([m.u[..., :1], m.u], axis=2)   # cell k-1 pad
        gu2 = pad_periodic_xy(uc, 1)
        u_at_w = 0.25 * (gu2[1:-1, 1:-1, 1:] + gu2[2:, 1:-1, 1:]
                         + gu2[1:-1, 1:-1, :-1] + gu2[2:, 1:-1, :-1])
        vc = jnp.concatenate([m.v[..., :1], m.v], axis=2)
        gv2 = pad_periodic_xy(vc, 1)
        v_at_w = 0.25 * (gv2[1:-1, 1:-1, 1:] + gv2[1:-1, 2:, 1:]
                         + gv2[1:-1, 1:-1, :-1] + gv2[1:-1, 2:, :-1])
        wfull = m.w
        spd_w = jnp.sqrt(wfull[..., :nz] ** 2 + u_at_w ** 2 + v_at_w ** 2)
        dw = dw.at[..., :nz].add(
            -self.dcoef_w[..., :nz] * wfull[..., :nz] * spd_w)

        # canopy energy balance (sveg mode, vegetation.f90:500-540)
        if (cfg.physics.lmoist and cfg.physics.ltempeq
                and self.sveg is not None):
            eb = self._canopy_eb(m)
            dqt = dqt + eb["dqt"]
            dthl = dthl + eb["dthl"]

        # scalar deposition (vegetation.f90:424-437)
        if dsv.shape[0] > 0:
            dep = self.lad * self.ud
            dsv = dsv - m.sv * dep[None]
        return du, dv, dw, dthl, dqt, dsv

    def _canopy_eb(self, m):
        """Penman-Monteith canopy energy balance (vegetation.f90:500-540).

        Returns the thl/qt tendencies plus the radiative/aerodynamic split
        of the latent flux and the decoupling factor omega, as needed by the
        treedump statistics (modstatsdump.f90:1245-1279)."""
        import jax.numpy as jnp
        nz = self.grid.ktot
        gam = (const.cp * const.pref0 * const.rv) / (const.rlv * const.rd)
        q_av = self.sveg / jnp.maximum(self.lad, 1e-12)
        e_sat = 610.8 * jnp.exp(17.27 * (m.thl - 273.15)
                                / (m.thl - 35.85))
        e_vap = (m.qt * const.pref0) / (0.378 * m.qt + 0.622)
        d_vap = jnp.maximum(e_sat - e_vap, 0.0)
        slope = (4098 * e_sat) / ((m.thl - 35.85) ** 2)
        uc2 = 0.5 * (m.u + jnp.roll(m.u, -1, axis=0))
        vc2 = 0.5 * (m.v + jnp.roll(m.v, -1, axis=1))
        wc2 = 0.5 * (m.w[..., :nz] + m.w[..., 1:])
        wind2 = jnp.maximum(uc2 ** 2 + vc2 ** 2 + wc2 ** 2, 1e-12)
        r_a = 130.0 * jnp.sqrt(self.lsize / jnp.sqrt(wind2))
        omega = 1.0 / (1.0 + 2.0 * (gam / (slope + 2 * gam))
                       * (self.rs / r_a))
        qeR = omega * (slope / (slope + 2 * gam)) * q_av
        qeA = ((1 - omega) * (1.0 / (gam * self.rs))
               * const.rhoa * const.cp * d_vap)
        qe = qeR + qeA
        qh = q_av - qe
        active = self.lad > 0
        z = jnp.zeros_like(m.thl)
        scale_q = self.lad / (const.rhoa * const.rlv)
        return dict(
            dqt=jnp.where(active, scale_q * qe, z),
            dqtR=jnp.where(active, scale_q * qeR, z),
            dqtA=jnp.where(active, scale_q * qeA, z),
            dthl=jnp.where(active,
                           self.lad * qh / (const.rhoa * const.cp), z),
            omega=jnp.where(active, omega, z))

    def diagnostics(self, m):
        """Instantaneous vegetation tendencies as dense 3-D fields, in the
        treedump variable layout (modstatsdump.f90:371-380).  Recomputed
        from the current state (pure function), which matches the
        per-sample values the reference stores from the last substep."""
        import jax.numpy as jnp
        nx, ny, nz = self.grid.shape
        z3 = jnp.zeros((nx, ny, nz), self.grid.dtype)
        du, dv, dw, dthl, dqt, dsv = self.forcing(
            m, self.grid, self.cfg, z3, z3,
            jnp.zeros((nx, ny, nz + 1), self.grid.dtype), z3, z3,
            jnp.zeros_like(m.sv))
        out = dict(tr_u=du, tr_v=dv, tr_w=dw[..., :nz], tr_thl=dthl,
                   tr_qt=dqt, tr_qtR=z3, tr_qtA=z3, tr_omega=z3,
                   tr_sv1=z3, tr_sv2=z3)
        if (self.cfg.physics.lmoist and self.cfg.physics.ltempeq
                and self.sveg is not None):
            eb = self._canopy_eb(m)
            out["tr_qtR"] = eb["dqtR"]
            out["tr_qtA"] = eb["dqtA"]
            out["tr_omega"] = eb["omega"]
        if m.sv.shape[0] > 0:
            out["tr_sv1"] = dsv[0]
        if m.sv.shape[0] > 1:
            out["tr_sv2"] = dsv[1]
        return out
