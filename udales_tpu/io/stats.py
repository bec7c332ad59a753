"""Time/space-averaged statistics (src/modstatsdump.f90 xytdump family).

The reference samples masked slab averages every `tsample` and writes their
time means every `tstatsdump` to ``xytdump.<exp>.nc`` (names at
modstatsdump.f90:248-271).  The accumulator here is a jitted pure function so
sampling costs one fused pass over the fields.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.thermo import avexy_masked
from .netcdf import NCWriter


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class XYTAccum:
    n: Any
    u: Any; v: Any; w: Any; thl: Any; qt: Any; p: Any
    uu: Any; vv: Any; ww: Any; thl2: Any
    uw: Any; wthl: Any


def zero_accum(nz, dtype):
    z = lambda n: jnp.zeros(n, dtype)
    return XYTAccum(n=jnp.zeros((), dtype),
                    u=z(nz), v=z(nz), w=z(nz + 1), thl=z(nz), qt=z(nz),
                    p=z(nz), uu=z(nz), vv=z(nz), ww=z(nz + 1), thl2=z(nz),
                    uw=z(nz + 1), wthl=z(nz + 1))


def sample(acc: XYTAccum, state, masks=None) -> XYTAccum:
    """Accumulate one sample of masked slab averages (modstatsdump.f90
    xytdump sampling; kinematic fluxes at w-levels)."""
    c = state.c
    nx, ny, nz = c.u.shape
    ones3 = jnp.ones_like(c.u)
    IIu = masks.u if masks is not None else ones3
    IIv = masks.v if masks is not None else ones3
    IIc = masks.c if masks is not None else ones3
    IIw = masks.w if masks is not None else jnp.ones_like(c.w)

    av = avexy_masked
    u_av = av(c.u, IIu)
    v_av = av(c.v, IIv)
    w_av = av(c.w, IIw)
    thl_av = av(c.thl, IIc)
    qt_av = av(c.qt, IIc)
    p_av = av(state.pres, IIc)
    uu_av = av(c.u ** 2, IIu)
    vv_av = av(c.v ** 2, IIv)
    ww_av = av(c.w ** 2, IIw)
    thl2_av = av(c.thl ** 2, IIc)
    # kinematic fluxes at w-levels (interpolated to the uw/wc positions)
    u_at_w = jnp.concatenate(
        [c.u[..., :1], 0.5 * (c.u[..., 1:] + c.u[..., :-1]), c.u[..., -1:]],
        axis=2)
    thl_at_w = jnp.concatenate(
        [c.thl[..., :1], 0.5 * (c.thl[..., 1:] + c.thl[..., :-1]),
         c.thl[..., -1:]], axis=2)
    uw_av = av(u_at_w * c.w, IIw)
    wthl_av = av(thl_at_w * c.w, IIw)
    clean = lambda a: jnp.where(a < -900.0, 0.0, a)
    return XYTAccum(
        n=acc.n + 1,
        u=acc.u + clean(u_av), v=acc.v + clean(v_av),
        w=acc.w + clean(w_av),
        thl=acc.thl + clean(thl_av), qt=acc.qt + clean(qt_av),
        p=acc.p + clean(p_av),
        uu=acc.uu + clean(uu_av), vv=acc.vv + clean(vv_av),
        ww=acc.ww + clean(ww_av), thl2=acc.thl2 + clean(thl2_av),
        uw=acc.uw + clean(uw_av), wthl=acc.wthl + clean(wthl_av))


class TKEDump:
    """Resolved TKE budget profiles (modstatsdump ltkedump /
    modstatistics.tkestats): shear production, buoyancy, turbulent
    transport, pressure transport, SGS dissipation, and the TKE itself,
    written to tkedump.<exp>.nc every tstatsdump."""

    _VARS = [
        ("tke", ("zt",), "m^2/s^2"),
        ("shear", ("zt",), "m^2/s^3"),
        ("buoy", ("zt",), "m^2/s^3"),
        ("ttrans", ("zt",), "m^2/s^3"),
        ("ptrans", ("zt",), "m^2/s^3"),
        ("sgsdiss", ("zt",), "m^2/s^3"),
        ("resid", ("zt",), "m^2/s^3"),
    ]

    def __init__(self, cfg, grid, outdir: str | Path = ".", model=None):
        self.cfg = cfg
        self.grid = grid
        self.model = model
        exp = f"{cfg.run.iexpnr:03d}"
        self.writer = NCWriter(Path(outdir) / f"tkedump.{exp}.nc", grid)
        for name, dims, units in self._VARS:
            self.writer.define(name, dims, units)
        self._zero()
        self.tnext_sample = cfg.output.tsample
        self.tnext_write = cfg.output.tstatsdump
        self._acc_jit = jax.jit(self._acc)

    def _zero(self):
        nz = self.grid.ktot
        dt = self.grid.dtype
        z = lambda n=nz: jnp.zeros(n, dt)
        self.acc = dict(n=jnp.zeros((), dt), u=z(), v=z(), w=z(nz + 1),
                        uu=z(), vv=z(), ww=z(nz + 1), uw=z(nz + 1),
                        wthv=z(nz + 1), thvw=z(nz + 1), we=z(nz + 1),
                        wp=z(nz + 1), eps=z())

    def _acc(self, acc, state):
        from ..ops.thermo import slab_mean
        c = state.c
        nz = self.grid.ktot
        av = slab_mean
        u_at_w = jnp.concatenate(
            [c.u[..., :1], 0.5 * (c.u[..., 1:] + c.u[..., :-1]),
             c.u[..., -1:]], axis=2)
        v_at_w = jnp.concatenate(
            [c.v[..., :1], 0.5 * (c.v[..., 1:] + c.v[..., :-1]),
             c.v[..., -1:]], axis=2)
        thv_at_w = jnp.concatenate(
            [c.thl[..., :1], 0.5 * (c.thl[..., 1:] + c.thl[..., :-1]),
             c.thl[..., -1:]], axis=2)
        e_at_w = 0.5 * (u_at_w ** 2 + v_at_w ** 2 + c.w ** 2)
        p_at_w = jnp.concatenate(
            [state.pres[..., :1],
             0.5 * (state.pres[..., 1:] + state.pres[..., :-1]),
             state.pres[..., -1:]], axis=2)
        # SGS dissipation estimate: ekm * 2 S_ij S_ij from the closure
        from ..ops import subgrid as sgs
        from ..run import _velocity_ghosts
        g = _velocity_ghosts(c, self.model.cfg, self.grid)
        s2 = sgs._strain2(g, self.grid)
        ekm, ekh, _ = sgs.closure(g, self.grid, self.model.cfg, e12=c.e12,
                                  dthvdz=None, thl=c.thl, thvs=288.0)
        eps = av(ekm * 2.0 * s2)
        return dict(
            n=acc["n"] + 1,
            u=acc["u"] + av(c.u), v=acc["v"] + av(c.v),
            w=acc["w"] + av(c.w),
            uu=acc["uu"] + av(c.u ** 2), vv=acc["vv"] + av(c.v ** 2),
            ww=acc["ww"] + av(c.w ** 2),
            uw=acc["uw"] + av(u_at_w * c.w),
            wthv=acc["wthv"] + av(thv_at_w * c.w),
            thvw=acc["thvw"] + av(thv_at_w),
            we=acc["we"] + av(e_at_w * c.w),
            wp=acc["wp"] + av(p_at_w * c.w),
            eps=acc["eps"] + eps)

    def maybe_sample(self, state):
        t = float(state.timee)
        if t < self.tnext_sample:
            return
        self.tnext_sample += self.cfg.output.tsample
        self.acc = self._acc_jit(self.acc, state)
        if t >= self.tnext_write:
            self.tnext_write += self.cfg.output.tstatsdump
            self.write(t)

    def write(self, t):
        from ..config import const
        a = {k: np.asarray(v) for k, v in jax.device_get(self.acc).items()}
        n = max(float(a["n"]), 1.0)
        g = self.grid
        nz = g.ktot
        m = lambda k: a[k] / n
        u, v, w = m("u"), m("v"), m("w")
        u_w = np.concatenate([u[:1], 0.5 * (u[1:] + u[:-1]), u[-1:]])
        upwp = m("uw") - u_w * w
        dudz = np.zeros(nz + 1)
        dudz[1:nz] = (u[1:] - u[:-1]) / g.dzh[1:nz]
        shear_w = -upwp * dudz
        shear = 0.5 * (shear_w[1:] + shear_w[:-1])
        thv_mean_w = m("thvw")
        wpthvp = m("wthv") - w * thv_mean_w
        buoy_w = const.grav / np.maximum(thv_mean_w, 1.0) * wpthvp
        buoy = 0.5 * (buoy_w[1:] + buoy_w[:-1])
        we = m("we")
        ttrans = -(we[1:] - we[:-1]) / g.dzf
        wp_ = m("wp")
        ptrans = -(wp_[1:] - wp_[:-1]) / g.dzf
        up2 = m("uu") - u ** 2
        vp2 = m("vv") - v ** 2
        wp2 = m("ww") - w ** 2
        tke = 0.5 * (up2 + vp2 + 0.5 * (wp2[1:] + wp2[:-1]))
        sgsdiss = -m("eps")
        resid = shear + buoy + ttrans + ptrans + sgsdiss
        self.writer.append(t, {
            "tke": tke, "shear": shear, "buoy": buoy, "ttrans": ttrans,
            "ptrans": ptrans, "sgsdiss": sgsdiss, "resid": resid})
        self._zero()

    def close(self):
        self.writer.close()


class TDump:
    """3-D time-averaged fields + second moments (modstatsdump ltdump):
    writes `tdump.<exp>.nc` every tstatsdump with time means of u,v,w,thl,
    qt, scalars and the resolved flux/variance products."""

    def __init__(self, cfg, grid, outdir: str | Path = ".", nsv: int = 0):
        self.cfg = cfg
        self.grid = grid
        self.nsv = nsv
        exp = f"{cfg.run.iexpnr:03d}"
        self.writer = NCWriter(Path(outdir) / f"tdump.{exp}.nc", grid)
        for name, dims in (("ut", ("zt", "yt", "xm")),
                           ("vt", ("zt", "ym", "xt")),
                           ("wt", ("zm", "yt", "xt")),
                           ("thlt", ("zt", "yt", "xt")),
                           ("qtt", ("zt", "yt", "xt")),
                           ("upwpt", ("zm", "yt", "xt")),
                           ("wpthlpt", ("zm", "yt", "xt")),
                           ("upupt", ("zt", "yt", "xm")),
                           ("wpwpt", ("zm", "yt", "xt"))):
            self.writer.define(name, dims)
        for n in range(nsv):
            self.writer.define(f"sca{n+1}t", ("zt", "yt", "xt"))
        self._zero()
        self.tnext_sample = cfg.output.tsample
        self.tnext_write = cfg.output.tstatsdump
        self._acc_jit = jax.jit(self._acc)

    def _zero(self):
        nx, ny, nz = self.grid.shape
        dt = self.grid.dtype
        z = lambda *s: jnp.zeros(s, dt)
        self.acc = dict(n=jnp.zeros((), dt),
                        u=z(nx, ny, nz), v=z(nx, ny, nz),
                        w=z(nx, ny, nz + 1), thl=z(nx, ny, nz),
                        qt=z(nx, ny, nz), uu=z(nx, ny, nz),
                        ww=z(nx, ny, nz + 1), uw=z(nx, ny, nz + 1),
                        wthl=z(nx, ny, nz + 1),
                        sv=z(self.nsv, nx, ny, nz))

    @staticmethod
    def _acc(acc, state):
        c = state.c
        u_at_w = jnp.concatenate(
            [c.u[..., :1], 0.5 * (c.u[..., 1:] + c.u[..., :-1]),
             c.u[..., -1:]], axis=2)
        thl_at_w = jnp.concatenate(
            [c.thl[..., :1], 0.5 * (c.thl[..., 1:] + c.thl[..., :-1]),
             c.thl[..., -1:]], axis=2)
        return dict(
            n=acc["n"] + 1, u=acc["u"] + c.u, v=acc["v"] + c.v,
            w=acc["w"] + c.w, thl=acc["thl"] + c.thl, qt=acc["qt"] + c.qt,
            uu=acc["uu"] + c.u ** 2, ww=acc["ww"] + c.w ** 2,
            uw=acc["uw"] + u_at_w * c.w,
            wthl=acc["wthl"] + thl_at_w * c.w,
            sv=acc["sv"] + c.sv)

    def maybe_sample(self, state):
        t = float(state.timee)
        if t < self.tnext_sample:
            return
        self.tnext_sample += self.cfg.output.tsample
        self.acc = self._acc_jit(self.acc, state)
        if t >= self.tnext_write:
            self.tnext_write += self.cfg.output.tstatsdump
            self.write(t)

    def write(self, t):
        a = {k: np.asarray(v) for k, v in jax.device_get(self.acc).items()}
        n = max(float(a["n"]), 1.0)
        nz = self.grid.ktot
        m = lambda k: a[k] / n
        u, w, thl = m("u"), m("w"), m("thl")
        u_at_w = np.concatenate(
            [u[..., :1], 0.5 * (u[..., 1:] + u[..., :-1]), u[..., -1:]],
            axis=2)
        thl_at_w = np.concatenate(
            [thl[..., :1], 0.5 * (thl[..., 1:] + thl[..., :-1]),
             thl[..., -1:]], axis=2)
        data = {
            "ut": u, "vt": m("v"), "wt": w[..., :nz], "thlt": thl,
            "qtt": m("qt"),
            "upwpt": (m("uw") - u_at_w * w)[..., :nz],
            "wpthlpt": (m("wthl") - thl_at_w * w)[..., :nz],
            "upupt": m("uu") - u ** 2,
            "wpwpt": (m("ww") - w ** 2)[..., :nz],
        }
        sv = m("sv")
        for i in range(self.nsv):
            data[f"sca{i+1}t"] = sv[i]
        self.writer.append(t, data)
        self._zero()

    def close(self):
        self.writer.close()


class MinTDump:
    """Minimal 3-D time-averaged prognostics (modstatsdump lmintdump,
    modstatsdump.f90:341-363,1670-1684): writes mintdump.<exp>.nc with
    time means of u, v, w, thl, qt, p every tstatsdump."""

    def __init__(self, cfg, grid, outdir: str | Path = "."):
        self.cfg = cfg
        self.grid = grid
        exp = f"{cfg.run.iexpnr:03d}"
        self.writer = NCWriter(Path(outdir) / f"mintdump.{exp}.nc", grid)
        for name, dims in (("ut", ("zt", "yt", "xm")),
                           ("vt", ("zt", "ym", "xt")),
                           ("wt", ("zm", "yt", "xt")),
                           ("thlt", ("zt", "yt", "xt")),
                           ("qtt", ("zt", "yt", "xt")),
                           ("pt", ("zt", "yt", "xt"))):
            self.writer.define(name, dims)
        self._zero()
        self.tnext_sample = cfg.output.tsample
        self.tnext_write = cfg.output.tstatsdump

        def acc_fn(acc, state):
            c = state.c
            return dict(n=acc["n"] + 1, u=acc["u"] + c.u, v=acc["v"] + c.v,
                        w=acc["w"] + c.w, thl=acc["thl"] + c.thl,
                        qt=acc["qt"] + c.qt, p=acc["p"] + state.pres)
        self._acc_jit = jax.jit(acc_fn)

    def _zero(self):
        nx, ny, nz = self.grid.shape
        dt = self.grid.dtype
        z = lambda *s: jnp.zeros(s, dt)
        self.acc = dict(n=jnp.zeros((), dt), u=z(nx, ny, nz),
                        v=z(nx, ny, nz), w=z(nx, ny, nz + 1),
                        thl=z(nx, ny, nz), qt=z(nx, ny, nz),
                        p=z(nx, ny, nz))

    def maybe_sample(self, state):
        t = float(state.timee)
        if t < self.tnext_sample:
            return
        self.tnext_sample += self.cfg.output.tsample
        self.acc = self._acc_jit(self.acc, state)
        if t >= self.tnext_write:
            self.tnext_write += self.cfg.output.tstatsdump
            self.write(t)

    def write(self, t):
        a = {k: np.asarray(v) for k, v in jax.device_get(self.acc).items()}
        n = max(float(a["n"]), 1.0)
        nz = self.grid.ktot
        self.writer.append(t, {
            "ut": a["u"] / n, "vt": a["v"] / n, "wt": a["w"][..., :nz] / n,
            "thlt": a["thl"] / n, "qtt": a["qt"] / n, "pt": a["p"] / n})
        self._zero()

    def close(self):
        self.writer.close()


class TreeDump:
    """Time-averaged vegetation source terms (modstatsdump ltreedump,
    modstatsdump.f90:364-390,1237-1290): writes treedump.<exp>.nc with
    means of the canopy drag/energy-balance/deposition tendencies."""

    VARS = ("tr_u", "tr_v", "tr_w", "tr_thl", "tr_qt", "tr_qtR", "tr_qtA",
            "tr_sv1", "tr_sv2", "tr_omega")

    def __init__(self, cfg, grid, vegetation, outdir: str | Path = "."):
        self.cfg = cfg
        self.grid = grid
        self.veg = vegetation
        exp = f"{cfg.run.iexpnr:03d}"
        self.writer = NCWriter(Path(outdir) / f"treedump.{exp}.nc", grid)
        for name in self.VARS:
            zdim = "zm" if name == "tr_w" else "zt"
            self.writer.define(name, (zdim, "yt", "xt"))
        self._zero()
        self.tnext_sample = cfg.output.tsample
        self.tnext_write = cfg.output.tstatsdump

        def acc_fn(acc, state):
            d = vegetation.diagnostics(state.c)
            out = {k: acc[k] + d[k] for k in self.VARS}
            out["n"] = acc["n"] + 1
            return out
        self._acc_jit = jax.jit(acc_fn)

    def _zero(self):
        nx, ny, nz = self.grid.shape
        dt = self.grid.dtype
        self.acc = {k: jnp.zeros((nx, ny, nz), dt) for k in self.VARS}
        self.acc["n"] = jnp.zeros((), dt)

    def maybe_sample(self, state):
        t = float(state.timee)
        if t < self.tnext_sample:
            return
        self.tnext_sample += self.cfg.output.tsample
        self.acc = self._acc_jit(self.acc, state)
        if t >= self.tnext_write:
            self.tnext_write += self.cfg.output.tstatsdump
            self.write(t)

    def write(self, t):
        a = {k: np.asarray(v) for k, v in jax.device_get(self.acc).items()}
        n = max(float(a["n"]), 1.0)
        self.writer.append(t, {k: a[k] / n for k in self.VARS})
        self._zero()

    def close(self):
        self.writer.close()


class SliceDump:
    """Instantaneous k/i/j slices every tsample (modstatsdump l*slicedump):
    kslicedump.<exp>.nc etc."""

    def __init__(self, cfg, grid, outdir: str | Path = ".", nsv: int = 0):
        self.cfg = cfg
        self.grid = grid
        self.writers = {}
        exp = f"{cfg.run.iexpnr:03d}"
        o = cfg.output
        if o.lkslicedump:
            w = NCWriter(Path(outdir) / f"kslicedump.{exp}.nc", grid)
            for v in ("uk", "vk", "wk", "thlk"):
                w.define(v, ("yt", "xt"))
            self.writers["k"] = w
        if o.lislicedump:
            w = NCWriter(Path(outdir) / f"islicedump.{exp}.nc", grid)
            for v in ("ui", "vi", "wi", "thli"):
                w.define(v, ("zt", "yt"))
            self.writers["i"] = w
        if o.ljslicedump:
            w = NCWriter(Path(outdir) / f"jslicedump.{exp}.nc", grid)
            for v in ("uj", "vj", "wj", "thlj"):
                w.define(v, ("zt", "xt"))
            self.writers["j"] = w
        self.tnext = cfg.output.tsample

    def maybe_dump(self, state):
        t = float(state.timee)
        if t < self.tnext or not self.writers:
            return
        self.tnext += self.cfg.output.tsample
        c = state.c
        o = self.cfg.output
        nz = self.grid.ktot
        if "k" in self.writers:
            k = min(o.kslice - 1, nz - 1)
            self.writers["k"].append(t, {
                "uk": np.asarray(c.u[:, :, k]).T,
                "vk": np.asarray(c.v[:, :, k]).T,
                "wk": np.asarray(c.w[:, :, k]).T,
                "thlk": np.asarray(c.thl[:, :, k]).T})
        if "i" in self.writers:
            i = min(o.islice - 1, self.grid.itot - 1)
            self.writers["i"].append(t, {
                "ui": np.asarray(c.u[i]).T, "vi": np.asarray(c.v[i]).T,
                "wi": np.asarray(c.w[i, :, :nz]).T,
                "thli": np.asarray(c.thl[i]).T})
        if "j" in self.writers:
            j = min(o.jslice - 1, self.grid.jtot - 1)
            self.writers["j"].append(t, {
                "uj": np.asarray(c.u[:, j]).T, "vj": np.asarray(c.v[:, j]).T,
                "wj": np.asarray(c.w[:, j, :nz]).T,
                "thlj": np.asarray(c.thl[:, j]).T})

    def close(self):
        for w in self.writers.values():
            w.close()


class YTDump:
    """y- and time-averaged x-z statistics (modstatsdump lytdump):
    ytdump.<exp>.nc."""

    def __init__(self, cfg, grid, outdir: str | Path = ".", masks=None):
        self.cfg = cfg
        self.grid = grid
        exp = f"{cfg.run.iexpnr:03d}"
        self.writer = NCWriter(Path(outdir) / f"ytdump.{exp}.nc", grid)
        for v in ("uyt", "vyt", "wyt", "thlyt", "qtyt"):
            self.writer.define(v, ("zt", "xt"))
        self._zero()
        self.tnext_sample = cfg.output.tsample
        self.tnext_write = cfg.output.tstatsdump

        def acc_fn(acc, state, masks):
            c = state.c
            ones = jnp.ones_like(c.u)
            mu = masks.u if masks is not None else ones
            mv = masks.v if masks is not None else ones
            mc = masks.c if masks is not None else ones
            mw = masks.w if masks is not None else jnp.ones_like(c.w)
            nz = c.u.shape[2]
            avy = lambda f, mk: jnp.sum(f * mk, axis=1) / jnp.maximum(
                jnp.sum(mk, axis=1), 1.0)
            return dict(
                n=acc["n"] + 1,
                u=acc["u"] + avy(c.u, mu), v=acc["v"] + avy(c.v, mv),
                w=acc["w"] + avy(c.w[..., :nz], mw[..., :nz]),
                thl=acc["thl"] + avy(c.thl, mc),
                qt=acc["qt"] + avy(c.qt, mc))
        self._acc_jit = jax.jit(acc_fn)

    def _zero(self):
        nx, _, nz = self.grid.shape
        dt = self.grid.dtype
        z = lambda: jnp.zeros((nx, nz), dt)
        self.acc = dict(n=jnp.zeros((), dt), u=z(), v=z(), w=z(),
                        thl=z(), qt=z())

    def maybe_sample(self, state, masks=None):
        t = float(state.timee)
        if t < self.tnext_sample:
            return
        self.tnext_sample += self.cfg.output.tsample
        self.acc = self._acc_jit(self.acc, state, masks)
        if t >= self.tnext_write:
            self.tnext_write += self.cfg.output.tstatsdump
            a = {k: np.asarray(v) for k, v in
                 jax.device_get(self.acc).items()}
            n = max(float(a["n"]), 1.0)
            self.writer.append(t, {
                "uyt": a["u"] / n, "vyt": a["v"] / n, "wyt": a["w"] / n,
                "thlyt": a["thl"] / n, "qtyt": a["qt"] / n})
            self._zero()

    def close(self):
        self.writer.close()


class XYDump:
    """Instantaneous slab-average profiles every tsample (modstatsdump
    lxydump): xydump.<exp>.nc."""

    def __init__(self, cfg, grid, outdir: str | Path = "."):
        self.cfg = cfg
        self.grid = grid
        exp = f"{cfg.run.iexpnr:03d}"
        self.writer = NCWriter(Path(outdir) / f"xydump.{exp}.nc", grid)
        for v, d in (("uxy", "zt"), ("vxy", "zt"), ("wxy", "zm"),
                     ("thlxy", "zt"), ("qtxy", "zt")):
            self.writer.define(v, (d,))
        self.tnext = cfg.output.tsample

        def fn(state, masks):
            c = state.c
            ones = jnp.ones_like(c.u)
            IIu = masks.u if masks is not None else ones
            IIv = masks.v if masks is not None else ones
            IIc = masks.c if masks is not None else ones
            IIw = masks.w if masks is not None else jnp.ones_like(c.w)
            cl = lambda a: jnp.where(a < -900.0, 0.0, a)
            return (cl(avexy_masked(c.u, IIu)), cl(avexy_masked(c.v, IIv)),
                    cl(avexy_masked(c.w, IIw)),
                    cl(avexy_masked(c.thl, IIc)),
                    cl(avexy_masked(c.qt, IIc)))
        self._fn = jax.jit(fn)

    def maybe_dump(self, state, masks=None):
        t = float(state.timee)
        if t < self.tnext:
            return
        self.tnext += self.cfg.output.tsample
        u, v, w, thl, qt = [np.asarray(x) for x in self._fn(state, masks)]
        nz = self.grid.ktot
        self.writer.append(t, {"uxy": u, "vxy": v, "wxy": w[:nz],
                               "thlxy": thl, "qtxy": qt})

    def close(self):
        self.writer.close()


class YDump:
    """Instantaneous y-averaged x-z fields every tsample (modstatsdump
    lydump): ydump.<exp>.nc."""

    def __init__(self, cfg, grid, outdir: str | Path = "."):
        self.cfg = cfg
        self.grid = grid
        exp = f"{cfg.run.iexpnr:03d}"
        self.writer = NCWriter(Path(outdir) / f"ydump.{exp}.nc", grid)
        for v in ("uy", "vy", "wy", "thly", "qty"):
            self.writer.define(v, ("zt", "xt"))
        self.tnext = cfg.output.tsample

        def fn(state, masks):
            c = state.c
            nz = c.u.shape[2]
            ones = jnp.ones_like(c.u)
            mk = lambda m: m if masks is None else m
            IIu = masks.u if masks is not None else ones
            IIv = masks.v if masks is not None else ones
            IIc = masks.c if masks is not None else ones
            IIw = masks.w if masks is not None else jnp.ones_like(c.w)
            avy = lambda f, M: jnp.sum(f * M, axis=1) / jnp.maximum(
                jnp.sum(M, axis=1), 1.0)
            return (avy(c.u, IIu), avy(c.v, IIv),
                    avy(c.w[..., :nz], IIw[..., :nz]),
                    avy(c.thl, IIc), avy(c.qt, IIc))
        self._fn = jax.jit(fn)

    def maybe_dump(self, state, masks=None):
        t = float(state.timee)
        if t < self.tnext:
            return
        self.tnext += self.cfg.output.tsample
        u, v, w, thl, qt = [np.asarray(x) for x in self._fn(state, masks)]
        self.writer.append(t, {"uy": u, "vy": v, "wy": w, "thly": thl,
                               "qty": qt})

    def close(self):
        self.writer.close()


class XYTDump:
    """xytdump writer: time-mean profiles + derived turbulent moments."""

    _VARS = [
        ("uxyt", ("zt",), "m/s"), ("vxyt", ("zt",), "m/s"),
        ("wxyt", ("zm",), "m/s"), ("thlxyt", ("zt",), "K"),
        ("qtxyt", ("zt",), "kg/kg"), ("pxyt", ("zt",), "m^2/s^2"),
        ("upuptxyc", ("zt",), "m^2/s^2"), ("vpvptxyc", ("zt",), "m^2/s^2"),
        ("wpwptxyc", ("zt",), "m^2/s^2"), ("thlpthlptxy", ("zt",), "K^2"),
        ("uwxyt", ("zm",), "m^2/s^2"), ("wthlxyt", ("zm",), "K m/s"),
        ("upwpxyt", ("zm",), "m^2/s^2"), ("wpthlpxyt", ("zm",), "K m/s"),
        ("tketxyc", ("zt",), "m^2/s^2"),
    ]

    def __init__(self, cfg, grid, outdir: str | Path = "."):
        self.cfg = cfg
        self.grid = grid
        exp = f"{cfg.run.iexpnr:03d}"
        # zm here has nz entries; w-level profiles are written on faces 0..nz-1
        self.writer = NCWriter(Path(outdir) / f"xytdump.{exp}.nc", grid)
        for name, dims, units in self._VARS:
            self.writer.define(name, dims, units)
        self.acc = zero_accum(grid.ktot, grid.dtype)
        self.tnext_sample = cfg.output.tsample
        self.tnext_write = cfg.output.tstatsdump
        self._sample_jit = jax.jit(sample)

    def maybe_sample(self, state, masks=None):
        t = float(state.timee)
        if t < self.tnext_sample:
            return
        self.tnext_sample += self.cfg.output.tsample
        self.acc = self._sample_jit(self.acc, state, masks)
        if t >= self.tnext_write:
            self.tnext_write += self.cfg.output.tstatsdump
            self.write(t)

    def write(self, t):
        a = jax.device_get(self.acc)
        n = max(float(a.n), 1.0)
        nz = self.grid.ktot
        m = lambda x: np.asarray(x) / n
        u, v, w = m(a.u), m(a.v), m(a.w)
        thl, qt, p = m(a.thl), m(a.qt), m(a.p)
        uu, vv, ww, thl2 = m(a.uu), m(a.vv), m(a.ww), m(a.thl2)
        uw, wthl = m(a.uw), m(a.wthl)
        u_at_w = np.concatenate([u[:1], 0.5 * (u[1:] + u[:-1]), u[-1:]])
        thl_at_w = np.concatenate([thl[:1], 0.5 * (thl[1:] + thl[:-1]),
                                   thl[-1:]])
        upwp = uw - u_at_w * w
        wpthlp = wthl - thl_at_w * w
        up2 = uu - u ** 2
        vp2 = vv - v ** 2
        wp2c = (ww - w ** 2)
        wp2c = 0.5 * (wp2c[1:] + wp2c[:-1])
        data = {
            "uxyt": u, "vxyt": v, "wxyt": w[:nz], "thlxyt": thl,
            "qtxyt": qt, "pxyt": p,
            "upuptxyc": up2, "vpvptxyc": vp2, "wpwptxyc": wp2c,
            "thlpthlptxy": thl2 - thl ** 2,
            "uwxyt": uw[:nz], "wthlxyt": wthl[:nz],
            "upwpxyt": upwp[:nz], "wpthlpxyt": wpthlp[:nz],
            "tketxyc": 0.5 * (up2 + vp2 + wp2c),
        }
        self.writer.append(t, data)
        self.acc = zero_accum(nz, self.grid.dtype)

    def close(self):
        self.writer.close()
