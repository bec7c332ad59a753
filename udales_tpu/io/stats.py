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
