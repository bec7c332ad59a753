"""Pallas TPU mega-kernel for the momentum-diffusion sweeps.

The XLA lowering of the momentum-diffusion stencils (ops/subgrid.diff_u/v/w,
reference modsubgrid.f90:672-997) materializes each viscosity coefficient and
flux-difference term as a full HBM temporary — measured ~19 ms of an 80 ms
step at 256^3 against a ~2 ms bandwidth floor.  This kernel fuses all three
sweeps so no intermediate ever touches HBM.

TPU-shape notes (the constraints that shaped this design; measured on the
axon v5e backend):
  - Mosaic only slices the minor (lane) dimension at 128-aligned sizes, so
    vertical (z = minor) stencil shifts are `pltpu.roll` of a lane-padded
    full-width row (W = nz+2 rounded up to 128); every term is evaluated at
    full width on a common index c' (= cell k+1 / face k+1) and the caller
    slices the interior off the kernel outputs with ordinary XLA ops.
  - Manual `make_async_copy` DMA combined with a pallas grid crashes this
    TPU worker, so the x-halo is expressed instead as three *block views* of
    the same ghosted input: block size 1 in x with index maps i -> i+1+di
    for di in (-1, 0, +1). Same HBM array, three pipelined windows, zero
    copies.
  - Captured array constants are forbidden, so the vertical metric lines
    arrive as one (rows, W) input, each row pre-shifted to the c' convention.

Numerics are identical to ops/subgrid (same formulas, same order); tests
compare both paths on random fields. CPU falls back to the jnp path.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import Grid

# metric rows, in the kernel's c' convention: row(a, lo)[c'] = a[lo + c' - 1]
_MROWS = (("dzf_g", 0), ("dzf_g", 1), ("dzf_g", 2),
          ("dzhiq", 0), ("dzhiq", 1),
          ("dzhi", 0), ("dzhi", 1),
          ("dzfi", 0),
          ("dzfi_g", 0), ("dzfi_g", 1))


def _metric_rows(grid: Grid, W: int):
    rows = []
    for name, lo in _MROWS:
        a = np.asarray(grid.j(name))
        idx = np.clip(np.arange(W) + lo - 1, 0, len(a) - 1)
        rows.append(a[idx])
    return np.stack(rows).astype(grid.dtype)


def fused_diff_mom(g, grid: Grid):
    """diff_u + diff_v + diff_w in one Pallas kernel (TPU); plain jnp path on
    CPU. Inputs are the h=1 ghosted fields of ops/boundary."""
    from . import subgrid as sgs
    interpret = os.environ.get("UDALES_PALLAS_INTERPRET") == "1"
    # Default OFF: on the current v5e runtime the kernel is bit-exact but
    # LOSES to the XLA lowering (10.2 vs 5.6 ms/step at 128^3) — the Mosaic
    # 128-lane alignment rule forces 2x lane padding for nz+2-wide rows and
    # the x-halo costs a 3x block re-read. Revisit with an interior-exact
    # layout + boundary fixups; opt in with UDALES_PALLAS=1.
    if not interpret and (jax.default_backend() == "cpu"
                          or os.environ.get("UDALES_PALLAS") != "1"):
        return sgs.diff_u(g, grid), sgs.diff_v(g, grid), sgs.diff_w(g, grid)

    nx, ny, nz = grid.shape
    W = -(-(nz + 2) // 128) * 128
    dtype = g.u.dtype
    dxi, dyi = grid.dxi, grid.dyi
    dx2i, dy2i = grid.dx2i, grid.dy2i
    mrows = jnp.asarray(_metric_rows(grid, W))
    zpad = lambda f: jnp.pad(f, ((0, 0), (0, 0), (0, W - f.shape[2])))
    gu_p, gv_p, ge_p, gw_p = zpad(g.u), zpad(g.v), zpad(g.ekm), zpad(g.w)

    def kernel(*refs):
        (um, u0, up, vm, v0, vp, wm, w0, wp, em, e0, ep, m_ref,
         du_ref, dv_ref, dw_ref) = refs
        uv = {-1: um, 0: u0, 1: up}
        vv = {-1: vm, 0: v0, 1: vp}
        wv = {-1: wm, 0: w0, 1: wp}
        ev = {-1: em, 0: e0, 1: ep}

        m = {key: m_ref[r, :][None, None, :] for r, key in enumerate(_MROWS)}
        dzf_km, dzf_k, dzf_kp = (m[("dzf_g", 0)], m[("dzf_g", 1)],
                                 m[("dzf_g", 2)])
        dzhiq_k, dzhiq_kp = m[("dzhiq", 0)], m[("dzhiq", 1)]
        dzhi_k, dzhi_kp = m[("dzhi", 0)], m[("dzhi", 1)]
        dzfi_k = m[("dzfi", 0)]
        dzfiw_km, dzfiw_k = m[("dzfi_g", 0)], m[("dzfi_g", 1)]

        # Sv(views, di, dj, s)[c'] = f[x+di, y+dj, c'+s]
        def Sv(views, di, dj, s):
            b = views[di][:]
            if s:
                b = pltpu.roll(b, (W - s) % W, 2)
            return b[:, 1 + dj: 1 + dj + ny, :]

        S = lambda fv, di, dj, dk: Sv(fv, di, dj, dk)     # cell rows
        Sw = lambda di, dj, dk: Sv(wv, di, dj, dk - 1)    # faces @ cell rows
        wf = Sw                                           # faces @ face rows
        C = lambda fv, di, dj, dk: Sv(fv, di, dj, dk - 1)  # cells @ face rows

        # ---- diff_u (modsubgrid.f90:672-775) ----------------------------
        ekm_c = S(ev, 0, 0, 0)
        ekm_im = S(ev, -1, 0, 0)
        emom = (dzf_km * (ekm_c + ekm_im)
                + dzf_k * (S(ev, 0, 0, -1) + S(ev, -1, 0, -1))) * dzhiq_k
        emop = (dzf_kp * (ekm_c + ekm_im)
                + dzf_k * (S(ev, 0, 0, 1) + S(ev, -1, 0, 1))) * dzhiq_kp
        empo = 0.25 * (ekm_c + S(ev, 0, 1, 0) + ekm_im + S(ev, -1, 1, 0))
        emmo = 0.25 * (ekm_c + S(ev, 0, -1, 0) + S(ev, -1, -1, 0) + ekm_im)
        uc = S(uv, 0, 0, 0)
        t_x = (ekm_c * (S(uv, 1, 0, 0) - uc)
               - ekm_im * (uc - S(uv, -1, 0, 0))) * 2.0 * dx2i
        t_y = (empo * ((S(uv, 0, 1, 0) - uc) * dyi
                       + (S(vv, 0, 1, 0) - S(vv, -1, 1, 0)) * dxi)
               - emmo * ((uc - S(uv, 0, -1, 0)) * dyi
                         + (S(vv, 0, 0, 0) - S(vv, -1, 0, 0)) * dxi)) * dyi
        t_z = (emop * ((S(uv, 0, 0, 1) - uc) * dzhi_kp
                       + (Sw(0, 0, 1) - Sw(-1, 0, 1)) * dxi)
               - emom * ((uc - S(uv, 0, 0, -1)) * dzhi_k
                         + (Sw(0, 0, 0) - Sw(-1, 0, 0)) * dxi)) * dzfi_k
        du_ref[:] = t_x + t_y + t_z

        # ---- diff_v (modsubgrid.f90:778-886) ----------------------------
        ekm_jm = S(ev, 0, -1, 0)
        eomm = (dzf_km * (ekm_c + ekm_jm)
                + dzf_k * (S(ev, 0, 0, -1) + S(ev, 0, -1, -1))) * dzhiq_k
        eomp = (dzf_kp * (ekm_c + ekm_jm)
                + dzf_k * (S(ev, 0, 0, 1) + S(ev, 0, -1, 1))) * dzhiq_kp
        emmo = 0.25 * (ekm_c + ekm_jm + S(ev, -1, -1, 0) + S(ev, -1, 0, 0))
        epmo = 0.25 * (ekm_c + ekm_jm + S(ev, 1, -1, 0) + S(ev, 1, 0, 0))
        vc = S(vv, 0, 0, 0)
        t_x = (epmo * ((S(vv, 1, 0, 0) - vc) * dxi
                       + (S(uv, 1, 0, 0) - S(uv, 1, -1, 0)) * dyi)
               - emmo * ((vc - S(vv, -1, 0, 0)) * dxi
                         + (S(uv, 0, 0, 0) - S(uv, 0, -1, 0)) * dyi)) * dxi
        t_y = (ekm_c * (S(vv, 0, 1, 0) - vc)
               - ekm_jm * (vc - S(vv, 0, -1, 0))) * 2.0 * dy2i
        t_z = (eomp * ((S(vv, 0, 0, 1) - vc) * dzhi_kp
                       + (Sw(0, 0, 1) - Sw(0, -1, 1)) * dyi)
               - eomm * ((vc - S(vv, 0, 0, -1)) * dzhi_k
                         + (Sw(0, 0, 0) - Sw(0, -1, 0)) * dyi)) * dzfi_k
        dv_ref[:] = t_x + t_y + t_z

        # ---- diff_w (modsubgrid.f90:890-997), evaluated at face rows
        # kf = c'-1: C(A,..,dk)[c'] = A_ghost[c'-1+dk], wf(..dk) = w[c'-1+dk];
        # the same metric rows apply (dzf[kf-1] = row(dzf_g,0), etc.) -------
        emom = (dzf_km * (C(ev, 0, 0, 1) + C(ev, -1, 0, 1))
                + dzf_k * (C(ev, 0, 0, 0) + C(ev, -1, 0, 0))) * dzhiq_k
        eomm = (dzf_km * (C(ev, 0, 0, 1) + C(ev, 0, -1, 1))
                + dzf_k * (C(ev, 0, 0, 0) + C(ev, 0, -1, 0))) * dzhiq_k
        eopm = (dzf_km * (C(ev, 0, 0, 1) + C(ev, 0, 1, 1))
                + dzf_k * (C(ev, 0, 0, 0) + C(ev, 0, 1, 0))) * dzhiq_k
        epom = (dzf_km * (C(ev, 0, 0, 1) + C(ev, 1, 0, 1))
                + dzf_k * (C(ev, 0, 0, 0) + C(ev, 1, 0, 0))) * dzhiq_k
        wc = wf(0, 0, 0)
        t_x = (epom * ((wf(1, 0, 0) - wc) * dxi
                       + (C(uv, 1, 0, 1) - C(uv, 1, 0, 0)) * dzhi_k)
               - emom * ((wc - wf(-1, 0, 0)) * dxi
                         + (C(uv, 0, 0, 1) - C(uv, 0, 0, 0)) * dzhi_k)) * dxi
        t_y = (eopm * ((wf(0, 1, 0) - wc) * dyi
                       + (C(vv, 0, 1, 1) - C(vv, 0, 1, 0)) * dzhi_k)
               - eomm * ((wc - wf(0, -1, 0)) * dyi
                         + (C(vv, 0, 0, 1) - C(vv, 0, 0, 0)) * dzhi_k)) * dyi
        t_z = (C(ev, 0, 0, 1) * (wf(0, 0, 1) - wc) * dzfiw_k
               - C(ev, 0, 0, 0) * (wc - wf(0, 0, -1)) * dzfiw_km) \
            * 2.0 * dzhi_k
        dw_ref[:] = t_x + t_y + t_z

    tx = int(os.environ.get("UDALES_PALLAS_TX", "0"))
    if tx <= 0:
        # auto: largest tile fitting ~10MB of double-buffered input blocks
        sub = -(-(ny + 2) // 8) * 8
        for cand in (8, 4, 2, 1):
            if nx % cand == 0 and \
                    12 * 2 * (cand + 1) * sub * W * 4 <= 10 * 2 ** 20:
                tx = cand
                break

    if tx == 1:
        # three block views of the SAME array (no copies): block size 1 in x
        # lets the index map express the +-1 element offsets directly
        def shifted_spec(di):
            return pl.BlockSpec((1, ny + 2, W),
                                lambda i, di=di: (i + 1 + di, 0, 0),
                                memory_space=pltpu.VMEM)
        in_arrays = (gu_p, gu_p, gu_p, gv_p, gv_p, gv_p, gw_p, gw_p, gw_p,
                     ge_p, ge_p, ge_p)
        in_specs = [shifted_spec(d) for _ in range(4) for d in (-1, 0, 1)]
    else:
        # x-shifted copies so larger blocks can use plain index maps
        def views(f):
            return f[0:nx], f[1:1 + nx], f[2:2 + nx]
        in_arrays = (*views(gu_p), *views(gv_p), *views(gw_p), *views(ge_p))
        in_specs = [pl.BlockSpec((tx, ny + 2, W), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)] * 12
    in_specs.append(pl.BlockSpec(mrows.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    out_blk = lambda: pl.BlockSpec((tx, ny, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    out_shapes = tuple(jax.ShapeDtypeStruct((nx, ny, W), dtype)
                       for _ in range(3))
    du_f, dv_f, dw_f = pl.pallas_call(
        kernel,
        grid=(nx // tx,),
        in_specs=in_specs,
        out_specs=(out_blk(), out_blk(), out_blk()),
        out_shape=out_shapes,
        interpret=interpret,
    )(*in_arrays, mrows)
    du = du_f[:, :, 1:1 + nz]
    dv = dv_f[:, :, 1:1 + nz]
    # dw rows c' = kf+1 -> faces 0..nz; reference zeroes faces 0 and nz
    dw = dw_f[:, :, 1:2 + nz]
    mask = ((jnp.arange(nz + 1) != 0) & (jnp.arange(nz + 1) != nz)
            ).astype(dtype)[None, None, :]
    return du, dv, dw * mask
