"""Pallas TPU mega-kernel for the momentum-diffusion sweeps.

The XLA lowering of the momentum-diffusion stencils (ops/subgrid.diff_u/v/w,
reference modsubgrid.f90:672-997) materializes coefficient and flux
temporaries in HBM — measured +10.9 ms/substep of a 77 ms step at 256^3
against a ~1 ms bandwidth floor.  This kernel fuses all three sweeps so no
intermediate ever touches HBM.

INTERIOR-EXACT LAYOUT (round-3 design, docs/performance.md):
  - The lane (minor) dimension carries exactly W = nz cells — 128-aligned
    whenever nz is a multiple of 128, so no Mosaic lane padding (the
    round-2 kernel's nz+2-wide rows forced 2x padding and lost to XLA).
  - Vertical shifts are wrap-around `pltpu.roll`: every output row is
    exact EXCEPT the k=0 and k=nz-1 planes (and the top w face), which a
    thin-slab XLA epilogue recomputes — 2/nz of the work.
  - The x-halo is expressed as three *block views* of the same ghosted
    input (block size 1 in x, index maps i -> i+1+di): same HBM array,
    three pipelined windows, zero copies (manual make_async_copy DMA plus
    a pallas grid crashes this TPU worker).
  - Captured array constants are forbidden in Mosaic, so the vertical
    metric lines arrive as one (rows, W) input.

Numerics are identical to ops/subgrid (same formulas, same order); tests
compare both paths on random fields (test_pallas.py).  CPU and non-128
vertical sizes fall back to the jnp path.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import Grid

# metric rows in the kernel convention row[c] = a[lo + c]:
#   cell rows (c = k):  dzf_km = dzf_g[k]   -> ("dzf_g", 0)
#                       dzf_k  = dzf_g[1+k] -> ("dzf_g", 1)
#                       dzf_kp = dzf_g[2+k] -> ("dzf_g", 2)
#                       dzhiq_k = dzhiq[k], dzhiq_kp = dzhiq[k+1]
#                       dzhi_k  = dzhi[k],  dzhi_kp  = dzhi[k+1]
#                       dzfi_k  = dzfi[k]
#   face rows (c = kf): the SAME rows apply (dzf[kf-1] = dzf_g[kf], ...)
#                       plus dzfi_km(face) = dzfi_g[kf] -> ("dzfi_g", 0)
_MROWS = (("dzf_g", 0), ("dzf_g", 1), ("dzf_g", 2),
          ("dzhiq", 0), ("dzhiq", 1),
          ("dzhi", 0), ("dzhi", 1),
          ("dzfi", 0),
          ("dzfi_g", 0))


def _metric_rows(grid: Grid, W: int):
    rows = []
    for name, lo in _MROWS:
        a = np.asarray(grid.j(name))
        idx = np.clip(np.arange(W) + lo, 0, len(a) - 1)
        rows.append(a[idx])
    return np.stack(rows).astype(grid.dtype)


# ---------------------------------------------------------------------------
# Thin-slab XLA recompute of one z-plane (the epilogue for the wrap-around
# boundary rows).  Metrics become static python floats; identical formulas.
# ---------------------------------------------------------------------------

def _mget(grid, name, i):
    a = np.asarray(grid.j(name))
    return float(a[int(np.clip(i, 0, len(a) - 1))])


def _diff_u_plane(g, grid: Grid, k: int):
    nx, ny, _ = grid.shape
    S = lambda A, di, dj, dk: A[1 + di:1 + di + nx, 1 + dj:1 + dj + ny,
                                1 + k + dk]
    Sw = lambda di, dj, dk: g.w[1 + di:1 + di + nx, 1 + dj:1 + dj + ny,
                                k + dk]
    u, v, ekm = g.u, g.v, g.ekm
    dxi, dyi = grid.dxi, grid.dyi
    dzf_km = _mget(grid, "dzf_g", k)
    dzf_k = _mget(grid, "dzf_g", 1 + k)
    dzf_kp = _mget(grid, "dzf_g", 2 + k)
    dzhiq_k = _mget(grid, "dzhiq", k)
    dzhiq_kp = _mget(grid, "dzhiq", k + 1)
    dzhi_k = _mget(grid, "dzhi", k)
    dzhi_kp = _mget(grid, "dzhi", k + 1)
    dzfi_k = _mget(grid, "dzfi", k)
    ekm_c = S(ekm, 0, 0, 0)
    ekm_im = S(ekm, -1, 0, 0)
    emom = (dzf_km * (ekm_c + ekm_im)
            + dzf_k * (S(ekm, 0, 0, -1) + S(ekm, -1, 0, -1))) * dzhiq_k
    emop = (dzf_kp * (ekm_c + ekm_im)
            + dzf_k * (S(ekm, 0, 0, 1) + S(ekm, -1, 0, 1))) * dzhiq_kp
    empo = 0.25 * (ekm_c + S(ekm, 0, 1, 0) + S(ekm, -1, 0, 0)
                   + S(ekm, -1, 1, 0))
    emmo = 0.25 * (ekm_c + S(ekm, 0, -1, 0) + S(ekm, -1, -1, 0)
                   + S(ekm, -1, 0, 0))
    uc = S(u, 0, 0, 0)
    t_x = (ekm_c * (S(u, 1, 0, 0) - uc)
           - ekm_im * (uc - S(u, -1, 0, 0))) * 2.0 * grid.dx2i
    t_y = (empo * ((S(u, 0, 1, 0) - uc) * dyi
                   + (S(v, 0, 1, 0) - S(v, -1, 1, 0)) * dxi)
           - emmo * ((uc - S(u, 0, -1, 0)) * dyi
                     + (S(v, 0, 0, 0) - S(v, -1, 0, 0)) * dxi)) * dyi
    t_z = (emop * ((S(u, 0, 0, 1) - uc) * dzhi_kp
                   + (Sw(0, 0, 1) - Sw(-1, 0, 1)) * dxi)
           - emom * ((uc - S(u, 0, 0, -1)) * dzhi_k
                     + (Sw(0, 0, 0) - Sw(-1, 0, 0)) * dxi)) * dzfi_k
    return t_x + t_y + t_z


def _diff_v_plane(g, grid: Grid, k: int):
    nx, ny, _ = grid.shape
    S = lambda A, di, dj, dk: A[1 + di:1 + di + nx, 1 + dj:1 + dj + ny,
                                1 + k + dk]
    Sw = lambda di, dj, dk: g.w[1 + di:1 + di + nx, 1 + dj:1 + dj + ny,
                                k + dk]
    u, v, ekm = g.u, g.v, g.ekm
    dxi, dyi = grid.dxi, grid.dyi
    dzf_km = _mget(grid, "dzf_g", k)
    dzf_k = _mget(grid, "dzf_g", 1 + k)
    dzf_kp = _mget(grid, "dzf_g", 2 + k)
    dzhiq_k = _mget(grid, "dzhiq", k)
    dzhiq_kp = _mget(grid, "dzhiq", k + 1)
    dzhi_k = _mget(grid, "dzhi", k)
    dzhi_kp = _mget(grid, "dzhi", k + 1)
    dzfi_k = _mget(grid, "dzfi", k)
    ekm_c = S(ekm, 0, 0, 0)
    ekm_jm = S(ekm, 0, -1, 0)
    eomm = (dzf_km * (ekm_c + ekm_jm)
            + dzf_k * (S(ekm, 0, 0, -1) + S(ekm, 0, -1, -1))) * dzhiq_k
    eomp = (dzf_kp * (ekm_c + ekm_jm)
            + dzf_k * (S(ekm, 0, 0, 1) + S(ekm, 0, -1, 1))) * dzhiq_kp
    emmo = 0.25 * (ekm_c + ekm_jm + S(ekm, -1, -1, 0) + S(ekm, -1, 0, 0))
    epmo = 0.25 * (ekm_c + ekm_jm + S(ekm, 1, -1, 0) + S(ekm, 1, 0, 0))
    vc = S(v, 0, 0, 0)
    t_x = (epmo * ((S(v, 1, 0, 0) - vc) * dxi
                   + (S(u, 1, 0, 0) - S(u, 1, -1, 0)) * dyi)
           - emmo * ((vc - S(v, -1, 0, 0)) * dxi
                     + (S(u, 0, 0, 0) - S(u, 0, -1, 0)) * dyi)) * dxi
    t_y = (ekm_c * (S(v, 0, 1, 0) - vc)
           - ekm_jm * (vc - S(v, 0, -1, 0))) * 2.0 * grid.dy2i
    t_z = (eomp * ((S(v, 0, 0, 1) - vc) * dzhi_kp
                   + (Sw(0, 0, 1) - Sw(0, -1, 1)) * dyi)
           - eomm * ((vc - S(v, 0, 0, -1)) * dzhi_k
                     + (Sw(0, 0, 0) - Sw(0, -1, 0)) * dyi)) * dzfi_k
    return t_x + t_y + t_z


def _diff_w_plane(g, grid: Grid, kf: int):
    """One interior w face (kf in 1..nz-1), modsubgrid.f90:890-997."""
    nx, ny, _ = grid.shape
    wf = lambda di, dj, dk: g.w[1 + di:1 + di + nx, 1 + dj:1 + dj + ny,
                                kf + dk]
    C = lambda A, di, dj, dk: A[1 + di:1 + di + nx, 1 + dj:1 + dj + ny,
                                kf + dk]
    u, v, ekm = g.u, g.v, g.ekm
    dxi, dyi = grid.dxi, grid.dyi
    dzf_km = _mget(grid, "dzf_g", kf)
    dzf_k = _mget(grid, "dzf_g", 1 + kf)
    dzhiq_k = _mget(grid, "dzhiq", kf)
    dzhi_k = _mget(grid, "dzhi", kf)
    dzfi_k = _mget(grid, "dzfi", kf)
    dzfi_km = _mget(grid, "dzfi_g", kf)
    emom = (dzf_km * (C(ekm, 0, 0, 1) + C(ekm, -1, 0, 1))
            + dzf_k * (C(ekm, 0, 0, 0) + C(ekm, -1, 0, 0))) * dzhiq_k
    eomm = (dzf_km * (C(ekm, 0, 0, 1) + C(ekm, 0, -1, 1))
            + dzf_k * (C(ekm, 0, 0, 0) + C(ekm, 0, -1, 0))) * dzhiq_k
    eopm = (dzf_km * (C(ekm, 0, 0, 1) + C(ekm, 0, 1, 1))
            + dzf_k * (C(ekm, 0, 0, 0) + C(ekm, 0, 1, 0))) * dzhiq_k
    epom = (dzf_km * (C(ekm, 0, 0, 1) + C(ekm, 1, 0, 1))
            + dzf_k * (C(ekm, 0, 0, 0) + C(ekm, 1, 0, 0))) * dzhiq_k
    wc = wf(0, 0, 0)
    t_x = (epom * ((wf(1, 0, 0) - wc) * dxi
                   + (C(u, 1, 0, 1) - C(u, 1, 0, 0)) * dzhi_k)
           - emom * ((wc - wf(-1, 0, 0)) * dxi
                     + (C(u, 0, 0, 1) - C(u, 0, 0, 0)) * dzhi_k)) * dxi
    t_y = (eopm * ((wf(0, 1, 0) - wc) * dyi
                   + (C(v, 0, 1, 1) - C(v, 0, 1, 0)) * dzhi_k)
           - eomm * ((wc - wf(0, -1, 0)) * dyi
                     + (C(v, 0, 0, 1) - C(v, 0, 0, 0)) * dzhi_k)) * dyi
    t_z = (C(ekm, 0, 0, 1) * (wf(0, 0, 1) - wc) * dzfi_k
           - C(ekm, 0, 0, 0) * (wc - wf(0, 0, -1)) * dzfi_km) \
        * 2.0 * dzhi_k
    return t_x + t_y + t_z


def fused_diff_mom(g, grid: Grid, pack=None, pmasks=None):
    """diff_u + diff_v + diff_w in one Pallas kernel (TPU); plain jnp path
    on CPU / unsupported sizes.  Inputs are the h=1 ghosted fields of
    ops/boundary.  When the caller supplies the substep's shared
    `GradPack`, the jnp path uses `subgrid.fused_diffusion` (edge fluxes
    shared with the closure) instead of the three standalone sweeps.

    `pmasks` (dict u/v/w of ghosted IBM fluid masks): fold the IBM
    diffusion corrections into the sweeps (subgrid.diff_u docstring) —
    this always takes the standalone masked path (the experimental
    Pallas/fused variants stay correction-separate)."""
    from . import subgrid as sgs
    nx, ny, nz = grid.shape
    if pmasks is not None:
        return (sgs.diff_u(g, grid, M=pmasks["u"]),
                sgs.diff_v(g, grid, M=pmasks["v"]),
                sgs.diff_w(g, grid, M=pmasks["w"]))
    interpret = os.environ.get("UDALES_PALLAS_INTERPRET") == "1"
    enabled = os.environ.get("UDALES_PALLAS") == "1"
    if not interpret and (jax.default_backend() == "cpu"
                          or not enabled or nz % 128 != 0):
        # The flux-difference form (sgs.fused_diffusion) has ~40% fewer
        # VPU ops but its shared fluxes are multi-consumer, and XLA
        # materializes them to HBM instead of duplicating into both
        # consumers: interleaved A/B on the v5e chip measured it SLOWER
        # (128^3: 5.75 -> 8.07 ms/step; 256^3: 77.3 -> 97.4; see
        # docs/performance.md "round 4").  The standalone sweeps fuse into
        # three clean single-consumer chains and win; keep them default.
        if os.environ.get("UDALES_DIFF") == "fused":
            return sgs.fused_diffusion(g, grid)
        return (sgs.diff_u(g, grid), sgs.diff_v(g, grid),
                sgs.diff_w(g, grid))

    W = nz
    dtype = g.u.dtype
    dxi, dyi = grid.dxi, grid.dyi
    dx2i, dy2i = grid.dx2i, grid.dy2i
    mrows = jnp.asarray(_metric_rows(grid, W))
    # strip z ghosts: lanes carry exactly the nz interior cells / the
    # bottom nz faces (face nz is only needed in the patched top rows).
    # The four fields ride in ONE stacked array so each grid step issues 3
    # input DMAs instead of 12 — the per-DMA issue cost (~2 us) dominates
    # at block row width 1, measured 7.5 -> ~2.5 ms at 256^3.
    F = jnp.stack([g.u[:, :, 1:1 + nz], g.v[:, :, 1:1 + nz],
                   g.w[:, :, 0:nz], g.ekm[:, :, 1:1 + nz]])

    def kernel(sm, s0, sp, m_ref, out_ref):
        fields = {-1: sm, 0: s0, 1: sp}
        fld = lambda di, f: fields[di][f, 0]
        uv = {d: partial(fld, d, 0) for d in (-1, 0, 1)}
        vv = {d: partial(fld, d, 1) for d in (-1, 0, 1)}
        wv = {d: partial(fld, d, 2) for d in (-1, 0, 1)}
        ev = {d: partial(fld, d, 3) for d in (-1, 0, 1)}

        m = {key: m_ref[r, :][None, :]
             for r, key in enumerate(_MROWS)}
        dzf_km, dzf_k, dzf_kp = (m[("dzf_g", 0)], m[("dzf_g", 1)],
                                 m[("dzf_g", 2)])
        dzhiq_k, dzhiq_kp = m[("dzhiq", 0)], m[("dzhiq", 1)]
        dzhi_k, dzhi_kp = m[("dzhi", 0)], m[("dzhi", 1)]
        dzfi_k = m[("dzfi", 0)]
        dzfiw_km = m[("dzfi_g", 0)]

        # S(views, di, dj, s)[c] = f[x+di, y+dj, c+s]  (wrap in z)
        def S(views, di, dj, s):
            b = views[di]()
            if s:
                b = pltpu.roll(b, (W - s) % W, 1)
            return b[1 + dj: 1 + dj + ny, :]

        # ---- diff_u (modsubgrid.f90:672-775) ---------------------------
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
                       + (S(wv, 0, 0, 1) - S(wv, -1, 0, 1)) * dxi)
               - emom * ((uc - S(uv, 0, 0, -1)) * dzhi_k
                         + (S(wv, 0, 0, 0) - S(wv, -1, 0, 0)) * dxi)) \
            * dzfi_k
        out_ref[0, 0] = t_x + t_y + t_z

        # ---- diff_v (modsubgrid.f90:778-886) ---------------------------
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
                       + (S(wv, 0, 0, 1) - S(wv, 0, -1, 1)) * dyi)
               - eomm * ((vc - S(vv, 0, 0, -1)) * dzhi_k
                         + (S(wv, 0, 0, 0) - S(wv, 0, -1, 0)) * dyi)) \
            * dzfi_k
        out_ref[1, 0] = t_x + t_y + t_z

        # ---- diff_w (modsubgrid.f90:890-997), face rows c = kf ---------
        # cells below the face = roll(cell, +1); cells above = direct.
        # The SAME metric rows apply on face rows (see _MROWS note).
        Cb = lambda fv, di, dj: S(fv, di, dj, -1)    # cell kf-1
        Ca = lambda fv, di, dj: S(fv, di, dj, 0)     # cell kf
        emom = (dzf_km * (Ca(ev, 0, 0) + Ca(ev, -1, 0))
                + dzf_k * (Cb(ev, 0, 0) + Cb(ev, -1, 0))) * dzhiq_k
        eomm = (dzf_km * (Ca(ev, 0, 0) + Ca(ev, 0, -1))
                + dzf_k * (Cb(ev, 0, 0) + Cb(ev, 0, -1))) * dzhiq_k
        eopm = (dzf_km * (Ca(ev, 0, 0) + Ca(ev, 0, 1))
                + dzf_k * (Cb(ev, 0, 0) + Cb(ev, 0, 1))) * dzhiq_k
        epom = (dzf_km * (Ca(ev, 0, 0) + Ca(ev, 1, 0))
                + dzf_k * (Cb(ev, 0, 0) + Cb(ev, 1, 0))) * dzhiq_k
        wc = S(wv, 0, 0, 0)
        t_x = (epom * ((S(wv, 1, 0, 0) - wc) * dxi
                       + (Ca(uv, 1, 0) - Cb(uv, 1, 0)) * dzhi_k)
               - emom * ((wc - S(wv, -1, 0, 0)) * dxi
                         + (Ca(uv, 0, 0) - Cb(uv, 0, 0)) * dzhi_k)) * dxi
        t_y = (eopm * ((S(wv, 0, 1, 0) - wc) * dyi
                       + (Ca(vv, 0, 1) - Cb(vv, 0, 1)) * dzhi_k)
               - eomm * ((wc - S(wv, 0, -1, 0)) * dyi
                         + (Ca(vv, 0, 0) - Cb(vv, 0, 0)) * dzhi_k)) * dyi
        t_z = (Ca(ev, 0, 0) * (S(wv, 0, 0, 1) - wc) * dzfi_k
               - Cb(ev, 0, 0) * (wc - S(wv, 0, 0, -1)) * dzfiw_km) \
            * 2.0 * dzhi_k
        out_ref[2, 0] = t_x + t_y + t_z

    # three block views of the SAME stacked array (no copies): block size 1
    # in x lets the index map express the +-1 element offsets directly
    def shifted_spec(di):
        return pl.BlockSpec((4, 1, ny + 2, W),
                            lambda i, di=di: (0, i + 1 + di, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [shifted_spec(d) for d in (-1, 0, 1)]
    in_specs.append(pl.BlockSpec(mrows.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((3, 1, ny, W), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nx,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((3, nx, ny, W), dtype),
        interpret=interpret,
    )(F, F, F, mrows)
    du, dv, dwf = out[0], out[1], out[2]

    # epilogue: the wrap-around rows k=0 and k=nz-1 (cells) and the top
    # interior face nz-1 are recomputed exactly; faces 0 and nz are zero
    # (reference zeroes them, modsubgrid.f90:995)
    du = du.at[:, :, 0].set(_diff_u_plane(g, grid, 0))
    du = du.at[:, :, nz - 1].set(_diff_u_plane(g, grid, nz - 1))
    dv = dv.at[:, :, 0].set(_diff_v_plane(g, grid, 0))
    dv = dv.at[:, :, nz - 1].set(_diff_v_plane(g, grid, nz - 1))
    zero_face = jnp.zeros((nx, ny, 1), dtype)
    dw = jnp.concatenate([zero_face, dwf[:, :, 1:nz], zero_face], axis=2)
    dw = dw.at[:, :, nz - 1].set(_diff_w_plane(g, grid, nz - 1))
    return du, dv, dw
