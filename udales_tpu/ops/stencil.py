"""Shifted-slice helpers for stencil operators on ghosted arrays.

Convention: a "ghosted" cell-centred array ``G`` with halo ``h`` in x/y and one
ghost cell in k satisfies ``G[h+i, h+j, 1+k] == f[i, j, k]`` for the interior
``i in [0,nx), j in [0,ny), k in [0,nz)``.  ``sh(G, di, dj, dk, ...)`` returns
the interior-shaped view shifted by (di, dj, dk).

The w (z-face) array carries no k ghosts: ``Gw[h+i, h+j, k] == w[i, j, k]``
with k in [0, nz], and ``shw`` views are (nx, ny, nz)-shaped slices over face
indices dk .. dk+nz-1.
"""
from __future__ import annotations

import jax.numpy as jnp


def sh(G, di: int, dj: int, dk: int, nx: int, ny: int, nz: int, h: int = 1,
       hk: int = 1):
    """Interior view of ghosted cell array shifted by (di,dj,dk)."""
    return G[h + di: h + di + nx, h + dj: h + dj + ny, hk + dk: hk + dk + nz]


def shw(Gw, di: int, dj: int, dk: int, nx: int, ny: int, nz: int, h: int = 1):
    """(nx,ny,nz) view of the ghosted face array starting at face index dk."""
    return Gw[h + di: h + di + nx, h + dj: h + dj + ny, dk: dk + nz]


def kvec(a, lo: int, n: int):
    """1-D vertical metric slice broadcast over (nx,ny,n): a[lo:lo+n]."""
    return a[lo: lo + n][None, None, :]
