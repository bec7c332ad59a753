"""Functional halo construction.

The reference exchanges MPI halos in x/y each substep (modboundary.f90:67-109,
2DECOMP exchange_halo_z).  Here halos are *values*, not communication: fields
are padded functionally and XLA's SPMD partitioner turns the wrap-pads into
collective-permutes over the device mesh when the arrays are sharded.
"""
from __future__ import annotations

import jax.numpy as jnp


def pad_periodic_xy(f, h: int = 1):
    """Periodic wrap pad of width h in axes 0 (x) and 1 (y)."""
    cfg = [(h, h), (h, h)] + [(0, 0)] * (f.ndim - 2)
    return jnp.pad(f, cfg, mode="wrap")


def pad_edge_xy(f, h: int = 1):
    """Zero-gradient (edge replicate) pad in x and y."""
    cfg = [(h, h), (h, h)] + [(0, 0)] * (f.ndim - 2)
    return jnp.pad(f, cfg, mode="edge")


def pad_axis(f, axis: int, lo, hi):
    """Attach explicit ghost planes `lo`/`hi` (arrays broadcastable to the
    boundary slice shape, or None to skip) along `axis`."""
    parts = []
    if lo is not None:
        parts.append(jnp.broadcast_to(
            lo, f.shape[:axis] + (1,) + f.shape[axis + 1:]).astype(f.dtype))
    parts.append(f)
    if hi is not None:
        parts.append(jnp.broadcast_to(
            hi, f.shape[:axis] + (1,) + f.shape[axis + 1:]).astype(f.dtype))
    return jnp.concatenate(parts, axis=axis)


def take_k(f, k):
    """f[..., k] keeping the trailing axis, for ghost construction."""
    k = k % f.shape[-1]
    return f[..., k:k + 1]
