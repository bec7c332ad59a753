"""Device-mesh sharding for the 2-D pencil decomposition.

The reference decomposes the domain with a 2-D MPI process grid
(nprocx x nprocy z-pencils, 2DECOMP; SURVEY.md section 2.3).  The TPU-native
equivalent is one `jax.sharding.Mesh` with axes ('x', 'y') and every field
sharded P('x', 'y', None): halo exchange and the Poisson transposes become
XLA collectives inserted by the GSPMD partitioner (the wrap-pads in
ops/halo.py become collective-permutes; FFT axis reshards become
all-to-alls).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(nprocx: int, nprocy: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = nprocx * nprocy
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    devs = np.asarray(devices[:n]).reshape(nprocx, nprocy)
    return Mesh(devs, axis_names=("x", "y"))


def field_spec(ndim: int, leading_batch: bool = False) -> P:
    """PartitionSpec for a field array: (nx, ny, ...) -> P('x','y',None...);
    scalar arrays stay replicated."""
    if ndim >= 3 and leading_batch:
        return P(None, "x", "y", *([None] * (ndim - 3)))
    if ndim >= 2:
        return P("x", "y", *([None] * (ndim - 2)))
    return P()


def shard_state(state, mesh: Mesh):
    """device_put the full State pytree with the pencil sharding."""
    def put(leaf):
        if leaf is None:
            return None
        nd = getattr(leaf, "ndim", 0)
        if nd == 4:           # sv: (nsv, nx, ny, nz)
            spec = field_spec(4, leading_batch=True)
        elif nd >= 2:
            spec = field_spec(nd)
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree.map(put, state)


def state_shardings(state, mesh: Mesh):
    """Matching NamedSharding pytree (for jit in_shardings/out_shardings)."""
    def spec(leaf):
        nd = getattr(leaf, "ndim", 0)
        if nd == 4:
            return NamedSharding(mesh, field_spec(4, leading_batch=True))
        if nd >= 2:
            return NamedSharding(mesh, field_spec(nd))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec, state)
