"""The Pallas fused momentum-diffusion kernel must reproduce the jnp
stencils exactly (interpret mode on CPU; the TPU run was verified bit-exact
on hardware — see ops/pallas_stencil.py)."""
import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_fused_diff_matches_jnp(monkeypatch):
    monkeypatch.setenv("UDALES_PALLAS_INTERPRET", "1")
    from udales_tpu.grid import Grid
    from udales_tpu.ops import subgrid as sgs
    from udales_tpu.ops.pallas_stencil import fused_diff_mom

    nx, ny, nz = 16, 12, 8
    grid = Grid.uniform(nx, ny, nz, float(nx), float(ny), float(nz),
                        dtype=np.float32)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    g = types.SimpleNamespace(
        u=jax.random.normal(ks[0], (nx + 2, ny + 2, nz + 2), jnp.float32),
        v=jax.random.normal(ks[1], (nx + 2, ny + 2, nz + 2), jnp.float32),
        w=jax.random.normal(ks[2], (nx + 2, ny + 2, nz + 1), jnp.float32),
        ekm=jax.random.uniform(ks[3], (nx + 2, ny + 2, nz + 2),
                               jnp.float32) + 0.5)
    pu, pv, pw = fused_diff_mom(g, grid)
    ru = sgs.diff_u(g, grid)
    rv = sgs.diff_v(g, grid)
    rw = sgs.diff_w(g, grid)
    assert np.allclose(pu, ru, atol=1e-5)
    assert np.allclose(pv, rv, atol=1e-5)
    assert np.allclose(pw, rw, atol=1e-5)
