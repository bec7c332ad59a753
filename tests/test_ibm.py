"""IBM tests against reference example 101 (infinite canyon, 64^3):
geometry loading, mask consistency, and a short stable integration with
solid-cell velocity suppression.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CASE = Path("/root/reference/examples/101")

pytestmark = pytest.mark.skipif(not CASE.exists(), reason="reference absent")


@pytest.fixture(scope="module")
def model():
    from udales_tpu.run import load_case
    return load_case(CASE, "101", dtype="float32")


class TestLoad:
    def test_counts(self, model):
        ibm = model.ibm
        w = model.cfg.walls
        assert ibm.nfcts == w.nfcts == 320
        assert int((1 - np.asarray(ibm.masks.u)).sum()) == w.nsolpts_u
        assert int((1 - np.asarray(ibm.masks.w)[:, :, 1:]).sum()) \
            == w.nsolpts_w - 64 * 64  # floor faces are in solid_w
        assert len(ibm.sec["u"].fac) == w.nfctsecs_u

    def test_masks_floor_solid(self, model):
        assert np.all(np.asarray(model.ibm.masks.w)[:, :, 0] == 0)

    def test_facet_props(self, model):
        ibm = model.ibm
        # roof/road facets are asphalt (z0=0.05); bounding walls z0=0
        assert np.isclose(ibm.facz0.max(), 0.05)
        assert (ibm.facz0 >= 0).all()

    def test_skip_logic(self, model):
        ibm = model.ibm
        # u-sections on x-normal facets are skipped (normal aligned with dir)
        s = ibm.sec["u"]
        norm = ibm.facnorm[s.fac]
        xnormal = np.abs(np.abs(norm[:, 0]) - 1) < 1e-10
        assert not s.active[xnormal].any()
        # z0=0 facets always skipped
        z0zero = ibm.facz0[s.fac] < 1e-10
        assert not s.active[z0zero].any()


class TestRun:
    def test_short_run(self, model):
        state = model.cold_start(seed=3)
        step = jax.jit(model.step)
        s = state
        for _ in range(3):
            s = step(s)
        u = np.asarray(s.c.u)
        assert np.isfinite(u).all()
        # solid u points: stay small (only pressure-correction residual)
        mask = np.asarray(model.ibm.masks.u)
        assert np.abs(u[mask == 0]).max() < 0.2
        assert np.abs(u[mask == 1]).max() < 5.0
        # thl stays physical
        thl = np.asarray(s.c.thl)
        assert 280 < thl.min() < thl.max() < 310

    def test_divergence_free_fluid(self, model):
        state = model.cold_start(seed=3)
        s = jax.jit(model.step)(state)
        grid = model.grid
        c = s.c
        gu = jnp.pad(c.u, ((0, 1), (0, 0), (0, 0)), mode="wrap")
        gv = jnp.pad(c.v, ((0, 0), (0, 1), (0, 0)), mode="wrap")
        div = ((gu[1:] - gu[:-1]) * grid.dxi
               + (gv[:, 1:] - gv[:, :-1]) * grid.dyi
               + (c.w[:, :, 1:] - c.w[:, :, :-1])
               * grid.dzfi[None, None, :].astype(np.float32))
        assert float(jnp.abs(div).max()) < 1e-4
