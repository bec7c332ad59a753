"""z-major slab forms of solid_fill and the cd2 advection corrections must
reproduce the full-field stencils bit-for-bit (ibm/ibm.py: the slab path
computes on (kz, ny, nx) with x/y rolls; above the slab every point is
fluid so the operators are identity/zero there)."""
import sys
import types
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


@pytest.fixture(scope="module")
def ibm_model(tmp_path_factory):
    from test_sharding_hard import _load, _stage_cube_case
    case = _stage_cube_case(tmp_path_factory.mktemp("slab"))
    return _load(case)


def test_slab_active(ibm_model):
    ibm = ibm_model.ibm
    assert ibm._kz_slab is not None
    assert ibm._kz_slab < ibm_model.grid.ktot


def test_solid_fill_slab_matches_full(ibm_model):
    ibm = ibm_model.ibm
    nx, ny, nz = ibm_model.grid.shape
    rng = np.random.default_rng(0)
    var = rng.standard_normal((nx, ny, nz))
    rhs = rng.standard_normal((nx, ny, nz))
    v1, r1 = ibm._solid_fill_full(var, rhs, 7.5)
    v2, r2 = ibm._solid_fill_slab(var, rhs, 7.5, ibm._kz_slab)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r1))


@pytest.mark.parametrize("name", ["_advecc2nd_corr_liberal",
                                  "_advecc2nd_corr_conservative"])
def test_advec_corr_slab_matches_full(ibm_model, name):
    ibm = ibm_model.ibm
    nx, ny, nz = ibm_model.grid.shape
    rng = np.random.default_rng(1)
    var = rng.standard_normal((nx, ny, nz))
    c = types.SimpleNamespace(u=rng.standard_normal((nx, ny, nz)),
                              v=rng.standard_normal((nx, ny, nz)),
                              w=rng.standard_normal((nx, ny, nz + 1)))
    slab = getattr(ibm, name)(var, c, ibm_model.grid)
    full = getattr(ibm, name + "_full")(var, c, ibm_model.grid)
    np.testing.assert_array_equal(np.asarray(slab), np.asarray(full))
