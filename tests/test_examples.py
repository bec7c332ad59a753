"""End-to-end smoke runs of the reference example cases.

Every shipped case directory is loaded AS-IS (namoptions + committed
preprocessed inputs) and stepped; the oracle is bounded, finite fields and
a bounded adaptive dt — the decomposition-free analogue of the reference's
system tests (tests/system/ud_test_sim.sh).  Cases 101/102 get deeper
checks in test_ibm/test_post; 949/950 (driver pair) in test_openbc.
"""
from pathlib import Path

import jax
import numpy as np
import pytest

EXAMPLES = Path("/root/reference/examples")

pytestmark = pytest.mark.skipif(not EXAMPLES.exists(),
                                reason="reference absent")


def _run_steps(case: str, n: int = 2):
    from udales_tpu.run import load_case
    model = load_case(EXAMPLES / case)
    state = model.cold_start()
    step = jax.jit(model.step)
    for _ in range(n):
        state = step(state)
    return model, state


@pytest.mark.parametrize("case,umax_bound", [
    ("001", 10.0),   # flat neutral ABL, periodic
    ("002", 10.0),   # bottom-heated cubes + scalar
    ("201", 10.0),   # facet energy balance + radiation
    ("999", 10.0),   # flat, no IBM
    # 024 is a 1024^3 production case (nprocx=nprocy=32 in its namoptions);
    # it loads through the same code paths but does not fit one device
])
def test_example_steps(case, umax_bound):
    model, state = _run_steps(case)
    for name in ("u", "v", "w", "thl", "qt", "e12"):
        f = np.asarray(getattr(state.c, name))
        assert np.isfinite(f).all(), f"{case}: {name} not finite"
    assert np.abs(np.asarray(state.c.u)).max() < umax_bound
    assert 0 < float(state.dt) <= model.cfg.run.dtmax + 1e-12
    if model.cfg.physics.ltempeq:
        thl = np.asarray(state.c.thl)
        assert 200.0 < thl.min() < thl.max() < 400.0


def test_example_201_eb_state():
    """201 exercises the facet EB: facet state present and physical."""
    model, state = _run_steps("201")
    assert model.eb is not None
    assert state.fac is not None
    T = np.asarray(state.fac.T)
    assert T.shape[0] == model.eb.nfcts == 994
    assert 200.0 < T.min() < T.max() < 400.0
