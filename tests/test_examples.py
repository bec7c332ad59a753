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


def test_example_001_physics_oracles():
    """Deeper oracle for the flat neutral ABL case: divergence-free after
    projection, near-conserved resolved KE over 10 steps, and slab-mean u
    bounded by the initial profile scale (the /verify drive oracles, in
    CI on CPU)."""
    from udales_tpu.run import load_case
    model = load_case(EXAMPLES / "001", dtype="float64")
    state = model.cold_start(seed=7)
    grid = model.grid
    nz = grid.ktot

    def ke(s):
        return float(np.mean(np.asarray(s.c.u) ** 2)
                     + np.mean(np.asarray(s.c.v) ** 2)
                     + np.mean(np.asarray(s.c.w) ** 2))

    step = jax.jit(model.step)
    state = step(state)
    ke0 = ke(state)
    for _ in range(9):
        state = step(state)
    u = np.asarray(state.c.u)
    v = np.asarray(state.c.v)
    w = np.asarray(state.c.w)
    gu = np.concatenate([u, u[:1]], axis=0)
    gv = np.concatenate([v, v[:, :1]], axis=1)
    dzfi = 1.0 / np.diff(np.asarray(grid.zh))
    div = ((gu[1:] - gu[:-1]) / grid.dx + (gv[:, 1:] - gv[:, :-1]) / grid.dy
           + (w[:, :, 1:] - w[:, :, :-1]) * dzfi[None, None, :])
    assert np.abs(div).max() < 1e-10, np.abs(div).max()
    # neutral ABL: resolved KE near-conserved over a few steps
    assert 0.85 < ke(state) / ke0 < 1.15
    # slab-mean u stays of the order of the initial profile
    ubar = u.mean(axis=(0, 1))
    assert 0.0 < ubar.max() < 3.0 * np.abs(np.asarray(
        model.inputs.prof["u"])).max() + 1.0


def test_example_102_warmstart_end_to_end(tmp_path):
    """Flagship validation case (BASELINE.json): example 102 run end-to-end
    THROUGH the reference Fortran warmstart machinery.

    No initd files are committed in the reference tree (only the scalar
    inits — real reference-produced data, ingest-validated in
    test_ref_formats.py), so the momentum restart is synthesized by a short
    cold run + write_fortran_restart in the modsave.f90 layout, named to
    pair with the committed inits00000267 files.  The run then goes through
    warmstart_state (modstartup.f90:2156 analogue: 2x2-rank assembly),
    steps >= 20 RK3 steps via Simulation with fielddump+xytdump enabled,
    and the outputs are read back through UDPost."""
    import re
    import shutil
    from udales_tpu.io.restart import warmstart_state, write_fortran_restart
    from udales_tpu.run import load_case
    from udales_tpu.sim import Simulation

    src = EXAMPLES / "102"
    case = tmp_path / "102"
    case.mkdir()
    for p in src.iterdir():
        if p.is_file():
            shutil.copy(p, case / p.name)
    # shorten output cadences so dumps fire within the test run
    nam = (case / "namoptions.102").read_text()
    for k, v in (("tfielddump", "2."), ("tstatsdump", "4."),
                 ("tsample", "1."), ("trestart", "5."),
                 ("nprocx", "2"), ("nprocy", "2")):
        nam = re.sub(rf"^({k}\s*=\s*)\S+", rf"\g<1>{v}", nam, flags=re.M)
    (case / "namoptions.102").write_text(nam)
    for p in (src / "warmstart_files").glob("inits*.102"):
        shutil.copy(p, case / p.name)

    model = load_case(case, dtype="float64")
    cfg = model.cfg

    # synthesize the initd files from a short cold spin-up, stamped with
    # the committed inits' timee so the pair is consistent
    import jax
    state = model.cold_start()
    step = jax.jit(model.step)
    for _ in range(2):
        state = step(state)
    c = state.c
    nz = model.grid.ktot
    pad = lambda a: np.concatenate(
        [np.asarray(a), np.asarray(a)[:, :, -1:]], axis=2)
    fields = {"u": pad(c.u), "v": pad(c.v), "w": np.asarray(c.w),
              "thl": pad(c.thl), "qt": pad(c.qt), "e12": pad(c.e12),
              "pres": pad(state.pres)}
    t_inits = 100.26389836215216   # committed inits00000267 timestamp
    write_fortran_restart(case, fields, t_inits, 0.3, "102",
                          64, 64, 64, nprocx=2, nprocy=2, ntrun=267)

    # warmstart through the reference-format machinery
    wstate = warmstart_state(case, cfg.run.startfile, "102", cfg,
                             model.grid)
    assert float(wstate.timee) == t_inits
    # the scalar field is the REAL committed reference data
    sv = np.asarray(wstate.m.sv)
    assert sv.shape[0] == 1 and np.isfinite(sv).all()
    assert np.abs(sv).max() > 1e-3
    wstate = model.attach_params(wstate)

    sim = Simulation(model, case)
    sim.run(wstate, runtime=7.0)

    mon = np.loadtxt(case / "monitor.102.txt", ndmin=2)
    assert mon.shape[0] >= 20, f"only {mon.shape[0]} steps"

    # physics oracles on the final state written to the restart file
    outs = sorted(case.glob("initd*.h5"))
    assert outs, "restart checkpoint not written"
    import h5py
    with h5py.File(outs[-1]) as f:
        u = f["c/u"][()]
        v = f["c/v"][()]
        w = f["c/w"][()]
        thl = f["c/thl"][()]
    assert np.isfinite(u).all() and np.abs(u).max() < 10.0
    assert 200.0 < thl.min() < thl.max() < 400.0
    gu = np.concatenate([u, u[:1]], axis=0)
    gv = np.concatenate([v, v[:, :1]], axis=1)
    dzfi = 1.0 / np.diff(np.asarray(model.grid.zh))
    div = ((gu[1:] - gu[:-1]) / model.grid.dx
           + (gv[:, 1:] - gv[:, :-1]) / model.grid.dy
           + (w[:, :, 1:] - w[:, :, :-1]) * dzfi[None, None, :])
    fluid = np.asarray(model.ibm.masks.c) > 0.5
    assert np.abs(div)[fluid].max() < 1e-9, np.abs(div)[fluid].max()

    # outputs read back through the postprocessing package
    from udales_tpu.post import UDPost
    post = UDPost("102", case)
    fd = post.load_field("u")
    assert np.isfinite(fd).all() and fd.ndim == 4 and fd.shape[0] >= 2
    xyt = post.load_stat_xyt()
    assert any("u" in k for k in xyt.variables())


def test_example_201_eb_state():
    """201 exercises the facet EB: facet state present and physical."""
    model, state = _run_steps("201")
    assert model.eb is not None
    assert state.fac is not None
    T = np.asarray(state.fac.T)
    assert T.shape[0] == model.eb.nfcts == 994
    assert 200.0 < T.min() < T.max() < 400.0


def test_example_002_drag_physics():
    """Physics trend for the cube-array case (no forcing, neutral): the
    canopy drag decays the resolved KE monotonically over steps, and the
    velocity deficit develops INSIDE the canopy (cubes reach z=16 of 64:
    geom.002.STL) relative to the flow aloft."""
    from udales_tpu.ops.thermo import slab_mean
    model, s0 = _run_steps("002", n=1)
    ke = lambda s: float(np.sum(np.asarray(s.c.u) ** 2
                                + np.asarray(s.c.v) ** 2))
    step = jax.jit(model.step)
    kes = [ke(s0)]
    state = s0
    for _ in range(8):
        state = step(state)
        kes.append(ke(state))
    assert all(b < a for a, b in zip(kes, kes[1:])), kes
    # canopy-top index: zmax=16 on the 64-cell/64 m grid -> k<16 inside
    II = model.ibm.masks.c
    u = np.asarray(state.c.u)
    inside = np.nanmean(np.where(np.asarray(II[:, :, :16]) > 0,
                                 u[:, :, :16], np.nan))
    above = u[:, :, 24:40].mean()
    assert inside < 0.8 * above, (inside, above)


def test_example_201_radiative_heating():
    """Physics trend for the EB case: the committed netsw.inp.201 drives
    sunlit facets above their 295 K radiative-equilibrium start once the
    facet energy balance fires (dtEB=2 s), and the facet-flux accumulators
    move (modEB.f90:429 cadence)."""
    from udales_tpu.run import load_case
    model = load_case(EXAMPLES / "201")
    state = model.cold_start()
    T0 = np.asarray(state.fac.T).copy()
    step = jax.jit(model.step)
    for _ in range(200):           # step past the dtEB cadence
        state = step(state)
        if float(state.timee) > model.cfg.eb.dtEB * 1.05:
            break
    T1 = np.asarray(state.fac.T)
    assert not np.allclose(T1, T0), "EB never fired within the run"
    nsw = np.loadtxt(EXAMPLES / "201" / "netsw.inp.201", skiprows=1)
    sunlit = nsw > 100.0
    assert sunlit.sum() > 10
    dT = T1[:, 0] - T0[:, 0]
    # strongly-irradiated facets warm on average; the sign is the oracle
    assert dT[sunlit].mean() > 0.0, dT[sunlit].mean()
    # and the most-irradiated quartile warms at least as much as the least
    # (201's committed netsw leaves no unlit facets, so split by quartile)
    q1, q3 = np.quantile(nsw, [0.25, 0.75])
    assert dT[nsw >= q3].mean() >= dT[nsw <= q1].mean() - 5e-3


def test_example_024_config_parses():
    """The 1024^3 production case: namoptions + stretched-z profile parse
    and the grid builds (no state allocation — it would not fit one
    device; its namoptions declare a 32x32 process grid)."""
    from udales_tpu.config import load_namoptions
    from udales_tpu.grid import Grid
    cfg = load_namoptions(EXAMPLES / "024/namoptions.024")
    assert cfg.domain.itot == cfg.domain.jtot == cfg.domain.ktot == 1024
    d = cfg.domain
    grid = Grid.from_prof_inp(EXAMPLES / "024/prof.inp.024", d.itot,
                              d.jtot, d.ktot, d.xlen, d.ylen,
                              dtype=np.float64)
    assert grid.ktot == 1024
    assert np.all(np.diff(np.asarray(grid.zf)) > 0)


def test_cli_end_to_end(tmp_path):
    """`python -m udales_tpu <case>` runs a generated mini case through
    the CLI: outputs + monitor + restart produced, exit code 0."""
    import subprocess
    import sys
    (tmp_path / "namoptions.905").write_text("""
&RUN
iexpnr = 905
runtime = 0.1
trestart = 0.05
ladaptive = .true.
dtmax = 0.02
/
&DOMAIN
itot = 8
jtot = 8
ktot = 8
xlen = 8.
ylen = 8.
/
&OUTPUT
lfielddump = .true.
tfielddump = 0.04
fieldvars = 'u0,w0'
lxytdump = .true.
tsample = 0.02
tstatsdump = 0.08
/
""")
    (tmp_path / "prof.inp.905").write_text(
        "# prof\n# z thl qt u v e12\n" + "".join(
            f"{z + 0.5:8.3f} 288.0 0.0 1.0 0.0 5e-5\n" for z in range(8)))
    (tmp_path / "lscale.inp.905").write_text(
        "# lscale\n# z ug vg pgx pgy wfls dqtdx dqtdy dqtdt dthlrad\n"
        + "".join(f"{z + 0.5:8.3f} 0 0 0 0 0 0 0 0 0\n"
                  for z in range(8)))
    out = tmp_path / "out"
    out.mkdir()
    import os
    env = dict(os.environ)
    # force the CPU backend: JAX_PLATFORMS alone is overridden by the
    # axon sitecustomize, so drop it from PYTHONPATH too
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        p_ for p_ in env.get("PYTHONPATH", "").split(":")
        if "axon" not in p_) or str(Path(__file__).parents[1])
    r = subprocess.run(
        [sys.executable, "-m", "udales_tpu", str(tmp_path),
         "--outdir", str(out), "--dtype", "float64"],
        capture_output=True, text=True, timeout=500, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out / "monitor.905.txt").exists()
    assert (out / "fielddump.905.nc").exists()
    assert (out / "xytdump.905.nc").exists()
    assert list(out.glob("initd*.h5"))
