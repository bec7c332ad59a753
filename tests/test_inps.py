"""&INPS-driven preprocessing: a shipped reference case regenerates from its
own namoptions + STL alone (the reference udprep workflow,
tools/python/udprep/udprep.py; VERDICT r3 missing #1)."""
from pathlib import Path

import numpy as np
import pytest

REF101 = Path("/root/reference/examples/101")

pytestmark = pytest.mark.skipif(not REF101.exists(),
                                reason="reference examples not present")


@pytest.fixture(scope="module")
def regen101(tmp_path_factory):
    from udales_tpu.prep.inps import prepare_from_case
    out = tmp_path_factory.mktemp("inps101")
    counts = prepare_from_case(REF101, outdir=out)
    return out, counts


def test_inps_parse_101():
    from udales_tpu.prep.inps import prep_config_from_namoptions
    cfg, stl, extras = prep_config_from_namoptions(REF101 / "namoptions.101")
    assert stl == "geom.101.STL"
    assert (cfg.itot, cfg.jtot, cfg.ktot) == (64, 64, 64)
    assert cfg.zsize == 64.0
    assert cfg.u0 == 1.5 and cfg.thl0 == 290.0 and cfg.facT0 == 295.0
    assert extras["nsv"] == 1
    assert extras["line_sources"] == [
        (32.0, 0.0, 1.0, 32.0, 64.0, 1.0, 1.0, 0.5)]


def test_regenerates_ibm_files_exact(regen101):
    out, counts = regen101
    assert counts["nfcts"] == 320          # shipped &WALLS value
    for f in ["solid_u.txt", "solid_v.txt", "solid_w.txt", "solid_c.txt",
              "fluid_boundary_u.txt", "fluid_boundary_v.txt",
              "fluid_boundary_w.txt", "fluid_boundary_c.txt"]:
        a = set(map(tuple, np.loadtxt(REF101 / f, skiprows=1, dtype=int)))
        b = set(map(tuple, np.loadtxt(out / f, skiprows=1, dtype=int)))
        assert a == b, f


def test_regenerates_facets_unused(regen101):
    """facets_unused.<exp> (facets without c-sections, udprep_ibm.py
    write_facets_unused) must match the shipped file (empty for 101)."""
    out, _ = regen101
    assert (out / "facets_unused.101").read_text() == \
        (REF101 / "facets_unused.101").read_text()


def test_regenerates_case_inputs(regen101):
    out, _ = regen101
    pa = np.loadtxt(REF101 / "prof.inp.101", skiprows=2)
    pb = np.loadtxt(out / "prof.inp.101", skiprows=2)
    np.testing.assert_allclose(pb, pa, atol=1e-6)
    sa = np.loadtxt(REF101 / "scalarsourcel.inp.1.101", skiprows=2)
    sb = np.loadtxt(out / "scalarsourcel.inp.1.101", skiprows=2)
    np.testing.assert_allclose(sb, sa, atol=1e-9)
    ca = np.loadtxt(REF101 / "scalar.inp.101", skiprows=2)
    cb = np.loadtxt(out / "scalar.inp.101", skiprows=2)
    np.testing.assert_allclose(cb, ca, atol=1e-6)
    la = np.loadtxt(REF101 / "lscale.inp.101", skiprows=2)
    lb = np.loadtxt(out / "lscale.inp.101", skiprows=2)
    np.testing.assert_allclose(lb, la, atol=1e-6)


def test_patched_namoptions_runs(regen101):
    """The regenerated case dir (namoptions with patched &WALLS + generated
    inputs) must load through the normal solver entry."""
    out, counts = regen101
    import re
    text = (out / "namoptions.101").read_text()
    assert int(re.search(r"nfcts\s*=\s*(\d+)", text).group(1)) == 320
    # every &WALLS count patched to the regenerated value
    for k, v in counts.items():
        m = re.search(rf"{k}\s*=\s*(\d+)", text)
        assert m and int(m.group(1)) == v, k
    from udales_tpu.config import load_namoptions
    cfg = load_namoptions(out / "namoptions.101")
    assert cfg.walls.nfcts == 320


def test_types_file_pathway(tmp_path):
    """read_types/types_path (&INPS): per-facet wall types from a file
    override the floor/wall heuristic; an authored facets.inp is never
    overwritten (udprep_ibm.py write_facets)."""
    import numpy as np
    from udales_tpu.prep.prep import (PrepConfig, make_box_stl,
                                      prepare_case)
    make_box_stl(tmp_path / "g.stl", 4, 8, 4, 8, 6, 16.0, 16.0)
    from udales_tpu.prep.stl import read_stl
    ntri = len(read_stl(tmp_path / "g.stl")[0])
    types = 1 + (np.arange(ntri) % 3)
    np.savetxt(tmp_path / "mytypes.txt", types, fmt="%d",
               header="facet types")
    cfg = PrepConfig(itot=16, jtot=16, ktot=16, xlen=16.0, ylen=16.0,
                     zsize=16.0, expnr="906",
                     types_file=str(tmp_path / "mytypes.txt"))
    prepare_case(tmp_path / "g.stl", tmp_path, cfg)
    got = np.loadtxt(tmp_path / "facets.inp.906", skiprows=1)[:, 0]
    np.testing.assert_array_equal(got.astype(int), types)
    # authored-input protection: a re-run with different types keeps it
    cfg2 = PrepConfig(itot=16, jtot=16, ktot=16, xlen=16.0, ylen=16.0,
                      zsize=16.0, expnr="906")
    prepare_case(tmp_path / "g.stl", tmp_path, cfg2)
    got2 = np.loadtxt(tmp_path / "facets.inp.906", skiprows=1)[:, 0]
    np.testing.assert_array_equal(got2.astype(int), types)


def test_lscale_forcing_columns(tmp_path):
    """generate_lscale semantics (udprep_forcing.py:233-276): geostrophic
    wind under lcoriol, pressure gradient only when nothing else forces
    the flow, subsidence/radiation columns always."""
    import numpy as np
    from udales_tpu.prep.prep import (PrepConfig, make_box_stl,
                                      prepare_case)
    make_box_stl(tmp_path / "g.stl", 4, 8, 4, 8, 6, 16.0, 16.0)
    base = dict(itot=16, jtot=16, ktot=16, xlen=16.0, ylen=16.0,
                zsize=16.0)
    d1 = tmp_path / "c1"
    prepare_case(tmp_path / "g.stl", d1, PrepConfig(
        **base, expnr="907", u0=5.0, v0=-1.0, lcoriol=True, w_s=-0.01,
        R=-2e-5))
    ls = np.loadtxt(d1 / "lscale.inp.907", skiprows=2)
    np.testing.assert_allclose(ls[:, 1], 5.0)
    np.testing.assert_allclose(ls[:, 2], -1.0)
    np.testing.assert_allclose(ls[:, 3], 0.0)
    np.testing.assert_allclose(ls[:, 5], -0.01)
    np.testing.assert_allclose(ls[:, 9], -2e-5)
    d2 = tmp_path / "c2"
    prepare_case(tmp_path / "g.stl", d2, PrepConfig(
        **base, expnr="908", dpdx=1e-4))
    ls = np.loadtxt(d2 / "lscale.inp.908", skiprows=2)
    np.testing.assert_allclose(ls[:, 1], 0.0)
    np.testing.assert_allclose(ls[:, 3], 1e-4)
    d3 = tmp_path / "c3"
    prepare_case(tmp_path / "g.stl", d3, PrepConfig(
        **base, expnr="909", dpdx=1e-4, has_flow_forcing=True))
    ls = np.loadtxt(d3 / "lscale.inp.909", skiprows=2)
    np.testing.assert_allclose(ls[:, 3], 0.0)   # volume-flow forcing wins


def test_prof_lapse_rate(tmp_path):
    """thl lapse integrates over half-level spacings
    (udprep_forcing.py:59-65)."""
    import numpy as np
    from udales_tpu.prep.prep import (PrepConfig, make_box_stl,
                                      prepare_case)
    make_box_stl(tmp_path / "g.stl", 4, 8, 4, 8, 6, 16.0, 16.0)
    prepare_case(tmp_path / "g.stl", tmp_path, PrepConfig(
        itot=16, jtot=16, ktot=16, xlen=16.0, ylen=16.0, zsize=16.0,
        expnr="910", thl0=290.0, lapse=0.01))
    pr = np.loadtxt(tmp_path / "prof.inp.910", skiprows=2)
    # uniform dz=1 -> thl[k] = 290 + 0.01*k
    np.testing.assert_allclose(pr[:, 1], 290.0 + 0.01 * np.arange(16),
                               atol=1e-3)


def test_update_prof_from_driver(tmp_path):
    """idriver=2 profile init from the precursor's xytdump slab profiles
    (udprep_forcing.py:155-210); missing output warns and keeps prof."""
    import numpy as np
    import warnings as _w
    from udales_tpu.io.netcdf import NCWriter
    from udales_tpu.grid import Grid
    from udales_tpu.prep.inps import update_prof_from_driver
    nz = 8
    # target case prof
    zf = (np.arange(nz) + 0.5)
    with open(tmp_path / "prof.inp.902", "w") as f:
        f.write("# gen\n# z thl qt u v tke\n")
        for z in zf:
            f.write(f"{z:14.6f} 288.0 0.0 1.0 0.0 0.0\n")
    # missing precursor output -> warning, unchanged
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        ok = update_prof_from_driver(tmp_path, "902", 949, tmp_path)
    assert not ok and any("not found" in str(r.message) for r in rec)
    # synthesize a precursor xytdump
    g = Grid.uniform(4, 4, nz, 4.0, 4.0, float(nz), dtype=np.float32)
    w = NCWriter(tmp_path / "xytdump.949.nc", g)
    for name in ("uxyt", "vxyt", "thlxyt", "qtxyt", "tketxyc"):
        w.define(name, ("zt",), "")
    prof = lambda v: np.full(nz, v)
    for t, off in ((10.0, 0.0), (20.0, 1.0)):
        w.append(t, {"uxyt": prof(2.0 + off), "vxyt": prof(0.1),
                     "thlxyt": prof(300.0 + off), "qtxyt": prof(0.001),
                     "tketxyc": prof(0.05)})
    w.close()
    assert update_prof_from_driver(tmp_path, "902", 949, tmp_path)
    pr = np.loadtxt(tmp_path / "prof.inp.902", skiprows=2)
    np.testing.assert_allclose(pr[:, 3], 3.0, rtol=1e-5)   # last slice
    np.testing.assert_allclose(pr[:, 1], 301.0, rtol=1e-5)
    # explicit time index picks the first slice
    update_prof_from_driver(tmp_path, "902", 949, tmp_path,
                            drivertimeidx=0)
    pr = np.loadtxt(tmp_path / "prof.inp.902", skiprows=2)
    np.testing.assert_allclose(pr[:, 3], 2.0, rtol=1e-5)


def test_tfacinit_layers_from_fact(tmp_path):
    """write_Tfacinit_layers: last time slice of a previous run's facT.nc,
    both axis layouts (udprep_seb.py write_Tfacinit_layers)."""
    import numpy as np
    from udales_tpu.io.netcdf import NCWriter
    from udales_tpu.prep.prep import write_tfacinit_layers
    nfcts, L = 6, 4
    w = NCWriter(tmp_path / "facT.901.nc", nfcts=nfcts, nlayers=L)
    w.define("T", ("facet", "layer"), "K")
    for t, off in ((1.0, 0.0), (2.0, 5.0)):
        w.append(t, {"T": 290.0 + off
                     + np.arange(nfcts * L).reshape(nfcts, L)})
    w.close()
    write_tfacinit_layers(tmp_path, "902", tmp_path / "facT.901.nc",
                          nfcts, 3)
    out = np.loadtxt(tmp_path / "Tfacinit_layers.inp.902", skiprows=1)
    assert out.shape == (nfcts, 3)
    want = 295.0 + np.arange(nfcts * L).reshape(nfcts, L)[:, :3]
    np.testing.assert_allclose(out, want, atol=1e-3)


def test_iwallmom_sanity_switch(tmp_path):
    """iwallmom=2 without an evolved temperature flips to neutral (3)
    in the regenerated namoptions (udprep_seb.py:27-37)."""
    import re
    import shutil
    import warnings as _w
    from udales_tpu.prep.inps import prepare_from_case
    src = REF101
    dst = tmp_path / "case"
    dst.mkdir()
    shutil.copy(src / "geom.101.STL", dst / "geom.101.STL")
    nam = (src / "namoptions.101").read_text()
    nam = nam.replace("ltempeq      = .true.", "ltempeq      = .false.")
    nam = nam.replace("iwalltemp    = 2", "iwallmom = 2\niwalltemp    = 2")
    (dst / "namoptions.101").write_text(nam)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        prepare_from_case(dst, outdir=dst)
    assert any("neutral wall function" in str(r.message) for r in rec)
    out = (dst / "namoptions.101").read_text()
    assert re.search(r"iwallmom\s*=\s*3", out)
