"""UDPost postprocessing against committed reference case inputs and
against this framework's own NetCDF outputs (udbase.py parity semantics)."""
import numpy as np
import pytest

CASE102 = "/root/reference/examples/102"


@pytest.fixture(scope="module")
def post102():
    from udales_tpu.post import UDPost
    return UDPost("102", CASE102)


class TestCaseLoading:
    def test_grid_and_counts(self, post102):
        p = post102
        assert (p.itot, p.jtot, p.ktot) == (64, 64, 64)
        assert p.nfcts == 2885
        assert set(p.facsec) == {"u", "v", "w", "c"}
        # counts from examples/102/info.txt (&WALLS)
        assert len(p.facsec["u"]["facid"]) == 13354
        assert len(p.facsec["c"]["facid"]) == 12240

    def test_solid_masks(self, post102):
        m = post102.load_solid_masks()
        assert m["c"].sum() == 8192          # nsolpts_c in info.txt
        assert m["u"].shape == (64, 64, 64)

    def test_prof_and_lscale(self, post102):
        prof = post102.load_prof()
        assert len(prof["u"]) == 64
        ls = post102.load_lscale()
        assert len(ls["ug"]) == 64


class TestFacetProps:
    def test_assign_prop_scalar(self, post102):
        z0 = post102.assign_prop_to_fac("z0")
        assert z0.shape == (2885,)
        assert np.all(z0 > 0)

    def test_assign_prop_layered(self, post102):
        lam = post102.assign_prop_to_fac("lam")
        d = post102.assign_prop_to_fac("d")
        assert lam.shape == d.shape == (2885, post102.cfg.eb.nfaclyrs)
        assert np.all(d > 0)

    def test_area_average(self, post102):
        # area-average of a constant is that constant
        ones = np.ones(post102.nfcts)
        assert np.isclose(post102.area_average_fac(ones), 1.0)
        # selection restricts the weights
        sel = np.arange(100)
        v = np.zeros(post102.nfcts)
        v[:100] = 2.0
        assert np.isclose(post102.area_average_fac(v, sel), 2.0)


class TestFacetFieldConversion:
    def test_fac_to_field_constant(self, post102):
        """Cells covered by sections of a constant facet value get exactly
        that value (area-weighted mean of a constant)."""
        f = post102.convert_fac_to_field(np.full(post102.nfcts, 3.5))
        covered = np.isfinite(f)
        assert covered.sum() > 0
        assert np.allclose(f[covered], 3.5)

    def test_frontal_properties(self, post102):
        fp = post102.calculate_frontal_properties()
        assert fp["skylinex"].shape == (64, 64)
        assert 0.0 < fp["brx"] <= 1.0
        assert 0.0 < fp["bry"] <= 1.0
        assert fp["Afx"] > 0 and fp["Afy"] > 0

    def test_facflx_density_integral(self, post102):
        """convert_facflx_to_field conserves sum(var*area) when integrated
        over cell volumes."""
        var = np.linspace(0.5, 1.5, post102.nfcts)
        rho = post102.convert_facflx_to_field(var)
        fs = post102.facsec["c"]
        expect = float((var[fs["facid"]] * fs["area"]).sum())
        cellv = post102.dx * post102.dy * post102.dzt[None, None, :]
        assert np.isclose(float((rho * cellv).sum()), expect, rtol=1e-10)


class TestOutputsRoundtrip:
    def test_seb_roundtrip(self, tmp_path):
        """Write facT/facEB via NCWriter, reassemble SEB via UDPost."""
        import shutil
        from udales_tpu.io.netcdf import NCWriter
        from udales_tpu.post import UDPost

        case = tmp_path / "case"
        case.mkdir()
        for f in ("namoptions.102", "prof.inp.102", "facets.inp.102",
                  "factypes.inp.102", "facetarea.inp.102"):
            src = f"{CASE102}/{f}"
            import os
            if os.path.exists(src):
                shutil.copy(src, case / f)
        # facetarea may not exist in 102; synthesize
        p0 = UDPost("102", case) if (case / "facetarea.inp.102").exists() \
            else None
        nf, L = 2885, 3
        if p0 is None:
            np.savetxt(case / "facetarea.inp.102",
                       np.ones(nf), header="area", comments="# ")
            p0 = UDPost("102", case)

        wT = NCWriter(case / "facT.102.nc", nfcts=nf, nlayers=L + 1)
        wT.define("T", ("facet", "layer"), "K", "T")
        wT.define("dTdz", ("facet", "layer"), "K/m", "grad")
        T = np.full((nf, L + 1), 300.0)
        dTdz = np.full((nf, L + 1), -2.0)
        wT.append(0.0, {"T": T, "dTdz": dTdz})
        wT.close()
        wEB = NCWriter(case / "facEB.102.nc", nfcts=nf)
        for v in ("netsw", "LWin", "LWout", "hf", "ef"):
            wEB.define(v, ("facet",), "W/m^2", v)
        wEB.append(0.0, {"netsw": np.full(nf, 100.0),
                         "LWin": np.full(nf, 350.0),
                         "LWout": np.full(nf, 400.0),
                         "hf": np.full(nf, 30.0),
                         "ef": np.full(nf, 10.0)})
        wEB.close()

        seb = p0.load_seb()
        assert np.allclose(seb["Kstar"], 100.0)
        assert np.allclose(seb["Lstar"], -50.0)
        assert np.allclose(seb["H"], -30.0)
        assert np.allclose(seb["Tsurf"], 300.0)
        lam1 = p0.assign_prop_to_fac("lam")[:, 0]
        assert np.allclose(seb["G"][:, 0], -lam1 * -2.0)
        avg = p0.area_average_seb(seb)
        assert np.isclose(avg["Kstar"][0], 100.0)
