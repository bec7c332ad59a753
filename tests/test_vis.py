"""Visualization (udvis-equivalent) tests: every plot function renders a
matplotlib figure headlessly on reference case 101 and the color policy
holds (diverging centred at zero for signed facet data, fixed categorical
order for identity)."""
from pathlib import Path

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

CASE = Path("/root/reference/examples/101")

pytestmark = pytest.mark.skipif(not CASE.exists(), reason="reference absent")


@pytest.fixture(scope="module")
def post():
    from udales_tpu.post import UDPost
    return UDPost("101", CASE)


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close("all")


def test_show_geometry(post):
    fig = post.vis.show_geometry(plot_quiver=True)
    assert fig.axes and fig.axes[0].name == "3d"
    # ground + buildings both present -> two mesh collections + edges
    assert len(fig.axes[0].collections) >= 2


def test_plot_fac_signed_uses_diverging(post):
    nf = post.nfcts
    var = np.linspace(-1.0, 2.0, nf)
    fig = post.vis.plot_fac(var)
    # colorbar present and symmetric about zero
    cbar_ax = fig.axes[-1]
    lo, hi = cbar_ax.get_ylim()
    assert lo == pytest.approx(-hi)


def test_plot_fac_wrong_length_raises(post):
    with pytest.raises(ValueError):
        post.vis.plot_fac(np.zeros(3))


def test_plot_fac_type(post):
    fig = post.vis.plot_fac_type()
    assert fig.axes[0].get_legend() is not None


def test_plot_solid_and_boundary(post):
    fig = post.vis.plot_solid("c")
    assert fig.axes[0].collections
    fig2 = post.vis.plot_fluid_boundary("c")
    assert fig2.axes[0].collections


def test_plot_2dmap(post):
    v = np.random.default_rng(0).random((post.itot, post.jtot))
    fig = post.vis.plot_2dmap(v, labels="test")
    assert fig.axes[0].get_title() == "test"


def test_profiles_and_lscale_and_dz(post, tmp_path):
    fig = post.vis.plot_profiles(save=True, outdir=tmp_path)
    assert (tmp_path / "profiles_101.png").exists()
    assert len(fig.axes) == 5
    post.vis.plot_dz_variation(save=True, outdir=tmp_path)
    assert (tmp_path / "dz_101.png").exists()
    if (CASE / "lscale.inp.101").exists():
        post.vis.plot_lscale()


def test_missing_backend_raises(post):
    with pytest.raises((ImportError, NotImplementedError)):
        post.vis.show_geometry(backend="pyvista")
