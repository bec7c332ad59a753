"""Core dynamical-core tests: grid metrics, Poisson solver, divergence-free
projection, conservation sanity, and short stable integration.

Oracle strategy mirrors the reference test suite (SURVEY.md section 4):
in-process checks of primitives against brute force.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udales_tpu.config import Config, DomainConfig, RunConfig, PhysicsConfig, \
    WallsConfig, BCConfig, SubgridConfig, SGS_VREMAN, SGS_DNS
from udales_tpu.grid import Grid
from udales_tpu.ops.poisson import PoissonSolver, dct2, idct2
from udales_tpu.run import Model
from udales_tpu.state import initial_state, profile_fields, randomize
import dataclasses


def make_cfg(**kw):
    dom = DomainConfig(itot=16, jtot=12, ktot=8, xlen=16.0, ylen=12.0)
    cfg = Config(domain=dom, dtype="float64",
                 run=RunConfig(ladaptive=False, dtmax=0.02, randomize=False),
                 walls=WallsConfig(lbottom=True),
                 bc=BCConfig(z0=0.01, z0h=0.001, thls=288.0))
    return dataclasses.replace(cfg, **kw)


def make_model(cfg=None):
    cfg = cfg or make_cfg()
    d = cfg.domain
    grid = Grid.uniform(d.itot, d.jtot, d.ktot, d.xlen, d.ylen, 8.0,
                        dtype=np.float64)
    return Model(cfg, grid)


def init_state(model, seed=1, amp=0.05):
    nz = model.grid.ktot
    f = profile_fields(model.grid, np.full(nz, 1.0), np.zeros(nz),
                       np.full(nz, 288.0), np.zeros(nz), np.full(nz, 5e-5))
    f = randomize(f, jax.random.PRNGKey(seed), amp, nz)
    return initial_state(model.grid, f, dt0=0.02)


class TestGrid:
    def test_uniform_metrics(self):
        g = Grid.uniform(8, 8, 8, 16.0, 16.0, 8.0, dtype=np.float64)
        assert np.allclose(g.dzf, 1.0)
        assert np.allclose(g.dzh, 1.0)
        assert np.isclose(g.dx, 2.0)
        assert np.isclose(g.zf[0], 0.5)
        assert np.isclose(g.zh[-1], 8.0)

    def test_stretched_metrics(self):
        # geometric stretching: zh reconstructed from zf midpoint recursion
        zf = np.cumsum(1.1 ** np.arange(8)) - 0.5 * 1.1 ** np.arange(8)
        g = Grid(4, 4, 8, 4.0, 4.0, zf, dtype=np.float64)
        assert np.allclose(g.dzf, np.diff(g.zh))
        assert np.allclose(g.dzh[1:-1], zf[1:] - zf[:-1])
        assert np.isclose(g.dzh[0], 2 * zf[0])


class TestDCT:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((5, 8, 3)))
        X = dct2(x, axis=1)
        y = idct2(X, axis=1)
        assert np.allclose(y, x, atol=1e-10)

    def test_matches_scipy_def(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(16)
        X = np.asarray(dct2(jnp.asarray(x)[None, :], axis=1))[0]
        # REDFT10: X[k] = 2 sum x[j] cos(pi k (2j+1) / 2N)
        j = np.arange(16)
        ref = np.array([2 * np.sum(x * np.cos(np.pi * k * (2 * j + 1) / 32))
                        for k in range(16)])
        assert np.allclose(X, ref, atol=1e-10)


class TestPoisson:
    def test_laplacian_inverse(self):
        """solve() must invert the discrete staggered Laplacian with
        Neumann-z BCs (periodic x/y)."""
        cfg = make_cfg()
        d = cfg.domain
        grid = Grid.uniform(d.itot, d.jtot, d.ktot, d.xlen, d.ylen, 8.0,
                            dtype=np.float64)
        pois = PoissonSolver(grid, cfg)
        rng = np.random.default_rng(2)
        p = jnp.asarray(rng.standard_normal(grid.shape))
        p = p - jnp.mean(p)

        def laplacian(p):
            gp = jnp.pad(p, ((1, 1), (1, 1), (0, 0)), mode="wrap")
            lap = ((gp[2:, 1:-1] - 2 * gp[1:-1, 1:-1] + gp[:-2, 1:-1])
                   * grid.dx2i
                   + (gp[1:-1, 2:] - 2 * gp[1:-1, 1:-1] + gp[1:-1, :-2])
                   * grid.dy2i)
            # z with Neumann: flux zero at bottom/top faces
            dzfi = grid.dzfi[None, None, :]
            dzhi = grid.dzhi
            flux = (p[:, :, 1:] - p[:, :, :-1]) * dzhi[1:-1][None, None, :]
            zero = jnp.zeros_like(p[:, :, :1])
            flux = jnp.concatenate([zero, flux, zero], axis=2)
            lap += (flux[:, :, 1:] - flux[:, :, :-1]) * dzfi
            return lap

        rhs = laplacian(p)
        p_sol = pois.solve(rhs)
        # solution defined up to a constant in the zero mode
        p0 = p - jnp.mean(p)
        ps = p_sol - jnp.mean(p_sol)
        assert np.allclose(ps, p0, atol=1e-8), np.abs(ps - p0).max()


class TestStep:
    def test_projection_divergence_free(self):
        model = make_model()
        state = init_state(model)
        state2 = jax.jit(model.step)(state)
        # divergence of the updated velocity field
        c = state2.c
        grid = model.grid
        gu = jnp.pad(c.u, ((0, 1), (0, 0), (0, 0)), mode="wrap")
        gv = jnp.pad(c.v, ((0, 0), (0, 1), (0, 0)), mode="wrap")
        div = ((gu[1:] - gu[:-1]) * grid.dxi
               + (gv[:, 1:] - gv[:, :-1]) * grid.dyi
               + (c.w[:, :, 1:] - c.w[:, :, :-1])
               * grid.dzfi[None, None, :])
        # rhs of projection is div(u)/rk3coef; tolerance scales with dt
        assert np.abs(div).max() < 1e-8, np.abs(div).max()

    def test_short_run_stable(self):
        model = make_model()
        state = init_state(model)
        final = jax.jit(lambda s: model.run(s, 10))(state)
        assert np.isfinite(np.asarray(final.c.u)).all()
        assert np.isfinite(np.asarray(final.c.w)).all()
        assert np.abs(np.asarray(final.c.u)).max() < 10.0

    def test_momentum_source_balance(self):
        """Uniform u=1 flow with dpdx forcing: domain-mean momentum change
        must equal dt*(dpdx - tau_wall/zsize) with the neutral log-law floor
        stress tau = (fkar/log(dz/2/z0))^2 * u^2 (dT=0 -> neutral)."""
        cfg = make_cfg(physics=PhysicsConfig())
        model = make_model(cfg)
        model.dpdxl = jnp.full(model.grid.ktot, -1e-4, jnp.float64)
        state = init_state(model, amp=0.0)
        s2 = jax.jit(model.step)(state)
        du = np.mean(np.asarray(s2.c.u)) - 1.0
        grid = model.grid
        ctm = (0.41 / np.log(0.5 * grid.dzf[0] / 0.01)) ** 2
        expected = float(s2.dt) * (1e-4 - ctm / grid.zh[-1])
        assert abs(du - expected) / abs(expected) < 0.01, (du, expected)

    def test_adaptive_dt(self):
        cfg = make_cfg(run=RunConfig(ladaptive=True, dtmax=5.0,
                                     randomize=False))
        model = make_model(cfg)
        state = init_state(model)
        s2 = jax.jit(model.step)(state)
        # CFL: dt*max(|u|/dx...) <= courant
        c = state.m
        grid = model.grid
        cour = np.asarray(jnp.max(
            jnp.abs(c.u) * grid.dxi + jnp.abs(c.v) * grid.dyi
            + jnp.abs(c.w[..., :grid.ktot])
            / grid.dzh[:grid.ktot][None, None, :]))
        assert float(s2.dt) <= 5.0
        assert float(s2.dt) * cour <= 1.5 * 1.001


class TestPoissonDiag:
    def test_diag_matches_thomas(self):
        """The uniform-z diagonal path equals the tridiagonal path up to an
        additive constant (the singular mean mode)."""
        cfg = make_cfg()
        d = cfg.domain
        grid = Grid.uniform(d.itot, d.jtot, d.ktot, d.xlen, d.ylen, 8.0,
                            dtype=np.float64)
        pois = PoissonSolver(grid, cfg)
        assert pois.diag_z
        rng = np.random.default_rng(7)
        rhs = jnp.asarray(rng.standard_normal(grid.shape))
        rhs = rhs - jnp.mean(rhs)  # compatible
        p_diag = pois.solve(rhs)
        pois.diag_z = False
        p_thom = pois.solve(rhs)
        dd = np.asarray(p_diag) - np.asarray(p_thom)
        assert np.abs(dd - dd.mean()).max() < 1e-8, np.abs(dd-dd.mean()).max()

    def test_stretched_uses_thomas(self):
        cfg = make_cfg()
        zf = np.cumsum(1.05 ** np.arange(8)) - 0.5 * 1.05 ** np.arange(8)
        grid = Grid(16, 12, 8, 16.0, 12.0, zf, dtype=np.float64)
        pois = PoissonSolver(grid, cfg)
        assert not pois.diag_z
