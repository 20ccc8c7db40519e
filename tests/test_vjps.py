"""Single-RHS VJP tests: hand-written discrete adjoint vs reverse-mode AD.

Mirrors /root/reference/test/SIA2D_adjoint.jl:2-380 — random cotangents, the
AD pullback of the discretized RHS as the oracle (the reference uses
finite differences / Enzyme).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odinn_tpu.core.params import (
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.inverse.adjoint_types import AutoVJP, ContinuousVJP, DiscreteVJP, NoVJP
from odinn_tpu.inverse import vjps
from odinn_tpu.laws.laws import LawA
from odinn_tpu.models.model import Model, SIA2DModel, init_theta
from odinn_tpu.models.nn import NeuralNetwork, default_architecture


@pytest.fixture(scope="module")
def setup():
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=(5.0, 6.0), use_MB=False),
        solver=SolverParameters(),
        UDE=UDEParameters(grad="discrete"),
    )
    glacier = halfar_glacier(nx=36, ny=32, dx=110.0, dy=130.0, temp=-16.0)
    nn = NeuralNetwork(default_architecture(1, light=True), seed=2)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    theta = init_theta(model, [glacier])
    lam = 1e-2 * jax.random.normal(jax.random.PRNGKey(0), glacier.H0.shape, jnp.float64)
    return params, glacier, model, theta, lam


def test_discrete_vjp_dH_matches_ad(setup):
    params, glacier, model, theta, lam = setup
    H = glacier.H0
    args = (lam, H, theta, glacier, 0, model, params, 5.0)
    d_manual = vjps.vjp_sia_dH(DiscreteVJP(), *args)
    d_auto = vjps.vjp_sia_dH(AutoVJP(), *args)
    m, a = np.asarray(d_manual), np.asarray(d_auto)
    denom = np.linalg.norm(a)
    assert denom > 0
    rel = np.linalg.norm(m - a) / denom
    assert rel < 1e-12, f"discrete vs AD dH mismatch: rel {rel}"


def test_discrete_vjp_dtheta_matches_ad(setup):
    params, glacier, model, theta, lam = setup
    H = glacier.H0
    args = (lam, H, theta, glacier, 0, model, params, 5.0)
    g_manual = vjps.vjp_sia_dtheta(DiscreteVJP(), *args)
    g_auto = vjps.vjp_sia_dtheta(AutoVJP(), *args)
    for m, a in zip(jax.tree.leaves(g_manual), jax.tree.leaves(g_auto)):
        denom = np.linalg.norm(np.asarray(a).ravel()) + 1e-30
        rel = np.linalg.norm(np.asarray(m - a).ravel()) / denom
        assert rel < 1e-10, f"discrete vs AD dθ mismatch: rel {rel}"


def test_continuous_vjp_dH_consistent(setup):
    """The continuous-adjoint operator is a different discretization of the
    same continuous object: it should agree with the discrete transpose in
    direction and magnitude (reference holds it to looser FD gates,
    /root/reference/test/runtests.jl:116-196)."""
    params, glacier, model, theta, lam = setup
    # smooth cotangent (the continuous operator assumes smooth fields)
    x, y = jnp.meshgrid(glacier.coords_x, glacier.coords_y, indexing="ij")
    r2 = (x**2 + y**2) / 800.0**2
    lam_s = jnp.exp(-r2)
    H = glacier.H0
    args = (lam_s, H, theta, glacier, 0, model, params, 5.0)
    d_cont = vjps.vjp_sia_dH(ContinuousVJP(), *args)
    d_disc = vjps.vjp_sia_dH(DiscreteVJP(), *args)
    m, a = np.asarray(d_cont).ravel(), np.asarray(d_disc).ravel()
    cos = np.dot(m, a) / (np.linalg.norm(m) * np.linalg.norm(a))
    ratio = np.linalg.norm(m) / np.linalg.norm(a)
    assert cos > 0.97, f"continuous/discrete angle too large: cos={cos}"
    assert 0.8 < ratio < 1.25, f"continuous/discrete magnitude off: {ratio}"


def test_surface_velocity_vjps(setup):
    params, glacier, model, theta, lam = setup
    H = glacier.H0
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    lam_x = 1e-3 * jax.random.normal(k1, (glacier.nx - 1, glacier.ny - 1), jnp.float64)
    lam_y = 1e-3 * jax.random.normal(k2, (glacier.nx - 1, glacier.ny - 1), jnp.float64)

    dH = vjps.vjp_surface_v_dH(DiscreteVJP(), lam_x, lam_y, H, theta, glacier, 0, model, params, 5.0)
    assert np.isfinite(np.asarray(dH)).all()
    # FD check along a direction supported on the smooth dome interior
    # (central FD is invalid across the margin/clamp kinks)
    key = jax.random.PRNGKey(3)
    v = jax.random.normal(key, H.shape, jnp.float64) * (H > 100.0)

    from odinn_tpu.models.model import make_values_fn, resolve_outer_values
    from odinn_tpu.physics.sia2d import surface_velocity

    def proj(h):
        outer = resolve_outer_values(model, theta, glacier, 0, 5.0)
        vfn = make_values_fn(model, theta, glacier, 0, 5.0, outer)
        vx, vy, _ = surface_velocity(h, glacier.B, glacier.dx, glacier.dy, vfn, model.target, params.physical)
        return jnp.sum(vx * lam_x) + jnp.sum(vy * lam_y)

    eps = 1e-4
    fd = (proj(H + eps * v) - proj(H - eps * v)) / (2 * eps)
    got = jnp.sum(dH * v)
    np.testing.assert_allclose(float(got), float(fd), rtol=1e-5)

    dth = vjps.vjp_surface_v_dtheta(DiscreteVJP(), lam_x, lam_y, H, theta, glacier, 0, model, params, 5.0)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(dth))


def test_mb_vjp_vs_fd(setup):
    """MB pullback vs finite differences (reference MB_VJP test,
    /root/reference/test/MB_VJP.jl:2-99)."""
    from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate
    from odinn_tpu.physics.mass_balance import TImodel1, mb_timestep

    params, _, model, theta, _ = setup
    clim = monthly_dummy_climate(5.0, 24, temp_mean=-2.0, nx=36, ny=32)
    glacier = halfar_glacier(nx=36, ny=32, dx=110.0, temp=-16.0, climate=clim)
    glacier = glacier.replace(B=jnp.full_like(glacier.B, 1800.0))
    H = glacier.H0
    mb = TImodel1()
    lam = jax.random.normal(jax.random.PRNGKey(5), H.shape, jnp.float64)
    dH = vjps.vjp_mb_dH(AutoVJP(), lam, H, glacier, mb, 5.5, 1.0 / 12.0)

    v = jax.random.normal(jax.random.PRNGKey(6), H.shape, jnp.float64)

    def proj(h):
        return jnp.sum(lam * (mb_timestep(h, glacier, mb, 5.5, 1.0 / 12.0) - h))

    eps = 1e-5
    fd = (proj(H + eps * v) - proj(H - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.sum(dH * v)), float(fd), rtol=1e-5, atol=1e-8)

    assert float(jnp.abs(vjps.vjp_mb_dH(NoVJP(), lam, H, glacier, mb, 5.5, 1 / 12)).max()) == 0.0
