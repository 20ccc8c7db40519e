"""Operator-level transpose identities ⟨u, Av⟩ = ⟨Aᵀu, v⟩ for every stencil.

Mirrors the reference's adjoint-operator unit tests
(/root/reference/test/SIA2D_adjoint_utils.jl:8-126).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odinn_tpu.ops import stencils as st

NX, NY = 17, 13
DX, DY = 37.0, 53.0
ETA0 = 1.0


def rand(key, shape):
    return jax.random.normal(key, shape, dtype=jnp.float64)


def dot(a, b):
    return jnp.sum(a * b)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_diff_x_adjoint(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    v = rand(k1, (NX, NY))
    u = rand(k2, (NX - 1, NY))
    lhs = dot(u, st.diff_x(v) / DX)
    rhs = dot(st.diff_x_adjoint(u, DX), v)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_diff_y_adjoint(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    v = rand(k1, (NX, NY))
    u = rand(k2, (NX, NY - 1))
    lhs = dot(u, st.diff_y(v) / DY)
    rhs = dot(st.diff_y_adjoint(u, DY), v)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_avg_adjoint(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    v = rand(k1, (NX, NY))
    u = rand(k2, (NX - 1, NY - 1))
    np.testing.assert_allclose(dot(u, st.avg(v)), dot(st.avg_adjoint(u), v), rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_avg_x_adjoint(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    v = rand(k1, (NX, NY))
    u = rand(k2, (NX - 1, NY))
    np.testing.assert_allclose(dot(u, st.avg_x(v)), dot(st.avg_x_adjoint(u), v), rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_avg_y_adjoint(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    v = rand(k1, (NX, NY))
    u = rand(k2, (NX, NY - 1))
    np.testing.assert_allclose(dot(u, st.avg_y(v)), dot(st.avg_y_adjoint(u), v), rtol=1e-12)


def test_stencils_match_jax_transpose():
    """Hand adjoints equal jax.linear_transpose of the forward ops."""
    key = jax.random.PRNGKey(7)
    v = rand(key, (NX, NY))
    for fwd, adj, cot_shape in [
        (lambda x: st.diff_x(x) / DX, lambda u: st.diff_x_adjoint(u, DX), (NX - 1, NY)),
        (st.avg, st.avg_adjoint, (NX - 1, NY - 1)),
        (st.avg_x, st.avg_x_adjoint, (NX - 1, NY)),
        (st.avg_y, st.avg_y_adjoint, (NX, NY - 1)),
    ]:
        u = rand(jax.random.PRNGKey(11), cot_shape)
        (ref,) = jax.linear_transpose(fwd, v)(u)
        np.testing.assert_allclose(np.asarray(adj(u)), np.asarray(ref), rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1])
def test_clamp_borders_dx_adjoint_vs_jax(seed):
    """Clamp adjoint matches JAX's VJP of the forward clamp (a.e.)."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    h = jnp.abs(rand(k1, (NX, NY)))
    ds = 0.01 * rand(k2, (NX - 1, NY - 2))
    cot = rand(k3, (NX - 1, NY - 2))

    fwd = lambda ds_, h_: st.clamp_borders_dx(ds_, h_, ETA0, DX)
    _, vjp = jax.vjp(fwd, ds, h)
    d_ds_ref, d_h_ref = vjp(cot)
    d_ds, d_h = st.clamp_borders_dx_adjoint(cot, ETA0, DX, h, ds)
    np.testing.assert_allclose(np.asarray(d_ds), np.asarray(d_ds_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(d_h), np.asarray(d_h_ref), atol=1e-10)


@pytest.mark.parametrize("seed", [0, 1])
def test_clamp_borders_dy_adjoint_vs_jax(seed):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    h = jnp.abs(rand(k1, (NX, NY)))
    ds = 0.01 * rand(k2, (NX - 2, NY - 1))
    cot = rand(k3, (NX - 2, NY - 1))

    fwd = lambda ds_, h_: st.clamp_borders_dy(ds_, h_, ETA0, DY)
    _, vjp = jax.vjp(fwd, ds, h)
    d_ds_ref, d_h_ref = vjp(cot)
    d_ds, d_h = st.clamp_borders_dy_adjoint(cot, ETA0, DY, h, ds)
    np.testing.assert_allclose(np.asarray(d_ds), np.asarray(d_ds_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(d_h), np.asarray(d_h_ref), atol=1e-10)


def test_batched_broadcasting():
    """All stencils broadcast over leading batch axes."""
    key = jax.random.PRNGKey(3)
    v = rand(key, (4, NX, NY))
    assert st.diff_x(v).shape == (4, NX - 1, NY)
    assert st.avg(v).shape == (4, NX - 1, NY - 1)
    assert st.avg_adjoint(st.avg(v)).shape == (4, NX, NY)
    single = st.avg(v[0])
    np.testing.assert_allclose(np.asarray(st.avg(v)[0]), np.asarray(single))
