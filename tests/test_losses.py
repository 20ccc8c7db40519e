"""Loss-layer tests: manual backward vs AD, regularization operators, kinds.

Mirrors the reference's loss gradient tests (test_grad_L2Sum,
test_grad_TikhonovRegularization, /root/reference/test/test_grad_loss.jl:405-496)
with JAX AD standing in for Enzyme as the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odinn_tpu.core.glacier import is_in_glacier
from odinn_tpu.losses.losses import (
    L2Sum,
    LogSum,
    LossH,
    LossHV,
    LossV,
    MultiLoss,
    backward_simple_loss,
    loss_uses_velocity,
    simple_loss,
    term_kind,
)
from odinn_tpu.losses.regularization import (
    TikhonovRegularization,
    laplacian,
    laplacian_vjp,
)

NX, NY = 24, 20


def make_fields(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    b = jnp.maximum(400.0 * jax.random.normal(k1, (NX, NY)) + 200.0, 0.0)
    a = b + 30.0 * jax.random.normal(k2, (NX, NY))
    return a, b


@pytest.mark.parametrize("cfg", [L2Sum(distance=2), LogSum(distance=2, eps=0.1)])
def test_backward_simple_loss_matches_ad(cfg):
    a, b = make_fields()
    a = jnp.abs(a)
    mask = is_in_glacier(b, cfg.distance)
    norm = jnp.asarray(float(a.size))
    grad_ad = jax.grad(lambda x: simple_loss(cfg, x, b, mask, norm))(a)
    grad_manual = backward_simple_loss(cfg, a, b, mask, norm)
    np.testing.assert_allclose(np.asarray(grad_manual), np.asarray(grad_ad), atol=1e-12)


def test_l2sum_masked_semantics():
    a, b = make_fields()
    mask = is_in_glacier(b, 2)
    val = simple_loss(L2Sum(distance=2), a, b, mask, jnp.asarray(1.0))
    expect = float(jnp.sum(jnp.where(mask, (a - b) ** 2, 0.0)))
    np.testing.assert_allclose(float(val), expect, rtol=1e-12)


def test_laplacian_vjp_transpose_identity():
    key = jax.random.PRNGKey(3)
    a = jax.random.normal(key, (NX, NY))
    lam = jax.random.normal(jax.random.PRNGKey(4), (NX, NY))
    dx, dy = 37.0, 53.0
    lhs = jnp.sum(lam * laplacian(a, dx, dy))
    rhs = jnp.sum(laplacian_vjp(lam, a, dx, dy) * a)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)
    # and against jax.linear_transpose
    (ref,) = jax.linear_transpose(lambda x: laplacian(x, dx, dy), a)(lam)
    np.testing.assert_allclose(
        np.asarray(laplacian_vjp(lam, a, dx, dy)), np.asarray(ref), atol=1e-12
    )


def test_tikhonov_penalizes_roughness():
    smooth = jnp.outer(jnp.linspace(0, 1, NX), jnp.linspace(0, 1, NY))
    rough = smooth + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (NX, NY))
    reg = TikhonovRegularization()
    mask = jnp.ones((NX, NY), bool)
    assert float(reg(rough, 1.0, 1.0, mask)) > 10.0 * float(reg(smooth, 1.0, 1.0, mask))


def test_term_kinds_and_velocity_trait():
    from odinn_tpu.losses.regularization import (
        InitialThicknessRegularization,
        RheologyRegularization,
        VelocityRegularization,
    )
    from odinn_tpu.losses.time_aggregated import LossAvgV, LossDhdt

    assert term_kind(LossH()) == "transient"
    assert term_kind(InitialThicknessRegularization()) == "initial"
    assert term_kind(RheologyRegularization()) == "initial"
    assert term_kind(VelocityRegularization()) == "transient"
    assert term_kind(LossDhdt()) == "aggregate"
    assert term_kind(LossAvgV()) == "aggregate"

    assert not loss_uses_velocity(LossH())
    assert loss_uses_velocity(LossV())
    assert loss_uses_velocity(LossHV())
    assert loss_uses_velocity(MultiLoss((LossH(), LossV()), (1.0, 0.5)))


def test_multiloss_weighted_sum():
    a, b = make_fields()
    from odinn_tpu.losses.losses import LossContext

    ctx = LossContext(H_ref=b, normalization=jnp.asarray(1.0))
    l1 = LossH(loss=L2Sum(distance=1))
    ml = MultiLoss(terms=(l1, l1), weights=(1.0, 2.5))
    np.testing.assert_allclose(
        float(ml(ctx, a, 0.0)), 3.5 * float(l1(ctx, a, 0.0)), rtol=1e-12
    )
    with pytest.raises(ValueError):
        MultiLoss(terms=(l1,), weights=(1.0, 2.0))
