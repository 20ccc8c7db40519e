"""Fused Pallas SIA2D RHS kernel vs the XLA stencil path.

Runs in interpret mode on CPU; compiled on TPU. Checks forward equality to
roundoff and custom_vjp gradients vs finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odinn_tpu.core.params import PhysicalParameters
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.ops.pallas.sia_kernel import pallas_available, sia2d_rhs_pallas
from odinn_tpu.physics.sia2d import SIAValues, sia2d_rhs
from odinn_tpu.physics.targets import ATarget

PHYS = PhysicalParameters()


def batch():
    g1 = halfar_glacier(nx=40, ny=40, dx=100.0, temp=-15.0)
    g2 = halfar_glacier(nx=40, ny=40, dx=120.0, temp=-20.0, A=4e-19)
    H = jnp.stack([g1.H0, g2.H0])
    B = jnp.stack([g1.B, g2.B])
    scal = jnp.array(
        [[100.0, 100.0, 8e-19, 0.0, 3.0, 3.0, 0.0],
         [120.0, 120.0, 4e-19, 0.0, 3.0, 3.0, 0.0]]
    )
    return H, B, scal, (g1, g2)


def test_pallas_matches_xla_forward():
    assert pallas_available()
    H, B, scal, (g1, g2) = batch()
    out = sia2d_rhs_pallas(H, B, scal, PHYS.rho, PHYS.g, PHYS.eta0)
    tgt = ATarget()

    def ref_one(Hg, Bg, dx, A):
        vals = SIAValues(A=jnp.asarray(A), C=jnp.asarray(0.0), n=jnp.asarray(3.0),
                         p=jnp.asarray(3.0), q=jnp.asarray(0.0))
        return sia2d_rhs(Hg, Bg, dx, dx, lambda hb, gs: vals, tgt, PHYS)

    ref = jnp.stack([ref_one(g1.H0, g1.B, 100.0, 8e-19), ref_one(g2.H0, g2.B, 120.0, 4e-19)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


@pytest.mark.slow   # pallas interpret-mode on CPU is minutes-scale; the forward
# parity test stays in the default lane, and the kernels run compiled on real
# TPU in benchmarks/pallas_roofline.py
def test_pallas_custom_vjp_gradients():
    H, B, scal, _ = batch()

    def loss_a(a):
        s = scal.at[0, 2].set(a)
        return jnp.sum(sia2d_rhs_pallas(H, B, s, PHYS.rho, PHYS.g, PHYS.eta0) ** 2)

    ga = jax.grad(loss_a)(jnp.asarray(8e-19))
    e = 1e-25
    fd = (loss_a(8e-19 + e) - loss_a(8e-19 - e)) / (2 * e)
    np.testing.assert_allclose(float(ga), float(fd), rtol=1e-6)

    def loss_h(h):
        return jnp.sum(sia2d_rhs_pallas(h, B, scal, PHYS.rho, PHYS.g, PHYS.eta0) ** 2)

    gh = jax.grad(loss_h)(H)
    v = jax.random.normal(jax.random.PRNGKey(0), H.shape) * (H > 100.0)
    eps = 1e-4
    fdh = (loss_h(H + eps * v) - loss_h(H - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.sum(gh * v)), float(fdh), rtol=1e-6)


def test_unsupported_shape_reason():
    """The whole-grid kernels refuse unsupported shapes with a clear message
    (r3 verdict Weak #5: 512² g_block=1 used to surface as opaque Mosaic
    errors → NaN benchmark rows)."""
    from odinn_tpu.ops.pallas.rkc_kernel import unsupported_reason

    # the production 128² f32 shape is supported at the default block
    assert unsupported_reason(128, 128, 8) is None
    # 512² at g_block=1: Mosaic broadcast limitation → named reason
    r = unsupported_reason(512, 512, 1)
    assert r is not None and "512" in r and "XLA path" in r
    # VMEM blow-up at larger blocks → named reason with the budget
    r = unsupported_reason(512, 512, 8)
    assert r is not None and "VMEM" in r
