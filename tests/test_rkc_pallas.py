"""Fused RKC-interval Pallas kernel: equality with the jnp path + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odinn_tpu.core.params import PhysicalParameters
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.ops.pallas.rkc_kernel import (
    derived_scalars,
    rkc_interval_pallas,
    rkc_interval_reference,
)
from odinn_tpu.physics.sia2d import SIAValues, sia2d_rhs
from odinn_tpu.physics.targets import ATarget
from odinn_tpu.simulation.solver import integrate_scan

PHYS = PhysicalParameters()


def batch():
    g1 = halfar_glacier(nx=40, ny=40, dx=100.0, temp=-15.0)
    g2 = halfar_glacier(nx=40, ny=40, dx=120.0, temp=-18.0, A=4e-19)
    H = jnp.stack([g1.H0, g2.H0])
    B = jnp.stack([g1.B, g2.B])
    scal = derived_scalars(
        jnp.array([100.0, 120.0]), jnp.array([100.0, 120.0]),
        jnp.array([8e-19, 4e-19]), jnp.zeros(2), jnp.full(2, 3.0),
        jnp.full(2, 3.0), jnp.zeros(2), PHYS.rho, PHYS.g,
    )
    return H, B, scal, g1


def test_fused_interval_matches_reference_and_solver():
    H, B, scal, g1 = batch()
    dt, s = 1.0 / 12.0, 13
    out_p = rkc_interval_pallas(H, B, scal, dt, s, PHYS.eta0)
    out_r = rkc_interval_reference(H, B, scal, dt, s, PHYS.eta0)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=1e-10)

    vals = SIAValues(A=jnp.asarray(8e-19), C=jnp.asarray(0.0), n=jnp.asarray(3.0),
                     p=jnp.asarray(3.0), q=jnp.asarray(0.0))
    rhs = lambda Hh, t: sia2d_rhs(Hh, g1.B, 100.0, 100.0, lambda hb, gs: vals,
                                  ATarget(), PHYS)
    tr = integrate_scan(rhs, g1.H0, jnp.array([0.0, dt]), 1, method="RKC", rkc_stages=s)
    np.testing.assert_allclose(np.asarray(out_p[0]), np.asarray(tr[-1]), atol=1e-9)


@pytest.mark.slow   # pallas interpret-mode on CPU is minutes-scale; the forward
# parity test stays in the default lane, and the kernels run compiled on real
# TPU in benchmarks/pallas_roofline.py
def test_fused_interval_custom_vjp():
    H, B, scal, _ = batch()
    dt, s = 1.0 / 12.0, 13

    def loss_h(h):
        return jnp.sum(rkc_interval_pallas(h, B, scal, dt, s, PHYS.eta0) ** 2)

    gh = jax.grad(loss_h)(H)
    v = jax.random.normal(jax.random.PRNGKey(0), H.shape) * (H > 100.0)
    e = 1e-4
    fd = (loss_h(H + e * v) - loss_h(H - e * v)) / (2 * e)
    np.testing.assert_allclose(float(jnp.sum(gh * v)), float(fd), rtol=1e-6)

    a0 = float(scal[0, 2])

    def loss_a(a):
        return jnp.sum(
            rkc_interval_pallas(H, B, scal.at[0, 2].set(a), dt, s, PHYS.eta0) ** 2
        )

    ga = jax.grad(loss_a)(jnp.asarray(a0))
    ea = a0 * 1e-6
    fda = (loss_a(a0 + ea) - loss_a(a0 - ea)) / (2 * ea)
    np.testing.assert_allclose(float(ga), float(fda), rtol=1e-4)
