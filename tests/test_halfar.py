"""Sanity checks of the Halfar analytical dome (validation ground truth).

The PDE-vs-analytic solver test lives in tests/test_solver.py; here we check
intrinsic properties of the similarity solution itself.
"""

import jax.numpy as jnp
import numpy as np

from odinn_tpu.core.params import PhysicalParameters
from odinn_tpu.data.halfar import Halfar, HalfarParameters, halfar_solution, halfar_velocity


def grid(nx, ny, dx, dy):
    xs = jnp.array([(i - nx / 2) * dx for i in range(nx)])
    ys = jnp.array([(j - ny / 2) * dy for j in range(ny)])
    return jnp.meshgrid(xs, ys, indexing="ij")


def test_profile_at_t0():
    p = HalfarParameters(R0=2000.0, H0=400.0, A=1.1e-17, n=3.0)
    fn, t0 = Halfar(p)
    assert t0 > 0
    x, y = grid(128, 128, 40.0, 40.0)
    H = fn(x, y, t0)
    # Dome height at center ~ H0, margin at R0
    np.testing.assert_allclose(float(jnp.max(H)), p.H0, rtol=1e-2)
    r = jnp.sqrt(x**2 + y**2)
    assert float(jnp.max(jnp.where(H > 0, r, 0.0))) <= p.R0 + 60.0
    assert float(jnp.max(jnp.where(H > 0, r, 0.0))) >= p.R0 - 60.0


def test_volume_conserved_no_mb():
    """λ = 0 ⇒ ice volume is invariant in time."""
    p = HalfarParameters(R0=2000.0, H0=400.0, A=1.1e-17, n=3.0, lam=0.0)
    fn, t0 = Halfar(p)
    x, y = grid(256, 256, 30.0, 30.0)
    v0 = float(jnp.sum(fn(x, y, t0)))
    v1 = float(jnp.sum(fn(x, y, t0 + 20.0)))
    np.testing.assert_allclose(v0, v1, rtol=2e-3)


def test_dome_spreads_and_flattens():
    p = HalfarParameters(R0=2000.0, H0=400.0, A=1.1e-17, n=3.0)
    fn, t0 = Halfar(p)
    x, y = grid(128, 128, 60.0, 60.0)
    H0 = fn(x, y, t0)
    H1 = fn(x, y, t0 + 30.0)
    assert float(jnp.max(H1)) < float(jnp.max(H0))
    assert int(jnp.sum(H1 > 0)) > int(jnp.sum(H0 > 0))


def test_halfar_solution_api():
    """halfar_solution(R, t, ...) matches the Halfar() closure."""
    phys = PhysicalParameters()
    p = HalfarParameters(R0=1000.0, H0=500.0, A=8e-19, n=3.0, rho=phys.rho, g=phys.g)
    fn, t0 = Halfar(p)
    x, y = grid(100, 100, 50.0, 50.0)
    r = jnp.sqrt(x**2 + y**2)
    H_a = halfar_solution(r, 5.0, 500.0, 1000.0, 8e-19, 3.0, phys)
    H_b = fn(x, y, 5.0)
    np.testing.assert_allclose(np.asarray(H_a), np.asarray(H_b), atol=1e-10)
    assert 5.0 > t0  # the test epoch is past the characteristic time


def test_velocity_points_outward():
    p = HalfarParameters(R0=2000.0, H0=400.0, A=1.1e-17, n=3.0)
    vel, t0 = halfar_velocity(p), Halfar(p)[1]
    x, y = grid(64, 64, 80.0, 80.0)
    vx, vy = vel(x, y, t0 * 2.0)
    # Radial outward flow: v·r ≥ 0 everywhere
    assert float(jnp.min(vx * x + vy * y)) >= -1e-9
    assert float(jnp.max(jnp.sqrt(vx**2 + vy**2))) > 0.0
