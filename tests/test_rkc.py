"""RKC2 stabilized stepper: accuracy vs RK4/Halfar, stability, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from odinn_tpu.core.params import PhysicalParameters
from odinn_tpu.data.halfar import Halfar, HalfarParameters
from odinn_tpu.physics.sia2d import SIAValues, sia2d_rhs
from odinn_tpu.physics.targets import ATarget
from odinn_tpu.simulation.solver import (
    build_tstops,
    integrate_scan,
    rkc_stages_for,
    suggest_substeps,
)

PHYS = PhysicalParameters()
A = 8e-19


def setup(nx=96, dx=50.0):
    p = HalfarParameters(R0=1000.0, H0=500.0, A=A, n=3.0, rho=PHYS.rho, g=PHYS.g)
    fn, _ = Halfar(p)
    xs = jnp.array([(i - nx / 2) * dx for i in range(nx)])
    x, y = jnp.meshgrid(xs, xs, indexing="ij")
    vals = SIAValues(A=jnp.asarray(A), C=jnp.asarray(0.0), n=jnp.asarray(3.0),
                     p=jnp.asarray(3.0), q=jnp.asarray(0.0))
    rhs = lambda H, t: sia2d_rhs(H, jnp.zeros_like(H), dx, dx,
                                 lambda hb, gs: vals, ATarget(), PHYS)
    return fn, x, y, rhs


def test_rkc_matches_rk4_and_halfar():
    fn, x, y, rhs = setup()
    H0 = fn(x, y, 5.0)
    tst = build_tstops((5.0, 7.0), 1.0 / 12.0)
    s = rkc_stages_for(50.0, 50.0, 500.0, A, step=1.0 / 12.0)
    # one s-stage RKC step per save interval vs many RK4 substeps
    tr_rkc = jax.jit(lambda h: integrate_scan(rhs, h, tst, 1, method="RKC",
                                              rkc_stages=s))(H0)
    tr_rk4 = jax.jit(lambda h: integrate_scan(rhs, h, tst, 60, method="RK4"))(H0)
    assert float(jnp.abs(tr_rkc[-1] - tr_rk4[-1]).max()) < 0.01
    Href = fn(x, y, 7.0)
    m = np.asarray(Href > 10.0)
    rel = np.abs(np.asarray(tr_rkc[-1] - Href))[m] / np.asarray(Href)[m]
    assert rel.mean() < 2e-2

    # RHS-eval budget: s per interval vs 4·substeps for RK4
    assert s < 4 * suggest_substeps(50.0, 50.0, 500.0, A, step=1.0 / 12.0)


def test_rkc_beats_rk4_at_equal_budget():
    """At an equal (low) RHS-eval budget, the stabilized stepper stays on the
    reference solution while RK4 develops stiffness overshoot (extended
    real-axis stability ∝ s²)."""
    fn, x, y, rhs = setup(nx=64, dx=40.0)   # stiffer: finer grid
    H0 = fn(x, y, 5.0)
    tst = build_tstops((5.0, 5.5), 1.0 / 12.0)
    ref = jax.jit(lambda h: integrate_scan(rhs, h, tst, 40, method="RK4"))(H0)
    # equal budget: RK4 1 substep = 4 RHS evals vs RKC s=4 stages
    tr_rk4 = jax.jit(lambda h: integrate_scan(rhs, h, tst, 1, method="RK4"))(H0)
    tr_rkc = jax.jit(lambda h: integrate_scan(rhs, h, tst, 1, method="RKC",
                                              rkc_stages=4))(H0)
    err_rk4 = float(jnp.abs(tr_rk4[-1] - ref[-1]).max())
    err_rkc = float(jnp.abs(tr_rkc[-1] - ref[-1]).max())
    assert np.isfinite(np.asarray(tr_rkc)).all()
    assert err_rkc < 0.2 * err_rk4, f"RKC {err_rkc} vs RK4 {err_rk4}"


def test_rkc_gradient_vs_fd():
    fn, x, y, _ = setup(nx=48, dx=80.0)
    H0 = fn(x, y, 5.0)
    tst = build_tstops((5.0, 5.5), 1.0 / 12.0)
    s = rkc_stages_for(80.0, 80.0, 500.0, A, step=1.0 / 12.0)

    def loss(logA):
        vals = SIAValues(A=jnp.exp(logA), C=jnp.asarray(0.0), n=jnp.asarray(3.0),
                         p=jnp.asarray(3.0), q=jnp.asarray(0.0))
        rhs = lambda H, t: sia2d_rhs(H, jnp.zeros_like(H), 80.0, 80.0,
                                     lambda hb, gs: vals, ATarget(), PHYS)
        return jnp.sum(integrate_scan(rhs, H0, tst, 1, method="RKC", rkc_stages=s)[-1] ** 2)

    g = jax.grad(loss)(jnp.log(A))
    e = 1e-5
    fd = (loss(jnp.log(A) + e) - loss(jnp.log(A) - e)) / (2 * e)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)
