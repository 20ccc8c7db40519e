"""SIA2D forward solve vs the Halfar analytical solution.

The reference validates its solver against Halfar domes
(/root/reference/test/test_grad_loss.jl:498-589 and the MWE at
scripts/MWEs/inversion_diffusivity/inversion_setup.jl) — same strategy here:
integrate the PDE from the analytic initial condition and compare against the
analytic state later in time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odinn_tpu.core.params import PhysicalParameters
from odinn_tpu.data.halfar import Halfar, HalfarParameters
from odinn_tpu.physics.sia2d import SIAValues, sia2d_rhs
from odinn_tpu.physics.targets import ATarget
from odinn_tpu.simulation.solver import build_tstops, integrate_adaptive, integrate_scan

PHYS = PhysicalParameters()
A = 8e-19
N = 3.0
NX = NY = 96
DX = DY = 50.0


def halfar_setup():
    p = HalfarParameters(R0=1000.0, H0=500.0, A=A, n=N, rho=PHYS.rho, g=PHYS.g)
    fn, t0 = Halfar(p)
    xs = jnp.array([(i - NX / 2) * DX for i in range(NX)])
    ys = jnp.array([(j - NY / 2) * DY for j in range(NY)])
    x, y = jnp.meshgrid(xs, ys, indexing="ij")
    return fn, x, y


def make_rhs():
    target = ATarget()
    vals = SIAValues(A=jnp.asarray(A), C=jnp.asarray(0.0), n=jnp.asarray(N),
                     p=jnp.asarray(N), q=jnp.asarray(0.0))
    B = jnp.zeros((NX, NY))

    def rhs(H, t):
        return sia2d_rhs(H, B, DX, DY, lambda hb, gs: vals, target, PHYS)

    return rhs


@pytest.mark.parametrize("method,substeps", [("RK4", 60), ("SSPRK3", 80)])
def test_forward_scan_matches_halfar(method, substeps):
    fn, x, y = halfar_setup()
    t0, t1 = 5.0, 7.0
    H0 = fn(x, y, t0)
    tstops = build_tstops((t0, t1), 1.0 / 12.0)
    traj = jax.jit(
        lambda h: integrate_scan(make_rhs(), h, tstops, substeps, method=method)
    )(H0)
    H_num = traj[-1]
    H_ref = fn(x, y, t1)
    mask = np.asarray(H_ref > 10.0)
    rel = np.abs(np.asarray(H_num - H_ref))[mask] / np.asarray(H_ref)[mask]
    # Discretization error at this resolution (dx = 50 m) is dominated by the
    # free-boundary margin; interior (dome center) error is ~1e-4 relative.
    assert rel.mean() < 2e-2, f"mean rel err {rel.mean()}"
    center = (NX // 2, NY // 2)
    assert abs(float(H_num[center] - H_ref[center])) / float(H_ref[center]) < 5e-4


def test_grid_convergence():
    """The FD scheme converges to the analytic solution under refinement."""
    p = HalfarParameters(R0=1000.0, H0=500.0, A=A, n=N, rho=PHYS.rho, g=PHYS.g)
    fn, _ = Halfar(p)
    target = ATarget()
    errs = []
    for nx, dx, sub in [(48, 100.0, 30), (96, 50.0, 60)]:
        xs = jnp.array([(i - nx / 2) * dx for i in range(nx)])
        x, y = jnp.meshgrid(xs, xs, indexing="ij")
        H0 = fn(x, y, 5.0)
        vals = SIAValues(A=jnp.asarray(A), C=jnp.asarray(0.0), n=jnp.asarray(N),
                         p=jnp.asarray(N), q=jnp.asarray(0.0))
        B = jnp.zeros((nx, nx))
        rhs = lambda H, t: sia2d_rhs(H, B, dx, dx, lambda hb, gs: vals, target, PHYS)
        tst = build_tstops((5.0, 7.0), 1.0 / 12.0)
        traj = jax.jit(lambda h: integrate_scan(rhs, h, tst, sub))(H0)
        Hn, Hr = np.asarray(traj[-1]), np.asarray(fn(x, y, 7.0))
        m = Hr > 10.0
        errs.append((np.abs(Hn - Hr)[m] / Hr[m]).mean())
    assert errs[1] < 0.45 * errs[0], f"no convergence: {errs}"


def test_adaptive_matches_scan():
    fn, x, y = halfar_setup()
    t0, t1 = 5.0, 6.0
    H0 = fn(x, y, t0)
    tstops = build_tstops((t0, t1), 1.0 / 4.0)
    rhs = make_rhs()
    traj_s = jax.jit(lambda h: integrate_scan(rhs, h, tstops, 120, method="RK4"))(H0)
    traj_a = jax.jit(lambda h: integrate_adaptive(rhs, h, tstops, rtol=1e-8, atol=1e-6))(H0)
    np.testing.assert_allclose(
        np.asarray(traj_a[-1]), np.asarray(traj_s[-1]), atol=2e-2
    )


def test_mass_conservation_interior():
    """No MB ⇒ total ice volume conserved by the flux-form discretization."""
    fn, x, y = halfar_setup()
    t0 = 5.0
    H0 = fn(x, y, t0)
    tstops = build_tstops((t0, t0 + 1.0), 1.0 / 12.0)
    traj = jax.jit(lambda h: integrate_scan(make_rhs(), h, tstops, 60))(H0)
    v0 = float(jnp.sum(traj[0]))
    v1 = float(jnp.sum(traj[-1]))
    np.testing.assert_allclose(v0, v1, rtol=1e-10)


def test_rhs_zero_outside_ice():
    fn, x, y = halfar_setup()
    H0 = fn(x, y, 5.0)
    rhs = make_rhs()
    dH = rhs(H0, 5.0)
    # far from the dome the RHS is exactly zero
    far = (jnp.sqrt(x**2 + y**2) > 2300.0)
    assert float(jnp.max(jnp.abs(jnp.where(far, dH, 0.0)))) == 0.0
    # boundary ring is zero by construction (interior-only update)
    assert float(jnp.max(jnp.abs(dH[0, :]))) == 0.0
    assert float(jnp.max(jnp.abs(dH[:, -1]))) == 0.0


def test_compensated_accumulation_beats_plain_f32():
    """Kahan-compensated f32 accumulation (solver.integrate_scan
    compensated=True) must (a) match the plain path exactly in f64 semantics
    and (b) in f32, land at least 5x closer to the f64 trajectory than plain
    f32 over a many-substep solve — the rounding walk is the f32 accuracy
    floor the compensated path removes."""
    fn, x, y = halfar_setup()
    rhs64 = make_rhs()
    tstops = build_tstops((5.0, 7.0), 1.0 / 12.0)
    H0_64 = fn(x, y, 5.0)
    H_ref = integrate_scan(rhs64, H0_64, tstops, 60, method="SSPRK3")[-1]

    H0_32 = H0_64.astype(jnp.float32)
    ts32 = jnp.asarray(tstops, jnp.float32)
    plain = integrate_scan(rhs64, H0_32, ts32, 60, method="SSPRK3")[-1]
    comp = integrate_scan(rhs64, H0_32, ts32, 60, method="SSPRK3",
                          compensated=True)[-1]
    scale = float(jnp.abs(H_ref).max())
    e_plain = float(jnp.abs(plain.astype(jnp.float64) - H_ref).max()) / scale
    e_comp = float(jnp.abs(comp.astype(jnp.float64) - H_ref).max()) / scale
    assert e_comp < e_plain / 5, (e_plain, e_comp)

    # increment forms are algebraically the steppers: f64 compensated == f64
    # plain to tight tolerance
    comp64 = integrate_scan(rhs64, H0_64, tstops, 60, method="SSPRK3",
                            compensated=True)[-1]
    np.testing.assert_allclose(np.asarray(comp64), np.asarray(H_ref),
                               rtol=1e-12, atol=1e-10)


def test_compensated_rejects_rkc():
    fn, x, y = halfar_setup()
    rhs = make_rhs()
    tstops = build_tstops((5.0, 5.5), 1.0 / 12.0)
    with pytest.raises(ValueError, match="compensated"):
        integrate_scan(rhs, fn(x, y, 5.0), tstops, 4, method="RKC",
                       compensated=True)


def test_rkc_step_preserves_f32_under_x64():
    """RKC2's coefficient tables are built in f64 numpy; under
    jax_enable_x64 (the tests' default) they must not promote an f32
    state — the scan carry would flip dtype mid-solve (TypeError) and an
    f32 production solve would silently run at f64 cost. Regression for
    the accuracy_matched.py compensated-mode sweep crash."""
    from odinn_tpu.simulation.solver import make_rkc2_step

    step = make_rkc2_step(8)
    f = lambda y, t: -y
    y32 = jnp.ones((4, 4), jnp.float32)
    out = jax.jit(lambda y: step(f, y, 0.0, 0.1))(y32)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(float(out[0, 0]), np.exp(-0.1), rtol=2e-4)
    y64 = jnp.ones((4, 4), jnp.float64)
    out64 = step(f, y64, 0.0, 0.1)
    assert out64.dtype == jnp.float64
    # the f32 path agrees with the f64 path to f32 roundoff
    np.testing.assert_allclose(float(out[0, 0]), float(out64[0, 0]), rtol=1e-5)
