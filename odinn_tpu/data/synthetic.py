"""Synthetic glacier construction (Halfar domes + dummy climates).

Zero-data-dependency glacier generation, mirroring how the reference
bootstraps solver-free validation
(/root/reference/test/test_grad_loss.jl:522-598 and the MWE at
scripts/MWEs/inversion_diffusivity/inversion_setup.jl:40-86): flat bed, Halfar
analytic initial condition, constant long-term temperature.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from odinn_tpu.core.glacier import Climate2D, DummyClimate2D, Glacier
from odinn_tpu.data.halfar import Halfar, HalfarParameters

__all__ = ["halfar_glacier", "monthly_dummy_climate"]


def halfar_glacier(
    nx: int = 96,
    ny: int = 96,
    dx: float = 50.0,
    dy: float = 50.0,
    r0: float = 1000.0,
    h0: float = 500.0,
    A: float = 8e-19,
    n: float = 3.0,
    temp: float = -10.0,
    t_ic: float = 5.0,
    rho: float = 900.0,
    g: float = 9.81,
    rgi_id: str = "halfar",
    climate=None,
) -> Glacier:
    """Build a flat-bed glacier whose H₀ is the Halfar dome at time ``t_ic``
    on the solution's intrinsic clock (matching the reference's Halfar test
    setup, /root/reference/test/test_grad_loss.jl:586-598)."""
    p = HalfarParameters(R0=r0, H0=h0, A=A, n=n, rho=rho, g=g)
    fn, _ = Halfar(p)
    xs = jnp.array([(i - nx / 2) * dx for i in range(nx)])
    ys = jnp.array([(j - ny / 2) * dy for j in range(ny)])
    x, y = jnp.meshgrid(xs, ys, indexing="ij")
    H0 = fn(x, y, t_ic)
    if climate is None:
        climate = DummyClimate2D(
            longterm_temps_scalar=jnp.asarray(temp),
            longterm_temps_gridded=jnp.full((nx, ny), temp),
        )
    return Glacier(
        H0=H0,
        B=jnp.zeros_like(H0),
        dx=jnp.asarray(dx),
        dy=jnp.asarray(dy),
        A=jnp.asarray(A),
        C=jnp.asarray(0.0),
        n=jnp.asarray(n),
        mask=jnp.ones_like(H0),
        coords_x=xs,
        coords_y=ys,
        climate=climate,
        rgi_id=rgi_id,
    )


def monthly_dummy_climate(
    t_start: float,
    n_months: int,
    temp_mean: float = -5.0,
    temp_amplitude: float = 8.0,
    snow_monthly: float = 0.05,
    gradient: float = -0.0065,
    ref_hgt: float = 2000.0,
    longterm_temp: float = -10.0,
    nx: Optional[int] = None,
    ny: Optional[int] = None,
) -> Climate2D:
    """A seasonal monthly climate series for MB testing."""
    months = jnp.arange(n_months)
    temp = temp_mean + temp_amplitude * jnp.sin(2.0 * jnp.pi * (months / 12.0))
    gridded = None
    if nx is not None and ny is not None:
        gridded = jnp.full((nx, ny), longterm_temp)
    return Climate2D(
        t_start=jnp.asarray(t_start),
        temp=temp,
        gradient=jnp.full((n_months,), gradient),
        snow=jnp.full((n_months,), snow_monthly),
        ref_hgt=jnp.asarray(ref_hgt),
        longterm_temps_scalar=jnp.asarray(longterm_temp),
        longterm_temps_gridded=gridded,
    )
