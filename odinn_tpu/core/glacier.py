"""Glacier, climate, and observation containers as JAX pytrees.

TPU-native rebuild of Sleipnir's data layer:
- ``Glacier2D``            (fields observed at /root/reference/test/test_grad_loss.jl:593-598,
                            /root/reference/scripts/MWEs/inversion_diffusivity/inversion_setup.jl:70-86)
- ``Climate2D`` / ``DummyClimate2D``   (fields used at /root/reference/src/inverse/SIA2D/VJPs.jl:118-124)
- ``ThicknessData`` / ``SurfaceVelocityData`` / ``dhdtData``
- ``is_in_glacier``        (usage /root/reference/src/losses/Losses.jl:122)

Design: every container is an immutable ``jax.tree_util.register_dataclass``
pytree. Array-valued fields (grids, per-glacier scalars) are data leaves;
identifiers are static. A set of glaciers is represented as a *stacked* pytree
(`stack_glaciers`) with a leading glacier axis, padded to a common grid shape —
this is the axis that `vmap` maps over and that the device mesh shards
(replacing the reference's one-process-per-glacier ``pmap``,
/root/reference/src/setup/config.jl:97-139).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DummyClimate2D",
    "Climate2D",
    "ThicknessData",
    "SurfaceVelocityData",
    "regrid_velocity_data",
    "DhdtData",
    "Glacier",
    "stack_glaciers",
    "pad_glacier",
    "is_in_glacier",
]


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DummyClimate2D:
    """Synthetic climate with constant long-term temperature.

    Mirrors Sleipnir.DummyClimate2D (usage:
    /root/reference/test/test_grad_loss.jl:597). Temperatures in °C.
    """

    longterm_temps_scalar: jnp.ndarray = None   # shape () or (n_years,)
    longterm_temps_gridded: jnp.ndarray = None  # (nx, ny) or (n_years, nx, ny)

    def avg_scalar_temp(self, t):
        temps = jnp.atleast_1d(self.longterm_temps_scalar)
        return jnp.mean(temps)

    def avg_gridded_temp(self, t):
        g = self.longterm_temps_gridded
        return g if g.ndim == 2 else jnp.mean(g, axis=0)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Climate2D:
    """Monthly climate series for mass balance and temperature inputs.

    Fields mirror the slice of Sleipnir.Climate2D that ODINN consumes
    (/root/reference/src/inverse/SIA2D/VJPs.jl:118-124): a reference-height
    monthly temperature series, a lapse-rate gradient series, monthly snow
    accumulation, and long-term temperatures for the T→A laws.

    Series are stored on a fixed monthly grid starting at ``t_start`` (float
    years) so time lookup under jit is a static-shape gather.
    """

    t_start: jnp.ndarray = None            # () float year of series start
    temp: jnp.ndarray = None               # (n_months,) monthly mean temp at ref height [°C]
    gradient: jnp.ndarray = None           # (n_months,) lapse rate [°C/m]
    snow: jnp.ndarray = None               # (n_months,) monthly solid precipitation [m w.e.]
    ref_hgt: jnp.ndarray = None            # () reference altitude [m]
    longterm_temps_scalar: jnp.ndarray = None
    longterm_temps_gridded: jnp.ndarray = None

    def month_index(self, t):
        """Index of the month containing float-year time t (clamped)."""
        idx = jnp.floor((t - self.t_start) * 12.0 + 1e-9).astype(jnp.int32)
        return jnp.clip(idx, 0, self.temp.shape[-1] - 1)

    def avg_scalar_temp(self, t):
        temps = jnp.atleast_1d(self.longterm_temps_scalar)
        return jnp.mean(temps)

    def avg_gridded_temp(self, t):
        g = self.longterm_temps_gridded
        return g if g.ndim == 2 else jnp.mean(g, axis=0)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ThicknessData:
    """Observed/reference ice-thickness time series (Sleipnir.ThicknessData)."""

    t: jnp.ndarray = None        # (n_obs,) float years
    H: jnp.ndarray = None        # (n_obs, nx, ny)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SurfaceVelocityData:
    """Observed/reference surface-velocity data (Sleipnir.SurfaceVelocityData).

    Field names follow /root/reference/scripts/MWEs/inversion_diffusivity/
    inversion_setup.jl:79-86. When the datacube grid differs from the glacier
    grid (``is_grid_glacier_aligned=False``), carry the source coordinates in
    ``x``/``y`` and call :func:`regrid_velocity_data` before training.
    """

    t: jnp.ndarray = None        # (n_obs,) float years (reference's `date`)
    vx: jnp.ndarray = None       # (n_obs, nx, ny)
    vy: jnp.ndarray = None       # (n_obs, nx, ny)
    vabs: jnp.ndarray = None     # (n_obs, nx, ny)
    x: jnp.ndarray = None        # (nx_src,) datacube x coordinates [m]
    y: jnp.ndarray = None        # (ny_src,) datacube y coordinates [m]
    date1: jnp.ndarray = None    # interval start (for interval-averaged products)
    date2: jnp.ndarray = None    # interval end
    is_grid_glacier_aligned: bool = _static(default=True)


def regrid_velocity_data(vd: "SurfaceVelocityData", glacier) -> "SurfaceVelocityData":
    """Bilinearly regrid a velocity datacube onto the glacier grid
    (Sleipnir's grid-alignment mapping for ``isGridGlacierAligned=false``
    products). Cells outside the datacube footprint get 0 (= masked out by
    the V_ref > 0 loss masks)."""
    if vd.is_grid_glacier_aligned:
        return vd
    if vd.x is None or vd.y is None:
        raise ValueError("regridding requires the datacube x/y coordinates")
    from jax.scipy.ndimage import map_coordinates

    gx, gy = glacier.coords_x, glacier.coords_y
    # fractional indices of glacier cell centers in the datacube grid
    ix = (gx - vd.x[0]) / (vd.x[1] - vd.x[0])
    iy = (gy - vd.y[0]) / (vd.y[1] - vd.y[0])
    IX, IY = jnp.meshgrid(ix, iy, indexing="ij")
    inside = (
        (IX >= 0.0) & (IX <= vd.x.shape[0] - 1.0)
        & (IY >= 0.0) & (IY <= vd.y.shape[0] - 1.0)
    )

    def regrid_field(f):
        out = jax.vmap(
            lambda fr: map_coordinates(fr, [IX, IY], order=1, mode="constant", cval=0.0)
        )(f)
        return out * inside[None]

    return dataclasses.replace(
        vd,
        vx=regrid_field(vd.vx),
        vy=regrid_field(vd.vy),
        vabs=regrid_field(vd.vabs),
        x=glacier.coords_x,
        y=glacier.coords_y,
        is_grid_glacier_aligned=True,
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DhdtData:
    """Observed mean dh/dt between two dates (Sleipnir.dhdtData)."""

    t1: jnp.ndarray = None       # () float year
    t2: jnp.ndarray = None       # () float year
    dhdt: jnp.ndarray = None     # (nx, ny) mean thickness change rate [m/yr]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Glacier:
    """A single 2-D glacier (Sleipnir.Glacier2D equivalent).

    Grids are laid out ``(nx, ny)`` with x first, matching the reference.
    ``dx``/``dy`` are per-glacier array scalars so a stacked batch can hold
    heterogeneous resolutions.
    """

    H0: jnp.ndarray = None           # (nx, ny) initial ice thickness [m]
    B: jnp.ndarray = None            # (nx, ny) bedrock elevation [m]
    dx: jnp.ndarray = None           # () grid spacing x [m]
    dy: jnp.ndarray = None           # () grid spacing y [m]
    A: jnp.ndarray = None            # () default creep coefficient
    C: jnp.ndarray = None            # () default sliding coefficient
    n: jnp.ndarray = None            # () default Glen exponent
    mask: jnp.ndarray = None         # (nx, ny) 1.0 inside valid (non-padded) domain
    coords_x: jnp.ndarray = None     # (nx,) cell-center x coordinates [m]
    coords_y: jnp.ndarray = None     # (ny,) cell-center y coordinates [m]
    climate: Any = None              # DummyClimate2D | Climate2D
    thickness_data: Optional[ThicknessData] = None
    velocity_data: Optional[SurfaceVelocityData] = None
    dhdt_data: Optional[DhdtData] = None
    npix: Optional[jnp.ndarray] = None  # () original (pre-padding) nx·ny for
    # loss normalization — set by stack_glaciers so zero-dynamics padding
    # (mixed-grid or spatial row padding) never rescales a glacier's loss
    rgi_id: str = _static(default="synthetic")

    @property
    def nx(self) -> int:
        return self.H0.shape[-2]

    @property
    def ny(self) -> int:
        return self.H0.shape[-1]

    @property
    def S(self) -> jnp.ndarray:
        """Surface elevation B + H₀."""
        return self.B + self.H0

    def replace(self, **kw) -> "Glacier":
        return dataclasses.replace(self, **kw)


def pad_glacier(g: Glacier, nx: int, ny: int) -> Glacier:
    """Zero-dynamics pad a glacier to grid (nx, ny).

    Padding cells get H₀ = 0, edge-replicated bedrock, and mask = 0, so the SIA
    right-hand side is identically zero there and the padded solve equals the
    unpadded one on the interior.
    """
    px, py = nx - g.nx, ny - g.ny
    if px < 0 or py < 0:
        raise ValueError(f"target grid ({nx},{ny}) smaller than glacier ({g.nx},{g.ny})")
    if px == 0 and py == 0:
        return g

    def pad0(a):
        return jnp.pad(a, ((0, px), (0, py)))

    def pad_field(a, mode):
        return jnp.pad(a, ((0, px), (0, py)), mode=mode)

    def pad_time_series(a):
        return jnp.pad(a, ((0, 0), (0, px), (0, py))) if a is not None else None

    mask = pad0(g.mask if g.mask is not None else jnp.ones_like(g.H0))
    td = g.thickness_data
    if td is not None:
        td = ThicknessData(t=td.t, H=pad_time_series(td.H))
    vd = g.velocity_data
    if vd is not None:
        vd = dataclasses.replace(
            vd,
            vx=pad_time_series(vd.vx),
            vy=pad_time_series(vd.vy),
            vabs=pad_time_series(vd.vabs),
        )
    dd = g.dhdt_data
    if dd is not None:
        dd = dataclasses.replace(dd, dhdt=pad0(dd.dhdt))
    clim = g.climate
    if clim is not None and getattr(clim, "longterm_temps_gridded", None) is not None:
        gt = clim.longterm_temps_gridded
        gt = pad_field(gt, "edge") if gt.ndim == 2 else jnp.pad(
            gt, ((0, 0), (0, px), (0, py)), mode="edge"
        )
        clim = dataclasses.replace(clim, longterm_temps_gridded=gt)
    cx = jnp.pad(g.coords_x, (0, px), mode="edge") if g.coords_x is not None else None
    cy = jnp.pad(g.coords_y, (0, py), mode="edge") if g.coords_y is not None else None
    return g.replace(
        H0=pad0(g.H0),
        B=pad_field(g.B, "edge"),
        mask=mask,
        coords_x=cx,
        coords_y=cy,
        climate=clim,
        thickness_data=td,
        velocity_data=vd,
        dhdt_data=dd,
    )


def stack_glaciers(glaciers: Sequence[Glacier]) -> Glacier:
    """Stack glaciers into one pytree with a leading glacier axis.

    Glaciers are padded to the max (nx, ny) over the set. The result is the
    unit that ``vmap`` maps over and the device mesh shards — the TPU-native
    replacement for the reference's per-glacier process batching
    (/root/reference/src/models/trainable_components/ML_utils.jl:81-231).
    """
    nx = max(g.nx for g in glaciers)
    ny = max(g.ny for g in glaciers)
    rgi_ids = tuple(g.rgi_id for g in glaciers)
    padded = [
        pad_glacier(g, nx, ny).replace(
            rgi_id=rgi_ids,
            # loss normalization stays the ORIGINAL pixel count: padding to a
            # common grid must not rescale a glacier's loss contribution
            npix=(g.npix if g.npix is not None
                  else jnp.asarray(float(g.nx * g.ny))),
        )
        for g in glaciers
    ]
    for g in padded:
        if g.mask is None:
            raise ValueError("glacier missing mask")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *padded)


def loss_normalization(glacier: Glacier) -> jnp.ndarray:
    """Per-glacier loss normalization (the reference's ``prod(size(H))``,
    Losses.jl:29-151): the ORIGINAL pre-padding pixel count when the glacier
    was padded (mixed-grid stacking, spatial row sharding), else nx·ny of the
    grid — so zero-dynamics padding is exactly loss-neutral."""
    if glacier.npix is not None:
        return jnp.asarray(glacier.npix, dtype=jnp.result_type(float))
    return jnp.asarray(float(glacier.H0.shape[-2] * glacier.H0.shape[-1]))


def is_in_glacier(H: jnp.ndarray, distance: int) -> jnp.ndarray:
    """Mask of cells at least ``distance`` pixels inside the glacier margin.

    Sleipnir.is_in_glacier equivalent (usage
    /root/reference/src/losses/Losses.jl:122): morphological erosion of the
    H > 0 mask, realized as a single XLA min-reduce-window.
    """
    if distance <= 0:
        return H > 0.0
    inside = (H > 0.0).astype(H.dtype)
    w = 2 * distance + 1
    nbatch = inside.ndim - 2
    eroded = jax.lax.reduce_window(
        inside,
        jnp.asarray(1.0, H.dtype),
        jax.lax.min,
        window_dimensions=(1,) * nbatch + (w, w),
        window_strides=(1,) * inside.ndim,
        padding=[(0, 0)] * nbatch + [(distance, distance)] * 2,
    )
    return eroded > 0.5
