"""Glacier data I/O: RGI-style preprocessed rasters.

TPU-native rebuild of Sleipnir's data layer entry points
(``get_rgi_paths``, ``initialize_glaciers``, ``fake_multi_datacube``; usage
/root/reference/README.md:63, test/test_grad_loss.jl:151-162).

The reference reads Gungnir/OGGM-preprocessed NetCDF rasters. Two on-disk
contracts are supported:

1. **OGGM glacier directories** (the reference's native layout):
   ``<prepro_dir>/<rgi_id>/gridded_data.nc`` (+ ``climate_historical.nc``),
   read through the h5py-backed NetCDF-4 layer
   (:mod:`odinn_tpu.data.netcdf` — NetCDF-4 files are HDF5). Bare
   ``<rgi_id>.nc`` files are treated as gridded_data.
2. A documented ``.npz`` per glacier (fast-path; the Gungnir-equivalent
   preprocessing step writes it; :func:`write_glacier_npz` is the producer):

    <prepro_dir>/<rgi_id>.npz with arrays:
      H0 (nx, ny)        initial ice thickness [m]      (Farinotti et al. 2019)
      B  (nx, ny)        bedrock elevation [m]
      dx, dy ()          grid spacing [m]
      coords_x (nx,), coords_y (ny,)
      longterm_temp ()   mean long-term air temperature [°C]
      temp (n_months,), gradient (n_months,), snow (n_months,)   monthly series
      ref_hgt (), t_start ()
      optional: A (), C (), n ()

Grid downscaling by ``params.simulation.grid_scaling_factor`` mirrors the
reference's gridScalingFactor (test/test_grad_loss.jl:119).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from odinn_tpu.core.glacier import Climate2D, DummyClimate2D, Glacier, SurfaceVelocityData

__all__ = [
    "get_rgi_paths",
    "initialize_glaciers",
    "write_glacier_npz",
    "fake_multi_datacube",
    "generate_synthetic_rgi_dir",
    "generate_synthetic_oggm_dir",
]

_PREPRO_ENV = "ODINN_TPU_PREPRO_DIR"


def get_rgi_paths(prepro_dir: Optional[str] = None) -> Dict[str, str]:
    """Map rgi_id → file path under the preprocessing directory
    (Sleipnir.get_rgi_paths equivalent)."""
    root = prepro_dir or os.environ.get(_PREPRO_ENV, os.path.join(os.getcwd(), "data", "prepro"))
    if not os.path.isdir(root):
        return {}
    paths: Dict[str, str] = {}
    for f in sorted(os.listdir(root)):
        full = os.path.join(root, f)
        if f.endswith((".npz", ".nc")):
            paths[os.path.splitext(f)[0]] = full
        elif os.path.isdir(full) and os.path.exists(os.path.join(full, "gridded_data.nc")):
            # OGGM glacier directory layout
            paths[f] = os.path.join(full, "gridded_data.nc")
    return paths


def _downscale(a: np.ndarray, k: int) -> np.ndarray:
    if k <= 1:
        return a
    nx, ny = (a.shape[0] // k) * k, (a.shape[1] // k) * k
    return a[:nx, :ny].reshape(nx // k, k, ny // k, k).mean(axis=(1, 3))


def _attach_velocity(g: Glacier, vd):
    """Attach a velocity datacube: paths load through the NetCDF layer, and
    cubes on their own grid are regridded onto the glacier
    (Sleipnir's velocityDatacubes kwarg, /root/reference/test/test_grad_loss.jl:153)."""
    if isinstance(vd, str):
        from odinn_tpu.data.netcdf import load_velocity_nc

        vd = load_velocity_nc(vd)
    if not vd.is_grid_glacier_aligned:
        from odinn_tpu.core.glacier import regrid_velocity_data

        vd = regrid_velocity_data(vd, g)
    return g.replace(velocity_data=vd)


def _downscale_glacier(g: Glacier, k: int) -> Glacier:
    """Apply gridScalingFactor coarsening to a loaded glacier (block-mean on
    rasters, stride-mean on coordinates, dx/dy scaled).

    Every grid-aligned attachment is coarsened with the glacier — gridded
    long-term temperatures, thickness/velocity/dhdt observations — so losses
    and gridded-temperature laws stay shape-consistent at k > 1.
    """
    if k <= 1:
        return g
    import dataclasses as _dc

    def down1d(v):
        if v is None:
            return None
        v = np.asarray(v)
        m = (v.shape[0] // k) * k
        return jnp.asarray(v[:m].reshape(-1, k).mean(axis=1))

    def down_cube(a):
        """Block-mean each frame of a (t, nx, ny) stack (or a single frame)."""
        if a is None:
            return None
        a = np.asarray(a)
        if a.ndim == 2:
            return jnp.asarray(_downscale(a, k))
        return jnp.asarray(np.stack([_downscale(f, k) for f in a]))

    clim = g.climate
    if clim is not None and getattr(clim, "longterm_temps_gridded", None) is not None:
        clim = _dc.replace(clim, longterm_temps_gridded=down_cube(clim.longterm_temps_gridded))
    td = g.thickness_data
    if td is not None and td.H is not None:
        td = _dc.replace(td, H=down_cube(td.H))
    vd = g.velocity_data
    if vd is not None and vd.vx is not None:
        if not vd.is_grid_glacier_aligned:
            raise ValueError(
                "grid_scaling_factor > 1 with an unaligned velocity datacube: "
                "regrid onto the glacier first (core.glacier.regrid_velocity_data)"
            )
        vd = _dc.replace(vd, vx=down_cube(vd.vx), vy=down_cube(vd.vy),
                         vabs=down_cube(vd.vabs), x=down1d(vd.x), y=down1d(vd.y))
    dd = g.dhdt_data
    if dd is not None and dd.dhdt is not None:
        dd = _dc.replace(dd, dhdt=down_cube(dd.dhdt))

    return g.replace(
        H0=jnp.asarray(_downscale(np.asarray(g.H0), k)),
        B=jnp.asarray(_downscale(np.asarray(g.B), k)),
        mask=jnp.asarray(_downscale(np.asarray(g.mask), k) > 0.5).astype(g.H0.dtype),
        dx=jnp.asarray(float(g.dx) * k),
        dy=jnp.asarray(float(g.dy) * k),
        coords_x=down1d(g.coords_x),
        coords_y=down1d(g.coords_y),
        climate=clim,
        thickness_data=td,
        velocity_data=vd,
        dhdt_data=dd,
    )


def initialize_glaciers(
    rgi_ids: Sequence[str], params, prepro_dir: Optional[str] = None,
    velocity_datacubes=None,
) -> List[Glacier]:
    """Load glaciers from preprocessed files (Sleipnir.initialize_glaciers
    equivalent). Path resolution order mirrors the reference's
    ``SimulationParameters.rgi_paths`` consumption
    (/root/reference/docs/src/quick_start.jl:12-20): an explicit
    ``prepro_dir`` wins, else ``params.simulation.rgi_paths`` (a dict from
    ``get_rgi_paths`` or a directory), else $ODINN_TPU_PREPRO_DIR."""
    rp = getattr(params.simulation, "rgi_paths", None)
    if prepro_dir is None and rp is not None:
        paths = dict(rp) if isinstance(rp, dict) else get_rgi_paths(str(rp))
    else:
        paths = get_rgi_paths(prepro_dir)
    k = params.simulation.grid_scaling_factor
    out = []
    for rid in rgi_ids:
        if rid not in paths:
            raise FileNotFoundError(
                f"no preprocessed file for {rid}; set ${_PREPRO_ENV} or run the "
                "Gungnir-equivalent preprocessing (see write_glacier_npz / "
                "netcdf.write_glacier_nc)"
            )
        if paths[rid].endswith(".nc"):
            from odinn_tpu.data.netcdf import load_glacier_nc

            climate_path = os.path.join(os.path.dirname(paths[rid]), "climate_historical.nc")
            g = load_glacier_nc(paths[rid], climate_path=climate_path, rgi_id=rid)
            g = _downscale_glacier(g, k)
            if velocity_datacubes is not None and rid in velocity_datacubes:
                g = _attach_velocity(g, velocity_datacubes[rid])
            out.append(g)
            continue
        with np.load(paths[rid]) as z:
            H0 = _downscale(z["H0"], k)
            B = _downscale(z["B"], k)
            dx = float(z["dx"]) * k
            dy = float(z["dy"]) * k
            nx, ny = H0.shape
            if "temp" in z.files:
                climate = Climate2D(
                    t_start=jnp.asarray(float(z["t_start"])),
                    temp=jnp.asarray(z["temp"]),
                    gradient=jnp.asarray(z["gradient"]),
                    snow=jnp.asarray(z["snow"]),
                    ref_hgt=jnp.asarray(float(z["ref_hgt"])),
                    longterm_temps_scalar=jnp.asarray(float(z["longterm_temp"])),
                    longterm_temps_gridded=jnp.full((nx, ny), float(z["longterm_temp"])),
                )
            else:
                climate = DummyClimate2D(
                    longterm_temps_scalar=jnp.asarray(float(z["longterm_temp"])),
                    longterm_temps_gridded=jnp.full((nx, ny), float(z["longterm_temp"])),
                )
            def down1d(v):
                if k <= 1:
                    return v
                m = (v.shape[0] // k) * k
                return v[:m].reshape(-1, k).mean(axis=1)

            cx = jnp.asarray(down1d(z["coords_x"])) if "coords_x" in z.files else jnp.arange(nx) * dx
            cy = jnp.asarray(down1d(z["coords_y"])) if "coords_y" in z.files else jnp.arange(ny) * dy
            g = Glacier(
                H0=jnp.asarray(H0),
                B=jnp.asarray(B),
                dx=jnp.asarray(dx),
                dy=jnp.asarray(dy),
                A=jnp.asarray(float(z["A"]) if "A" in z.files else 4e-17),
                C=jnp.asarray(float(z["C"]) if "C" in z.files else 0.0),
                n=jnp.asarray(float(z["n"]) if "n" in z.files else 3.0),
                mask=jnp.ones_like(jnp.asarray(H0)),
                coords_x=cx,
                coords_y=cy,
                climate=climate,
                rgi_id=rid,
            )
        if velocity_datacubes is not None and rid in velocity_datacubes:
            g = _attach_velocity(g, velocity_datacubes[rid])
        out.append(g)
    return out


def write_glacier_npz(path: str, glacier: Glacier, longterm_temp: float) -> None:
    """Producer side of the preprocessing contract (Gungnir-equivalent)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = dict(
        H0=np.asarray(glacier.H0),
        B=np.asarray(glacier.B),
        dx=np.asarray(glacier.dx),
        dy=np.asarray(glacier.dy),
        coords_x=np.asarray(glacier.coords_x),
        coords_y=np.asarray(glacier.coords_y),
        longterm_temp=np.asarray(longterm_temp),
        A=np.asarray(glacier.A),
        C=np.asarray(glacier.C),
        n=np.asarray(glacier.n),
    )
    clim = glacier.climate
    if hasattr(clim, "temp") and clim.temp is not None:
        payload.update(
            temp=np.asarray(clim.temp),
            gradient=np.asarray(clim.gradient),
            snow=np.asarray(clim.snow),
            ref_hgt=np.asarray(clim.ref_hgt),
            t_start=np.asarray(clim.t_start),
        )
    np.savez_compressed(path, **payload)


def generate_synthetic_rgi_dir(dirpath: str, n: int = 4, nx: int = 64, ny: int = 64,
                               seed: int = 0) -> List[str]:
    """Write a synthetic preprocessed dataset (Halfar domes over random
    temperatures) so the loading path is exercisable without OGGM data."""
    from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate

    rng = np.random.default_rng(seed)
    ids = []
    for i in range(n):
        temp = float(rng.uniform(-25.0, -12.0))
        clim = monthly_dummy_climate(2010.0, 72, longterm_temp=temp, nx=nx, ny=ny)
        g = halfar_glacier(nx=nx, ny=ny, dx=float(rng.uniform(80, 150)), temp=temp,
                           climate=clim, rgi_id=f"RGI60-99.{i:05d}")
        write_glacier_npz(os.path.join(dirpath, f"{g.rgi_id}.npz"), g, temp)
        ids.append(g.rgi_id)
    return ids


def generate_synthetic_oggm_dir(dirpath: str, n: int = 2, nx: int = 64, ny: int = 64,
                                seed: int = 0) -> List[str]:
    """Write a synthetic preprocessed dataset in the OGGM glacier-directory
    layout (``<rgi_id>/gridded_data.nc`` + ``climate_historical.nc``) so the
    real-data NetCDF ingestion path is exercisable offline."""
    from odinn_tpu.data.netcdf import write_glacier_nc
    from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate

    rng = np.random.default_rng(seed)
    ids = []
    for i in range(n):
        temp = float(rng.uniform(-25.0, -12.0))
        clim = monthly_dummy_climate(2010.0, 72, longterm_temp=temp, nx=nx, ny=ny)
        g = halfar_glacier(nx=nx, ny=ny, dx=float(rng.uniform(80, 150)), temp=temp,
                           climate=clim, rgi_id=f"RGI60-11.{i:05d}")
        write_glacier_nc(dirpath, g, temp)
        ids.append(g.rgi_id)
    return ids


def fake_multi_datacube(glacier: Glacier, tstops, noise: float = 0.0, seed: int = 0):
    """Fake surface-velocity datacube (Sleipnir.fake_multi_datacube
    equivalent; usage /root/reference/test/test_grad_loss.jl:151-156):
    synthesizes a SurfaceVelocityData from the glacier's own diagnostic
    velocity plus optional noise."""
    import jax

    from odinn_tpu.core.params import PhysicalParameters
    from odinn_tpu.physics.sia2d import default_values, v_from_h
    from odinn_tpu.physics.targets import ATarget

    phys = PhysicalParameters()
    vals = default_values(glacier)
    vx, vy, v = v_from_h(
        glacier.H0, glacier.B, glacier.dx, glacier.dy, lambda hb, gs: vals, ATarget(), phys
    )
    tstops = jnp.asarray(tstops)
    reps = tstops.shape[0]
    vx = jnp.repeat(vx[None], reps, 0)
    vy = jnp.repeat(vy[None], reps, 0)
    v = jnp.repeat(v[None], reps, 0)
    if noise > 0:
        key = jax.random.PRNGKey(seed)
        vx = vx + noise * jax.random.normal(key, vx.shape)
    return SurfaceVelocityData(t=tstops, vx=vx, vy=vy, vabs=v)
