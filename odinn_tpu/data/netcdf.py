"""Minimal NetCDF-4 I/O via h5py + OGGM/Gungnir datacube ingestion.

The reference's data layer is driven by OGGM-preprocessed NetCDF datacubes
(Sleipnir.initialize_glaciers over Gungnir rasters; usage
/root/reference/README.md:63, /root/reference/test/test_grad_loss.jl:151-162).
This environment ships no netCDF4/xarray stack — but NetCDF-4 files ARE HDF5
files, so a small h5py-backed reader/writer covers the real-data workflow:

- :func:`read_netcdf` / :func:`write_netcdf` — generic NetCDF-4 access
  (dimension scales, ``_FillValue``, ``scale_factor``/``add_offset`` CF
  unpacking, global + per-variable attributes).
- :func:`load_glacier_nc` — OGGM ``gridded_data.nc`` → :class:`Glacier`
  (surface DEM ``topo``, thickness from ``consensus_ice_thickness`` /
  ``millan_ice_thickness`` / ``distributed_thickness``, ``glacier_mask``,
  Millan velocity mosaics, Hugonnet dh/dt), plus ``climate_historical.nc``
  → :class:`Climate2D` (monthly temp/gradient/solid precipitation at
  ``ref_hgt``).
- :func:`write_glacier_nc` — producer side (the Gungnir-equivalent
  preprocessing step), emitting files that both this reader and standard
  netCDF4 tooling accept.

Axis convention: NetCDF rasters are stored ``(y, x)`` (CF order); Glacier
grids here are ``(nx, ny)`` with x first (matching the reference's Julia
arrays), so rasters are transposed on the way in/out.
"""

from __future__ import annotations

import datetime as _dt
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from odinn_tpu.utils.time_utils import datetime_to_floatyear

__all__ = [
    "read_netcdf",
    "write_netcdf",
    "load_glacier_nc",
    "write_glacier_nc",
    "load_velocity_nc",
    "write_velocity_nc",
    "parse_cf_time",
]

# OGGM gridded_data.nc thickness products, in preference order
# (Sleipnir picks the consensus estimate by default).
_THICKNESS_VARS = (
    "consensus_ice_thickness",
    "millan_ice_thickness",
    "distributed_thickness",
    "thickness",
)


def _unpack(ds) -> np.ndarray:
    """CF-unpack one HDF5 dataset: fill values → NaN, scale/offset applied."""
    a = np.asarray(ds[()])
    attrs = ds.attrs
    if a.dtype.kind in "fiu":
        fill = attrs.get("_FillValue", attrs.get("missing_value", None))
        if fill is not None and a.dtype.kind == "f":
            a = np.where(np.isclose(a, np.asarray(fill, a.dtype)), np.nan, a)
        scale = attrs.get("scale_factor", None)
        offset = attrs.get("add_offset", None)
        if scale is not None or offset is not None:
            a = a.astype(np.float64)
            if scale is not None:
                a = a * float(np.asarray(scale).ravel()[0])
            if offset is not None:
                a = a + float(np.asarray(offset).ravel()[0])
    return a


def _attr_to_py(v) -> Any:
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, np.ndarray):
        if v.size == 1:
            return _attr_to_py(v.ravel()[0])
        return v.tolist()
    if isinstance(v, (np.generic,)):
        return v.item()
    return v


def read_netcdf(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Dict[str, Any]], Dict[str, Any]]:
    """Read a NetCDF-4 (HDF5) file.

    Returns ``(variables, var_attrs, global_attrs)``. Pure-dimension-scale
    datasets that carry no data (netCDF "dimension without variable",
    stored by netCDF4 as the string "This is a netCDF dimension but not a
    netCDF variable") are skipped.
    """
    import h5py

    variables: Dict[str, np.ndarray] = {}
    var_attrs: Dict[str, Dict[str, Any]] = {}
    with h5py.File(path, "r") as f:
        global_attrs = {k: _attr_to_py(v) for k, v in f.attrs.items()}

        def visit(name, obj):
            if not isinstance(obj, h5py.Dataset):
                return
            nm = obj.attrs.get("NAME", b"")
            if isinstance(nm, bytes) and nm.startswith(b"This is a netCDF dimension"):
                return
            key = name.split("/")[-1]
            variables[key] = _unpack(obj)
            var_attrs[key] = {
                k: _attr_to_py(v)
                for k, v in obj.attrs.items()
                if not k.startswith(("_Netcdf4", "CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST"))
            }

        f.visititems(visit)
    return variables, var_attrs, global_attrs


def write_netcdf(
    path: str,
    variables: Dict[str, Tuple[Tuple[str, ...], np.ndarray]],
    coords: Dict[str, np.ndarray],
    var_attrs: Optional[Dict[str, Dict[str, Any]]] = None,
    global_attrs: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a NetCDF-4-compatible HDF5 file.

    ``variables`` maps name → (dim names, array); ``coords`` maps dim name →
    coordinate array (becomes an HDF5 dimension scale, which is exactly the
    netCDF-4 on-disk encoding of a coordinate variable).
    """
    import h5py

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    var_attrs = var_attrs or {}
    with h5py.File(path, "w") as f:
        for k, v in (global_attrs or {}).items():
            f.attrs[k] = v
        scales = {}
        for dim, cvals in coords.items():
            d = f.create_dataset(dim, data=np.asarray(cvals))
            d.make_scale(dim)
            scales[dim] = d
            for k, v in var_attrs.get(dim, {}).items():
                d.attrs[k] = v
        for name, (dims, arr) in variables.items():
            if name in scales:
                continue
            d = f.create_dataset(name, data=np.asarray(arr))
            for ax, dim in enumerate(dims):
                if dim in scales:
                    d.dims[ax].attach_scale(scales[dim])
            for k, v in var_attrs.get(name, {}).items():
                d.attrs[k] = v


_CF_TIME_RE = re.compile(
    r"^\s*(day|hour|minute|second|month|year)s?\s+since\s+"
    r"(\d{1,4})-(\d{1,2})-(\d{1,2})", re.IGNORECASE,
)


def parse_cf_time(values: np.ndarray, units: str) -> np.ndarray:
    """CF time values + units string → float years.

    Handles "days/hours/minutes/seconds since Y-M-D" (exact, via datetime
    arithmetic) and "months/years since Y-M-D" (calendar-grid arithmetic) —
    the encodings OGGM's ``climate_historical.nc`` uses.
    """
    m = _CF_TIME_RE.match(units)
    if m is None:
        raise ValueError(f"unsupported CF time units: {units!r}")
    unit = m.group(1).lower()
    y0, mo0, d0 = int(m.group(2)), int(m.group(3)), int(m.group(4))
    vals = np.asarray(values, np.float64)
    if unit == "year":
        return y0 + (mo0 - 1) / 12.0 + vals
    if unit == "month":
        months = (y0 * 12 + (mo0 - 1)) + vals
        return months / 12.0
    epoch = _dt.datetime(y0, mo0, d0)
    seconds = {"day": 86400.0, "hour": 3600.0, "minute": 60.0, "second": 1.0}[unit] * vals
    return np.asarray(
        [datetime_to_floatyear(epoch + _dt.timedelta(seconds=float(s))) for s in seconds]
    )


def _grid_spacing(c: np.ndarray, name: str) -> float:
    d = np.diff(np.asarray(c, np.float64))
    if d.size == 0:
        raise ValueError(f"coordinate {name!r} has fewer than 2 points")
    mean = float(np.mean(d))
    # tolerate single-precision coordinate storage (~1e-7 relative per value,
    # amplified by differencing); projected OGGM grids are uniform by design
    if not np.allclose(d, mean, rtol=1e-3, atol=1e-3 * abs(mean)):
        raise ValueError(f"coordinate {name!r} is not uniformly spaced")
    return float(abs(mean))


def load_glacier_nc(
    gridded_path: str,
    climate_path: Optional[str] = None,
    rgi_id: Optional[str] = None,
    thickness_var: Optional[str] = None,
):
    """OGGM ``gridded_data.nc`` (+ optional ``climate_historical.nc``) →
    :class:`odinn_tpu.core.glacier.Glacier`.

    Reads the surface DEM (``topo``), an ice-thickness product, the glacier
    mask, and — when present — Millan velocity mosaics
    (``millan_vx``/``millan_vy``/``millan_v``) and the Hugonnet 2000-2020
    mean dh/dt (``hugonnet_dhdt``) as observation attachments. The bedrock is
    ``topo - thickness`` (the reference's B = S - H identity,
    /root/reference/src/models/iceflow/SIA2D/SIA2D_utils.jl surface algebra).
    """
    import jax.numpy as jnp

    from odinn_tpu.core.glacier import (
        Climate2D, DhdtData, DummyClimate2D, Glacier, SurfaceVelocityData,
    )

    vs, va, ga = read_netcdf(gridded_path)

    def raster(name):
        # CF (y, x) → (nx, ny)
        a = np.asarray(vs[name], np.float64)
        return np.nan_to_num(a, nan=0.0).T

    if "topo" not in vs:
        raise ValueError(f"{gridded_path}: no 'topo' DEM variable — not an OGGM gridded_data file")
    S = raster("topo")

    tvar = thickness_var or next((v for v in _THICKNESS_VARS if v in vs), None)
    if tvar is None:
        raise ValueError(
            f"{gridded_path}: no ice-thickness product (looked for {_THICKNESS_VARS})"
        )
    H0 = np.maximum(raster(tvar), 0.0)
    mask = raster("glacier_mask") if "glacier_mask" in vs else (H0 > 0).astype(np.float64)
    H0 = H0 * (mask > 0)
    B = S - H0

    cx = np.asarray(vs.get("x", np.arange(S.shape[0])), np.float64)
    cy = np.asarray(vs.get("y", np.arange(S.shape[1])), np.float64)
    dx = _grid_spacing(cx, "x")
    dy = _grid_spacing(cy, "y")

    climate = None
    if climate_path is not None and os.path.exists(climate_path):
        cvs, cva, cga = read_netcdf(climate_path)
        t_units = cva.get("time", {}).get("units", "months since 1900-01-01")
        t_years = parse_cf_time(np.asarray(cvs["time"]), str(t_units))
        temp = np.asarray(cvs["temp"], np.float64)
        # gradient: per-month lapse rate if provided, else OGGM's default
        grad = np.asarray(
            cvs.get("gradient", np.full_like(temp, -0.0065)), np.float64
        )
        # solid precipitation: OGGM stores total precip [kg m-2 == mm w.e.];
        # Sleipnir converts mm → m w.e. for the TI model
        if "snow" in cvs:
            snow = np.asarray(cvs["snow"], np.float64)
        else:
            prcp = np.asarray(cvs.get("prcp", np.zeros_like(temp)), np.float64)
            snow = prcp / 1000.0
        ref_hgt = float(
            cga.get("ref_hgt", cva.get("temp", {}).get("ref_hgt", 0.0))
        )
        # long-term temperature: mean over the series at ref height
        # prefer the preprocessed long-term temperature (what the T→A laws
        # consume); the monthly-series mean is only a fallback — it reflects
        # the ref-height seasonal mean, not the glacier's long-term climate
        if "longterm_temp" in ga:
            longterm = float(ga["longterm_temp"])
        else:
            longterm = float(np.mean(temp))
        nx, ny = H0.shape
        climate = Climate2D(
            t_start=jnp.asarray(float(t_years[0])),
            temp=jnp.asarray(temp),
            gradient=jnp.asarray(grad),
            snow=jnp.asarray(snow),
            ref_hgt=jnp.asarray(ref_hgt),
            longterm_temps_scalar=jnp.asarray(longterm),
            longterm_temps_gridded=jnp.full((nx, ny), longterm),
        )
    else:
        longterm = float(ga.get("longterm_temp", -15.0))
        nx, ny = H0.shape
        climate = DummyClimate2D(
            longterm_temps_scalar=jnp.asarray(longterm),
            longterm_temps_gridded=jnp.full((nx, ny), longterm),
        )

    velocity_data = None
    if "millan_vx" in vs and "millan_vy" in vs:
        vx = raster("millan_vx")[None]
        vy = raster("millan_vy")[None]
        vabs = raster("millan_v")[None] if "millan_v" in vs else np.sqrt(vx**2 + vy**2)
        # Millan et al. 2022 mosaics are nominally 2017-2018 composites
        t_v = float(ga.get("millan_date", 2017.5))
        velocity_data = SurfaceVelocityData(
            t=jnp.asarray([t_v]), vx=jnp.asarray(vx), vy=jnp.asarray(vy),
            vabs=jnp.asarray(vabs),
        )

    dhdt_data = None
    if "hugonnet_dhdt" in vs:
        dhdt_data = DhdtData(
            t1=jnp.asarray(float(ga.get("hugonnet_t1", 2000.0))),
            t2=jnp.asarray(float(ga.get("hugonnet_t2", 2020.0))),
            dhdt=jnp.asarray(raster("hugonnet_dhdt")),
        )

    rid = rgi_id or str(ga.get("rgi_id", os.path.basename(os.path.dirname(gridded_path)) or "unknown"))
    return Glacier(
        H0=jnp.asarray(H0),
        B=jnp.asarray(B),
        dx=jnp.asarray(dx),
        dy=jnp.asarray(dy),
        A=jnp.asarray(float(ga.get("A", 4e-17))),
        C=jnp.asarray(float(ga.get("C", 0.0))),
        n=jnp.asarray(float(ga.get("n", 3.0))),
        mask=jnp.asarray((mask > 0).astype(H0.dtype)),
        coords_x=jnp.asarray(cx),
        coords_y=jnp.asarray(cy),
        climate=climate,
        velocity_data=velocity_data,
        dhdt_data=dhdt_data,
        rgi_id=rid,
    )


def write_glacier_nc(dirpath: str, glacier, longterm_temp: float) -> str:
    """Producer side: emit an OGGM-layout glacier directory
    (``gridded_data.nc`` + ``climate_historical.nc``) from a Glacier —
    the Gungnir-equivalent preprocessing output this reader ingests.
    Returns the glacier directory path."""
    gdir = os.path.join(dirpath, glacier.rgi_id)
    os.makedirs(gdir, exist_ok=True)
    H0 = np.asarray(glacier.H0, np.float64)
    B = np.asarray(glacier.B, np.float64)
    mask = np.asarray(glacier.mask, np.float64)
    topo = (B + H0).T            # (nx, ny) → CF (y, x)
    write_netcdf(
        os.path.join(gdir, "gridded_data.nc"),
        variables={
            "topo": (("y", "x"), topo),
            "consensus_ice_thickness": (("y", "x"), H0.T),
            "glacier_mask": (("y", "x"), mask.T),
        },
        coords={
            "x": np.asarray(glacier.coords_x, np.float64),
            "y": np.asarray(glacier.coords_y, np.float64),
        },
        var_attrs={
            "topo": {"units": "m", "long_name": "DEM topography"},
            "consensus_ice_thickness": {"units": "m"},
            "x": {"units": "m"}, "y": {"units": "m"},
        },
        global_attrs={
            "rgi_id": glacier.rgi_id,
            "longterm_temp": float(longterm_temp),
            "A": float(glacier.A), "C": float(glacier.C), "n": float(glacier.n),
        },
    )
    clim = glacier.climate
    if hasattr(clim, "temp") and clim.temp is not None:
        t0 = float(clim.t_start)
        n_m = int(np.asarray(clim.temp).shape[-1])
        months = np.arange(n_m, dtype=np.float64)
        write_netcdf(
            os.path.join(gdir, "climate_historical.nc"),
            variables={
                "temp": (("time",), np.asarray(clim.temp, np.float64)),
                "gradient": (("time",), np.asarray(clim.gradient, np.float64)),
                "prcp": (("time",), np.asarray(clim.snow, np.float64) * 1000.0),
            },
            coords={"time": months},
            var_attrs={
                # total-months divmod: int(t0)-based month arithmetic yields
                # month 13 for t0 fractions >= 23/24 (an invalid CF epoch)
                "time": {
                    "units": "months since {}-{:02d}-01".format(
                        int(round(t0 * 12)) // 12, int(round(t0 * 12)) % 12 + 1
                    ),
                    "calendar": "standard",
                },
                "temp": {"units": "degC"},
                "prcp": {"units": "kg m-2"},
            },
            global_attrs={"ref_hgt": float(clim.ref_hgt)},
        )
    return gdir


def load_velocity_nc(path: str):
    """Velocity datacube ``.nc`` → :class:`SurfaceVelocityData`.

    Gungnir-style cube contract (mirrors Sleipnir.SurfaceVelocityData fields,
    /root/reference/scripts/MWEs/inversion_diffusivity/inversion_setup.jl:79-86):
    variables ``vx``/``vy`` (+ optional ``v``) with dims (time, y, x), a CF
    ``time`` coordinate (mid-date of each product), optional ``date1``/``date2``
    interval bounds, and ``x``/``y`` projected coordinates. A cube on its own
    grid (is_grid_glacier_aligned=False) is regridded onto the glacier by
    :func:`odinn_tpu.core.glacier.regrid_velocity_data`.
    """
    import jax.numpy as jnp

    from odinn_tpu.core.glacier import SurfaceVelocityData

    vs, va, ga = read_netcdf(path)
    if "vx" not in vs or "vy" not in vs:
        raise ValueError(f"{path}: velocity cube needs 'vx' and 'vy' variables")

    def cube(name):
        a = np.asarray(vs[name], np.float64)
        return np.nan_to_num(a, nan=0.0).transpose(0, 2, 1)   # (t, y, x) → (t, x, y)

    vx = cube("vx")
    vy = cube("vy")
    vabs = cube("v") if "v" in vs else np.sqrt(vx**2 + vy**2)
    t_units = va.get("time", {}).get("units", "years since 0-01-01")
    t = parse_cf_time(np.asarray(vs["time"]), str(t_units)) if "time" in vs else None
    d1 = (parse_cf_time(np.asarray(vs["date1"]), str(t_units))
          if "date1" in vs else None)
    d2 = (parse_cf_time(np.asarray(vs["date2"]), str(t_units))
          if "date2" in vs else None)
    aligned = bool(ga.get("is_grid_glacier_aligned", False))
    return SurfaceVelocityData(
        t=jnp.asarray(t) if t is not None else None,
        vx=jnp.asarray(vx), vy=jnp.asarray(vy), vabs=jnp.asarray(vabs),
        x=jnp.asarray(np.asarray(vs["x"], np.float64)) if "x" in vs else None,
        y=jnp.asarray(np.asarray(vs["y"], np.float64)) if "y" in vs else None,
        date1=jnp.asarray(d1) if d1 is not None else None,
        date2=jnp.asarray(d2) if d2 is not None else None,
        is_grid_glacier_aligned=aligned,
    )


def write_velocity_nc(path: str, vd, t_units: str = "years since 0-01-01") -> None:
    """Producer side of the velocity-cube contract (test fixtures /
    Gungnir-equivalent preprocessing)."""
    variables = {
        "vx": (("time", "y", "x"), np.asarray(vd.vx, np.float64).transpose(0, 2, 1)),
        "vy": (("time", "y", "x"), np.asarray(vd.vy, np.float64).transpose(0, 2, 1)),
    }
    if vd.vabs is not None:
        variables["v"] = (("time", "y", "x"),
                          np.asarray(vd.vabs, np.float64).transpose(0, 2, 1))
    coords = {"time": np.asarray(vd.t, np.float64)}
    if vd.x is not None:
        coords["x"] = np.asarray(vd.x, np.float64)
        coords["y"] = np.asarray(vd.y, np.float64)
    write_netcdf(
        path, variables=variables, coords=coords,
        var_attrs={"time": {"units": t_units}, "vx": {"units": "m yr-1"},
                   "vy": {"units": "m yr-1"}},
        global_attrs={"is_grid_glacier_aligned": int(bool(vd.is_grid_glacier_aligned))},
    )
