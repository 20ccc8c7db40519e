"""Plotting: glacier fields, gridded data, learned laws, MB, animations.

TPU-native rebuild of the reference's plotting surface:
- ``plot_glacier`` / ``plot_gridded_data`` / ``plot_cumulative_mb`` /
  ``plot_glacier_vid`` (Sleipnir; usage
  /root/reference/docs/src/forward_simulation.jl:48,138-144)
- ``plot_law`` 1-D line / 2-D heatmap with ground-truth overlay
  (/root/reference/src/laws/laws_plots.jl)

All matplotlib (Agg backend) — figures are returned and optionally saved;
nothing here touches the accelerator.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

__all__ = [
    "plot_glacier",
    "plot_gridded_data",
    "plot_law",
    "plot_cumulative_mb",
    "plot_glacier_vid",
    "save_plot",
]


def save_plot(fig, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)


def plot_glacier(glacier, fields: Sequence[str] = ("H0", "B"), title: Optional[str] = None):
    """Heatmaps of glacier fields (Sleipnir.plot_glacier equivalent)."""
    fields = list(fields)
    fig, axes = plt.subplots(1, len(fields), figsize=(5 * len(fields), 4))
    if len(fields) == 1:
        axes = [axes]
    extent = None
    if glacier.coords_x is not None and glacier.coords_y is not None:
        cx, cy = np.asarray(glacier.coords_x), np.asarray(glacier.coords_y)
        extent = [cy[0], cy[-1], cx[0], cx[-1]]
    for ax, f in zip(axes, fields):
        data = np.asarray(getattr(glacier, f))
        im = ax.imshow(data, origin="lower", extent=extent, cmap="viridis")
        ax.set_title(f"{glacier.rgi_id}: {f}")
        fig.colorbar(im, ax=ax, shrink=0.8)
    if title:
        fig.suptitle(title)
    return fig


def plot_gridded_data(data, title: str = "", cmap: str = "viridis", mask=None):
    """Single gridded field (Sleipnir.plot_gridded_data equivalent)."""
    fig, ax = plt.subplots(figsize=(5.5, 4.5))
    arr = np.asarray(data, dtype=float)
    if mask is not None:
        arr = np.where(np.asarray(mask), arr, np.nan)
    im = ax.imshow(arr, origin="lower", cmap=cmap)
    ax.set_title(title)
    fig.colorbar(im, ax=ax, shrink=0.85)
    return fig


def plot_law(law, theta, glacier, input_ranges: dict, truth_fn=None, n: int = 100,
             glacier_idx: int = 0, t: float = 0.0, surface: bool = False,
             posterior=None):
    """Evaluate a law over 1 or 2 swept inputs (plot_law equivalent,
    /root/reference/src/laws/laws_plots.jl): line plot for one input,
    heatmap for two (or a 3-D surface with ``surface=True``, matching the
    reference's PlotlyJS surface view — truth overlaid as a wireframe);
    optional ground-truth overlay.

    ``posterior``: an `inverse.uncertainty.LaplacePosterior` — 1-input plots
    then shade the ±2σ pointwise confidence band of the law (beyond-parity;
    the reference plots point estimates only)."""
    import jax.numpy as jnp

    names = list(input_ranges.keys())
    base_inputs = {"glacier_idx": jnp.asarray(glacier_idx)}
    for spec in law.inputs:
        base_inputs[spec.name] = spec.get(glacier, glacier.H0, t)

    if len(names) == 1:
        name = names[0]
        lo, hi = input_ranges[name]
        xs = np.linspace(lo, hi, n)
        ys = []
        for x in xs:
            inp = dict(base_inputs)
            inp[name] = jnp.asarray(x)
            ys.append(float(np.ravel(np.asarray(law.apply(theta, inp)))[0]))
        fig, ax = plt.subplots(figsize=(5.5, 4))
        ax.plot(xs, ys, label=f"law {law.name}")
        if posterior is not None:
            def band_fn(th):
                def one(x):
                    inp = {k: v for k, v in base_inputs.items()}
                    inp[name] = x
                    return jnp.ravel(jnp.asarray(law.apply(th, inp)))[0]
                return jnp.stack([one(jnp.asarray(x)) for x in xs])

            vals, stds = posterior.band(band_fn)
            vals = np.asarray(vals)
            stds = np.asarray(stds)
            ax.fill_between(xs, vals - 2 * stds, vals + 2 * stds, alpha=0.25,
                            label="±2σ (Laplace)")
        if truth_fn is not None:
            ax.plot(xs, [float(truth_fn(x)) for x in xs], "--", label="truth")
        ax.set_xlabel(name)
        ax.set_ylabel(law.slot)
        ax.legend()
        return fig

    if len(names) == 2:
        (nx_name, ny_name) = names
        lo1, hi1 = input_ranges[nx_name]
        lo2, hi2 = input_ranges[ny_name]
        xs = np.linspace(lo1, hi1, n)
        ys = np.linspace(lo2, hi2, n)
        import jax

        def eval_xy(x, y):
            inp = dict(base_inputs)
            inp[nx_name] = jnp.full((1, 1), x)
            inp[ny_name] = jnp.full((1, 1), y)
            return np.ravel(np.asarray(law.apply(theta, inp)))[0]

        Z = np.array([[eval_xy(x, y) for y in ys] for x in xs])
        if surface:
            fig = plt.figure(figsize=(7, 5.5))
            ax = fig.add_subplot(projection="3d")
            YY, XX = np.meshgrid(ys, xs)
            surf = ax.plot_surface(XX, YY, Z, cmap="magma", alpha=0.9,
                                   linewidth=0, antialiased=True)
            if truth_fn is not None:
                Zt = np.array([[float(truth_fn(x, y)) for y in ys] for x in xs])
                ax.plot_wireframe(XX, YY, Zt, color="k", linewidth=0.4,
                                  rstride=max(n // 12, 1), cstride=max(n // 12, 1),
                                  label="truth")
            ax.set_xlabel(nx_name)
            ax.set_ylabel(ny_name)
            ax.set_zlabel(law.slot)
            fig.colorbar(surf, ax=ax, shrink=0.6, label=law.slot)
            return fig
        fig, ax = plt.subplots(figsize=(6, 4.5))
        im = ax.pcolormesh(ys, xs, Z, shading="auto", cmap="magma")
        ax.set_xlabel(ny_name)
        ax.set_ylabel(nx_name)
        fig.colorbar(im, ax=ax, label=law.slot)
        return fig

    raise ValueError("plot_law supports 1 or 2 swept inputs")


def plot_cumulative_mb(glacier, mb_model, tspan, step: float = 1.0 / 12.0):
    """Cumulative glacier-wide mass balance over time
    (Sleipnir.plot_cumulative_mb equivalent)."""
    import jax.numpy as jnp

    from odinn_tpu.physics.mass_balance import compute_mb

    ts = np.arange(tspan[0] + step, tspan[1] + 1e-9, step)
    S = np.asarray(glacier.B + glacier.H0)
    inside = np.asarray(glacier.H0) > 0
    cum, series = 0.0, []
    for t in ts:
        mb = np.asarray(compute_mb(mb_model, glacier.climate, jnp.asarray(S), float(t), step))
        cum += float(mb[inside].mean()) if inside.any() else 0.0
        series.append(cum)
    fig, ax = plt.subplots(figsize=(6, 3.5))
    ax.plot(ts, series)
    ax.set_xlabel("time [yr]")
    ax.set_ylabel("cumulative MB [m ice]")
    ax.set_title(f"{glacier.rgi_id} cumulative mass balance")
    return fig


def plot_glacier_vid(path: str, traj, glacier, fps: int = 8, field_label: str = "H [m]"):
    """Animated GIF of a thickness trajectory (plot_glacier_vid equivalent)."""
    from PIL import Image

    traj = np.asarray(traj)
    vmax = float(traj.max())
    frames = []
    for k in range(traj.shape[0]):
        fig, ax = plt.subplots(figsize=(4.5, 4))
        ax.imshow(traj[k], origin="lower", cmap="Blues", vmin=0.0, vmax=vmax)
        ax.set_title(f"{glacier.rgi_id}  t index {k}  ({field_label})")
        fig.canvas.draw()
        w, h = fig.canvas.get_width_height()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8).reshape(h, w, 4)
        frames.append(Image.fromarray(buf[..., :3]))
        plt.close(fig)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    frames[0].save(
        path, save_all=True, append_images=frames[1:], duration=int(1000 / fps), loop=0
    )
    return path
