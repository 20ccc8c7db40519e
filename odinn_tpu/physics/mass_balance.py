"""Surface mass balance: temperature-index model (Muninn equivalent).

TPU-native rebuild of Muninn's ``TImodel1`` / ``MB_timestep!`` / ``compute_MB``
/ ``apply_MB_mask!`` / ``downscale_2D_climate`` (semantics reconstructed from
the reference's hand-written MB VJP,
/root/reference/src/inverse/SIA2D/VJPs.jl:107-151, and call sites at
/root/reference/src/simulations/inversions/inversion_utils.jl:498-517):

- the climate series is downscaled to the glacier surface with a lapse-rate
  gradient:  T₂D(m) = T_ref(m) + ∇T(m)·(S − ref_hgt)
- melt  = DDF · Σ_m PDD(m)   over the trailing window (positive degree-days)
- acc   = acc_factor · Σ_m snow(m)
- the MB mask ((H>0 ∧ MB<0) ∨ (H>10 ∧ MB≥0)) gates application and MB is
  clipped so H + MB ≥ 0 (ice cannot go negative) — VJPs.jl:126-140.

Design: the window sum is a static-shape masked reduction over the whole
monthly series (no dynamic slicing), so MB application is one fused XLA kernel
and — crucially — *differentiable by construction*: folded into the scan step,
JAX reverse-mode sees it, removing the reference's need for a bespoke MB VJP
(the reference cannot differentiate its callbacks on the SciML path,
/root/reference/src/simulations/inversions/inversion_utils.jl:321-323).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

__all__ = ["TImodel1", "downscale_2d_climate", "compute_mb", "apply_mb_mask", "mb_timestep"]

_DAYS_PER_MONTH = 30.44


@dataclass(frozen=True)
class TImodel1:
    """Temperature-index mass-balance model (Muninn.TImodel1).

    DDF in m ice °C⁻¹ day⁻¹; acc_factor dimensionless multiplier on solid
    precipitation.
    """

    DDF: float = 7.0e-3
    acc_factor: float = 1.0


def downscale_2d_climate(climate, S):
    """Downscale the monthly reference-height temperature series to the
    glacier surface (Muninn/Sleipnir ``downscale_2D_climate!`` equivalent).

    Returns T₂D of shape (n_months, nx, ny).
    """
    return climate.temp[:, None, None] + climate.gradient[:, None, None] * (
        S[None] - climate.ref_hgt
    )


def compute_mb(mb: TImodel1, climate, S, t, step):
    """Mass balance accumulated over the window (t−step, t], per cell [m ice].

    Muninn ``compute_MB`` + ``get_cumulative_climate!`` equivalent. The
    window gather is a static-size ``dynamic_slice`` of the monthly series
    (window length is known from ``step``), so each MB application touches
    only its own months instead of masking the whole series — the MB callback
    cost is O(window), not O(simulation length).
    """
    import jax.lax as lax

    n_m = climate.temp.shape[-1]
    n_win = max(int(round(float(step) * 12.0)), 1)
    # months m with t_start + (m+0.5)/12 ∈ (t−step, t] start at
    # m0 = round((t−step−t_start)·12)
    m0 = jnp.round((t - step - climate.t_start) * 12.0).astype(jnp.int32)
    m0 = jnp.clip(m0, 0, n_m - n_win)

    temp_w = lax.dynamic_slice(climate.temp, (m0,), (n_win,))
    grad_w = lax.dynamic_slice(climate.gradient, (m0,), (n_win,))
    snow_w = lax.dynamic_slice(climate.snow, (m0,), (n_win,))

    t2d = temp_w[:, None, None] + grad_w[:, None, None] * (S[None] - climate.ref_hgt)
    pdd = jnp.maximum(t2d, 0.0) * _DAYS_PER_MONTH          # degree-days per month
    melt = mb.DDF * jnp.sum(pdd, axis=0)
    acc = mb.acc_factor * jnp.sum(snow_w)
    return acc - melt


def apply_mb_mask(H, MB):
    """Masked, clipped MB application; returns (H_new, MB_applied).

    Mask and clipping semantics from
    /root/reference/src/inverse/SIA2D/VJPs.jl:126-140:
      mask = (H > 0 ∧ MB < 0) ∨ (H > 10 ∧ MB ≥ 0);  MB clipped to ≥ −H.
    """
    mask = ((H > 0.0) & (MB < 0.0)) | ((H > 10.0) & (MB >= 0.0))
    mb_eff = jnp.where(mask, MB, 0.0)
    mb_eff = jnp.maximum(mb_eff, -H)
    return H + mb_eff, mb_eff


def mb_timestep(H, glacier, mb: TImodel1, t, step):
    """Full MB step at time t over window (t−step, t] (Muninn MB_timestep!).

    Returns the updated thickness. Pure function — safe to fold into the
    solve's scan step so reverse-mode AD differentiates through it.
    """
    H_pos = jnp.where(H > 0.0, H, 0.0)
    S = glacier.B + H_pos
    if hasattr(mb, "compute_mb_field"):
        # MLP MB models (MassBalanceMachine CustomMLP equivalent)
        MB = mb.compute_mb_field(glacier.climate, S, t, step)
    else:
        MB = compute_mb(mb, glacier.climate, S, t, step)
    H_new, _ = apply_mb_mask(H_pos, MB)
    return H_new


def validate_model_simulation_compatibility(model, params) -> None:
    """Muninn's validate_model_simulation_compatibility equivalent: an MB
    model requires a monthly climate and use_MB; raise early otherwise."""
    if params.simulation.use_MB and model.mass_balance is None:
        raise ValueError("use_MB=True but the model has no mass-balance component")
    if not params.simulation.use_MB and model.mass_balance is not None:
        import warnings

        warnings.warn("mass-balance model provided but use_MB=False; it will be ignored")
