"""Laws: parameterizations binding regressors/inverted parameters to PDE slots.

TPU-native rebuild of the reference law subsystem
(/root/reference/src/laws/Laws.jl:34-460; Law semantics documented at
/root/reference/docs/src/inversions.md:122-156):

- ``LawA(nn, params)``          — NN: T → A, scaled to [minA, maxA]   (Laws.jl:323-380)
- ``LawA_inversion(params)``    — per-glacier tanh-bounded A (scalar or grid)
                                  (Laws.jl:402-460)
- ``LawY(nn, params)``          — NN: (T, H̄) → hybrid diffusivity Y  (Laws.jl ~190-270)
- ``LawU(nn, params)``          — NN: (H̄, |∇S|) → diffusive velocity U (Laws.jl:99-188)
- ``ConstantA``, ``CuffeyPaterson``, ``poly_A_paterson_cuffey``, ``SyntheticC``
                                  — non-learnable laws (Huginn; usage
                                  /root/reference/test/inversion_test.jl:77,87)

Design: a ``Law`` is a *static* description — input specs, a pure apply
function, a schedule — while all trainable state lives in the θ pytree under
the law's slot key. There are no caches and no custom VJP plumbing
(/root/reference/src/laws/Cache.jl, auto_VJP.jl): JAX reverse-mode through the
pure apply function replaces DifferentiationInterface preparations, and law
outputs are ordinary traced values that XLA fuses into the RHS kernel.

Scheduling (``callback_freq``): ``None`` → evaluated at every RHS call (inner
laws depending on H̄/∇S); ``0`` → once at simulation start; ``x > 0`` →
re-evaluated every x years at tstop boundaries, matching the reference's
callback-law semantics (/root/reference/docs/src/inversions.md:140-156).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from odinn_tpu.laws import inputs as law_inputs
from odinn_tpu.models import nn as nnmod

__all__ = [
    "Law",
    "LawA",
    "LawA_inversion",
    "LawC",
    "LawC_inversion",
    "LawN_inversion",
    "LawY",
    "LawU",
    "ConstantA",
    "CuffeyPaterson",
    "poly_A_paterson_cuffey",
    "SyntheticC",
    "eval_law",
]


@dataclass(frozen=True)
class Law:
    """A parameterization of one PDE slot.

    ``apply_fn(theta, inputs)``: ``theta`` is the full trainable pytree (the
    law reads its own slice, e.g. ``theta["A"]``); ``inputs`` is a dict of
    resolved input arrays (plus ``glacier_idx`` for per-glacier laws).
    """

    slot: str                                   # "A" | "C" | "n" | "Y" | "U" | "n_H" | "n_gradS"
    apply_fn: Callable[[Any, dict], Any]
    inputs: Tuple[Any, ...] = ()
    callback_freq: Optional[float] = 0.0
    trainable: bool = True
    name: str = "law"
    init_theta: Optional[Callable] = None       # (glaciers, dtype) -> θ subtree

    @property
    def is_inner(self) -> bool:
        """True if the law must be evaluated inside the RHS (every call)."""
        return self.callback_freq is None

    @property
    def input_names(self) -> Tuple[str, ...]:
        return tuple(i.name for i in self.inputs)

    def apply(self, theta, inputs: dict):
        return self.apply_fn(theta, inputs)


# ---------------------------------------------------------------------------
# Learnable laws
# ---------------------------------------------------------------------------

def LawA(nn: nnmod.NeuralNetwork, params, scalar: bool = True,
         head: str = "sigmoid", prescale_bounds=None,
         n_fourier: Optional[int] = None, fourier_scale: float = 1.0) -> Law:
    """NN law T → A ∈ [minA, maxA] (reference Laws.jl:323-380).

    ``head`` selects the output parameterization:

    - ``"sigmoid"`` (reference parity): ``scale(NN(T), (minA, maxA))`` — the
      sigmoid head mapped *linearly* onto the bounds.
    - ``"log"``: ``exp(scale(NN(T), (log minA, log maxA)))`` — the head mapped
      onto the bounds in log space. A spans ~3 decades over glacier
      temperatures, so the linear map needs ~1e-5 absolute head accuracy for
      1e-3 relative A accuracy at the cold end; the log map equalizes relative
      sensitivity across the range (measured floor for the default
      architecture over T ∈ [−25, −14]: max rel err 5.6e-3 linear vs 2.5e-4
      log). Use for many-glacier inversions spanning wide temperature ranges.

    ``prescale_bounds`` (e.g. ``((-25.0, 0.0),)``): normalize the temperature
    input to [0, 1] before the network (the reference's `_ml_model_prescale`,
    target_utils.jl:58-86). Raw °C inputs saturate the first layer and cap
    the trainable fit ~20× above the architecture's floor (measured).

    ``n_fourier``: embed the (prescaled) input with ``n_fourier`` Fourier
    frequencies before the network (the reference's Fourier-feature option,
    NN_utils.jl:37-70; the MLP's input width must be 2·n_fourier). Plain
    tanh nets plateau ~1.7e-5 max rel err fitting 128 recovered A values —
    spectral-bias-limited; 8 Fourier frequencies + one 32-wide layer
    interpolate the same targets to f64 machine precision (measured).

    Applied once at simulation start (callback_freq = 0) since the long-term
    temperature input is time-independent within a solve.
    """
    min_a, max_a = params.physical.min_A, params.physical.max_A
    arch = nn.architecture
    if head not in ("sigmoid", "log"):
        raise ValueError(f"LawA head must be 'sigmoid' or 'log', got {head!r}")
    log_head = head == "log"

    def apply_fn(theta, inputs):
        t_in = inputs["T_grid"] if not scalar else inputs["T"]
        x = jnp.asarray(t_in)[..., None]
        if prescale_bounds is not None:
            x = nnmod.prescale(x, prescale_bounds)
        if n_fourier:
            x = nnmod.fourier_feature(x, n_freq=n_fourier, scale_ff=fourier_scale)
        out = nnmod.mlp_apply(arch, theta["A"], x)[..., 0]
        if log_head:
            return jnp.exp(nnmod.scale(out, (jnp.log(min_a), jnp.log(max_a))))
        return nnmod.scale(out, (min_a, max_a))

    inp = (law_inputs.AvgScalarTemp(),) if scalar else (law_inputs.AvgGriddedTemp(),)
    return Law(
        slot="A",
        apply_fn=apply_fn,
        inputs=inp,
        callback_freq=0.0,
        trainable=True,
        name="NN_A",
        init_theta=lambda glaciers, dtype=jnp.float64: nn.init(dtype),
    )


def LawA_inversion(params, scalar: bool = True, grid_shape=None) -> Law:
    """Classical-inversion A law: one tanh-bounded scalar (or grid) per glacier
    (reference Laws.jl:402-460).

    θ["A"] has shape (n_glaciers,) or (n_glaciers, nx−1, ny−1); the law
    selects its glacier's slice with the traced ``glacier_idx`` input, so the
    whole batch trains under one vmap.
    """
    min_a, max_a = params.physical.min_A, params.physical.max_A

    def apply_fn(theta, inputs):
        raw = theta["A"][inputs["glacier_idx"]]
        return min_a + (max_a - min_a) * (jnp.tanh(raw) + 1.0) / 2.0

    def init_theta(glaciers, dtype=jnp.float64):
        n_g = len(glaciers) if isinstance(glaciers, (list, tuple)) else glaciers.H0.shape[0]
        if scalar:
            return jnp.zeros((n_g,), dtype)
        if grid_shape is not None:
            nx, ny = grid_shape
        elif isinstance(glaciers, (list, tuple)):
            nx = max(g.nx for g in glaciers)
            ny = max(g.ny for g in glaciers)
        else:
            nx, ny = glaciers.H0.shape[-2:]
        return jnp.zeros((n_g, nx - 1, ny - 1), dtype)

    return Law(
        slot="A",
        apply_fn=apply_fn,
        inputs=(),
        callback_freq=0.0,
        trainable=True,
        name="InvA" if scalar else "InvA_grid",
        init_theta=init_theta,
    )


def LawC(
    nn: nnmod.NeuralNetwork,
    params,
    prescale_bounds: Tuple[Tuple[float, float], ...] = ((0.0, 2000.0), (0.0, 0.05)),
) -> Law:
    """NN sliding law (CPDD, topo_rough) → C ∈ [minC, maxC].

    Beyond-reference capability: the reference's ``Model`` exposes a C slot
    (/root/reference/src/models/trainable_components/Model.jl:81-123) and a
    *synthetic* sliding law (Huginn.SyntheticC) but ships no learnable C
    constructor (Laws.jl has LawA/LawY/LawU only). This closes the slot with
    the LawY design: per-pixel features batched into one (npix, 2) matmul
    chain for the MXU, sigmoid head mapped linearly onto [minC, maxC], output
    averaged onto the staggered (nx−1, ny−1) grid where the sliding term of
    the diffusivity lives (physics.targets.ATarget.diffusivity).

    Gradients flow through the generic exact-pullback machinery
    (inverse.vjps.rhs_with_theta) on every adjoint path — no bespoke VJPs.
    """
    min_c, max_c = params.physical.min_C, params.physical.max_C
    arch = nn.architecture

    def apply_fn(theta, inputs):
        rough = inputs["topo_rough"]
        cpdd = jnp.broadcast_to(inputs["CPDD"], rough.shape)
        feats = jnp.stack([cpdd, rough], axis=-1)
        if prescale_bounds is not None:
            feats = nnmod.prescale(feats, prescale_bounds)
        out = nnmod.mlp_apply(arch, theta["C"], feats.reshape(-1, 2))[..., 0]
        c = nnmod.scale(out.reshape(rough.shape), (min_c, max_c))
        from odinn_tpu.ops.stencils import avg

        return avg(c)

    return Law(
        slot="C",
        apply_fn=apply_fn,
        inputs=(law_inputs.CPDD(), law_inputs.TopoRough()),
        callback_freq=0.0,
        trainable=True,
        name="NN_C",
        init_theta=lambda glaciers, dtype=jnp.float64: nn.init(dtype),
    )


def LawC_inversion(params, scalar: bool = True, grid_shape=None) -> Law:
    """Classical sliding inversion: one tanh-bounded C ∈ [minC, maxC] per
    glacier (scalar or staggered grid) — the C-slot counterpart of
    ``LawA_inversion`` (reference Laws.jl:402-460 pattern applied to the C
    slot, which the reference leaves without a learnable constructor)."""
    min_c, max_c = params.physical.min_C, params.physical.max_C

    def apply_fn(theta, inputs):
        raw = theta["C"][inputs["glacier_idx"]]
        return min_c + (max_c - min_c) * (jnp.tanh(raw) + 1.0) / 2.0

    def init_theta(glaciers, dtype=jnp.float64):
        n_g = len(glaciers) if isinstance(glaciers, (list, tuple)) else glaciers.H0.shape[0]
        if scalar:
            return jnp.zeros((n_g,), dtype)
        if grid_shape is not None:
            nx, ny = grid_shape
        elif isinstance(glaciers, (list, tuple)):
            nx = max(g.nx for g in glaciers)
            ny = max(g.ny for g in glaciers)
        else:
            nx, ny = glaciers.H0.shape[-2:]
        return jnp.zeros((n_g, nx - 1, ny - 1), dtype)

    return Law(
        slot="C",
        apply_fn=apply_fn,
        inputs=(),
        callback_freq=0.0,
        trainable=True,
        name="InvC" if scalar else "InvC_grid",
        init_theta=init_theta,
    )


def LawN_inversion(params, bounds: Tuple[float, float] = (1.5, 4.2)) -> Law:
    """Per-glacier Glen-exponent inversion: one tanh-bounded n per glacier.

    Beyond-reference: the reference's n slot only takes constant laws. A
    traced n disables the static-exponent strength reduction
    (physics.targets._pow falls back to powf) — expected, and only on models
    that opt in. The creep term A·Γ(n)·H̄^{n+2}|∇S|^{n−1} is smooth in n, so
    exact pullbacks give the gradient on every adjoint path."""
    lo, hi = bounds

    def apply_fn(theta, inputs):
        raw = theta["n"][inputs["glacier_idx"]]
        return lo + (hi - lo) * (jnp.tanh(raw) + 1.0) / 2.0

    def init_theta(glaciers, dtype=jnp.float64):
        n_g = len(glaciers) if isinstance(glaciers, (list, tuple)) else glaciers.H0.shape[0]
        return jnp.zeros((n_g,), dtype)

    return Law(
        slot="n",
        apply_fn=apply_fn,
        inputs=(),
        callback_freq=0.0,
        trainable=True,
        name="InvN",
        init_theta=init_theta,
    )


def LawY(
    nn: nnmod.NeuralNetwork,
    params,
    max_nn: Optional[float] = None,
    prescale_bounds: Tuple[Tuple[float, float], ...] = ((-25.0, 0.0), (0.0, 500.0)),
) -> Law:
    """NN law (T, H̄) → Y (hybrid diffusivity matrix), reference LawY.

    Inner law (evaluated every RHS call). The per-pixel NN evaluation is
    batched into one (npix, 2) → (npix, 1) matmul chain for the MXU.
    """
    arch = nn.architecture

    def apply_fn(theta, inputs):
        hbar = inputs["Hbar"]
        temp = jnp.broadcast_to(inputs["T"], hbar.shape)
        feats = jnp.stack([temp, hbar], axis=-1)
        if prescale_bounds is not None:
            feats = nnmod.prescale(feats, prescale_bounds)
        out = nnmod.mlp_apply(arch, theta["Y"], feats.reshape(-1, 2))
        out = out.reshape(hbar.shape)
        if max_nn is not None:
            out = nnmod.postscale(out, max_nn)
        return out

    return Law(
        slot="Y",
        apply_fn=apply_fn,
        inputs=(law_inputs.AvgScalarTemp(), law_inputs.HbarInput()),
        callback_freq=None,
        trainable=True,
        name="NN_Y",
        init_theta=lambda glaciers, dtype=jnp.float64: nn.init(dtype),
    )


def LawU(
    nn: nnmod.NeuralNetwork,
    params,
    max_nn: Optional[float] = 50.0,
    prescale_bounds: Tuple[Tuple[float, float], ...] = ((0.0, 300.0), (0.0, 0.5)),
) -> Law:
    """NN law (H̄, |∇S|) → U (diffusive velocity matrix), reference LawU
    (Laws.jl:99-188). D = H̄·U (see DPureTarget)."""
    arch = nn.architecture

    def apply_fn(theta, inputs):
        hbar, grad_s = inputs["Hbar"], inputs["gradS"]
        feats = jnp.stack([hbar, grad_s], axis=-1)
        if prescale_bounds is not None:
            feats = nnmod.prescale(feats, prescale_bounds)
        out = nnmod.mlp_apply(arch, theta["U"], feats.reshape(-1, 2))
        out = out.reshape(hbar.shape)
        if max_nn is not None:
            out = nnmod.postscale(out, max_nn)
        return out

    return Law(
        slot="U",
        apply_fn=apply_fn,
        inputs=(law_inputs.HbarInput(), law_inputs.GradSInput()),
        callback_freq=None,
        trainable=True,
        name="NN_U",
        init_theta=lambda glaciers, dtype=jnp.float64: nn.init(dtype),
    )


# ---------------------------------------------------------------------------
# Non-learnable laws (Huginn equivalents)
# ---------------------------------------------------------------------------

def ConstantA(a_value: float) -> Law:
    """Constant creep coefficient (Huginn.ConstantA; usage
    /root/reference/test/inversion_test.jl:87)."""
    return Law(
        slot="A",
        apply_fn=lambda theta, inputs: jnp.asarray(a_value),
        inputs=(),
        callback_freq=0.0,
        trainable=False,
        name="ConstantA",
    )


# Cuffey & Paterson (2010, "The Physics of Glaciers", Table 3.4) creep
# coefficients A(T) in Pa⁻³ s⁻¹, converted to yr⁻¹ below.
_CP_TEMPS = np.array(
    [-50.0, -45.0, -40.0, -35.0, -30.0, -25.0, -20.0, -15.0, -10.0, -5.0, -2.0, 0.0]
)
_CP_A_SI = np.array(
    [2.6e-27, 5.2e-27, 1.0e-26, 2.0e-26, 3.7e-26, 6.8e-26, 1.2e-25, 2.1e-25,
     3.5e-25, 9.3e-25, 1.7e-24, 2.4e-24]
)
_SEC_IN_YEAR = 365.25 * 24 * 3600
_CP_A_YR = _CP_A_SI * _SEC_IN_YEAR


def poly_A_paterson_cuffey():
    """Degree-4 fit of log₁₀A(T) to the Cuffey–Paterson table; returns A(T)
    in Pa⁻³ yr⁻¹ (Huginn.polyA_PatersonCuffey equivalent; usage
    /root/reference/test/inversion_test.jl:77)."""
    coeffs = np.polyfit(_CP_TEMPS, np.log10(_CP_A_YR), deg=4)
    coeffs = jnp.asarray(coeffs)

    def a_of_t(temp):
        temp = jnp.clip(temp, _CP_TEMPS[0], _CP_TEMPS[-1])
        return 10.0 ** jnp.polyval(coeffs, temp)

    return a_of_t


def CuffeyPaterson(scalar: bool = True) -> Law:
    """A(T) from the Cuffey–Paterson polynomial (Huginn.CuffeyPaterson;
    used to generate synthetic ground truth in the end-to-end inversion test,
    /root/reference/test/inversion_test.jl:77)."""
    a_of_t = poly_A_paterson_cuffey()

    def apply_fn(theta, inputs):
        t_in = inputs["T"] if scalar else inputs["T_grid"]
        return a_of_t(t_in)

    inp = (law_inputs.AvgScalarTemp(),) if scalar else (law_inputs.AvgGriddedTemp(),)
    return Law(
        slot="A",
        apply_fn=apply_fn,
        inputs=inp,
        callback_freq=0.0,
        trainable=False,
        name="CuffeyPaterson",
    )


def SyntheticC(params, inputs: Tuple[Any, ...] = None, c_max: Optional[float] = None) -> Law:
    """Synthetic sliding-coefficient law from CPDD and topographic roughness
    (Huginn.SyntheticC; usage /root/reference/docs/src/inversions.md:75-79).

    C = maxC · σ(CPDD/1000) · exp(−roughness/ρ₀): sliding increases with melt
    (CPDD) and decreases with bed roughness; bounded in [0, maxC].
    """
    if inputs is None:
        inputs = (law_inputs.CPDD(), law_inputs.TopoRough())
    c_hi = c_max if c_max is not None else params.physical.max_C

    def apply_fn(theta, inp):
        cpdd = inp.get("CPDD", 0.0)
        rough = inp.get("topo_rough", 0.0)
        melt_factor = jax.nn.sigmoid(cpdd / 1000.0)
        rough_factor = jnp.exp(-rough / 1e-2)
        c = c_hi * melt_factor * rough_factor
        # laws producing gridded C must live on the staggered (nx-1, ny-1) grid
        if hasattr(c, "ndim") and c.ndim >= 2:
            from odinn_tpu.ops.stencils import avg

            c = avg(c)
        return c

    return Law(
        slot="C",
        apply_fn=apply_fn,
        inputs=inputs,
        callback_freq=0.0,
        trainable=False,
        name="SyntheticC",
    )


def eval_law(law: Law, theta, glacier, state=None, t=0.0, glacier_idx=0):
    """One-shot user-facing law evaluation with freshly resolved inputs
    (reference ``eval_law``, /root/reference/src/laws/laws_utils.jl:33-89)."""
    resolved = {"glacier_idx": jnp.asarray(glacier_idx)}
    for spec in law.inputs:
        resolved[spec.name] = spec.get(glacier, state, t)
    return law.apply(theta, resolved)
