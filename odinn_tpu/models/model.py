"""Model container: iceflow law slots + trainable components + target inference.

TPU-native rebuild of:
- ``SIA2Dmodel(params; A=, C=, n=, Y=, U=, n_H=, n_∇S=)`` (Huginn; slot usage
  /root/reference/src/models/trainable_components/Model.jl:81-123)
- ``Model(...)`` slot validation + target inference
  (/root/reference/src/models/trainable_components/Model.jl:3-251)
- ``TrainableComponents`` θ assembly and per-glacier routing
  (``splitθ`` / ``aggregate∇θ``, Model.jl:208-224)

Design: the model is a *static* description (laws are pure closures); every
trainable number lives in one θ dict pytree. Per-glacier parameters (IC,
per-glacier A) are arrays with a leading glacier axis selected by the traced
``glacier_idx`` — so one vmap covers the whole batch and gradient aggregation
is a plain tree-sum (replacing splitθ/aggregate∇θ bookkeeping; the mesh shards
the same axis, psum-reducing shared-θ gradients).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from odinn_tpu.laws.laws import Law
from odinn_tpu.physics.sia2d import SIAValues, default_values
from odinn_tpu.physics import targets as targets_mod
from odinn_tpu.laws import inputs as law_inputs_mod

__all__ = ["SIA2DModel", "Model", "init_theta", "make_values_fn", "resolve_outer_values"]

_SLOTS = ("A", "C", "n", "Y", "U", "n_H", "n_gradS")


@dataclass(frozen=True)
class SIA2DModel:
    """Slot-based SIA model description (Huginn.SIA2Dmodel equivalent)."""

    A: Optional[Law] = None
    C: Optional[Law] = None
    n: Optional[Law] = None
    Y: Optional[Law] = None
    U: Optional[Law] = None
    n_H: Optional[float] = None       # decoupled exponents (hybrid target)
    n_gradS: Optional[float] = None
    # Static exponent overrides: when Glen's n (and sliding p, q) are the same
    # constant for every glacier, setting these Python floats lets XLA
    # strength-reduce the H̄ⁿ⁺²|∇S|ⁿ⁻¹ powers from powf (exp/log) to
    # integer_pow multiplies — ~2x on the RHS hot path.
    n_value: Optional[float] = None
    p_value: Optional[float] = None
    q_value: Optional[float] = None
    # Optional smooth diffusivity cap max_D·tanh(D/max_D) (the reference's
    # cap_D, target_utils.jl; flagged TODO at target_D_hybrid.jl:20-22).
    # Differentiable guard against CFL blow-up while the optimizer explores
    # large creep values.
    max_D: Optional[float] = None

    @property
    def periodic_laws(self):
        """Laws re-evaluated every callback_freq years at save boundaries."""
        return {
            s: l for s, l in self.laws.items()
            if l.callback_freq is not None and l.callback_freq > 0
        }

    @property
    def laws(self):
        return {s: getattr(self, s) for s in ("A", "C", "n", "Y", "U") if getattr(self, s) is not None}

    @property
    def Y_is_provided(self) -> bool:
        return self.Y is not None

    @property
    def U_is_provided(self) -> bool:
        return self.U is not None


@dataclass(frozen=True)
class Model:
    """Iceflow + mass balance + trainable components.

    Target inference mirrors Model.jl:81-123: a U law ⇒ pure-D target, a Y law
    ⇒ hybrid-D target, otherwise the A target.
    """

    iceflow: SIA2DModel
    mass_balance: Any = None                 # TImodel1 | custom MB model | None
    initial_condition: Any = None            # models.initial_condition.InitialCondition
    target: Any = None                       # inferred if None

    def __post_init__(self):
        if self.target is None:
            if self.iceflow.U_is_provided:
                tgt = targets_mod.DPureTarget()
            elif self.iceflow.Y_is_provided:
                tgt = targets_mod.DHybridTarget()
            else:
                tgt = targets_mod.ATarget()
            if self.iceflow.max_D is not None:
                tgt = targets_mod.CappedTarget(tgt, float(self.iceflow.max_D))
            object.__setattr__(self, "target", tgt)
        # slot/input validation (Model.jl:81-123): inner laws may only consume
        # catalogue inputs; U law must not coexist with Y law; a law must sit
        # in the slot it was built for (C=LawA(...) would silently feed creep
        # values into the sliding term otherwise).
        if self.iceflow.U is not None and self.iceflow.Y is not None:
            raise ValueError("U and Y laws are mutually exclusive (pure-D vs hybrid-D target)")
        for slot, law in self.iceflow.laws.items():
            if law.slot != slot:
                raise ValueError(
                    f"law {law.name!r} was built for slot {law.slot!r} but is "
                    f"assigned to SIA2DModel slot {slot!r}"
                )

    @property
    def trainable_laws(self):
        return {s: l for s, l in self.iceflow.laws.items() if l.trainable}


def init_theta(model: Model, glaciers, dtype=jnp.float64) -> dict:
    """Build the flat trainable θ pytree (ComponentVector θ equivalent,
    Model.jl:150-180): one entry per trainable law slot, plus "IC" when the
    initial condition is trainable."""
    theta = {}
    for slot, law in model.trainable_laws.items():
        if law.init_theta is None:
            raise ValueError(f"trainable law {law.name} has no init_theta")
        theta[slot] = law.init_theta(glaciers, dtype)
    if model.initial_condition is not None:
        theta["IC"] = model.initial_condition.init_theta(glaciers, dtype)
    return theta


def resolve_outer_values(
    model: Model, theta, glacier, glacier_idx, t, H=None
) -> SIAValues:
    """Evaluate all non-inner (callback_freq ≥ 0) laws into an SIAValues pytree.

    The reference applies these via `apply_all_callback_laws!` at solve start
    / periodic callbacks (/root/reference/src/simulations/inversions/
    inversion_utils.jl:519-527); here they are plain evaluations whose results
    ride the scan carry.
    """
    vals = default_values(glacier)
    if model.iceflow.n_value is not None:
        nv = float(model.iceflow.n_value)
        pv = float(model.iceflow.p_value) if model.iceflow.p_value is not None else nv
        qv = float(model.iceflow.q_value) if model.iceflow.q_value is not None else 0.0
        vals = vals.replace(n=nv, p=pv, q=qv)
    for slot, law in model.iceflow.laws.items():
        if law.is_inner:
            continue
        inputs = {"glacier_idx": glacier_idx}
        for spec in law.inputs:
            inputs[spec.name] = spec.get(glacier, H if H is not None else glacier.H0, t)
        vals = vals.replace(**{slot: law.apply(theta, inputs)})
    if model.iceflow.n_H is not None:
        vals = vals.replace(n_H=jnp.asarray(model.iceflow.n_H))
    if model.iceflow.n_gradS is not None:
        vals = vals.replace(n_gradS=jnp.asarray(model.iceflow.n_gradS))
    return vals


def make_values_fn(
    model: Model, theta, glacier, glacier_idx, t, outer_vals: SIAValues
) -> Callable:
    """Build the per-RHS-call law resolver.

    Inner laws (callback_freq None — LawY, LawU) are re-evaluated from the
    current (H̄, |∇S|); everything else comes from ``outer_vals``. Mirrors
    `apply_all_non_callback_laws!` (usage
    /root/reference/src/inverse/SIA2D/adjoint.jl:75-76).
    """
    inner = [(s, l) for s, l in model.iceflow.laws.items() if l.is_inner]
    # outer inputs of inner laws (e.g. T for LawY) are time-constant within a
    # solve; resolve them once here.
    static_inputs = {}
    for _, law in inner:
        for spec in law.inputs:
            if spec.name not in law_inputs_mod.INNER_INPUTS:
                static_inputs[spec.name] = spec.get(glacier, glacier.H0, t)

    def values_fn(hbar, grad_s):
        vals = outer_vals
        for slot, law in inner:
            inputs = dict(static_inputs)
            inputs["glacier_idx"] = glacier_idx
            inputs["Hbar"] = hbar
            inputs["gradS"] = grad_s
            vals = vals.replace(**{slot: law.apply(theta, inputs)})
        return vals

    return values_fn
