"""NN training utilities: supervised pretraining.

TPU-native rebuild of /root/reference/src/models/trainable_components/
NN_utils.jl:37-139: ``pretraining`` fits the regressor to (X, Y) pairs with an
MSLE loss and Adam before the UDE training starts (warm-starting the law far
from the sigmoid's flat regions); fourier features live in odinn_tpu.models.nn.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from odinn_tpu.models.nn import MLP, mlp_apply

__all__ = ["msle_loss", "pretraining", "dense_lm_fit", "pretrain_law_from_A"]


def msle_loss(pred, target):
    """Mean squared log error (NN_utils.jl pretraining loss)."""
    return jnp.mean((jnp.log1p(jnp.maximum(pred, 0.0)) - jnp.log1p(jnp.maximum(target, 0.0))) ** 2)


def pretraining(
    arch: MLP,
    params,
    X: jnp.ndarray,
    Y: jnp.ndarray,
    postprocess: Optional[Callable] = None,
    epochs: int = 1000,
    lr: float = 1e-2,
    loss_fn: Callable = msle_loss,
) -> Tuple[list, list]:
    """Supervised pre-fit of an MLP; returns (trained_params, loss_history).

    ``postprocess`` maps raw network output to physical units (e.g. the
    [minA, maxA] scaling of LawA) so the fit happens in the law's output
    space, matching the reference's pretraining of the scaled law.
    """
    X = jnp.atleast_2d(X)
    Y = jnp.asarray(Y)

    def objective(p):
        out = mlp_apply(arch, p, X)[..., 0]
        if postprocess is not None:
            out = postprocess(out)
        return loss_fn(out, Y)

    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        val, g = jax.value_and_grad(objective)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, val

    history = []
    for _ in range(epochs):
        params, state, val = step(params, state)
        history.append(float(val))
    return params, history


def dense_lm_fit(
    arch: MLP,
    params,
    X: jnp.ndarray,
    Y: jnp.ndarray,
    postprocess: Optional[Callable] = None,
    iters: int = 400,
    lam0: float = 1e-2,
    sample_weights=None,
) -> Tuple[list, float]:
    """Exact Levenberg–Marquardt fit of a small MLP to (X, Y) pairs.

    Supervised pretraining problems are tiny (O(100) samples × O(1e3)
    weights), so the Jacobian is formed densely with ``jax.jacfwd`` and the
    damped normal equations solved directly — first-order methods and even
    matrix-free LM stall 2–3 orders above the achievable fit on these
    ill-conditioned NN least-squares (measured: Adam+LBFGS floor ~1e-4 max
    rel on the A(T) curve vs ~2e-5 here). Use f64 parameters; cast to f32
    afterwards (the fit survives the cast to ~1 ulp of the f32 head).

    Returns (trained_params, final_sum_of_squares).
    """
    import jax.flatten_util

    X = jnp.atleast_2d(X)
    Y = jnp.asarray(Y)
    sw = None if sample_weights is None else jnp.sqrt(jnp.asarray(sample_weights, Y.dtype))
    flat, unravel = jax.flatten_util.ravel_pytree(params)

    def resid_flat(f):
        out = mlp_apply(arch, unravel(f), X)[..., 0]
        if postprocess is not None:
            out = postprocess(out)
        r = out - Y
        if sw is not None:
            r = sw * r
        return r.ravel()

    Jfn = jax.jit(jax.jacfwd(resid_flat))
    rfn = jax.jit(resid_flat)
    lam = float(lam0)
    loss = float(jnp.sum(rfn(flat) ** 2))
    for _ in range(iters):
        J = Jfn(flat)
        r = rfn(flat)
        JtJ = J.T @ J
        g = J.T @ r
        d = jnp.maximum(jnp.diag(JtJ), 1e-12)
        step = jnp.linalg.solve(JtJ + lam * jnp.diag(d), -g)
        cand = flat + step
        ln = float(jnp.sum(rfn(cand) ** 2))
        if ln < loss:
            flat, loss, lam = cand, ln, max(lam / 3.0, 1e-14)
        else:
            lam = min(lam * 10.0, 1e12)
    return unravel(flat), loss


def pretrain_law_from_A(
    nn,
    params,
    temps,
    A_values,
    head: str = "log",
    prescale_bounds=None,
    iters: int = 400,
    restarts: int = 5,
    sample_weights=None,
    init_theta=None,
    n_fourier=None,
    fourier_scale: float = 1.0,
) -> list:
    """Pretrain a LawA-style network on recovered (T, A) pairs.

    The reference pretrains its A(T) network on target A values before UDE
    training (/root/reference/src/models/trainable_components/NN_utils.jl:37-139);
    the canonical source of pairs is a classical per-glacier inversion
    (LawA_inversion) over the same glaciers. The fit runs in the law's HEAD
    space — log A for ``head="log"``, the linear [minA, maxA] map otherwise —
    with :func:`dense_lm_fit`, in f64 regardless of the training dtype (cast
    the returned θ afterwards).

    ``prescale_bounds`` must match the LawA(prescale_bounds=...) the θ will
    drive. Returns the θ["A"] parameter list.

    ``restarts``: dense LM is exact but LOCAL — measured across seeds on the
    A(T) curve, the fit lands anywhere from 2e-5 to 8e-1 max rel err
    depending on the init basin. The fit runs from ``restarts`` seeds
    (nn.seed, then nn.seed+1, ...) and keeps the lowest sum-of-squares.

    ``sample_weights``: optional per-sample weights for curvature-matched
    pretraining — weight glacier g by c_g = L_g/ε_g² (its measured PDE-loss
    curvature w.r.t. relative A error) and the weighted fit minimizes the
    *predicted PDE loss*, not the flat curve error; glaciers whose dynamics
    are most A-sensitive get fit tightest. ``init_theta`` warm-starts the
    fit (e.g. from an unweighted pass) and is tried alongside the restarts.
    """
    import jax.flatten_util

    from odinn_tpu.models.nn import (fourier_feature, init_mlp,
                                     prescale as _prescale, scale as _scale)

    arch = nn.architecture
    min_a, max_a = params.physical.min_A, params.physical.max_A
    T = jnp.asarray(temps, jnp.float64)[:, None]
    A = jnp.asarray(A_values, jnp.float64)
    if prescale_bounds is not None:
        T = _prescale(T, prescale_bounds)
    if n_fourier:
        # must mirror LawA(n_fourier=...) exactly — same embedding, same order
        T = fourier_feature(T, n_freq=n_fourier, scale_ff=fourier_scale)
    if head == "log":
        lims = (jnp.log(min_a), jnp.log(max_a))
        Y = jnp.log(A)
    else:
        lims = (min_a, max_a)
        Y = A
    starts = [init_mlp(arch, jax.random.PRNGKey(nn.seed + k), jnp.float64)
              for k in range(max(restarts, 1))]
    if init_theta is not None:
        starts.insert(0, jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), init_theta))
    best, best_ssr = None, jnp.inf
    for p0 in starts:
        fitted, ssr = dense_lm_fit(
            arch, p0, T, Y, postprocess=lambda o: _scale(o, lims), iters=iters,
            sample_weights=sample_weights,
        )
        if ssr < best_ssr:
            best, best_ssr = fitted, ssr
    return best
