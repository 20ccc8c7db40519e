"""FD-parity harness utilities.

Mirrors the reference's gradient-test machinery
(/root/reference/test/test_utils.jl:42-83): central finite differences of the
full training loss over flattened θ, compared with three metrics —
norm ratio, angle (1 − cosine), relative error — against per-configuration
thresholds (/root/reference/test/runtests.jl:116-235).
"""

import jax
import jax.numpy as jnp
import numpy as np


def flatten_theta(theta):
    leaves, treedef = jax.tree.flatten(theta)
    sizes = [l.size for l in leaves]
    flat = jnp.concatenate([l.ravel() for l in leaves])
    return flat, (treedef, [l.shape for l in leaves], sizes)


def unflatten_theta(flat, spec):
    treedef, shapes, sizes = spec
    out, off = [], 0
    for shape, size in zip(shapes, sizes):
        out.append(flat[off : off + size].reshape(shape))
        off += size
    return jax.tree.unflatten(treedef, out)


def fd_gradient(loss_fn, theta, eps=1e-6, indices=None):
    """Central-difference gradient of loss_fn over flattened θ
    (FiniteDifferences.central_fdm(3,1) equivalent at 2nd order)."""
    flat, spec = flatten_theta(theta)
    n = flat.shape[0]
    idxs = range(n) if indices is None else indices
    g = np.zeros(n)
    for i in idxs:
        e = jnp.zeros_like(flat).at[i].set(eps)
        lp = float(loss_fn(unflatten_theta(flat + e, spec)))
        lm = float(loss_fn(unflatten_theta(flat - e, spec)))
        g[i] = (lp - lm) / (2 * eps)
    return g


def grad_metrics(g, g_ref):
    """(ratio, angle, relerr) — test_utils.jl:78-83 equivalents."""
    g = np.asarray(g).ravel()
    g_ref = np.asarray(g_ref).ravel()
    nrm, nrm_ref = np.linalg.norm(g), np.linalg.norm(g_ref)
    ratio = abs(nrm / nrm_ref - 1.0)
    angle = 1.0 - float(np.dot(g, g_ref) / (nrm * nrm_ref))
    relerr = np.linalg.norm(g - g_ref) / nrm_ref
    return ratio, angle, relerr
