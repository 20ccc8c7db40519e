"""Subprocess helper: dense-LM pretrain of an A(T) law network in f64.

Runs on CPU with x64 enabled — the parent benchmark process keeps x64 OFF so
its f32 TPU numbers stay bit-comparable across rounds, while the tiny
supervised fit (models.nn_utils.pretrain_law_from_A) needs f64 to reach the
architecture floor. I/O via npz: argv[1] = input (temps, A, config), argv[2]
= output (fitted θ["A"] leaves as w0,b0,w1,b1,...).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from odinn_tpu.core.params import Parameters, PhysicalParameters  # noqa: E402
from odinn_tpu.models.nn import MLP, NeuralNetwork  # noqa: E402
from odinn_tpu.models.nn_utils import pretrain_law_from_A  # noqa: E402


def main():
    inp = np.load(sys.argv[1], allow_pickle=True)
    widths = tuple(int(w) for w in inp["widths"])
    acts = tuple(str(a) for a in inp["acts"])
    nn = NeuralNetwork(MLP(widths, acts), seed=int(inp["seed"]))
    params = Parameters(physical=PhysicalParameters(
        min_A=float(inp["min_A"]), max_A=float(inp["max_A"])))
    pb = inp["prescale_bounds"]
    sw = inp["sample_weights"] if "sample_weights" in inp.files else None
    init = None
    if "init_w0" in inp.files:
        init = [{"w": inp[f"init_w{i}"], "b": inp[f"init_b{i}"]}
                for i in range(len(widths) - 1)]
    nf = int(inp["n_fourier"]) if "n_fourier" in inp.files else 0
    theta_A = pretrain_law_from_A(
        nn, params, inp["temps"], inp["A"], head=str(inp["head"]),
        prescale_bounds=tuple(map(tuple, pb)) if pb.size else None,
        iters=int(inp["iters"]), sample_weights=sw, init_theta=init,
        n_fourier=nf or None,
        restarts=int(inp["restarts"]) if "restarts" in inp.files else 5,
    )
    out = {}
    for i, layer in enumerate(theta_A):
        out[f"w{i}"] = np.asarray(layer["w"], np.float64)
        out[f"b{i}"] = np.asarray(layer["b"], np.float64)
    np.savez(sys.argv[2], **out)


if __name__ == "__main__":
    main()
