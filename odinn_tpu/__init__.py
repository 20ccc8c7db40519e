"""odinn_tpu — a TPU-native glacier Universal-Differential-Equation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
ODINN-SciML/ODINN.jl ecosystem (ODINN + Huginn + Muninn + Sleipnir): a 2-D
Shallow Ice Approximation PDE solver coupled with machine-learned
parameterizations ("laws") of the PDE components, trained by gradient-based
optimization through the solve.

TPU-first design:
  * glaciers are padded, stacked pytrees `vmap`-ed over a batch axis and
    sharded over a `jax.sharding.Mesh` (replacing Distributed.jl `pmap`);
  * the solve is a fixed-shape, checkpointed `lax.scan` (differentiable) with
    an adaptive `while_loop` forward path;
  * adjoints: reverse-mode AD through the solve, plus hand-written
    discrete/continuous adjoints built on stencil-transpose kernels;
  * hot stencil path available as a fused Pallas TPU kernel.
"""

from odinn_tpu.core.params import (
    Hyperparameters,
    InversionParameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.core.glacier import (
    Climate2D,
    DhdtData,
    DummyClimate2D,
    Glacier,
    SurfaceVelocityData,
    ThicknessData,
    is_in_glacier,
    stack_glaciers,
)

__version__ = "0.1.0"
