"""Tutorial execution lane: every docs/*.py tutorial runs end to end.

The reference executes its tutorials as part of the docs build (Literate.jl
programs, /root/reference/docs/src/forward_simulation.jl and siblings) — so
its documentation cannot silently rot as the API moves. This lane is the
TPU-native equivalent: each tutorial runs as a subprocess in smoke mode
(``ODINN_TUTORIAL_SMOKE=1`` shrinks epochs/grids/tspans; the flow itself is
unchanged) with an isolated cwd, and the test fails on any exception.

Slow-marked (nightly lane): the tutorials compile real training steps.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

DOCS = Path(__file__).resolve().parent.parent / "docs"
TUTORIALS = sorted(p.name for p in DOCS.glob("*.py"))


def test_tutorial_inventory():
    """All shipped tutorials are in the lane — a new docs/*.py is picked up
    automatically; an accidentally deleted one fails here."""
    assert len(TUTORIALS) >= 8, TUTORIALS
    for name in ("quick_start.py", "forward_simulation.py",
                 "classical_inversion.py", "functional_inversion.py",
                 "laws_and_inputs.py", "real_data.py", "scaling.py",
                 "tolerance_and_adaptivity.py"):
        assert name in TUTORIALS


@pytest.mark.slow
@pytest.mark.parametrize("name", TUTORIALS)
def test_tutorial_runs(name, tmp_path):
    env = dict(os.environ)
    env.update({
        "ODINN_TUTORIAL_SMOKE": "1",
        "JAX_PLATFORMS": "cpu",
        # scaling.py exercises the mesh path; harmless for the others
        "XLA_FLAGS": (env.get("XLA_FLAGS", "") +
                      " --xla_force_host_platform_device_count=8").strip(),
        "MPLBACKEND": "Agg",
    })
    # this box pre-imports jax pinned to a tunneled TPU via sitecustomize, so
    # JAX_PLATFORMS=cpu in the env is ignored — force CPU post-import (the
    # same both-ways forcing tests/conftest.py does) before running the
    # tutorial under its own __main__
    runner = (
        "import jax, runpy, sys; "
        "jax.config.update('jax_platforms', 'cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "runpy.run_path(sys.argv[1], run_name='__main__')"
    )
    # isolated cwd: tutorials write plots/ and .log/ relative to cwd
    proc = subprocess.run(
        [sys.executable, "-c", runner, str(DOCS / name)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (
        f"tutorial {name} failed\n--- stdout ---\n{proc.stdout[-4000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}"
    )
