"""Training observability: console progress, TensorBoard scalars, JSONL log.

TPU-native rebuild of the reference's diagnostics
(/root/reference/src/simulations/inversions/callback_utils.jl:84-137 and
TensorBoardLogger wiring at inversion_utils.jl:26-36): per-iteration loss with
improvement %, gradient norm, time per iteration — mirrored scalar names
``train/loss``, ``train/norm_grad``, ``train/time_per_iter``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

__all__ = ["TrainingLogger", "print_progress_loss", "combine_callbacks"]


def combine_callbacks(*callbacks):
    """Run several training callbacks in sequence
    (CallbackOptimizationSet equivalent, callback_utils.jl:139-150)."""
    cbs = [c for c in callbacks if c is not None]

    def combined(stats):
        for c in cbs:
            c(stats)

    return combined


def print_progress_loss(it: int, total: int, loss: float, prev: Optional[float]) -> None:
    """Console progress line (printProgressLoss, callback_utils.jl:119-137)."""
    if prev is not None and prev != 0:
        impr = 100.0 * (prev - loss) / abs(prev)
        print(f"[odinn_tpu] iter {it}/{total}  loss {loss:.6e}  ({impr:+.2f}%)")
    else:
        print(f"[odinn_tpu] iter {it}/{total}  loss {loss:.6e}")


class TrainingLogger:
    """Scalar logger: TensorBoard (if available) + JSONL sidecar.

    Usage: pass ``TrainingLogger(logdir).callback`` as the training callback;
    it consumes the mutable ``TrainingStats``.
    """

    def __init__(self, logdir: Optional[str] = None, use_tensorboard: bool = True,
                 print_every: int = 1, total_iters: Optional[int] = None,
                 save_every: Optional[int] = None, save_path: Optional[str] = None,
                 plot_law_every: Optional[int] = None, plot_law_cfg: Optional[dict] = None):
        self.logdir = logdir or os.path.join(".log", time.strftime("%Y%m%d-%H%M%S"))
        self.print_every = print_every
        self.total_iters = total_iters
        self.save_every = save_every
        self.save_path = save_path
        # per-epoch learned-law plots (callback_plots_A equivalent,
        # /root/reference/src/simulations/inversions/callback_utils.jl:6-52);
        # plot_law_cfg = dict(law=, glacier=, input_ranges=, truth_fn=)
        self.plot_law_every = plot_law_every
        self.plot_law_cfg = plot_law_cfg or {}
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                os.makedirs(self.logdir, exist_ok=True)
                self._tb = SummaryWriter(self.logdir)
            except Exception:
                self._tb = None
        os.makedirs(self.logdir, exist_ok=True)
        self._jsonl = open(os.path.join(self.logdir, "train_log.jsonl"), "a")

    def callback(self, stats) -> None:
        it = stats.niter
        loss = stats.losses[-1]
        prev = stats.losses[-2] if len(stats.losses) > 1 else None
        gnorm = stats.grad_norm_hist[-1] if stats.grad_norm_hist else float("nan")
        dt = stats.time_per_iter[-1] if stats.time_per_iter else float("nan")
        if it % self.print_every == 0:
            print_progress_loss(it, self.total_iters or -1, loss, prev)
        rec = {"iter": it, "loss": loss, "norm_grad": gnorm, "time_per_iter": dt}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar("train/loss", loss, it)
            self._tb.add_scalar("train/norm_grad", gnorm, it)
            self._tb.add_scalar("train/time_per_iter", dt, it)
        if self.plot_law_every and it % self.plot_law_every == 0 and self.plot_law_cfg:
            from odinn_tpu.utils.plotting import plot_law, save_plot

            cfg = self.plot_law_cfg
            fig = plot_law(cfg["law"], stats.theta, cfg["glacier"],
                           cfg["input_ranges"], truth_fn=cfg.get("truth_fn"))
            save_plot(fig, os.path.join(self.logdir, f"law_epoch_{it:05d}.png"))
        if self.save_every and self.save_path and it % self.save_every == 0:
            from odinn_tpu.utils.io import TrainingResult, save_inversion_file

            save_inversion_file(
                self.save_path,
                TrainingResult(
                    theta=stats.theta,
                    losses=stats.losses,
                    grad_norm_hist=stats.grad_norm_hist,
                ),
            )

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
