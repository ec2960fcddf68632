"""Quantile-tied clamp scheduling for the pose (q, t) loss.

The reference tightens its q/t loss clamps on a fixed ITERATION schedule
(Train_model_pipeline.py:467-489: (0.1, 0.5) -> (0.01, 0.3) -> (0.001,
0.1) at clamp_iter1=3k / clamp_iter2=6k of 30k+ total) — which works
only because by iteration 3k/6k the error distribution has already moved
inside the next clamp level. On short runs the same schedule saturates:
round 4 measured the loss pinning at exactly q_clamp + t_clamp with zero
gradients once nearly every item clips, and the few unsaturated items
then drive high-variance updates that regress the solver
(experiments/joint_fullres_train_qt/README.md §bugs #1).

`QuantileClampScheduler` makes the implicit coupling explicit: clamps
tighten exactly when the MEASURED per-item error quantile is inside
them, with bounded shrink per check so the loss surface never changes
abruptly. The train step exposes the per-item unclamped final-layer
errors as `q_l2_final` / `t_l2_final` (train/engine.compute_losses), so
scheduling costs one tiny host transfer per step that training loops
already pay for metric logging.

Rule, per clamp c and error window E (checked every `check_every`
updates over a sliding window of the last `window` per-item errors):

    target = headroom * quantile(E, q)        # clamp sits above the bulk
    c'     = clip(target, max_shrink * c, c)  # monotone, bounded shrink
    c'     = max(c', floor)                   # reference's tightest level

so at most `1 - max_shrink` of the clamp is removed per check, the clamp
never loosens, and at steady state ~q of the items keep gradient signal.
"""

from __future__ import annotations

from collections import deque
from typing import Tuple

import numpy as np


class QuantileClampScheduler:
    """Error-quantile-driven (q_clamp, t_clamp) schedule.

    Defaults anchor to the reference curriculum's endpoints: start at
    its loosest level (0.1, 0.5), floor at its tightest (0.001, 0.1)
    (configs/kitti_corr_baseline.yaml clamp_q_params/clamp_t_params).
    """

    def __init__(
        self,
        q0: float = 0.1,
        t0: float = 0.5,
        q_floor: float = 0.001,
        t_floor: float = 0.1,
        quantile: float = 0.7,
        headroom: float = 1.5,
        check_every: int = 50,
        window: int = 400,
        max_shrink: float = 0.5,
    ):
        self.q_clamp = float(q0)
        self.t_clamp = float(t0)
        self.q_floor = float(q_floor)
        self.t_floor = float(t_floor)
        self.quantile = float(quantile)
        self.headroom = float(headroom)
        self.check_every = int(check_every)
        self.max_shrink = float(max_shrink)
        self._q_errs: deque = deque(maxlen=int(window))
        self._t_errs: deque = deque(maxlen=int(window))
        self._n_updates = 0
        self.n_tightenings = 0

    def _tighten(self, clamp: float, floor: float, errs: deque) -> float:
        e = np.asarray(errs, np.float64)
        e = e[np.isfinite(e)]
        if e.size == 0:
            return clamp
        target = self.headroom * float(np.quantile(e, self.quantile))
        new = min(clamp, max(target, self.max_shrink * clamp, floor))
        return new

    def update(self, q_errs, t_errs) -> Tuple[float, float]:
        """Feed one step's per-item unclamped errors; returns the clamps
        to use for the NEXT step."""
        self._q_errs.extend(np.ravel(np.asarray(q_errs, np.float64)))
        self._t_errs.extend(np.ravel(np.asarray(t_errs, np.float64)))
        self._n_updates += 1
        if self._n_updates % self.check_every == 0 and len(self._q_errs):
            new_q = self._tighten(self.q_clamp, self.q_floor, self._q_errs)
            new_t = self._tighten(self.t_clamp, self.t_floor, self._t_errs)
            if new_q < self.q_clamp or new_t < self.t_clamp:
                self.n_tightenings += 1
            self.q_clamp, self.t_clamp = new_q, new_t
        return self.q_clamp, self.t_clamp

    @property
    def clamps(self) -> Tuple[float, float]:
        return self.q_clamp, self.t_clamp
