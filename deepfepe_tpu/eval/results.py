"""Result post-processing: inlier-ratio tables + multi-experiment reports.

Port of `utils/eval_tools.py`'s `Result_processor` (:27-178 — per-run npz →
epipolar-distance inlier ratios and err_q/err_t summary stats) and the table
side of `Exp_table_processor` (:181-243, 452-585 — multi-experiment
aggregation with mean/median rows and best-entry highlighting; LaTeX
emission included). Operates on the same npz schema the CLI eval dumps
({our,base}_name + filename with err_q/err_t/epi_dists arrays).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

DEFAULT_THRESHOLDS = (0.1, 0.5, 1.0, 2.0)
DEFAULT_ANGLE_THRESHOLDS = (0.5, 1.0, 2.0, 5.0, 10.0, 20.0)


class ResultProcessor:
    """Summaries over one experiment's per-pair results."""

    def __init__(self, results: Dict[str, np.ndarray]):
        self.results = results

    @classmethod
    def from_npz(cls, path: str) -> "ResultProcessor":
        with np.load(path, allow_pickle=True) as z:
            return cls({k: z[k] for k in z.files})

    def inlier_ratio(
        self, thresholds: Sequence[float] = DEFAULT_THRESHOLDS
    ) -> Dict[float, float]:
        """Mean fraction of correspondences under each epi-dist threshold
        (ref: Result_processor.inlier_ratio)."""
        d = self.results["epi_dists"]
        return {
            float(t): float(np.mean(d < t)) for t in thresholds
        }

    def pose_error_stats(self) -> Dict[str, float]:
        out = {}
        for k in ("err_q", "err_t"):
            if k in self.results:
                v = np.asarray(self.results[k], np.float64)
                out[f"{k}_mean"] = float(np.mean(v))
                out[f"{k}_median"] = float(np.median(v))
                out[f"{k}_max"] = float(np.max(v))
        return out

    def ratio_curve(
        self,
        key: str = "err_q",
        thresholds: Sequence[float] = DEFAULT_ANGLE_THRESHOLDS,
    ) -> Dict[float, float]:
        """Cumulative accuracy curve: fraction of pairs with error < th
        (ref: write_metrics_summary ratio curves, train_good_utils.py:806)."""
        v = np.asarray(self.results[key], np.float64)
        return {float(t): float(np.mean(v < t)) for t in thresholds}


class ExpTableProcessor:
    """Aggregate several experiments into comparison tables."""

    def __init__(self, experiments: Dict[str, ResultProcessor]):
        self.experiments = experiments

    @classmethod
    def from_dirs(
        cls, paths: Dict[str, str], filename: str = "DeepF_err_ratio.npz"
    ) -> "ExpTableProcessor":
        return cls(
            {
                name: ResultProcessor.from_npz(str(Path(p) / filename))
                for name, p in paths.items()
            }
        )

    @classmethod
    def from_config(cls, config: Dict) -> "ExpTableProcessor":
        """Build from a table config dict (ref configs/table_*.yaml schema:
        `data.base_path` + `data.seq_dict: symbol -> [folder, filename, ...]`
        consumed by Exp_table_processor, eval_tools.py:181-243). Extra list
        entries past (folder, filename) — checkpoint iters etc. — are
        ignored, as the reference does for table assembly. Missing npz files
        are skipped with a warning rather than failing the whole table
        (the reference's check_output behavior, run_eval_good.py:296-356)."""
        data = config.get("data", config)
        base = Path(data.get("base_path", "."))
        exps: Dict[str, ResultProcessor] = {}
        for sym, entry in (data.get("seq_dict") or {}).items():
            folder, filename = entry[0], entry[1]
            path = base / folder / filename
            if not path.exists():
                print(f"[ExpTableProcessor] missing: {path} (skipped)")
                continue
            exps[sym] = ResultProcessor.from_npz(str(path))
        return cls(exps)

    def table(
        self, metrics: Sequence[str] = ("err_q_median", "err_t_median")
    ) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                m: rp.pose_error_stats().get(m, float("nan"))
                for m in metrics
            }
            for name, rp in self.experiments.items()
        }

    def highlights(
        self, metric: str = "err_q_median", lower_better: bool = True
    ) -> str:
        t = self.table((metric,))
        vals = {k: v[metric] for k, v in t.items()}
        pick = min if lower_better else max
        return pick(vals, key=vals.get)

    def to_latex(
        self, metrics: Sequence[str] = ("err_q_median", "err_t_median")
    ) -> str:
        """LaTeX table emission (ref: Exp_table_processor.print_tables :472)."""
        t = self.table(metrics)
        header = " & ".join(["exp"] + list(metrics)) + r" \\"
        lines = [r"\begin{tabular}{l" + "c" * len(metrics) + "}", header,
                 r"\hline"]
        best = {m: self.highlights(m) for m in metrics}
        for name, row in t.items():
            cells = []
            for m in metrics:
                v = f"{row[m]:.3f}"
                if best[m] == name:
                    v = r"\textbf{" + v + "}"
                cells.append(v)
            lines.append(" & ".join([name] + cells) + r" \\")
        lines.append(r"\end{tabular}")
        return "\n".join(lines)
