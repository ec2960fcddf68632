"""Qualitative single-sample evaluation pipeline (frontend + solver).

Port of the reference's notebook-driven `Val_pipeline_frontend`
(utils/eval_tools.py:587-2100): load a trained DeepF solver (and optionally
a SuperPoint frontend), run one sample end-to-end — images → matches →
F̂/Ê → recovered pose — compare against gt and the RANSAC baseline
(`get_val_rt` :1770, `run_net` :1831, `eval_one_sample` :691), and produce
the qualitative plots (correspondences, est-vs-gt epipolar lines, solver
weight heatmaps — :1899-2100).

TPU-native differences: the nets run as single jitted calls on padded
static shapes; pose validation is the batched on-device `val_rt_batch`
instead of per-sample OpenCV; plotting stays host-side matplotlib.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..geometry.epipolar import F_to_E
from .val_rt import inlier_ratios, val_rt_batch


def load_params_msgpack(path: str, template):
    """Restore flax params from a .msgpack that may hold either bare params
    or a whole TrainState/JointTrainState-style dict with a 'params' entry
    (both checkpoint layouts exist: train/loop.save_checkpoint vs the
    experiment drivers' params-only dumps)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    for key in ("params", "deepf_params"):
        if isinstance(raw, dict) and key in raw:
            probe = raw[key]
            try:
                return serialization.from_state_dict(template, probe)
            except Exception:
                pass
    return serialization.from_state_dict(template, raw)


class ValPipelineFrontend:
    """Single-sample qualitative eval driver (ref eval_tools.py:587).

    Parameters
    ----------
    deepf_net : models.DeepFNet
        Constructed solver (flags must match the checkpoint).
    deepf_params_path : str
        msgpack checkpoint (TrainState or bare params).
    sp_net / sp_params_path : optional SuperPoint frontend; when absent,
        samples must carry precomputed `matches_xy_ori` (+ `quality`) the
        way the SIFT-dump path does (ref loads either net or dumps too,
        eval_tools.py:619-689).
    fp : frontend.FrontendParams, SP post-processing knobs.
    """

    def __init__(
        self,
        deepf_net,
        deepf_params_path: str,
        example_batch: Dict,
        sp_net=None,
        sp_params_path: Optional[str] = None,
        fp=None,
    ):
        self.net = deepf_net
        self.sp_net = sp_net
        self.fp = fp
        self.sp_params = None

        batch = {k: jnp.asarray(v) for k, v in example_batch.items()
                 if not isinstance(v, (str, list))}
        if sp_net is not None:
            from ..frontend import FrontendParams, get_matches_from_sp

            self.fp = fp or FrontendParams()
            imgs = batch["imgs_grey"]
            sp_template = sp_net.init(
                jax.random.PRNGKey(0), imgs[:, 0][..., None]
            )
            assert sp_params_path, "sp_net given without sp_params_path"
            self.sp_params = load_params_msgpack(sp_params_path, sp_template)
            self._match_fn = jax.jit(
                lambda p, i1, i2: get_matches_from_sp(
                    self.sp_net, p, (i1, i2), self.fp
                )
            )
            sp_out = self._match_fn(self.sp_params, imgs[:, 0], imgs[:, 1])
            batch = self._with_matches(batch, sp_out)

        template = deepf_net.init(jax.random.PRNGKey(1), batch)
        self.deepf_params = load_params_msgpack(deepf_params_path, template)
        self._forward = jax.jit(lambda p, b: deepf_net.apply(p, b))

    @staticmethod
    def _with_matches(batch: Dict, sp_out: Dict) -> Dict:
        db = dict(batch)
        db["matches_xy_ori"] = sp_out["matches_xy_ori"]
        db["quality"] = sp_out["quality"]
        db["matches_good_unique_nums"] = jnp.sum(
            sp_out["valid"].astype(jnp.int32), axis=-1
        )
        return db

    def run_net(self, data_batch: Dict) -> Dict:
        """Solver forward on a prepared batch; adds pixel-frame F̂/Ê
        (ref run_net :1831 — denormalize via T2ᵀ F T1, E = KᵀFK)."""
        outs = dict(self._forward(self.deepf_params, data_batch))
        F_pix = (
            jnp.swapaxes(outs["T2"], -1, -2) @ outs["F_est"] @ outs["T1"]
        )
        outs["F_est_pix"] = F_pix
        outs["E_est"] = F_to_E(F_pix, data_batch["Ks"])
        return outs

    def eval_one_sample(
        self, sample: Dict, ransac_key: Optional[jax.Array] = None
    ) -> Dict:
        """Run frontend (if any) + solver + pose validation on one batch.

        Returns the solver preds plus `val` (err_q/err_t/epi_dists for
        est/gt/baseline from val_rt_batch) and `ratios` (epi-dist inlier
        fractions), everything as numpy (ref eval_one_sample :691)."""
        batch = {k: jnp.asarray(v) for k, v in sample.items()
                 if not isinstance(v, (str, list))}
        if self.sp_net is not None:
            imgs = batch["imgs_grey"]
            sp_out = self._match_fn(self.sp_params, imgs[:, 0], imgs[:, 1])
            batch = self._with_matches(batch, sp_out)
        outs = self.run_net(batch)
        if ransac_key is None:
            ransac_key = jax.random.PRNGKey(0)
        val = val_rt_batch(
            outs["E_est"],
            batch["Ks"],
            batch["matches_xy_ori"],
            batch["E_gts"],
            batch["delta_Rtijs_4_4"],
            ransac_key=ransac_key,
        )
        result = {
            "batch": {k: np.asarray(v) for k, v in batch.items()},
            "preds": {k: np.asarray(v) for k, v in outs.items()},
            "val": {k: np.asarray(v) for k, v in val.items()},
            "ratios": {
                name: {
                    k: np.asarray(v)
                    for k, v in inlier_ratios(val[f"epi_dists_{name}"]).items()
                }
                for name in ("est", "gt", "base")
            },
        }
        return result

    def plot_one_sample(
        self, result: Dict, item: int = 0, save_dir: Optional[str] = None
    ):
        """Correspondence plot, est-vs-gt epipolar lines, weight heatmap
        (ref plotting cells eval_tools.py:1899-2100). Returns the figures;
        saves PNGs when save_dir is given."""
        from ..utils.vis import draw_corr, show_epipolar, weight_heatmap

        b, p = result["batch"], result["preds"]
        imgs = b.get("imgs_grey")
        if imgs is None:
            H, W = self.net.image_size
            img1 = img2 = np.zeros((int(H), int(W)), np.float32)
        else:
            img1, img2 = imgs[item, 0], imgs[item, 1]
        x1 = b["matches_xy_ori"][item, :, :2]
        x2 = b["matches_xy_ori"][item, :, 2:4]
        epi_est = result["val"]["epi_dists_est"][item]
        figs = {}
        ax = draw_corr(
            img1, img2, x1, x2, mask=epi_est < 1.0,
            title="matches (green: epi<1px under F̂)",
        )
        figs["corr"] = ax.figure
        axes = show_epipolar(
            img1, img2, x1, x2,
            F=p["F_est_pix"][item],
            F_gt=np.asarray(b["F_gts"][item]) if "F_gts" in b else None,
        )
        figs["epipolar"] = axes[0].figure
        ax = weight_heatmap(img1, x1, p["weights"][item])
        ax.set_title("final solver weights")
        figs["weights"] = ax.figure
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            for name, fig in figs.items():
                fig.savefig(
                    os.path.join(save_dir, f"{name}_{item}.png"),
                    bbox_inches="tight", dpi=130,
                )
        return figs
