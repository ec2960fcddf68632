"""Deeper localization: which sampled subset's fit produces the NaN grad.

Stage A: grad of loss_selected_F wrt F_samples (pure loss side).
Stage B: vjp through sample_loss_fits alone, at the model's actual
         (pts, weights) for each layer, to find the offending [b, s].
Stage C: reproduce that single subset's weighted_eight_point grad.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from flax import serialization

SNAP = sys.argv[1] if len(sys.argv) > 1 else "/tmp/slnan"

meta = json.load(open(os.path.join(SNAP, "meta.json")))
raw = dict(np.load(os.path.join(SNAP, "batch.npz")))
batch = {k: jnp.asarray(v) for k, v in raw.items()}

from deepfepe_tpu.geometry.epipolar import compute_epi_residual
from deepfepe_tpu.loader import model_loader
from deepfepe_tpu.models.sample_fit import sample_loss_fits
from deepfepe_tpu.train import Config

cfg = Config()
cfg.data.good_num = 1000
cfg.data.batch_size = int(batch["Ks"].shape[0])
cfg.model.depth = 5
cfg.model.if_quality = True
cfg.model.if_sample_loss = True
net = model_loader(cfg)

params = net.init(jax.random.PRNGKey(0), batch)
with open(os.path.join(SNAP, "params.msgpack"), "rb") as f:
    params = serialization.from_bytes(params, f.read())
rng = jax.random.fold_in(jax.random.PRNGKey(17), meta["n_iter"])

outs = net.apply(params, batch, rngs={"sample": rng})
T1, T2 = outs["T1"], outs["T2"]
pts1_eval = batch["pts1_virt"] @ jnp.swapaxes(T1, -1, -2)
pts2_eval = batch["pts2_virt"] @ jnp.swapaxes(T2, -1, -2)

# --- Stage A: loss side only -------------------------------------------
F_samples = outs["out_sample_selected_layers"]  # [L, B, S, 3, 3]


def sel_loss(F_samples):
    sl = compute_epi_residual(
        pts1_eval[None, :, None], pts2_eval[None, :, None], F_samples,
        clamp_at=0.02,
    )
    return jnp.mean(sl)


gA = jax.grad(sel_loss)(F_samples)
finA = np.isfinite(np.asarray(gA))
print("stage A grad wrt F_samples finite:", finA.all(),
      "| nonfinite frac:", 1 - finA.mean())
if not finA.all():
    bad = np.argwhere(~finA.all(axis=(-1, -2)))
    print("  bad [l,b,s]:", bad[:10])

# --- Stage B: model side — reproduce the per-layer sample fits ---------
# The model calls sample_loss_fits once per layer with the SAME rng
# consumed via make_rng; replicate by re-running the fit on the captured
# weights_layers and pts (detached), and scan for NaN grads wrt weights.
pts1, pts2 = outs["pts1"], outs["pts2"]
W = outs["weights_layers"]  # [L, B, N]
unique = batch.get("matches_good_unique_nums",
                   jnp.full((pts1.shape[0],), pts1.shape[1]))

from deepfepe_tpu.ops.fmatrix import weighted_eight_point

L = W.shape[0]
for l in range(L):
    w = W[l]

    def layer_loss(w):
        sf = sample_loss_fits(pts1, pts2, w, unique,
                              jax.random.fold_in(rng, l))
        sl = compute_epi_residual(
            pts1_eval[:, None], pts2_eval[:, None], sf["F_samples"],
            clamp_at=0.02,
        )
        return jnp.mean(sl), sf

    (v, sf), g = jax.value_and_grad(layer_loss, has_aux=True)(w)
    gnp = np.asarray(g)
    print(f"layer {l}: loss={float(v):.5f} grad_finite={np.isfinite(gnp).all()}"
          f" grad_absmax={np.nanmax(np.abs(gnp)):.3g}")
    if not np.isfinite(gnp).all():
        # find offending subset via per-sample grad
        def per_subset(w, b, s):
            sf = sample_loss_fits(pts1, pts2, w, unique,
                                  jax.random.fold_in(rng, l))
            sl = compute_epi_residual(
                pts1_eval[:, None], pts2_eval[:, None], sf["F_samples"],
                clamp_at=0.02,
            )
            return jnp.mean(sl[b, s])

        found = None
        for b in range(pts1.shape[0]):
            gb = jax.grad(lambda w: per_subset(w, b, slice(None)))(w)
            if not np.isfinite(np.asarray(gb)).all():
                for s in range(0, 100):
                    gs = jax.grad(lambda w: per_subset(w, b, s))(w)
                    if not np.isfinite(np.asarray(gs)).all():
                        found = (b, s)
                        break
                break
        print("  offending (b, s):", found)
        if found:
            b, s = found
            sf0 = sample_loss_fits(pts1, pts2, w, unique,
                                   jax.random.fold_in(rng, l))
            idx = np.asarray(sf0["sample_idx"])[b, s]
            print("  subset idx:", idx, "distinct:", len(set(idx.tolist())))
            p1s = np.asarray(pts1)[b][idx]
            p2s = np.asarray(pts2)[b][idx]
            ws = np.asarray(w)[b][idx]
            np.savez("/tmp/slnan/subset.npz", p1=p1s, p2=p2s, w=ws,
                     b=b, s=s, layer=l)
            print("  saved /tmp/slnan/subset.npz; w range:",
                  ws.min(), ws.max())
        break
