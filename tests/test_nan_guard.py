"""NaN-guard in the train step: a poisoned batch must not poison params
(ref: the reference's NaN-loss pause, train_good_utils.py:986-987)."""

import numpy as np

import jax

from deepfepe_tpu.data import SyntheticPairs
from deepfepe_tpu.models import DeepFNet
from deepfepe_tpu.train import Config, Trainer
import pytest


pytestmark = pytest.mark.slow  # end-to-end: excluded from the core numeric suite

def _leaves(state):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]


def test_nan_batch_skips_update():
    cfg = Config()
    cfg.model.if_quality = True
    net = DeepFNet(depth=2, image_size=(376, 1241), if_quality=True)
    trainer = Trainer(net, cfg)
    gen = SyntheticPairs(good_num=64, seed=0)
    batch = gen.batch(8)
    trainer.init_state(batch)

    from deepfepe_tpu.parallel import shard_batch

    # Clean step: params move, nonfinite == 0.
    before = _leaves(trainer.state)
    state, metrics = trainer.train_step(
        trainer.state, shard_batch(trainer.mesh, batch), 0.1, 0.5
    )
    trainer.state = state
    assert float(metrics["nonfinite"]) == 0.0
    after_clean = _leaves(trainer.state)
    assert any(
        not np.allclose(a, b) for a, b in zip(before, after_clean)
    )

    # Poisoned step: params frozen, nonfinite == 1, loss is NaN.
    bad = {k: np.array(v) for k, v in batch.items()}
    bad["matches_xy_ori"] = bad["matches_xy_ori"].copy()
    bad["matches_xy_ori"][0, :8] = np.nan
    state, metrics = trainer.train_step(
        trainer.state, shard_batch(trainer.mesh, bad), 0.1, 0.5
    )
    assert float(metrics["nonfinite"]) == 1.0
    after_bad = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    for a, b in zip(after_clean, after_bad):
        np.testing.assert_array_equal(a, b)
    # Training continues cleanly afterwards.
    state2, metrics2 = trainer.train_step(
        state, shard_batch(trainer.mesh, batch), 0.1, 0.5
    )
    assert float(metrics2["nonfinite"]) == 0.0
    assert np.all(np.isfinite(np.asarray(metrics2["loss_F"])))
