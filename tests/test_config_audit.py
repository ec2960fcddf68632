"""Reference config-knob audit (VERDICT r4 next-step #5).

Walks every key of every YAML in the reference's configs/ directory and
asserts each is either consumed (a Config field — possibly through the
rename map — or a named non-Config consumer) or explicitly rejected with
a recorded reason. Fails the moment a reference knob would silently
no-op in our load_config.
"""

import glob
import os

import pytest
import yaml

from deepfepe_tpu.train.config import (
    audit_reference_config,
    config_from_dict,
    load_config,
)

REF_CONFIGS = sorted(
    glob.glob("/root/reference/deepFEPE/configs/*.yaml")
)

pytestmark = pytest.mark.skipif(
    not REF_CONFIGS, reason="reference configs not present"
)


@pytest.mark.parametrize(
    "path", REF_CONFIGS, ids=[os.path.basename(p) for p in REF_CONFIGS]
)
def test_every_reference_knob_consumed_or_rejected(path):
    with open(path) as f:
        raw = yaml.safe_load(f)
    rep = audit_reference_config(raw)
    assert not rep["unknown"], (
        f"silently no-oped reference knobs in {os.path.basename(path)}: "
        f"{rep['unknown']}"
    )
    # Rejections must carry a reason string.
    for k, why in rep["rejected"].items():
        assert isinstance(why, str) and len(why) > 10, (k, why)


@pytest.mark.parametrize(
    "path", REF_CONFIGS, ids=[os.path.basename(p) for p in REF_CONFIGS]
)
def test_every_reference_yaml_loads(path):
    cfg = load_config(path)
    assert cfg.model.depth >= 1
    assert cfg.data.batch_size >= 1


def test_consumed_knobs_actually_land():
    """Spot-check the non-trivial mappings end to end."""
    raw = {
        "model": {"if_img_feat": True, "if_img_des_to_pointnet": True,
                  "if_cpu_svd": False},
        "data": {"cache_in_memory": True,
                 "read_what": {"with_SP": True, "with_qt": True}},
        "training": {
            "SP_params": {"out_num_points": 321, "conf_thresh": 0.02},
            "pretrained_SP": "x.pth.tar", "retrain_SP": False,
            "reset_iter": True, "train_SP": True,
            "val_interval_in_train": 123, "val_show_interval": 77,
            "workers_train": 9,
        },
    }
    cfg = config_from_dict(raw)
    assert cfg.model.if_img_w is True       # if_img_feat alias
    assert cfg.model.if_des is True          # if_img_des_to_pointnet alias
    assert cfg.data.cache_in_memory is True
    assert cfg.data.with_SP is True
    assert cfg.training.sp_params["out_num_points"] == 321
    assert cfg.training.pretrained_SP == "x.pth.tar"
    assert cfg.training.retrain_SP is False
    assert cfg.training.reset_iter is True
    assert cfg.training.train_SP is True
    assert cfg.training.val_interval_in_train == 123
    assert cfg.training.val_show_interval == 77
    assert cfg.training.workers_train == 9

    from deepfepe_tpu.frontend import frontend_params_from_config

    fp = frontend_params_from_config(cfg)
    assert fp.out_num_points == 321 and fp.conf_thresh == 0.02

    with pytest.raises(ValueError, match="SP_params"):
        cfg.training.sp_params["bogus_knob"] = 1
        frontend_params_from_config(cfg)


def test_rejected_knobs_fail_loudly():
    """The explicit rejections raise instead of silently no-oping."""
    from deepfepe_tpu.loader import data_loader

    with pytest.raises(ValueError, match="if_lidar_corres"):
        config_from_dict({"model": {"if_lidar_corres": True}})

    cfg = config_from_dict(
        {"data": {"read_what": {"with_sift": False}}}
    )
    with pytest.raises(ValueError, match="with_sift"):
        data_loader(cfg, "train")

    cfg2 = config_from_dict({"data": {"read_what": {"with_qt": False}}})
    with pytest.raises(ValueError, match="with_qt"):
        data_loader(cfg2, "train")
