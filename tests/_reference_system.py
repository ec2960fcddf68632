"""Run the reference's FULL eval system (`train_good.py eval_good`) live,
in-container, against a dump tree.

This is the system-level counterpart of `_reference_oracle` (module-level
parity): the reference's real CLI entry `eval_good` -> `train_good` ->
`Train_model_pipeline.train_epoch` val loop -> per-pair `val_rt` in the
(synchronous stand-in) process pool -> npz dumps
(`/root/reference/deepFEPE/train_good.py:93-98`,
`Train_model_pipeline.py:239-297`). Our `cli.py eval_good` is then diffed
against those npz outputs field by field on the same tree with the same
imported weights (tests/test_full_system_parity.py).

Only environment shims are installed (missing pip packages: torchvision,
imgaug; a synchronous `pebble.ProcessPool`; inert superpoint modules for
the SIFT-mode path). The reference code itself runs unmodified.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

from _reference_oracle import _load_dataset_cls, _stub, load_reference


class _SyncMapFuture:
    def __init__(self, results):
        self._results = results

    def result(self):
        return iter(self._results)

    def cancel(self):
        pass


class _SyncProcessPool:
    """Drop-in for pebble.ProcessPool: runs the map synchronously in-process
    (the reference only uses pool.map(val_rt, ...) during validation,
    Train_model_pipeline.py:1048-1061)."""

    def __init__(self, *a, **k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def map(self, fn, *iterables, **kw):
        return _SyncMapFuture([fn(*args) for args in zip(*iterables)])


class _ToTensor:
    """torchvision.transforms.ToTensor semantics: HWC numpy -> CHW float
    tensor, uint8 scaled to [0, 1]."""

    def __call__(self, a):
        import torch

        a = np.asarray(a)
        if a.ndim == 2:
            a = a[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(a.transpose(2, 0, 1)))
        if a.dtype == np.uint8:
            t = t.float().div(255.0)
        return t


class _Compose:
    def __init__(self, ts):
        self.ts = ts

    def __call__(self, x):
        for t in self.ts:
            x = t(x)
        return x


def _install_system_stubs(writer_dir: str) -> None:
    load_reference()
    _load_dataset_cls()  # path/pykitti/skimage/coloredlogs shims

    # Missing pip packages the import chain touches but the SIFT-mode eval
    # path never exercises meaningfully.
    tv = _stub("torchvision")
    tvt = _stub("torchvision.transforms", Compose=_Compose, ToTensor=_ToTensor)
    tv.transforms = tvt
    ia = _stub("imgaug")
    ia.augmenters = _stub("imgaug.augmenters")

    # pebble: the oracle stubs ProcessPool=object; the system run needs a
    # working (synchronous) map.
    _stub("pebble", ProcessPool=_SyncProcessPool)

    # superpoint surface referenced at module import time (train_good.py
    # :70-83); SIFT mode (if_SP=false) never instantiates any of it.
    sp = sys.modules["superpoint"]
    tmf = _stub("superpoint.Train_model_frontend")

    class Train_model_frontend:  # noqa: N801 — reference naming
        pass

    tmf.Train_model_frontend = Train_model_frontend
    sp.Train_model_frontend = tmf

    spu = sys.modules["superpoint.utils"]
    pt = _stub(
        "superpoint.utils.print_tool",
        print_dict_attr=lambda *a, **k: None,
    )
    spu.print_tool = pt

    spm = _stub("superpoint.models")
    sp.models = spm
    g2 = _stub("superpoint.models.SuperPointNet_gauss2")
    g2.SuperPointNet_gauss2 = type("SuperPointNet_gauss2", (), {})
    mu = _stub("superpoint.models.model_utils")
    mu.SuperPointNet_process = type("SuperPointNet_process", (), {})
    mw = _stub("superpoint.models.model_wrap")
    mw.PointTracker = type("PointTracker", (), {})
    spm.SuperPointNet_gauss2 = g2
    spm.model_utils = mu
    spm.model_wrap = mw

    uu = sys.modules["superpoint.utils.utils"]
    uu.getWriterPath = lambda **kw: writer_dir
    uu.saveLoss = lambda *a, **k: None
    uu.toNumpy = lambda t: t.detach().cpu().numpy()


def make_reference_eval_config(
    dump_root: str,
    ckpt_path: str,
    good_num: int,
    image_hw,
    batch_size: int,
    five_point: bool = False,
    if_quality: bool = False,
    quality_size: int = 2,
):
    """The reference's kitti_corr_baselineEval.yaml schema with the dump
    root / shapes / checkpoint pointed at the test tree (SIFT mode,
    if_SP=false; workers 0 so the torch DataLoader runs in-process)."""
    import yaml

    with open(
        "/root/reference/deepFEPE/configs/kitti_corr_baselineEval.yaml"
    ) as f:
        cfg = yaml.safe_load(f)
    H, W = image_hw
    cfg["data"].update(
        dump_root=str(dump_root),
        cache_in_memory=False,
        batch_size=batch_size,
        good_num=good_num,
    )
    cfg["data"]["image"]["size"] = [H, W, 3]
    cfg["data"]["preprocessing"]["resize"] = [H, W]
    cfg["data"]["read_what"]["with_quality"] = if_quality
    cfg["model"].update(
        if_SP=False, if_quality=if_quality, quality_size=quality_size
    )
    cfg["exps"].update(five_point=five_point)
    cfg["training"].update(
        workers_train=0,
        workers_val=0,
        pretrained=str(ckpt_path),
        pretrained_SP="",
        train_iter=0,
        val_interval=1,
        val_batches=-1,
        retrain=False,
        train=False,
        reset_iter=True,
        reproduce=True,
    )
    return cfg


def save_reference_checkpoint(net, path: str) -> None:
    """Write a reference-format .pth.tar (mode 'full',
    utils/loader.py:196-213: model_state_dict + n_iter[_val])."""
    import torch

    torch.save(
        {
            "n_iter": 0,
            "n_iter_val": 0,
            "model_state_dict": net.state_dict(),
            "optimizer_state_dict": {},
            "loss": 0.0,
        },
        path,
    )


def run_reference_eval_good(config: dict, output_dir: str) -> dict:
    """Drive the reference's eval_good end to end; returns the two npz
    dumps it wrote ({our_name,base_name}_{filename})."""
    os.makedirs(output_dir, exist_ok=True)
    _install_system_stubs(os.path.join(output_dir, "runs"))

    import importlib

    tg = importlib.import_module("deepFEPE.train_good")

    args = types.SimpleNamespace(
        command="eval_good",
        exper_name="ref_system_parity",
        eval=True,
        test=True,
        config="",
        func=None,
        debug=False,
    )
    cwd = os.getcwd()
    try:
        # The reference resolves save/log paths relative to cwd.
        os.chdir(output_dir)
        tg.eval_good(config, ".", args)
    finally:
        os.chdir(cwd)

    our = config["exps"]["our_name"]
    base = config["exps"]["base_name"]
    fn = config["exps"]["filename"]
    return {
        "our": dict(np.load(os.path.join(output_dir, f"{our}_{fn}"))),
        "base": dict(np.load(os.path.join(output_dir, f"{base}_{fn}"))),
    }
