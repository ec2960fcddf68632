"""Import the live reference implementation (/root/reference) as a test
oracle.

The reference is PyTorch; we run it on CPU against identical inputs to turn
"capability parity" claims into measured F/loss/gradient agreement
(VERDICT round-1 item 1). A few of its imports (pebble, superpoint.utils,
…) are not in this environment and are irrelevant to the numeric paths
under test, so they are stubbed with inert placeholders before import.

Nothing from the reference is copied — it is imported and *executed*.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


_loaded = {}


def load_reference():
    """Return a namespace with the reference modules used by parity tests.

    Lazy + cached; raises pytest.skip-friendly ImportError if the reference
    tree is absent.
    """
    if _loaded:
        return _loaded["ns"]

    for p in (REF_ROOT, f"{REF_ROOT}/deepFEPE"):
        if p not in sys.path:
            sys.path.insert(0, p)

    # torch here is CPU-only but the reference calls .cuda() unconditionally
    # (e.g. DeepFNet.__init__: self.mask = Variable(torch.ones(3)).cuda()).
    # Make .cuda() an identity so the reference runs on CPU unmodified.
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # Inert stand-ins for imports the numeric paths never touch.
    _stub("pebble", ProcessPool=object)
    sp = _stub("superpoint")
    spu = _stub("superpoint.utils")
    sp.utils = spu

    def _noop(*a, **k):
        return None

    spu.logging = _stub(
        "superpoint.utils.logging",
        logging=__import__("logging"),
        toRed=lambda s: s,
        toCyan=lambda s: s,
        toGreen=lambda s: s,
        toMagenta=lambda s: s,
        toYellow=lambda s: s,
        toBlue=lambda s: s,
    )
    spu.utils = _stub(
        "superpoint.utils.utils",
        tensor2array=_noop,
        save_checkpoint=_noop,
        load_checkpoint=_noop,
        save_path_formatter=_noop,
        flattenDetection=_noop,
    )

    from deepFEPE.models.DeepFNet import (  # noqa: E402
        DeepFNet,
        Fit,
        NormalizeAndExpand,
    )
    from deepFEPE import train_good_utils as tgu  # noqa: E402
    from deepFEPE.dsac_tools import utils_F as ref_utils_F  # noqa: E402
    from deepFEPE.dsac_tools import utils_geo as ref_utils_geo  # noqa: E402

    ns = types.SimpleNamespace(
        load_dataset_cls=_load_dataset_cls,
        DeepFNet=DeepFNet,
        Fit=Fit,
        NormalizeAndExpand=NormalizeAndExpand,
        tgu=tgu,
        utils_F=ref_utils_F,
        utils_geo=ref_utils_geo,
    )
    _loaded["ns"] = ns
    return ns


class _StrPath(str):
    """Minimal stand-in for the `path` package's str-subclass Path —
    kitti_odo_corr slices it like a string (frame[0][-2:]) AND joins with
    the / operator, so pathlib won't do."""

    def __truediv__(self, other):
        import os

        return _StrPath(os.path.join(str(self), str(other)))

    __div__ = __truediv__

    @property
    def name(self):
        import os

        return _StrPath(os.path.basename(str(self)))


def _load_dataset_cls():
    """Import the reference's live KittiCorrOdo dataset class (stubs the
    `path` and `skimage` imports its module head needs)."""
    load_reference()  # base stubs + sys.path

    pathmod = _stub("path")
    pathmod.Path = _StrPath
    # utils_kitti imports pykitti at module level; only the raw-dump-time
    # KittiLoader needs it (load_as_array & co. don't).
    _stub("pykitti", raw=None)
    # py3.10 removed the collections.Mapping alias utils/tools.py uses.
    import collections
    import collections.abc

    if not hasattr(collections, "Mapping"):
        collections.Mapping = collections.abc.Mapping
    _stub("coloredlogs", install=lambda *a, **k: None)
    _stub(
        "termcolor",
        colored=lambda text, *a, **k: text,
        cprint=lambda text, *a, **k: print(text),
    )
    sk = _stub("skimage")
    skt = _stub("skimage.transform")

    def _resize(img, shape, **kw):
        import cv2
        import numpy as np

        out = cv2.resize(
            np.asarray(img), (int(shape[1]), int(shape[0])),
            interpolation=cv2.INTER_AREA,
        )
        return out

    skt.resize = _resize
    sk.transform = skt

    def _adjust_gamma(img, gamma=1.0, gain=1.0):
        import numpy as np

        return gain * np.asarray(img) ** gamma

    sk.exposure = _stub("skimage.exposure")
    sk.exposure.adjust_gamma = _adjust_gamma

    from deepFEPE.datasets.kitti_odo_corr import KittiCorrOdo  # noqa: E402

    return KittiCorrOdo


def load_sample_loss_fit():
    """Import the reference's DeepFNetSampleLoss.Fit with a torch-native
    stand-in for the CUDA `batch_svd` extension (same (U, S, V) convention
    as torch.svd: X = U diag(S) V^T with V's columns the right vectors)."""
    load_reference()
    import torch

    def _batch_svd(X):
        U, S, Vh = torch.linalg.svd(X, full_matrices=False)
        return U, S, Vh.transpose(-1, -2)

    _stub("batch_svd", batch_svd=_batch_svd)

    from deepFEPE.models.DeepFNetSampleLoss import Fit as SampleFit

    return SampleFit
