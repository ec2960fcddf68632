"""Import reference torch checkpoints (.pth.tar) into deepfepe_tpu params.

The reference ships a pretrained model zoo as torch `.pth.tar` files
(`README.md:104-169`) saved by `save_checkpoint` with
`{n_iter, model_state_dict, optimizer_state_dict, loss}`
(`Train_model_pipeline.py:56-77`). SURVEY.md §7.3 flags checkpoint
translation as the fastest route to accuracy parity; this module maps those
state dicts onto our flax param trees so a reference user can bring their
trained models:

- DeepFNet (`models/DeepFNet.py:325-330`): attributes `input_weights`,
  `update_weights`, `update_offsets` are `ErrorEstimator` Conv1d stacks
  (`models/ErrorEstimators.py:14-69`) — Sequential `fw` with Conv1d at
  indices 0,3,6,9,12,15 and affine InstanceNorm1d at 1,4,7,10,13 (non-BN);
  with `if_bn`, Conv1d at 0,4,8,12,16,20, BatchNorm1d at 1,5,...,
  InstanceNorm1d at 2,6,....
- SuperPoint (`SuperPointNet` classic layout, magicleap `superpoint_v1.pth`):
  conv1a..conv4b encoder + convPa/convPb detector and convDa/convDb
  descriptor heads — the layout our `frontend.SuperPointNet` mirrors.

Layout transforms: torch Conv1d weight [out,in,1] -> Dense kernel [in,out];
torch Conv2d weight [out,in,kh,kw] -> flax kernel [kh,kw,in,out]
(NCHW->NHWC); InstanceNorm weight/bias -> scale/bias.

torch (CPU) is only imported inside `load_pth_tar`; conversion itself is
pure numpy, so tests can feed ordinary dicts of arrays.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def load_pth_tar(path: str) -> Dict:
    """Load a torch checkpoint to numpy-backed dicts (host-only)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # Copy: .numpy() on a live module's tensor shares storage, so an
    # in-place optimizer step on the torch side would silently mutate the
    # "imported" params (bit us in the co-training parity test).
    return np.array(t.detach().cpu().numpy())  # torch tensor


def strip_module_prefix(sd: Dict) -> Dict:
    """Drop the nn.DataParallel 'module.' prefix (the reference unwraps via
    net.module at save time, Train_model_pipeline.py:59-62, but older files
    in the wild keep it)."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return sd


def convert_error_estimator(
    sd: Dict, prefix: str, if_bn: bool = False
) -> Tuple[Dict, Dict]:
    """Map one ErrorEstimator ('<prefix>.fw.<i>.{weight,bias}') to our flax
    {'Dense_i', 'InstanceNorm1d_i'[, 'BatchNorm_i']} tree.

    Returns (params, batch_stats); batch_stats is empty for non-BN nets.
    """
    n_hidden = 5
    stride = 4 if if_bn else 3
    conv_idx = [i * stride for i in range(n_hidden)] + [n_hidden * stride]
    in_off = 2 if if_bn else 1  # InstanceNorm position within each block
    params: Dict = {}
    stats: Dict = {}
    for li, ci in enumerate(conv_idx):
        w = _to_np(sd[f"{prefix}.fw.{ci}.weight"])  # [out, in, 1]
        dense = {"kernel": np.ascontiguousarray(w[:, :, 0].T)}
        bkey = f"{prefix}.fw.{ci}.bias"
        if bkey in sd:
            dense["bias"] = _to_np(sd[bkey])
        elif li < n_hidden or not if_bn:
            raise KeyError(bkey)
        params[f"Dense_{li}"] = dense
        if li < n_hidden:
            ii = ci + in_off
            params[f"InstanceNorm1d_{li}"] = {
                "scale": _to_np(sd[f"{prefix}.fw.{ii}.weight"]),
                "bias": _to_np(sd[f"{prefix}.fw.{ii}.bias"]),
            }
            if if_bn:
                bi = ci + 1
                params[f"BatchNorm_{li}"] = {
                    "scale": _to_np(sd[f"{prefix}.fw.{bi}.weight"]),
                    "bias": _to_np(sd[f"{prefix}.fw.{bi}.bias"]),
                }
                stats[f"BatchNorm_{li}"] = {
                    "mean": _to_np(sd[f"{prefix}.fw.{bi}.running_mean"]),
                    "var": _to_np(sd[f"{prefix}.fw.{bi}.running_var"]),
                }
    return params, stats


def convert_deepf_state(sd: Dict, if_bn: bool = False) -> Dict:
    """Reference DeepFNet state_dict -> our {'params': {...}} variables.

    Handles input_weights / update_weights and, when present, the
    learn-offsets head (DeepFNet.py:330)."""
    sd = strip_module_prefix(sd)
    nets = sorted({k.split(".")[0] for k in sd if ".fw." in k})
    if not nets:
        raise ValueError("no ErrorEstimator weights found in state_dict")
    params: Dict = {}
    stats: Dict = {}
    for name in nets:
        p, s = convert_error_estimator(sd, name, if_bn=if_bn)
        params[name] = p
        if s:
            stats[name] = s
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_superpoint_state(sd: Dict) -> Dict:
    """SuperPointNet (conv1a..convDb) state_dict -> our flax variables."""
    sd = strip_module_prefix(sd)
    params: Dict = {}
    for k, v in sd.items():
        if not k.endswith(".weight") and not k.endswith(".bias"):
            continue
        layer, kind = k.rsplit(".", 1)
        a = _to_np(v)
        entry = params.setdefault(layer, {})
        if kind == "weight":
            entry["kernel"] = np.ascontiguousarray(a.transpose(2, 3, 1, 0))
        else:
            entry["bias"] = a
    return {"params": params}


def convert_superpoint_gauss2_state(sd: Dict) -> Dict:
    """`SuperPointNet_gauss2` state_dict -> `frontend.SuperPointNetGauss2`
    flax variables ({'params', 'batch_stats'}).

    Torch layout (pytorch-superpoint models/SuperPointNet_gauss2.py +
    unet_parts.double_conv, the net train_good.py:224 instantiates):
      inc.conv.conv.{0,3}          conv / {1,4} BN       -> inc/conv{0,1}, bn{0,1}
      down{1,2,3}.mpconv.1.conv.*  same block after pool -> down{1,2,3}/...
      convPa bnPa convPb bnPb convDa bnDa convDb bnDb    -> same names
    """
    sd = strip_module_prefix(sd)
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = val

    seq = {"0": ("conv0", "conv"), "1": ("bn0", "bn"),
           "3": ("conv1", "conv"), "4": ("bn1", "bn")}
    for k, v in sd.items():
        parts = k.split(".")
        a = _to_np(v)
        if parts[0] == "inc" or parts[0].startswith("down"):
            # inc.conv.conv.<i>.<leaf> / downK.mpconv.1.conv.<i>.<leaf>
            idx, leaf = parts[-2], parts[-1]
            if idx not in seq:
                continue  # num_batches_tracked
            name, kind = seq[idx]
            block = parts[0]
            if kind == "conv":
                if leaf == "weight":
                    put(params, (block, name), "kernel",
                        np.ascontiguousarray(a.transpose(2, 3, 1, 0)))
                else:
                    put(params, (block, name), "bias", a)
            else:
                _put_bn(params, stats, (block, name), leaf, a)
        elif parts[0].startswith("conv") and len(parts) == 2:
            layer, leaf = parts
            if leaf == "weight":
                put(params, (layer,), "kernel",
                    np.ascontiguousarray(a.transpose(2, 3, 1, 0)))
            else:
                put(params, (layer,), "bias", a)
        elif parts[0].startswith("bn") and len(parts) == 2:
            _put_bn(params, stats, (parts[0],), parts[1], a)
    return {"params": params, "batch_stats": stats}


def _put_bn(params: Dict, stats: Dict, path, leaf: str, a) -> None:
    def put(tree, leafname):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leafname] = a

    if leaf == "weight":
        put(params, "scale")
    elif leaf == "bias":
        put(params, "bias")
    elif leaf == "running_mean":
        put(stats, "mean")
    elif leaf == "running_var":
        put(stats, "var")
    # num_batches_tracked: dropped


def load_reference_checkpoint(
    path: str, kind: str = "auto", if_bn: bool = False
) -> Tuple[Dict, Optional[int]]:
    """One-call import: returns (variables, n_iter or None).

    kind: 'deepf', 'superpoint', or 'auto' (sniff the state-dict keys)."""
    ckpt = load_pth_tar(path)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    n_iter = ckpt.get("n_iter") if isinstance(ckpt, dict) else None
    keys = list(sd.keys())
    if kind == "auto":
        if any(".fw." in k for k in keys):
            kind = "deepf"
        elif any(k.startswith(("inc.", "module.inc.")) for k in keys):
            kind = "superpoint_gauss2"
        else:
            kind = "superpoint"
    if kind == "deepf":
        return convert_deepf_state(sd, if_bn=if_bn), n_iter
    if kind == "superpoint_gauss2":
        return convert_superpoint_gauss2_state(sd), n_iter
    return convert_superpoint_state(sd), n_iter


# ---------------------------------------------------------------------------
# Export: our flax params -> reference torch state_dict (the inverse map)
# ---------------------------------------------------------------------------


def export_error_estimator(
    params: Dict, prefix: str, stats: Optional[Dict] = None,
    if_bn: bool = False,
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_error_estimator`: our flax
    {'Dense_i', 'InstanceNorm1d_i'[, 'BatchNorm_i']} tree -> the
    reference's '<prefix>.fw.<i>.{weight,bias}' Conv1d/norm keys
    (models/ErrorEstimators.py:14-69 layout)."""
    n_hidden = 5
    stride = 4 if if_bn else 3
    conv_idx = [i * stride for i in range(n_hidden)] + [n_hidden * stride]
    in_off = 2 if if_bn else 1
    sd: Dict[str, np.ndarray] = {}
    for li, ci in enumerate(conv_idx):
        dense = params[f"Dense_{li}"]
        k = np.asarray(dense["kernel"])  # [in, out]
        sd[f"{prefix}.fw.{ci}.weight"] = np.ascontiguousarray(
            k.T[:, :, None]
        )  # [out, in, 1]
        if "bias" in dense:
            sd[f"{prefix}.fw.{ci}.bias"] = np.asarray(dense["bias"])
        if li < n_hidden:
            inorm = params[f"InstanceNorm1d_{li}"]
            ii = ci + in_off
            sd[f"{prefix}.fw.{ii}.weight"] = np.asarray(inorm["scale"])
            sd[f"{prefix}.fw.{ii}.bias"] = np.asarray(inorm["bias"])
            if if_bn:
                bn = params[f"BatchNorm_{li}"]
                bi = ci + 1
                sd[f"{prefix}.fw.{bi}.weight"] = np.asarray(bn["scale"])
                sd[f"{prefix}.fw.{bi}.bias"] = np.asarray(bn["bias"])
                if stats and f"BatchNorm_{li}" in stats:
                    s = stats[f"BatchNorm_{li}"]
                    sd[f"{prefix}.fw.{bi}.running_mean"] = np.asarray(
                        s["mean"]
                    )
                    sd[f"{prefix}.fw.{bi}.running_var"] = np.asarray(
                        s["var"]
                    )
    return sd


def export_deepf_state(variables: Dict, if_bn: bool = False) -> Dict:
    """Our DeepFNet flax variables -> a reference-layout state_dict
    (numpy values) loadable by the live torch net via
    `net.load_state_dict` (the Fit buffers are plain attributes there, so
    the ErrorEstimator stacks are the complete state)."""
    params = variables.get("params", variables)
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    for name, tree in params.items():
        if not any(k.startswith("Dense_") for k in tree):
            continue
        sd.update(
            export_error_estimator(
                tree, name, stats.get(name), if_bn=if_bn
            )
        )
    if not sd:
        raise ValueError("no ErrorEstimator stacks found in variables")
    return sd


def save_reference_checkpoint(
    variables: Dict, path: str, n_iter: int = 0, if_bn: bool = False
) -> None:
    """Write a reference-format .pth.tar (`save_checkpoint` schema:
    {n_iter, model_state_dict, ...}, Train_model_pipeline.py:56-77) from
    our flax variables, so models trained HERE run in the reference
    stack unmodified."""
    import torch

    sd = {
        k: torch.tensor(np.ascontiguousarray(v))
        for k, v in export_deepf_state(variables, if_bn=if_bn).items()
    }
    torch.save(
        {
            "n_iter": int(n_iter),
            "n_iter_val": 0,
            "model_state_dict": sd,
            "optimizer_state_dict": {},
            "loss": 0.0,
        },
        path,
    )


def export_superpoint_gauss2_state(variables: Dict) -> Dict:
    """`frontend.SuperPointNetGauss2` flax variables -> the torch
    state_dict layout of pytorch-superpoint's SuperPointNet_gauss2 —
    the exact inverse of convert_superpoint_gauss2_state, INCLUDING the
    BatchNorm running statistics (mean/var -> running_mean/running_var
    + num_batches_tracked), so SuperPoint checkpoints fine-tuned HERE
    load into the reference stack unmodified (train_good.py:198-237)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict = {}
    inv_seq = {"conv0": "0", "bn0": "1", "conv1": "3", "bn1": "4"}

    def put_conv(prefix: str, p: Dict) -> None:
        sd[prefix + ".weight"] = np.ascontiguousarray(
            np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        )
        sd[prefix + ".bias"] = np.asarray(p["bias"])

    def put_bn(prefix: str, p: Dict, s: Dict) -> None:
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])
        sd[prefix + ".running_mean"] = np.asarray(s["mean"])
        sd[prefix + ".running_var"] = np.asarray(s["var"])
        sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)

    for block in ("inc", "down1", "down2", "down3"):
        base = (
            f"{block}.conv.conv" if block == "inc"
            else f"{block}.mpconv.1.conv"
        )
        for name, idx in inv_seq.items():
            if name.startswith("conv"):
                put_conv(f"{base}.{idx}", params[block][name])
            else:
                put_bn(
                    f"{base}.{idx}", params[block][name],
                    stats[block][name],
                )
    for head in ("convPa", "convPb", "convDa", "convDb"):
        put_conv(head, params[head])
    for head in ("bnPa", "bnPb", "bnDa", "bnDb"):
        put_bn(head, params[head], stats[head])
    return sd


def save_superpoint_checkpoint(
    variables: Dict, path: str, n_iter: int = 0
) -> None:
    """Write a reference-format superPointNet .pth.tar (the
    save_checkpoint schema the joint trainer uses for its SP side,
    Train_model_pipeline.py:1160-1185) from our flax gauss2 variables."""
    import torch

    sd = {
        k: torch.tensor(np.ascontiguousarray(v))
        for k, v in export_superpoint_gauss2_state(variables).items()
    }
    torch.save(
        {
            "n_iter": int(n_iter),
            "n_iter_val": 0,
            "model_state_dict": sd,
            "optimizer_state_dict": {},
            "loss": 0.0,
        },
        path,
    )
