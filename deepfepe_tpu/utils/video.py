"""Result-frame stitching to video + warp sanity visualization.

Parity with `tools/save_video.py` (stitch result frames into a video) and
`tools/visualize_warping.py` (HPatches-style warp sanity plots). Uses
OpenCV's VideoWriter when available, otherwise writes an image sequence.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def save_video(
    frames: Sequence[np.ndarray],
    out_path: str,
    fps: int = 10,
) -> str:
    """Write frames ([H, W] or [H, W, 3], uint8 or [0,1] float) to a video
    (or a PNG sequence fallback)."""
    frames = [
        (np.clip(f, 0, 1) * 255).astype(np.uint8)
        if np.issubdtype(np.asarray(f).dtype, np.floating)
        else np.asarray(f, np.uint8)
        for f in frames
    ]
    try:
        import cv2

        H, W = frames[0].shape[:2]
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        vw = cv2.VideoWriter(out_path, fourcc, fps, (W, H))
        for f in frames:
            if f.ndim == 2:
                f = cv2.cvtColor(f, cv2.COLOR_GRAY2BGR)
            vw.write(f)
        vw.release()
        return out_path
    except ImportError:
        out_dir = Path(out_path).with_suffix("")
        os.makedirs(out_dir, exist_ok=True)
        import matplotlib.pyplot as plt

        for i, f in enumerate(frames):
            plt.imsave(out_dir / f"{i:06d}.png", f, cmap="gray")
        return str(out_dir)


def visualize_warp_pair(
    img1: np.ndarray, img2: np.ndarray, H_mat: np.ndarray,
    save_path: Optional[str] = None,
):
    """Warp img1 by H and blend with img2 — sanity check that the homography
    aligns them (ref: tools/visualize_warping.py)."""
    import jax.numpy as jnp

    from .warp import transform_image

    warped = np.asarray(
        transform_image(
            jnp.asarray(img1[..., None] if img1.ndim == 2 else img1,
                        jnp.float32),
            jnp.asarray(np.linalg.inv(H_mat), jnp.float32),
        )
    )[..., 0]
    blend = np.stack(
        [warped, img2 if img2.ndim == 2 else img2[..., 0],
         np.zeros_like(warped)], -1
    )
    if save_path:
        import matplotlib.pyplot as plt

        plt.imsave(save_path, np.clip(blend, 0, 1))
    return blend
