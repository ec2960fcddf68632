"""Synthetic SfM problem generator for BA benchmarks/tests.

Forward-motion keyframe trajectory with windowed landmark visibility —
the structure of a real odometry/SfM run, at configurable (C cameras,
P landmarks) scale. Dense [C, P] observation tensors with a {0,1}
visibility mask (TPU-native static shapes, SURVEY §5.7).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def make_sfm_problem(rng, C=100, P=10_000, window=20, noise_px=0.5,
                     perturb=0.1):
    """Forward-motion keyframe trajectory with windowed visibility:
    landmark p is observed by `window` consecutive cameras around its
    anchor frame (the structure of a real odometry/SfM run; the [C, P]
    tensors stay dense with a {0,1} visibility mask — TPU-native static
    shapes, SURVEY §5.7)."""
    from . import bundle_adjustment as ba
    from ..geometry.lie import se3_exp

    f = 718.0  # KITTI-like focal
    K = np.array([[f, 0, 620.0], [0, f, 188.0], [0, 0, 1.0]])
    # Camera trajectory: forward motion + gentle yaw.
    poses = [np.eye(4)]
    for c in range(C - 1):
        yaw = 0.002 * np.sin(c / 7.0) + rng.randn() * 5e-4
        Rz = np.array([
            [np.cos(yaw), 0, np.sin(yaw)],
            [0, 1, 0],
            [-np.sin(yaw), 0, np.cos(yaw)],
        ])
        T = np.eye(4)
        T[:3, :3] = Rz
        T[:3, 3] = [rng.randn() * 0.01, rng.randn() * 0.005,
                    -1.0 + rng.randn() * 0.02]  # ~1 m/frame forward
        poses.append(T @ poses[-1])
    poses = np.stack(poses)  # world->camera
    cam_centers = -np.einsum("cij,ci->cj", poses[:, :3, :3].transpose(0, 2, 1),
                             poses[:, :3, 3])

    # Landmarks anchored along the trajectory, in front of their anchor.
    anchor = rng.randint(0, C, P)
    Xc_anchor = np.stack([
        rng.uniform(-15, 15, P), rng.uniform(-3, 6, P),
        rng.uniform(6, 40, P),
    ], -1)
    Ra = poses[anchor, :3, :3]
    ta = poses[anchor, :3, 3]
    X = np.einsum("pij,pj->pi", Ra.transpose(0, 2, 1), Xc_anchor - ta)

    # Windowed visibility around the anchor frame.
    lo = np.clip(anchor - window // 2, 0, C - 1)
    cams = np.arange(C)[:, None]
    vis = ((cams >= lo[None, :]) & (cams < lo[None, :] + window)).astype(
        np.float64
    )

    Xc = np.einsum("cij,pj->cpi", poses[:, :3, :3], X) + poses[:, :3, 3][
        :, None, :
    ]
    in_front = Xc[..., 2] > 1.0
    uv_h = np.einsum("ij,cpj->cpi", K, Xc)
    uv = uv_h[..., :2] / np.clip(uv_h[..., 2:3], 1e-6, None)
    in_img = (
        (uv[..., 0] >= 0) & (uv[..., 0] < 1240)
        & (uv[..., 1] >= 0) & (uv[..., 1] < 376)
    )
    vis = vis * in_front * in_img
    obs = uv + rng.randn(C, P, 2) * noise_px

    poses_init = poses.copy()
    for c in range(1, C):
        xi = rng.randn(6) * perturb * 0.02
        poses_init[c] = np.asarray(se3_exp(jnp.asarray(xi))) @ poses_init[c]
    X_init = X + rng.randn(P, 3) * perturb

    prob = ba.BAProblem(
        poses=jnp.asarray(poses_init, jnp.float32),
        points=jnp.asarray(X_init, jnp.float32),
        obs=jnp.asarray(obs, jnp.float32),
        vis=jnp.asarray(vis, jnp.float32),
        K=jnp.asarray(K, jnp.float32),
    )
    return prob, poses, X, cam_centers
