"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the reference's verification strategy (SURVEY.md §4) plus the
multi-host story the reference never had: all sharding tests run against
XLA's host-platform device virtualization.
"""

import os

# The environment may pin JAX_PLATFORMS to a real accelerator and preimport
# jax, so plain env-var setdefault is not enough: update the config directly
# (the backend is not initialized until the first device lookup) and set the
# host-platform flag before that happens.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# x64 available for the high-precision eval path; tests pass explicit f32
# where they exercise the (default) f32 training path.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_pose(rng, max_angle_deg=10.0, t_scale=1.0):
    """A random small relative pose (R, t) like consecutive KITTI frames."""
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    angle = np.deg2rad(max_angle_deg) * rng.rand()
    K_ = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    R = np.eye(3) + np.sin(angle) * K_ + (1 - np.cos(angle)) * K_ @ K_
    t = rng.randn(3)
    t = t / np.linalg.norm(t) * t_scale
    return R.astype(np.float64), t.astype(np.float64)


def synthetic_pair(rng, n=200, noise=0.0, outlier_frac=0.0, H=376, W=1241):
    """Generate a geometrically consistent two-view correspondence set.

    Returns dict with x1, x2 [N,2] pixels, K, R, t (frame1->frame2), E, F.
    """
    f = 700.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    R, t = random_pose(rng, max_angle_deg=5.0)

    # 3D points in front of camera 1.
    X1 = np.stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(-3, 3, n),
            rng.uniform(5, 40, n),
        ],
        axis=-1,
    )
    X2 = X1 @ R.T + t
    x1 = (X1 / X1[:, 2:3]) @ K.T
    x2 = (X2 / X2[:, 2:3]) @ K.T
    x1, x2 = x1[:, :2], x2[:, :2]
    if noise > 0:
        x1 = x1 + rng.randn(n, 2) * noise
        x2 = x2 + rng.randn(n, 2) * noise
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        x2[idx] = np.stack(
            [rng.uniform(0, W, n_out), rng.uniform(0, H, n_out)], axis=-1
        )
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    return dict(x1=x1, x2=x2, K=K, R=R, t=t, E=E, F=F, X1=X1)
