"""Frontend tests: CNN shapes, NMS vs naive oracle, soft-argmax gradients,
descriptor sampling, mutual-NN matching vs brute-force numpy."""

import numpy as np

import jax
import jax.numpy as jnp

from deepfepe_tpu.frontend import (
    FrontendParams,
    SuperPointNet,
    descriptor_distance,
    flatten_detection,
    get_matches_from_sp,
    mutual_nn_match,
    nms_heatmap,
    sample_descriptors,
    soft_argmax_refine,
    topk_keypoints,
)


def test_superpoint_shapes():
    net = SuperPointNet()
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 96, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(params, x)
    assert outs["semi"].shape == (1, 8, 12, 65)
    assert outs["desc"].shape == (1, 8, 12, 256)
    # Descriptors are unit norm.
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(outs["desc"], axis=-1)), 1.0, atol=1e-5
    )
    hm = flatten_detection(outs["semi"])
    assert hm.shape == (1, 64, 96)
    assert float(jnp.min(hm)) >= 0.0


def test_nms_matches_naive(rng):
    hm = jnp.asarray(rng.rand(2, 32, 32).astype(np.float32))
    out = np.asarray(nms_heatmap(hm, nms_dist=2))
    hm_np = np.asarray(hm)
    for b in range(2):
        for y in range(32):
            for x in range(32):
                y0, y1 = max(0, y - 2), min(32, y + 3)
                x0, x1 = max(0, x - 2), min(32, x + 3)
                is_max = hm_np[b, y, x] >= hm_np[b, y0:y1, x0:x1].max()
                if is_max:
                    assert out[b, y, x] == hm_np[b, y, x]
                else:
                    assert out[b, y, x] == 0.0


def test_topk_and_softargmax(rng):
    # A heatmap with a single gaussian blob off-center: the soft-argmax
    # offset should point toward the true subpixel maximum.
    H = W = 40
    yy, xx = np.mgrid[0:H, 0:W]
    cx, cy = 20.3, 17.6
    hm = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 4.0).astype(np.float32)
    hm_j = jnp.asarray(hm[None])
    kpts = topk_keypoints(nms_heatmap(hm_j, 4), k=8, conf_thresh=0.1)
    assert bool(kpts.valid[0, 0])
    assert tuple(np.asarray(kpts.xy[0, 0])) == (20.0, 18.0)
    refined = soft_argmax_refine(hm_j, kpts, patch_size=5)
    sub = np.asarray(refined.xy[0, 0] + refined.offsets[0, 0])
    assert abs(sub[0] - cx) < 0.2, sub
    assert abs(sub[1] - cy) < 0.2, sub

    # Gradient flows from offsets back into the heatmap.
    def loss(h):
        k = soft_argmax_refine(h, kpts, patch_size=5)
        return jnp.sum(k.offsets)

    g = jax.grad(loss)(hm_j)
    assert float(jnp.max(jnp.abs(g))) > 0


def test_sample_descriptors_interpolates():
    # Descriptor map with a linear ramp in channel 0.
    Hc = Wc = 8
    dm = np.zeros((1, Hc, Wc, 4), np.float32)
    dm[0, :, :, 0] = np.arange(Wc)[None, :]
    dm[0, :, :, 1] = 1.0
    xy = jnp.asarray([[[12.0, 20.0], [28.0, 20.0]]])  # pixel coords, cell=8
    d = np.asarray(sample_descriptors(jnp.asarray(dm), xy))
    # x=12px -> grid 1.0 exactly; x=28px -> grid 3.0.
    r0 = d[0, 0, 0] / d[0, 0, 1]
    r1 = d[0, 1, 0] / d[0, 1, 1]
    assert abs(r0 - 1.0) < 1e-5
    assert abs(r1 - 3.0) < 1e-5


def test_mutual_nn_match_vs_numpy(rng):
    K, D = 32, 16
    d1 = rng.randn(K, D).astype(np.float32)
    d2 = rng.randn(K, D).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    valid = np.ones(K, bool)

    m = mutual_nn_match(
        jnp.asarray(d1[None]), jnp.asarray(d2[None]),
        jnp.asarray(valid[None]), jnp.asarray(valid[None]),
        nn_thresh=1.2, num_matches=K,
    )
    # Brute-force numpy oracle.
    dist = np.sqrt(np.clip(2 - 2 * d1 @ d2.T, 0, None))
    nn12 = dist.argmin(1)
    nn21 = dist.argmin(0)
    expected = {
        (i, nn12[i])
        for i in range(K)
        if nn21[nn12[i]] == i and dist[i, nn12[i]] < 1.2
    }
    got = {
        (int(m.idx1[0, j]), int(m.idx2[0, j]))
        for j in range(K)
        if bool(m.valid[0, j])
    }
    assert got == expected


def test_mutual_nn_match_pallas_production_k(rng):
    """Interpret-mode Pallas matcher == masked-XLA matcher at the SP
    PRODUCTION fan-outs (out_num_points 1000-2000) with padding — the
    shapes the joint pipeline actually routes to the kernel
    (matching.PALLAS_MATCHER_MIN_K = 768). Mosaic lowering still needs
    tools/check_pallas_hw.py on hardware; this pins the semantics."""

    def pairs(m):
        val = np.asarray(m.valid)
        i1, i2 = np.asarray(m.idx1), np.asarray(m.idx2)
        return {
            (b, int(i1[b, k]), int(i2[b, k]))
            for b in range(val.shape[0])
            for k in range(val.shape[1]) if val[b, k]
        }

    for B, K, frac_valid in [(2, 1024, 1.0), (1, 1024, 0.7), (1, 2048, 0.8)]:
        D = 256
        base = rng.randn(B, K, D).astype(np.float32)
        d1 = base / np.linalg.norm(base, axis=-1, keepdims=True)
        d2p = base + 0.3 * rng.randn(B, K, D).astype(np.float32)
        d2 = d2p / np.linalg.norm(d2p, axis=-1, keepdims=True)
        v1 = jnp.asarray(rng.rand(B, K) < frac_valid)
        v2 = jnp.asarray(rng.rand(B, K) < frac_valid)
        a1, a2 = jnp.asarray(d1), jnp.asarray(d2)
        ref = mutual_nn_match(a1, a2, v1, v2, nn_thresh=0.9, backend="xla")
        got = mutual_nn_match(a1, a2, v1, v2, nn_thresh=0.9,
                              backend="pallas")
        assert pairs(ref) == pairs(got), (K, frac_valid)
        np.testing.assert_allclose(
            np.sort(np.asarray(got.scores), axis=None),
            np.sort(np.asarray(ref.scores), axis=None),
            atol=1e-5,
        )


def test_full_frontend_pipeline_and_gradient(rng):
    net = SuperPointNet()
    imgs = jnp.asarray(rng.rand(2, 1, 64, 96).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), imgs[0][..., None])
    fp = FrontendParams(out_num_points=64, conf_thresh=1e-4)
    out = get_matches_from_sp(net, params, (imgs[0], imgs[1]), fp)
    assert out["matches_xy_ori"].shape == (1, 64, 4)
    assert out["quality"].shape == (1, 64, 1)

    # End-to-end differentiability: d(match positions)/d(SP weights) != 0.
    def loss(p):
        o = get_matches_from_sp(net, p, (imgs[0], imgs[1]), fp)
        return jnp.sum(o["matches_xy_ori"])

    g = jax.grad(loss)(params)
    total = sum(
        float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g)
    )
    assert np.isfinite(total) and total > 0


def test_val_model_heatmap_wrapper(rng):
    from deepfepe_tpu.frontend import SuperPointNet, ValModelHeatmap

    net = SuperPointNet()
    imgs = jnp.asarray(rng.rand(1, 64, 96).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), imgs[..., None])
    vm = ValModelHeatmap(params, {"top_k": 32, "conf_thresh": 1e-4}, net=net)
    kpts = vm.run(imgs)
    pts = np.asarray(vm.heatmap_to_pts())
    desc = np.asarray(vm.desc_to_sparse_desc())
    assert pts.shape == (1, 32, 3)
    assert desc.shape == (1, 32, 256)
    assert np.all(np.isfinite(pts))


def test_warp_labels(rng):
    from deepfepe_tpu.frontend.train_sp import warp_labels

    H = np.array([[1.0, 0, 10.0], [0, 1.0, -5.0], [0, 0, 1]])
    corners = np.array([[5.0, 10.0], [50.0, 30.0], [90.0, 60.0]])
    out = warp_labels(corners, H, (64, 96))
    # First corner: (15, 5) in-bounds; third: (100, 55) out of x-range.
    assert len(out) == 2
    np.testing.assert_allclose(out[0], [15.0, 5.0])


def test_descriptor_distance_grad_finite_at_identical_descriptors():
    """Matched pairs minimize the L2 descriptor distance, so identical
    descriptors (distance exactly 0) are the attractor of end-to-end
    training — and sqrt's VJP at 0 is inf. This NaN'd the SuperPoint
    params in joint stage-2 (experiments/joint_full3); the distance must
    have a zero-safe gradient."""
    d = jnp.full((1, 3, 8), 1.0 / np.sqrt(8.0), jnp.float32)

    def f(d1):
        return jnp.sum(descriptor_distance(d1, d))

    g = jax.grad(f)(d)
    assert np.isfinite(np.asarray(g)).all()


def test_softargmax_conv_matches_gather_interior(rng):
    """The scatter-free conv implementation (the default) must equal the
    per-point patch-gather implementation exactly for interior keypoints
    (>= patch//2 from the border); at the border 'conv' keeps the window
    centered (zero-padded) while 'gather' shifts it inward."""
    B, H, W, K, r = 2, 48, 64, 32, 2
    hm = jnp.asarray(rng.rand(B, H, W).astype(np.float32))
    kp = topk_keypoints(nms_heatmap(hm, 4), K, conf_thresh=1e-4)
    kg = soft_argmax_refine(hm, kp, patch_size=5, impl="gather")
    kc = soft_argmax_refine(hm, kp, patch_size=5, impl="conv")
    km = soft_argmax_refine(hm, kp, patch_size=5, impl="matmul")
    # 'matmul' (the default) and 'conv' are the same centered-window math
    # on ALL keypoints, border included.
    np.testing.assert_allclose(
        np.asarray(km.offsets), np.asarray(kc.offsets), atol=1e-5
    )
    xy = np.asarray(kp.xy)
    interior = (
        (xy[..., 0] >= r) & (xy[..., 0] < W - r)
        & (xy[..., 1] >= r) & (xy[..., 1] < H - r)
        & np.asarray(kp.valid)
    )
    assert interior.sum() > K  # the scenario exercises the comparison
    np.testing.assert_allclose(
        np.asarray(kg.offsets)[interior], np.asarray(kc.offsets)[interior],
        atol=1e-5,
    )
    # All implementations carry heatmap gradients.
    for impl in ("gather", "conv", "matmul"):
        g = jax.grad(
            lambda h: jnp.sum(
                soft_argmax_refine(h, kp, patch_size=5, impl=impl).offsets
                ** 2
            )
        )(hm)
        assert float(jnp.max(jnp.abs(g))) > 0, impl


def test_sample_descriptors_matches_bilinear_oracle(rng):
    """The separable two-hot einsum formulation (matmul fwd/bwd, no
    scatters — the round-3 joint-backward fix) must equal a per-point
    numpy bilinear oracle."""
    B, Hc, Wc, D, K = 2, 6, 8, 16, 24
    dm = rng.randn(B, Hc, Wc, D).astype(np.float32)
    xy = np.stack(
        [rng.rand(B, K) * (Wc * 8 - 1), rng.rand(B, K) * (Hc * 8 - 1)], -1
    ).astype(np.float32)
    d_new = np.asarray(sample_descriptors(jnp.asarray(dm), jnp.asarray(xy)))

    for b in range(B):
        for k in range(K):
            gx, gy = xy[b, k, 0] / 8 - 0.5, xy[b, k, 1] / 8 - 0.5
            x0 = int(np.clip(np.floor(gx), 0, Wc - 2))
            y0 = int(np.clip(np.floor(gy), 0, Hc - 2))
            fx = np.clip(gx - x0, 0, 1)
            fy = np.clip(gy - y0, 0, 1)
            d = (
                dm[b, y0, x0] * (1 - fx) * (1 - fy)
                + dm[b, y0, x0 + 1] * fx * (1 - fy)
                + dm[b, y0 + 1, x0] * (1 - fx) * fy
                + dm[b, y0 + 1, x0 + 1] * fx * fy
            )
            d = d / (np.linalg.norm(d) + 1e-10)
            np.testing.assert_allclose(d_new[b, k], d, atol=1e-5)

    # Gradients flow to both the dense map and the (subpixel) coords.
    g_map, g_xy = jax.grad(
        lambda m, x: jnp.sum(sample_descriptors(m, x) ** 2), argnums=(0, 1)
    )(jnp.asarray(dm), jnp.asarray(xy))
    assert np.any(np.asarray(g_map) != 0)
    assert np.any(np.asarray(g_xy) != 0)
