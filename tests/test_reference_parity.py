"""Cross-implementation parity vs the LIVE torch reference (VERDICT item 1).

Identical inputs (and, for the full model, identical imported weights) are
fed through the reference implementation at /root/reference — executed, not
copied — and through this package, asserting F/loss/gradient agreement.

Everything runs in float64 on CPU so agreement is limited only by genuine
algorithmic differences, not float noise. Known, documented deviations:
- the reference's Hartley scale constant is the literal `1.4142`
  (DeepFNet.py:167) vs our exact sqrt(2) — a 1.3e-5 relative difference
  in the normalizing transform, which bounds achievable F agreement at
  ~1e-4 relative rather than machine precision;
- the null-vector sign is eigensolver-arbitrary in both implementations;
  comparisons canonicalize it identically on both sides
  (ops.weighted_eight_point(sign_canonical=True) and CanonFit below).

Measured tolerances are recorded in PARITY.md §"Measured cross-
implementation tolerances".
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import synthetic_pair

from _reference_oracle import load_reference

from deepfepe_tpu.geometry.epipolar import (
    compute_epi_residual,
    normalize_hw,
)
from deepfepe_tpu.losses.f_loss import f_loss
from deepfepe_tpu.losses.rt_loss import rt_loss
from deepfepe_tpu.ops.fmatrix import weighted_eight_point

H, W = 376, 1241


# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------

def _make_batch(seed, B=4, N=128, noise=0.5, outlier_frac=0.2, n_virt=64):
    """Synthetic correspondence batch + gt-consistent virtual points."""
    rng = np.random.RandomState(seed)
    xs1, xs2, v1, v2, Ks, rels = [], [], [], [], [], []
    for _ in range(B):
        d = synthetic_pair(
            rng, n=N + n_virt, noise=noise, outlier_frac=outlier_frac,
            H=H, W=W,
        )
        xs1.append(d["x1"][:N])
        xs2.append(d["x2"][:N])
        # Exact (pre-noise) correspondences are regenerated for virt points:
        # re-project the tail 3D points exactly.
        X1 = d["X1"][N:]
        X2 = X1 @ d["R"].T + d["t"]
        p1 = (X1 / X1[:, 2:3]) @ d["K"].T
        p2 = (X2 / X2[:, 2:3]) @ d["K"].T
        v1.append(p1[:, :2])
        v2.append(p2[:, :2])
        Ks.append(d["K"])
        rel = np.eye(4)
        rel[:3, :3], rel[:3, 3] = d["R"], d["t"]
        rels.append(rel)
    matches = np.concatenate(
        [np.stack(xs1), np.stack(xs2)], axis=-1
    ).astype(np.float64)  # [B, N, 4]
    homo = lambda p: np.concatenate(
        [p, np.ones(p.shape[:-1] + (1,))], axis=-1
    )
    return dict(
        matches=matches,
        virt1=homo(np.stack(v1)),
        virt2=homo(np.stack(v2)),
        Ks=np.stack(Ks),
        delta_Rtijs=np.stack(rels),
    )


def _hw_normalized(matches):
    """[B, N, 4] pixels -> homogeneous HW-normalized pts1/pts2 (numpy)."""
    m = jnp.asarray(matches)
    pts1, T1 = normalize_hw(m[..., :2], (H, W))
    pts2, T2 = normalize_hw(m[..., 2:4], (H, W))
    return (np.asarray(pts1), np.asarray(pts2),
            np.asarray(T1), np.asarray(T2))


def _canon_sign(F, residual):
    """Numpy sign canonicalization matching ops.weighted_eight_point."""
    idx = np.argmax(np.abs(residual), axis=-1)
    r = np.take_along_axis(residual, idx[..., None], axis=-1)[..., 0]
    s = np.where(r >= 0, 1.0, -1.0)
    return F * s[..., None, None], residual * s[..., None]


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _fit64(ref):
    """Reference Fit with its (hard-coded .float()) buffers cast to f64."""
    fit = ref.Fit(is_cuda=False, is_test=False, if_cpu_svd=False)
    fit.T_b = fit.T_b.double()
    fit.ones_b = fit.ones_b.double()
    fit.zero_b = fit.zero_b.double()
    fit.mask = fit.mask.double()
    return fit


@pytest.fixture(scope="module", autouse=True)
def _torch_f64():
    old = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(old)


# ----------------------------------------------------------------------
# (a) Fit.weighted_svd vs ops.weighted_eight_point
# ----------------------------------------------------------------------

def test_fit_value_parity(ref):
    b = _make_batch(0)
    pts1, pts2, _, _ = _hw_normalized(b["matches"])
    B, N = pts1.shape[:2]
    rng = np.random.RandomState(1)
    w = np.exp(rng.randn(B, N))
    w = (w / w.sum(-1, keepdims=True)).astype(np.float64)

    fit = _fit64(ref)
    F_t, res_t = fit(
        torch.tensor(pts1), torch.tensor(pts2),
        torch.tensor(w).unsqueeze(1),
    )
    F_t, res_t = F_t.detach().numpy(), res_t.detach().numpy()

    ours = weighted_eight_point(
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(w)
    )
    F_j, res_j = np.asarray(ours.F), np.asarray(ours.residual)

    # Normalize scale+sign per item (F defined up to scale; the reference's
    # F carries the unit-f-vec scale which differs from ours only via the
    # 1.4142-vs-sqrt(2) constant).
    def canon(F):
        F = F / np.linalg.norm(F, axis=(-2, -1), keepdims=True)
        idx = np.argmax(np.abs(F).reshape(F.shape[0], -1), axis=-1)
        s = np.sign(
            np.take_along_axis(F.reshape(F.shape[0], -1), idx[:, None], 1)
        )[:, 0]
        return F * s[:, None, None]

    err_F = np.abs(canon(F_t) - canon(F_j)).max()
    assert err_F < 5e-5, err_F  # measured 2025-08: ~1e-6

    # Residuals: X@f with f unit in both; sign per item arbitrary.
    flip = np.sign(np.sum(res_t * res_j, axis=-1))
    err_r = np.abs(res_t - flip[:, None] * res_j).max()
    assert err_r < 5e-5, err_r


def test_fit_gradient_parity(ref):
    """d(mean clamped epi residual of F on virtual pts)/d weights."""
    b = _make_batch(2)
    pts1, pts2, T1, T2 = _hw_normalized(b["matches"])
    v1 = np.einsum("bij,bnj->bni", T1, b["virt1"])
    v2 = np.einsum("bij,bnj->bni", T2, b["virt2"])
    B, N = pts1.shape[:2]
    rng = np.random.RandomState(3)
    w0 = np.exp(rng.randn(B, N))
    w0 = (w0 / w0.sum(-1, keepdims=True)).astype(np.float64)

    # torch
    fit = _fit64(ref)
    w_t = torch.tensor(w0, requires_grad=True)
    F_t, _ = fit(torch.tensor(pts1), torch.tensor(pts2), w_t.unsqueeze(1))
    loss_t = ref.utils_F.compute_epi_residual(
        torch.tensor(v1), torch.tensor(v2), F_t, 0.5
    ).mean()
    loss_t.backward()
    g_t = w_t.grad.numpy()

    # jax
    def loss_fn(w):
        out = weighted_eight_point(
            jnp.asarray(pts1), jnp.asarray(pts2), w, gap_eps=1e-14
        )
        return jnp.mean(
            compute_epi_residual(
                jnp.asarray(v1), jnp.asarray(v2), out.F, clamp_at=0.5
            )
        )

    loss_j, g_j = jax.value_and_grad(loss_fn)(jnp.asarray(w0))

    assert abs(float(loss_j) - float(loss_t)) < 1e-6
    scale = np.abs(g_t).max()
    err = np.abs(g_t - np.asarray(g_j)).max() / scale
    assert err < 1e-4, err  # measured: ~1e-7 relative


# ----------------------------------------------------------------------
# (b) get_all_loss_DeepF vs losses.f_loss
# ----------------------------------------------------------------------

def _forward_ours(params, model, batch_np):
    db = {
        "matches_xy_ori": jnp.asarray(batch_np["matches"]),
        "matches_good_unique_nums": jnp.full(
            (batch_np["matches"].shape[0],), batch_np["matches"].shape[1]
        ),
    }
    return model.apply(params, db)


def test_f_loss_parity(ref):
    """Identical `outs` through get_all_loss_DeepF and losses.f_loss."""
    b = _make_batch(4)
    depth, B = 3, b["matches"].shape[0]
    pts1, pts2, T1, T2 = _hw_normalized(b["matches"])
    rng = np.random.RandomState(5)
    N = pts1.shape[1]

    # Layer outputs from real fits under random weight profiles.
    out_layers, res_layers, w_layers, epi_layers = [], [], [], []
    for l in range(depth):
        w = np.exp(rng.randn(B, N))
        w = w / w.sum(-1, keepdims=True)
        f = weighted_eight_point(
            jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(w),
            sign_canonical=True,
        )
        out_layers.append(np.asarray(f.F))
        res_layers.append(np.asarray(f.residual))
        w_layers.append(w)
        if l < depth - 1:
            epi_layers.append(
                np.asarray(
                    compute_epi_residual(
                        jnp.asarray(pts1), jnp.asarray(pts2), f.F
                    )
                )
            )

    tt = torch.tensor
    outs_t = {
        "weights": tt(w_layers[-1]).unsqueeze(1),
        "F_est": tt(out_layers[-1]),
        "T1": tt(T1),
        "T2": tt(T2),
        "out_layers": [tt(o) for o in out_layers],
        "residual_layers": [tt(r) for r in res_layers],
        "weights_layers": [tt(w).unsqueeze(1) for w in w_layers],
        "epi_res_layers": [tt(e).unsqueeze(1) for e in epi_layers],
    }
    loss_params = {
        "depth": depth,
        "clamp_at": 0.02,
        "if_tri_depth": False,
        "if_sample_loss": False,
    }
    (losses_t, E_ests_t, F_ests_t, _, _, _, E_layers_t) = (
        ref.tgu.get_all_loss_DeepF(
            outs_t, tt(b["virt1"]), tt(b["virt2"]), tt(b["Ks"]),
            loss_params, get_residual_summaries=False,
        )
    )

    outs_j = {
        "T1": jnp.asarray(T1),
        "T2": jnp.asarray(T2),
        "F_est": jnp.asarray(out_layers[-1]),
        "out_layers": jnp.stack([jnp.asarray(o) for o in out_layers]),
        "epi_res_layers": jnp.stack([jnp.asarray(e) for e in epi_layers]),
        "weights_layers": jnp.stack([jnp.asarray(w) for w in w_layers]),
    }
    ld = f_loss(
        outs_j, jnp.asarray(b["virt1"]), jnp.asarray(b["virt2"]),
        jnp.asarray(b["Ks"]), clamp_at=0.02,
    )

    assert abs(float(ld["loss_F"]) - float(losses_t["loss_F"])) < 1e-10
    for l in range(depth):
        assert (
            abs(float(ld["loss_layers"][l]) - float(losses_t["loss_layers"][l]))
            < 1e-10
        )
    np.testing.assert_allclose(
        np.asarray(ld["loss_min_batch"]),
        losses_t["loss_min_batch"].detach().numpy(),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(ld["E_ests"]), E_ests_t.detach().numpy(),
        rtol=0, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(ld["E_ests_layers"]),
        np.stack([E.detach().numpy() for E in E_layers_t]),
        rtol=0, atol=1e-8,
    )
    assert (
        abs(float(ld["loss_epi_res"]) - float(losses_t["loss_epi_res"]))
        < 1e-10
    )


# ----------------------------------------------------------------------
# (c) get_Rt_loss vs losses.rt_loss
# ----------------------------------------------------------------------

def test_rt_loss_parity(ref):
    b = _make_batch(6)
    B = b["Ks"].shape[0]
    depth = 3
    rng = np.random.RandomState(7)

    # Per-layer estimates: exact essential matrices (layer 0: the two
    # decomposition routes — reference SVD U W Vt vs our closed form —
    # agree to machine eps ON the manifold) plus perturbed layers (off
    # the manifold they differ at O(perturbation), a designed deviation:
    # our closed form keeps gradients finite at the (s, s, 0) spectrum
    # where torch's svd-backward is 1/(s1^2-s2^2) = inf).
    pert = [0.0, 1e-3, 0.05]
    rels = b["delta_Rtijs"]
    E_layers = []
    for l in range(depth):
        Es = []
        for bb in range(B):
            R, t = rels[bb, :3, :3], rels[bb, :3, 3]
            tx = np.array(
                [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
            )
            E = tx @ R
            E = E / np.linalg.norm(E)
            E = E + rng.randn(3, 3) * pert[l]
            Es.append(E)
        E_layers.append(np.stack(Es))

    # gt q/t of the INVERSE relative pose (the reference convention:
    # qs_cam/ts_cam in the sample dict, get_Rt_loss docstring).
    rel_inv = np.linalg.inv(rels)
    qs, ts = [], []
    for bb in range(B):
        qs.append(
            ref.utils_geo._R_to_q(torch.tensor(rel_inv[bb, :3, :3])).numpy()
        )
        ts.append(rel_inv[bb, :3, 3])
    qs, ts = np.stack(qs).reshape(B, 4), np.stack(ts)

    out_t = ref.tgu.get_Rt_loss(
        [torch.tensor(E) for E in E_layers],
        torch.tensor(b["Ks"]),
        torch.tensor(b["matches"][..., :2]),
        torch.tensor(b["matches"][..., 2:]),
        torch.tensor(rels),
        torch.tensor(qs)[..., None],
        torch.tensor(ts)[..., None],
        device="cpu",
    )

    out_j = rt_loss(
        jnp.stack([jnp.asarray(E) for E in E_layers]),
        jnp.asarray(qs),
        jnp.asarray(ts),
        jnp.asarray(rel_inv[:, :3, :3]),
        decomp_gap_eps=1e-14,
    )

    q_l2_t = np.stack(
        [q.detach().numpy() for q in out_t["q_l2_error_layers_list"]]
    )
    t_l2_t = np.stack(
        [t.detach().numpy() for t in out_t["t_l2_error_layers_list"]]
    )
    q_l2_j = np.asarray(out_j["q_l2_layers"])
    t_l2_j = np.asarray(out_j["t_l2_layers"])
    R_ang_t = np.stack(out_t["R_angle_error_layers_list"])
    t_ang_t = np.stack(out_t["t_angle_error_layers_list"])
    R_ang_j = np.asarray(out_j["R_angle_error_layers"])
    # t: the routes agree at machine eps at ANY perturbation (t = left null
    # vector in both). q/R: exact on the manifold, O(pert) off it
    # (measured: 5e-4 @ pert 1e-3, 2e-2 @ pert 0.05).
    np.testing.assert_allclose(t_l2_j, t_l2_t, rtol=0, atol=1e-9)
    # 1e-3 deg: the reference's acos(clip(dot, -1, 1)) snaps to exactly 0
    # where our atan2(|cross|, dot) resolves ~1e-4 deg.
    np.testing.assert_allclose(
        np.asarray(out_j["t_angle_error_layers"]), t_ang_t, atol=1e-3
    )
    for l, p_ in enumerate(pert):
        tol_q = 1e-9 + 2.0 * p_
        tol_ang = 1e-3 + 120.0 * p_  # degrees (1e-3: acos-clip snap, see above)
        np.testing.assert_allclose(
            q_l2_j[l], q_l2_t[l], rtol=0, atol=tol_q
        )
        np.testing.assert_allclose(
            R_ang_j[l], R_ang_t[l], rtol=0, atol=tol_ang
        )


def test_rt_loss_gradient_parity(ref):
    """dq_l2/dE and dt_l2/dE agree with torch autograd through svd."""
    b = _make_batch(8, B=3)
    B = b["Ks"].shape[0]
    rng = np.random.RandomState(9)
    rels = b["delta_Rtijs"]
    Es = []
    for bb in range(B):
        R, t = rels[bb, :3, :3], rels[bb, :3, 3]
        tx = np.array(
            [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
        )
        E = tx @ R
        # Perturb away from the exact (s, s, 0) spectrum so torch's
        # autograd-through-svd is well-defined.
        Es.append(E / np.linalg.norm(E) + rng.randn(3, 3) * 0.03)
    E0 = np.stack(Es)

    rel_inv = np.linalg.inv(rels)
    qs = np.stack(
        [
            ref.utils_geo._R_to_q(torch.tensor(rel_inv[bb, :3, :3]))
            .numpy()
            .reshape(4)
            for bb in range(B)
        ]
    )
    ts = rel_inv[:, :3, 3]

    E_t = torch.tensor(E0, requires_grad=True)
    out_t = ref.tgu.get_Rt_loss(
        [E_t],
        torch.tensor(b["Ks"]),
        torch.tensor(b["matches"][..., :2]),
        torch.tensor(b["matches"][..., 2:]),
        torch.tensor(rels),
        torch.tensor(qs)[..., None],
        torch.tensor(ts)[..., None],
        device="cpu",
    )
    out_t["t_l2_error_mean"].backward(retain_graph=True)
    g_t_t = E_t.grad.numpy().copy()
    E_t.grad = None
    out_t["q_l2_error_mean"].backward()
    g_q_t = E_t.grad.numpy().copy()

    def loss_parts(E):
        o = rt_loss(
            E[None], jnp.asarray(qs), jnp.asarray(ts),
            jnp.asarray(rel_inv[:, :3, :3]), decomp_gap_eps=1e-14,
        )
        return o["t_l2_error_mean"], o["q_l2_error_mean"]

    g_t_j = np.asarray(jax.grad(lambda E: loss_parts(E)[0])(jnp.asarray(E0)))
    g_q_j = np.asarray(jax.grad(lambda E: loss_parts(E)[1])(jnp.asarray(E0)))

    # t-gradient: both implementations compute the identical map (left null
    # vector of E), so autograd-through-svd and our closed-form VJP must
    # agree tightly.
    err_t = np.abs(g_t_t - g_t_j).max() / np.abs(g_t_t).max()
    assert err_t < 1e-6, err_t  # measured: ~1e-10 relative

    # q-gradient: the two decomposition maps agree on the essential
    # manifold but differ transverse to it, so their Jacobians differ at
    # O(1) in the transverse directions. Assert strong directional
    # agreement (the descent directions coincide), not elementwise match.
    cos = float(
        np.sum(g_q_t * g_q_j)
        / (np.linalg.norm(g_q_t) * np.linalg.norm(g_q_j))
    )
    # Measured: ~0.87. The remaining angle is the transverse-Jacobian
    # deviation plus torch's 1/(s1^2-s2^2) svd-backward amplification near
    # the (s, s, 0) spectrum — the very term our closed form regularizes.
    assert cos > 0.8, cos


# ----------------------------------------------------------------------
# (d) full DeepFNet forward/backward with identical imported weights
# ----------------------------------------------------------------------

def _canon_fit_cls(ref):
    """Reference Fit with the null-vector sign canonicalized like
    ops.weighted_eight_point(sign_canonical=True) — the sign is
    eigensolver-arbitrary, and the signed residual feeds the recurrence."""

    class CanonFit(ref.Fit):
        def forward(self, pts1, pts2, weights, if_print=False,
                    matches_good_unique_num=None):
            out, residual = self.weighted_svd(pts1, pts2, weights)
            idx = residual.abs().argmax(dim=1, keepdim=True)
            r = residual.gather(1, idx).squeeze(1)
            s = torch.where(r >= 0.0, 1.0, -1.0).detach()
            return out * s[:, None, None], residual * s[:, None]

    return CanonFit


def _ref_deepf(ref, depth):
    torch.manual_seed(0)  # deterministic MLP init -> deterministic tolerances
    net = ref.DeepFNet(
        depth=depth, image_size=[H, W, 3], if_quality=False,
        is_cuda=False, is_test=False, if_cpu_svd=False,
    )
    fit = _canon_fit_cls(ref)(
        is_cuda=False, is_test=False, if_cpu_svd=False
    )
    fit.T_b = fit.T_b.double()
    fit.ones_b = fit.ones_b.double()
    fit.zero_b = fit.zero_b.double()
    fit.mask = fit.mask.double()
    net.fit = fit
    return net


def _ours_from_ref(ref_net, depth):
    from deepfepe_tpu.models import DeepFNet
    from deepfepe_tpu.utils.torch_import import convert_deepf_state

    variables = convert_deepf_state(
        {k: v for k, v in ref_net.state_dict().items()}
    )
    model = DeepFNet(
        depth=depth, image_size=(H, W), mlp_dtype=jnp.float64,
        sign_canonical=True,
    )
    return model, variables


def _torch_batch(b):
    B, N = b["matches"].shape[:2]
    return {
        "matches_xy_ori": torch.tensor(b["matches"]),
        "matches_good_unique_nums": torch.full((B,), N, dtype=torch.long),
        "t_scene_scale": torch.ones(B, 1),
    }


def _jax_batch(b):
    B, N = b["matches"].shape[:2]
    return {
        "matches_xy_ori": jnp.asarray(b["matches"]),
        "matches_good_unique_nums": jnp.full((B,), N),
        "t_scene_scale": jnp.ones((B, 1)),
    }


def test_full_forward_parity(ref):
    """Identical weights + identical batch -> layer-by-layer agreement of
    the full depth-3 recurrence (weights, logits, F per layer)."""
    depth = 3
    b = _make_batch(10)
    net_t = _ref_deepf(ref, depth)
    model, variables = _ours_from_ref(net_t, depth)

    with torch.no_grad():
        preds_t = net_t(_torch_batch(b))
    preds_j = model.apply(variables, _jax_batch(b))

    w_t = np.stack(
        [w.squeeze(1).numpy() for w in preds_t["weights_layers"]]
    )
    w_j = np.asarray(preds_j["weights_layers"])
    err_w = np.abs(w_t - w_j).max()
    assert err_w < 1e-4, err_w  # measured ~3e-6..3e-5 (the 1.4142 constant)

    l_t = np.stack(
        [l.squeeze(1).numpy() for l in preds_t["logits_layers"]]
    )
    l_j = np.asarray(preds_j["logits_layers"])
    err_l = np.abs(l_t - l_j).max()
    assert err_l < 1e-3, err_l  # measured 2.3e-4 abs (logits are O(10))

    F_t = np.stack([o.numpy() for o in preds_t["out_layers"]])
    F_j = np.asarray(preds_j["out_layers"])
    scale = np.abs(F_t).max()
    err_F = np.abs(F_t - F_j).max() / scale
    assert err_F < 1e-4, err_F  # bounded by the 1.4142-vs-sqrt(2) constant

    res_t = np.stack([r.numpy() for r in preds_t["residual_layers"]])
    res_j = np.asarray(preds_j["residual_layers"])
    assert np.abs(res_t - res_j).max() < 1e-5


@pytest.mark.slow
def test_full_backward_parity(ref):
    """d loss_F / d MLP params agree between the implementations."""
    depth = 3
    b = _make_batch(11)
    net_t = _ref_deepf(ref, depth)
    model, variables = _ours_from_ref(net_t, depth)

    loss_params = {
        "depth": depth, "clamp_at": 0.02,
        "if_tri_depth": False, "if_sample_loss": False,
    }
    tt = torch.tensor
    preds_t = net_t(_torch_batch(b))
    outs_t = dict(preds_t)
    outs_t["weights"] = preds_t["weights_layers"][-1]
    losses_t = ref.tgu.get_all_loss_DeepF(
        outs_t, tt(b["virt1"]), tt(b["virt2"]), tt(b["Ks"]),
        loss_params, get_residual_summaries=False,
    )[0]
    losses_t["loss_F"].backward()
    g_t = {
        n: p.grad.numpy().copy()
        for n, p in net_t.named_parameters() if p.grad is not None
    }

    def loss_fn(params):
        preds = model.apply({"params": params}, _jax_batch(b))
        ld = f_loss(
            preds, jnp.asarray(b["virt1"]), jnp.asarray(b["virt2"]),
            jnp.asarray(b["Ks"]), clamp_at=0.02,
        )
        return ld["loss_F"]

    loss_j, g_j = jax.value_and_grad(loss_fn)(variables["params"])

    assert abs(float(loss_j) - float(losses_t["loss_F"])) < 1e-6  # measured 7e-8

    # Elementwise full-model gradient parity is mathematically
    # unattainable: the loss surface curvature is ~1/eigengap (~1e4 at
    # these shapes, measured), so the reference's 1.4142-vs-sqrt(2) offset
    # (a ~1e-5 effective parameter shift) moves the local gradient by a
    # few percent — both autograds match their OWN finite differences to
    # <1e-4 (verified while building this test). Assert what is
    # well-defined: strong directional agreement and matched magnitude of
    # every conv-kernel gradient.
    checked = 0
    for net_name in ("input_weights", "update_weights"):
        pj = g_j[net_name]
        for torch_key, gt3 in g_t.items():
            if not torch_key.startswith(net_name + ".fw."):
                continue
            ci = int(torch_key.split(".")[2])
            if not (torch_key.endswith("weight") and gt3.ndim == 3):
                continue
            li = {0: 0, 3: 1, 6: 2, 9: 3, 12: 4, 15: 5}[ci]
            gt = gt3[:, :, 0]
            gj = np.asarray(pj[f"Dense_{li}"]["kernel"]).T
            cos = float(
                np.sum(gt * gj)
                / (np.linalg.norm(gt) * np.linalg.norm(gj) + 1e-30)
            )
            ratio = float(
                np.linalg.norm(gj) / (np.linalg.norm(gt) + 1e-30)
            )
            # measured: cos >= 0.989, ratio in [0.94, 1.01]
            assert cos > 0.97, (torch_key, cos)
            assert 0.8 < ratio < 1.25, (torch_key, ratio)
            checked += 1
    assert checked == 12  # 6 conv kernels per MLP


@pytest.mark.slow
def test_co_training_parity(ref):
    """Short co-training: same init, same batches, same Adam — the loss
    trajectories must track (measured drift < 1e-3 relative by iter 10)."""
    import optax

    depth = 3
    b = _make_batch(12)
    net_t = _ref_deepf(ref, depth)
    model, variables = _ours_from_ref(net_t, depth)
    params = variables["params"]

    loss_params = {
        "depth": depth, "clamp_at": 0.02,
        "if_tri_depth": False, "if_sample_loss": False,
    }
    lr = 1e-4
    opt_t = torch.optim.Adam(net_t.parameters(), lr=lr, eps=1e-8)
    tx = optax.adam(lr, eps=1e-8)
    opt_state = tx.init(params)
    tt = torch.tensor

    def loss_fn(params):
        preds = model.apply({"params": params}, _jax_batch(b))
        ld = f_loss(
            preds, jnp.asarray(b["virt1"]), jnp.asarray(b["virt2"]),
            jnp.asarray(b["Ks"]), clamp_at=0.02,
        )
        return ld["loss_F"]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    traj_t, traj_j = [], []
    for it in range(10):
        opt_t.zero_grad()
        preds_t = net_t(_torch_batch(b))
        outs_t = dict(preds_t)
        outs_t["weights"] = preds_t["weights_layers"][-1]
        lt = ref.tgu.get_all_loss_DeepF(
            outs_t, tt(b["virt1"]), tt(b["virt2"]), tt(b["Ks"]),
            loss_params, get_residual_summaries=False,
        )[0]["loss_F"]
        lt.backward()
        opt_t.step()
        traj_t.append(float(lt))

        lj, g = grad_fn(params)
        upd, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, upd)
        traj_j.append(float(lj))

    traj_t, traj_j = np.array(traj_t), np.array(traj_j)
    # The optimizer actually moved the loss away from its start...
    assert np.abs(traj_t - traj_t[0]).max() > 1e-8
    # ...and the two trajectories start identical and track each other.
    # Exact long-horizon tracking is impossible (gradients agree in
    # direction, not elementwise — see test_full_backward_parity), so the
    # honest assertion is a bounded drift rate.
    rel = np.abs(traj_t - traj_j) / np.abs(traj_t)
    assert rel[0] < 1e-4, rel[0]  # measured 4.5e-6
    assert rel.max() < 0.1, rel


# ----------------------------------------------------------------------
# (e) sample-loss variant: Fit.weighted_svd_batch / topK selection
# ----------------------------------------------------------------------

def test_sample_loss_fit_parity(ref):
    """DeepFNetSampleLoss.Fit (topK + batched subset fits) vs
    models.sample_fit on identical inputs: the top-K fit and the
    batched-subset solve agree; the reference's overflowing product score
    equals our log-space softmax wherever it doesn't overflow."""
    from _reference_oracle import load_sample_loss_fit

    from deepfepe_tpu.models.sample_fit import sample_loss_fits
    from deepfepe_tpu.ops.fmatrix import weighted_eight_point

    SampleFit = load_sample_loss_fit()
    fit_t = SampleFit(is_cuda=False, is_test=False, if_cpu_svd=False)
    fit_t.T_b = fit_t.T_b.double()
    fit_t.ones_b = fit_t.ones_b.double()
    fit_t.zero_b = fit_t.zero_b.double()
    fit_t.mask = fit_t.mask.double()
    fit_t.mask_cpu = fit_t.mask.clone()

    b = _make_batch(14, B=3, N=96)
    pts1, pts2, _, _ = _hw_normalized(b["matches"])
    B, N = pts1.shape[:2]
    rng = np.random.RandomState(15)
    w = np.exp(rng.randn(B, N)).astype(np.float64)
    w = w / w.sum(-1, keepdims=True)
    unique = np.full((B,), N, np.int64)

    np.random.seed(0)  # the reference samples with the global numpy rng
    out_t = fit_t(
        torch.tensor(pts1), torch.tensor(pts2),
        torch.tensor(w).unsqueeze(1),
        matches_good_unique_nums=torch.tensor(unique),
    )

    sf = sample_loss_fits(
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(w),
        jnp.asarray(unique), jax.random.PRNGKey(0), topk=20, selects=16,
    )

    def canon(F):
        F = np.asarray(F, np.float64)
        F = F / np.linalg.norm(F, axis=(-2, -1), keepdims=True)
        flat = F.reshape(F.shape[:-2] + (9,))
        idx = np.argmax(np.abs(flat), axis=-1)
        s = np.sign(
            np.take_along_axis(flat, idx[..., None], -1)
        )[..., 0]
        return F * s[..., None, None]

    # (1) top-K fit parity (deterministic: same top-20 unique weights).
    # 20-point fits are worse-conditioned than the N=128 full fit, so the
    # reference's 1.4142-vs-sqrt(2) constant shows up at ~1e-4 here.
    np.testing.assert_allclose(
        canon(out_t["out_topK"].detach().numpy()),
        canon(np.asarray(sf["F_topK"])),
        atol=5e-4,
    )

    # (2) the batched-subset SOLVER: run the reference's
    # weighted_svd_batch on OUR sampled subsets and compare F matrices.
    idx = np.asarray(sf["sample_idx"])  # [B, S, K]
    S, K = idx.shape[1:]
    g = lambda pts: np.take_along_axis(
        pts[:, None], idx[..., None], axis=-2
    ).reshape(B * S, K, 3)
    w_sel = np.take_along_axis(w[:, None], idx, axis=-1).reshape(B * S, K)
    F_t, _ = fit_t.weighted_svd_batch(
        torch.tensor(g(pts1)), torch.tensor(g(pts2)),
        torch.tensor(w_sel).unsqueeze(1),
    )
    np.testing.assert_allclose(
        canon(F_t.detach().numpy().reshape(B, S, 3, 3)),
        canon(np.asarray(sf["F_samples"])),
        atol=2e-3,  # weight-proportional 20-subsets can be near-degenerate
    )

    # (3) score formula: prod(w*1000)/sum == softmax(sum log w) when the
    # product does not overflow (the reference's f32 overflow at
    # concentrated weights is the documented bug our log-space form
    # fixes — ops fixed round 1).
    w_t = torch.tensor(w_sel.reshape(B, S, K))
    prod = torch.prod(w_t * 1000.0, dim=2)
    score_ref = (prod / (prod.sum(dim=1, keepdim=True) + 1e-10)).numpy()
    np.testing.assert_allclose(
        np.asarray(sf["sample_scores"]), score_ref, atol=1e-6
    )


@pytest.mark.slow
def test_co_training_parity_long(ref):
    """300-step co-training (VERDICT r2 next-step #6): same init, same
    rotating batches, same Adam, f64 both sides. Ten steps bound almost
    nothing about accumulation; here we track (a) the loss trajectories
    and (b) the pose-error trajectories of the two TRAINED MODELS on a
    held-out batch (scored by one shared metric implementation), and
    assert bounded divergence across the full horizon. Measured drift
    recorded in PARITY.md §co-training.
    """
    import optax

    from deepfepe_tpu.geometry.decompose import recover_pose
    from deepfepe_tpu.geometry.epipolar import F_to_E
    from deepfepe_tpu.geometry.rotations import (
        rotation_angle_error,
        vector_angle,
    )

    depth = 2
    n_steps = 300
    batches = [_make_batch(40 + i, B=4, N=128) for i in range(4)]
    held = _make_batch(99, B=8, N=128)

    net_t = _ref_deepf(ref, depth)
    model, variables = _ours_from_ref(net_t, depth)
    params = variables["params"]

    loss_params = {
        "depth": depth, "clamp_at": 0.02,
        "if_tri_depth": False, "if_sample_loss": False,
    }
    lr = 1e-4
    opt_t = torch.optim.Adam(net_t.parameters(), lr=lr, eps=1e-8)
    tx = optax.adam(lr, eps=1e-8)
    opt_state = tx.init(params)
    tt = torch.tensor

    jb = [_jax_batch(b) for b in batches]
    tb = [_torch_batch(b) for b in batches]

    def loss_fn(params, b_idx):
        b = batches[b_idx]
        preds = model.apply({"params": params}, jb[b_idx])
        ld = f_loss(
            preds, jnp.asarray(b["virt1"]), jnp.asarray(b["virt2"]),
            jnp.asarray(b["Ks"]), clamp_at=0.02,
        )
        return ld["loss_F"]

    grad_fns = [
        jax.jit(jax.value_and_grad(lambda p, i=i: loss_fn(p, i)))
        for i in range(len(batches))
    ]

    def eval_errs_torch():
        with torch.no_grad():
            preds = net_t(_torch_batch(held))
        T1, T2, F = preds["T1"], preds["T2"], preds["F_est"]
        F_pix = T2.transpose(1, 2) @ F @ T1
        return np.asarray(F_pix)

    def eval_errs_jax(params):
        preds = model.apply({"params": params}, _jax_batch(held))
        F_pix = (
            jnp.swapaxes(preds["T2"], -1, -2) @ preds["F_est"] @ preds["T1"]
        )
        return np.asarray(F_pix)

    def pose_errors(F_pix):
        """Shared metric: decompose with OUR machinery for both models."""
        K = jnp.asarray(held["Ks"])
        E = F_to_E(jnp.asarray(F_pix), K)
        m = held["matches"]
        K_inv = np.linalg.inv(held["Ks"])
        homo = lambda x: np.concatenate(
            [x, np.ones(x.shape[:-1] + (1,))], -1
        )
        x1n = homo(m[..., :2]) @ np.swapaxes(K_inv, -1, -2)
        x2n = homo(m[..., 2:4]) @ np.swapaxes(K_inv, -1, -2)
        rec = recover_pose(E, jnp.asarray(x1n), jnp.asarray(x2n))
        gt = np.linalg.inv(held["delta_Rtijs"])
        # est i->j pose, inverted (cam convention), vs inverse gt.
        Rt = np.concatenate(
            [np.asarray(rec.R), np.asarray(rec.t)[..., None]], -1
        )
        R_cam = np.swapaxes(Rt[..., :3, :3], -1, -2)
        t_cam = -np.einsum("bij,bj->bi", R_cam, Rt[..., :3, 3])
        eq = np.asarray(
            rotation_angle_error(jnp.asarray(R_cam),
                                 jnp.asarray(gt[:, :3, :3]))
        )
        et = np.asarray(
            vector_angle(jnp.asarray(t_cam), jnp.asarray(gt[:, :3, 3]))
        )
        et = np.minimum(et, 180.0 - et)
        return np.median(eq), np.median(et)

    loss_t, loss_j, err_drift = [], [], []
    for it in range(n_steps):
        bi = it % len(batches)
        b = batches[bi]
        opt_t.zero_grad()
        preds_t = net_t(tb[bi])
        outs_t = dict(preds_t)
        outs_t["weights"] = preds_t["weights_layers"][-1]
        lt = ref.tgu.get_all_loss_DeepF(
            outs_t, tt(b["virt1"]), tt(b["virt2"]), tt(b["Ks"]),
            loss_params, get_residual_summaries=False,
        )[0]["loss_F"]
        lt.backward()
        opt_t.step()
        loss_t.append(float(lt))

        lj, g = grad_fns[bi](params)
        upd, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, upd)
        loss_j.append(float(lj))

        if (it + 1) % 50 == 0:
            eq_t, et_t = pose_errors(eval_errs_torch())
            eq_j, et_j = pose_errors(eval_errs_jax(params))
            err_drift.append(
                (it + 1, eq_t, eq_j, et_t, et_j)
            )

    loss_t = np.array(loss_t)
    loss_j = np.array(loss_j)
    rel = np.abs(loss_t - loss_j) / np.maximum(np.abs(loss_t), 1e-12)
    print("\nloss drift: it50 %.2e  it150 %.2e  it300 %.2e  max %.2e"
          % (rel[49], rel[149], rel[299], rel.max()))
    for it, eq_t, eq_j, et_t, et_j in err_drift:
        print(f"it {it}: err_q ref {eq_t:.3f} ours {eq_j:.3f} | "
              f"err_t ref {et_t:.3f} ours {et_j:.3f}")

    # Training moved both.
    assert abs(loss_t[-1] - loss_t[0]) > 1e-6
    # GATE CALIBRATION (measured, PARITY.md §co-training): the optimization
    # trajectory at this operating point is CHAOTIC — the reference run
    # against ITSELF with a 1e-5 parameter perturbation diverges MORE than
    # the two implementations do (self-envelope: loss drift 6.1x by iter
    # 300, held-out err_t split 1.8 vs 13.2 deg; cross-implementation:
    # 2.99x and 1.8 vs 7.6). The honest assertion is therefore that the
    # cross-implementation divergence stays inside the reference's own
    # perturbation envelope and that BOTH models converge.
    assert rel[49] < 1.0, rel[49]           # measured 0.22 (self: 0.105)
    assert rel.max() < 6.0, rel.max()       # measured 2.99 (self: 6.1)
    first_q = max(err_drift[0][1], err_drift[0][2])
    first_t = max(err_drift[0][3], err_drift[0][4])
    it, eq_t, eq_j, et_t, et_j = err_drift[-1]
    # Both converged on the held-out batch...
    assert eq_t < 2.0 and eq_j < 2.0, (eq_t, eq_j)
    assert et_t < 20.0 and et_j < 20.0, (et_t, et_j)
    assert et_t < 0.5 * first_t and et_j < 0.5 * first_t
    # ...and every checkpoint's spread sits inside the self-chaos envelope
    # (measured self-spread: err_q up to 1.5, err_t up to 17.3).
    for it, eq_t, eq_j, et_t, et_j in err_drift:
        assert abs(eq_t - eq_j) < 3.0, (it, eq_t, eq_j)
        assert abs(et_t - et_j) < 31.0, (it, et_t, et_j)
