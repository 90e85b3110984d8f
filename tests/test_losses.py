"""SSIM / LPIPS / training-loss tests (with a torch cross-check for SSIM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guava_renderer_tpu.ops.ssim import mae, psnr, ssim
from guava_renderer_tpu.train.losses import LossConfig, OptimizationLoss, crop_resample
from guava_renderer_tpu.train.lpips import LPIPS


def test_ssim_identity():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)


def test_ssim_matches_torch_reference():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    # independent torch implementation of the published SSIM formula
    x_t, y_t = torch.tensor(a), torch.tensor(b)
    g = torch.exp(-((torch.arange(11) - 5) ** 2) / (2 * 1.5**2))
    g = (g / g.sum()).float()
    win = (g[:, None] @ g[None, :]).expand(3, 1, 11, 11).contiguous()
    mu1 = F.conv2d(x_t, win, padding=5, groups=3)
    mu2 = F.conv2d(y_t, win, padding=5, groups=3)
    s1 = F.conv2d(x_t * x_t, win, padding=5, groups=3) - mu1**2
    s2 = F.conv2d(y_t * y_t, win, padding=5, groups=3) - mu2**2
    s12 = F.conv2d(x_t * y_t, win, padding=5, groups=3) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    ref = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) /
           ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))).mean().item()

    ours = float(ssim(jnp.asarray(a.transpose(0, 2, 3, 1)), jnp.asarray(b.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)[0]), 20.0, atol=1e-4)
    assert float(mae(a, b)) == pytest.approx(0.1, abs=1e-6)


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_basic(net):
    m = LPIPS(net_type=net)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, x)
    d_same = float(m.apply(params, x, x))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    y = jnp.clip(x + 0.3, 0, 1)
    assert float(m.apply(params, x, y)) > 0.0


def test_crop_resample_matches_plain_resize():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    # full-image box, exact x2 downscale with align_corners=False (no
    # antialias, torch F.interpolate semantics) == 2x2 average pooling
    box = jnp.asarray([[0, 32, 0, 32]], jnp.int32)
    out = crop_resample(img, box, 16)
    ref = np.asarray(img).reshape(1, 16, 2, 16, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # identity box crop (same size) reproduces the region exactly
    box2 = jnp.asarray([[0, 16, 0, 16]], jnp.int32)
    out2 = crop_resample(img, box2, 16)
    np.testing.assert_allclose(out2, np.asarray(img)[:, :16, :16], atol=1e-5)


def test_optimization_loss_runs_and_differentiates():
    m = LPIPS(net_type="alex")
    x0 = jnp.zeros((1, 64, 64, 3))
    lp_params = m.init(jax.random.PRNGKey(0), x0, x0)

    def perceptual(a, b):
        return m.apply(lp_params, a, b)

    cfg = LossConfig(crop_size=32)
    loss_fn = OptimizationLoss(cfg, perceptual)
    rng = np.random.default_rng(0)
    renders = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    raw = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    mask = jnp.ones((2, 64, 64, 1))
    boxes = {
        "head_box": jnp.asarray([[10, 40, 5, 35]] * 2, jnp.int32),
        "left_hand_box": jnp.asarray([[0, 20, 30, 60]] * 2, jnp.int32),
        "right_hand_box": jnp.asarray([[30, 60, 30, 60]] * 2, jnp.int32),
    }
    uv_xyz = jnp.asarray(rng.normal(size=(2, 50, 3)) * 4, jnp.float32)
    uv_scales = jnp.asarray(rng.uniform(0, 1.0, (2, 50, 3)), jnp.float32)

    def f(r):
        total, d = loss_fn(r, raw, gt, mask, boxes, uv_xyz, uv_scales, jnp.asarray(2000))
        return total

    total = f(renders)
    assert np.isfinite(float(total))
    g = jax.grad(f)(renders)
    assert float(jnp.abs(g).max()) > 0

    # regularizers activate above thresholds
    _, d = loss_fn(renders, None, gt, mask, None, uv_xyz, uv_scales, jnp.asarray(0))
    assert float(d["local_xyz_loss"]) > 0
    assert float(d["local_scale_loss"]) > 0


def test_lpips_conversion_forward_parity_vs_torch():
    """Full-forward LPIPS parity vs a torch transcription of the reference's
    lpipsPyTorch (networks.py AlexNet z_score/target_layers semantics,
    lpips.py spatial-mean + layer-sum), with REAL torchvision key layout —
    regression for the features.10-sorts-before-features.3 conversion bug."""
    import pytest as _pytest

    torch = _pytest.importorskip("torch")
    import torch.nn as tnn

    from guava_renderer_tpu.train.lpips import load_torch_state

    torch.manual_seed(0)
    feats = tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, stride=2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, stride=2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
        tnn.MaxPool2d(3, stride=2),
    ).eval()
    for q in feats.parameters():
        q.data = q.data * 0.2  # keep activations tame
    lins = [tnn.Conv2d(c, 1, 1, bias=False).eval()
            for c in (64, 192, 384, 256, 256)]
    for q in lins:
        q.weight.data = q.weight.data.abs() * 0.1

    mean = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    std = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    target_layers = [2, 5, 8, 10, 12]  # 1-based module index, after each ReLU

    def torch_lpips(x, y):
        def stages(im):
            h = (im - mean) / std
            out = []
            for i, layer in enumerate(feats, 1):
                h = layer(h)
                if i in target_layers:
                    n = torch.sqrt((h**2).sum(1, keepdim=True)).clamp_min(1e-10)
                    out.append(h / n)
                if len(out) == 5:
                    break
            return out

        total = 0.0
        for fx, fy, lin in zip(stages(x), stages(y), lins):
            total = total + lin((fx - fy) ** 2).mean((2, 3)).mean()
        return total

    # real torchvision/LPIPS key layout (conv layer ids 0,3,6,8,10; lin 0..4)
    sd = {}
    for i, mi in enumerate((0, 3, 6, 8, 10)):
        conv = feats[mi]
        sd[f"features.{mi}.weight"] = conv.weight.detach().numpy()
        sd[f"features.{mi}.bias"] = conv.bias.detach().numpy()
    for i, lin in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = lin.weight.detach().numpy()

    m = LPIPS(net_type="alex")
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(size=x.shape).astype(np.float32) * 0.1, 0, 1)
    tmpl = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
    params = load_torch_state(tmpl, sd)

    got = float(m.apply(params, jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        want = float(torch_lpips(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(y).permute(0, 3, 1, 2),
        ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
