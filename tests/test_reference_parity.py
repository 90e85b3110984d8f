"""Direct-import activation parity against /root/reference's ACTUAL modules.

Unlike test_guava_convert.py (which compares against torch modules
re-implemented inside the test file), these tests import the reference's own
`styleunet.py`, `feature_decoder.py`, and `dino_encoder.py` sources
(ref: models/modules/net_module/*), randomly initialize them, convert the
real state_dict with train/weights.py, and assert end-to-end activation
parity. If we misread the reference architecture, these fail.

The container lacks `lightning` / `torchvision` / hub network access, so:
 - `lightning.LightningModule` is shimmed to `torch.nn.Module` (the
   reference uses nothing else from it in these files);
 - `torchvision.transforms.Normalize` / `transforms.functional.resize` are
   shimmed with their documented torch equivalents (`F.interpolate` with
   `antialias=True` — torchvision v2 resize IS this call);
 - `torch.hub.load('facebookresearch/dinov2', ...)` is monkeypatched to a
   stub ViT implementing the dinov2 `get_intermediate_layers` contract
   (last-n block outputs, final-norm, patch tokens only) with dinov2's
   exact state_dict naming, so the DPT neck code under test is 100% the
   reference's.

Skipped when /root/reference is absent.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import torch  # noqa: E402
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from guava_renderer_tpu.train.weights import (  # noqa: E402
    convert_dpt_encoder,
    convert_styleunet,
    convert_uv_decoder,
    convert_vertex_decoder,
)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference checkout not available",
)


# ---------------------------------------------------------------------------
# import shims
# ---------------------------------------------------------------------------

_SHIMMED: list[str] = []


def _install_shims():
    if "lightning" not in sys.modules:
        L = types.ModuleType("lightning")
        L.LightningModule = tnn.Module
        sys.modules["lightning"] = L
        _SHIMMED.append("lightning")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        trf = types.ModuleType("torchvision.transforms.functional")

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(1, -1, 1, 1)
                self.std = torch.tensor(std).view(1, -1, 1, 1)

            def __call__(self, x):
                return (x - self.mean) / self.std

        def resize(img, size, antialias=True):
            return tF.interpolate(
                img, size=tuple(size), mode="bilinear",
                align_corners=False, antialias=bool(antialias),
            )

        tr.Normalize = Normalize
        trf.resize = resize
        tr.functional = trf
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = trf
        _SHIMMED.extend(
            ["torchvision", "torchvision.transforms",
             "torchvision.transforms.functional"]
        )


@pytest.fixture(scope="module", autouse=True)
def _shims():
    _install_shims()
    yield
    for name in _SHIMMED:
        sys.modules.pop(name, None)
    _SHIMMED.clear()


def _load_ref(relpath: str, name: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def sd_numpy(m: tnn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


# ---------------------------------------------------------------------------
# StyleUNet — the reference's own class (ref: styleunet/styleunet.py:86-207)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("small,extra", [(True, False), (False, True)])
def test_reference_styleunet_parity(small, extra):
    from guava_renderer_tpu.models.styleunet import StyleUNet

    ref = _load_ref("models/modules/net_module/styleunet/styleunet.py",
                    "ref_styleunet")
    torch.manual_seed(3)
    size, in_dim, out_dim, style_dim, num_mlp, cs = 32, 6, 4, 64, 2, 8
    tm = ref.StyleUNet(
        size, size, in_dim, out_dim, num_style_feat=style_dim,
        num_mlp=num_mlp, activation=False, channel_scale=cs, small=small,
        extra_style_dim=style_dim if extra else -1,
    )
    tm.eval()
    x = torch.randn(2, in_dim, size, size)
    es = torch.randn(2, style_dim) if extra else None
    with torch.no_grad():
        # noise weights are zero-initialized (ref styleunet.py:501) so
        # randomize_noise has no effect at random init
        ty = tm(x, extra_style=es).numpy()

    sd = {f"m.{k}": v for k, v in sd_numpy(tm).items()}
    params = convert_styleunet(
        sd, "m", in_size=size, out_size=size,
        channel_scale=float(cs), small=small, extra_style=extra,
        num_mlp=num_mlp,
    )
    fm = StyleUNet(in_size=size, out_size=size, in_dim=in_dim, out_dim=out_dim,
                   style_dim=style_dim, num_mlp=num_mlp, activation=False,
                   channel_scale=float(cs), small=small,
                   extra_style_dim=style_dim if extra else -1)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    esj = jnp.asarray(es.numpy()) if extra else None
    fy = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, xj, esj)
    fy = np.asarray(fy).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(fy, ty, atol=3e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Gaussian decoders (ref: feature_decoder.py:9-137)
# ---------------------------------------------------------------------------


def test_reference_vertex_decoder_parity():
    from guava_renderer_tpu.models.decoders import VertexGSDecoder

    ref = _load_ref("models/modules/net_module/feature_decoder.py", "ref_fd")
    torch.manual_seed(4)
    in_dim, color_dim = 64, 8
    tm = ref.Vertex_GS_Decoder(in_dim=in_dim, dir_dim=27, color_out_dim=color_dim)
    tm.eval()
    x = torch.randn(2, 11, in_dim)
    dirs = torch.randn(2, 27)
    with torch.no_grad():
        td = tm(x, dirs)

    params = convert_vertex_decoder(
        {f"v.{k}": v for k, v in sd_numpy(tm).items()}, "v")
    fm = VertexGSDecoder(in_dim=in_dim, color_dim=color_dim)
    fd = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(x.numpy()), jnp.asarray(dirs.numpy()))
    for k_ref, k_ours in (("colors", "colors"), ("opacities", "opacities"),
                          ("scales", "scales"), ("rotations", "rotations")):
        np.testing.assert_allclose(
            np.asarray(fd[k_ours]), td[k_ref].numpy(), atol=2e-5, rtol=1e-4,
            err_msg=k_ref)


def test_reference_uv_decoder_parity():
    from guava_renderer_tpu.models.decoders import UVPointGSDecoder

    ref = _load_ref("models/modules/net_module/feature_decoder.py", "ref_fd2")
    torch.manual_seed(5)
    in_dim, color_dim = 32, 8
    tm = ref.UV_Point_GS_Decoder(in_dim=in_dim, dir_dim=27,
                                 color_out_dim=color_dim)
    tm.eval()
    x = torch.randn(2, in_dim, 16, 16)
    dirs = torch.randn(2, 27)
    with torch.no_grad():
        td = tm(x, dirs)  # dict of (B, H, W, C)

    params = convert_uv_decoder(
        {f"u.{k}": v for k, v in sd_numpy(tm).items()}, "u")
    fm = UVPointGSDecoder(in_dim=in_dim, color_dim=color_dim)
    fd = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                  jnp.asarray(dirs.numpy()))
    for k_ref, k_ours in (("colors", "colors"), ("opacities", "opacities"),
                          ("scales", "scales"), ("rotations", "rotations"),
                          ("local_pos", "local_pos")):
        np.testing.assert_allclose(
            np.asarray(fd[k_ours]), td[k_ref].numpy(), atol=2e-5, rtol=1e-4,
            err_msg=k_ref)


# ---------------------------------------------------------------------------
# DINO_Enocder DPT neck (ref: dino_encoder.py:7-113) with a stub hub ViT
# ---------------------------------------------------------------------------


class _StubAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, D // self.num_heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (D // self.num_heads) ** -0.5
        x = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(x)


class _StubLS(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = tnn.Parameter(torch.full((dim,), 1e-1))

    def forward(self, x):
        return x * self.gamma


class _StubMlp(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(tF.gelu(self.fc1(x)))


class _StubBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = _StubAttn(dim, heads)
        self.ls1 = _StubLS(dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = _StubMlp(dim)
        self.ls2 = _StubLS(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


class _StubPatchEmbed(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, 14, 14)


class _StubDino(tnn.Module):
    """dinov2_vitb14-shaped stub: same state_dict names, same
    get_intermediate_layers contract (last n blocks, final norm, patch
    tokens only — which is why ref `[:, 0]` is a PATCH token, a quirk our
    encoder reproduces, dpt_encoder.py:11-15)."""

    def __init__(self, dim=32, depth=6, heads=4, grid=4):
        super().__init__()
        self.patch_embed = _StubPatchEmbed(dim)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + grid * grid, dim) * 0.02)
        self.blocks = tnn.ModuleList(_StubBlock(dim, heads) for _ in range(depth))
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def to(self, *a, **k):  # hub model gets .to('cpu')
        return self

    def get_intermediate_layers(self, x, n):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i >= len(self.blocks) - n:
                outs.append(x)
        return tuple(self.norm(o)[:, 1:] for o in outs)


def test_reference_dino_encoder_parity(monkeypatch):
    from guava_renderer_tpu.models.dpt_encoder import DinoDPTEncoder

    dim, depth, heads, grid = 32, 6, 4, 4
    hidden, out1, out2 = 16, 8, 12
    img = grid * 14  # 56
    out_size = 32

    torch.manual_seed(6)
    stub = _StubDino(dim, depth, heads, grid)
    monkeypatch.setattr(torch.hub, "load", lambda *a, **k: stub)
    ref = _load_ref("models/modules/net_module/dino_encoder.py", "ref_dino")
    tm = ref.DINO_Enocder(output_dim=out1, output_dim_2=out2, hidden_dims=hidden)
    tm.eval()
    x = torch.rand(2, 3, img, img)
    with torch.no_grad():
        td = tm(x, output_size=out_size)

    sd = {f"dino_encoder.{k}": v for k, v in sd_numpy(tm).items()}
    params = convert_dpt_encoder(sd, "dino_encoder")
    fm = DinoDPTEncoder(
        out_dim_1=out1, out_dim_2=out2, hidden=hidden, output_size=out_size,
        vit_dim=dim, vit_depth=depth, vit_heads=heads, vit_pos_grid=grid,
    )
    fy = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(fy["f_global"]), td["f_global"].numpy(),
        atol=2e-5, rtol=1e-4, err_msg="f_global")
    np.testing.assert_allclose(
        np.asarray(fy["f_map1"]),
        td["f_map1"].numpy().transpose(0, 2, 3, 1),
        atol=1e-4, rtol=1e-3, err_msg="f_map1")
    np.testing.assert_allclose(
        np.asarray(fy["f_map2"]),
        td["f_map2"].numpy().transpose(0, 2, 3, 1),
        atol=1e-4, rtol=1e-3, err_msg="f_map2")
