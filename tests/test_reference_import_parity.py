"""Direct-import parity vs the ACTUAL reference torch modules (VERDICT r2 #4).

Unlike test_guava_convert.py (self-written torch minis with the reference's
module structure), these tests import the reference sources themselves —
  /root/reference/models/modules/net_module/styleunet/styleunet.py
  /root/reference/models/modules/net_module/feature_decoder.py
  /root/reference/models/modules/net_module/dino_encoder.py
— with minimal sys.modules shims for the two packages absent from this
container (`lightning`: only LightningModule-as-nn.Module is used;
`torchvision`: Normalize + functional.resize, shimmed with the
antialiased bilinear `F.interpolate` torchvision itself lowers to).
The DINOv2 backbone is external to the reference repo (torch.hub), so
`torch.hub.load` is monkeypatched to a miniature ViT exposing the real
dinov2 API (get_intermediate_layers -> normed PATCH tokens, CLS stripped).

Each test randomly initializes the reference module, converts its
state_dict via guava_renderer_tpu.train.weights, and asserts end-to-end
activation parity against the Flax module — closing the trust chain for
the checkpoint converter on the reference's own code.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
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

REF = "/root/reference/models/modules/net_module"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)

torch.manual_seed(0)


def _install_shims():
    """lightning + torchvision stand-ins for exactly the surface the
    reference modules touch (dino_encoder.py:2-4, feature_decoder.py:4)."""
    if "lightning" not in sys.modules:
        L = types.ModuleType("lightning")
        L.LightningModule = tnn.Module
        sys.modules["lightning"] = L

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")
        functional = types.ModuleType("torchvision.transforms.functional")

        class Normalize:
            def __init__(self, mean, std):
                self.mean, self.std = mean, std

            def __call__(self, x):
                m = torch.tensor(self.mean, dtype=x.dtype).view(1, -1, 1, 1)
                s = torch.tensor(self.std, dtype=x.dtype).view(1, -1, 1, 1)
                return (x - m) / s

        def resize(img, size, antialias=None):
            # torchvision tensor-mode resize == antialiased bilinear interpolate
            return tF.interpolate(
                img, size=tuple(size), mode="bilinear",
                align_corners=False, antialias=bool(antialias),
            )

        transforms.Normalize = Normalize
        functional.resize = resize
        transforms.functional = functional
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional


def _load(modname: str, relpath: str):
    _install_shims()
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REF, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def sd_numpy(m) -> dict:
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


# ---------------------------------------------------------------------------
# miniature DINOv2 backbone with the REAL hub API
# ---------------------------------------------------------------------------


class _MiniBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.ls1 = tnn.Module()
        self.ls1.gamma = tnn.Parameter(torch.randn(dim) * 0.1 + 1.0)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        self.ls2 = tnn.Module()
        self.ls2.gamma = tnn.Parameter(torch.randn(dim) * 0.1 + 1.0)
        self.heads = heads

    def forward(self, x):
        B, N, D = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, self.heads, D // self.heads)
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
        a = torch.softmax(q @ k.transpose(-2, -1) * (D // self.heads) ** -0.5, -1)
        h = (a @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.ls1.gamma * self.attn.proj(h)
        h = self.norm2(x)
        return x + self.ls2.gamma * self.mlp.fc2(tF.gelu(self.mlp.fc1(h)))


class _MiniDinoHub(tnn.Module):
    """dinov2_vitb14-shaped mini: get_intermediate_layers returns the last
    n blocks' NORMED PATCH tokens with CLS stripped — the real dinov2 API
    the reference's DINO_Enocder relies on (dino_encoder.py:71-79 reshapes
    tokens straight to the patch grid, and its [:, 0] 'global' feature is
    therefore the first PATCH token)."""

    def __init__(self, dim, depth, heads, grid):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, 14, stride=14)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + grid * grid, dim) * 0.02)
        self.blocks = tnn.ModuleList([_MiniBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.depth = depth

    def get_intermediate_layers(self, x, n):
        B = x.shape[0]
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(B, -1, -1), t], dim=1)
        t = t + self.pos_embed
        outs = []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i >= self.depth - n:
                outs.append(self.norm(t)[:, 1:])  # strip CLS like dinov2
        return outs


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("small,extra", [(True, False), (False, True)])
def test_reference_styleunet_parity(small, extra):
    from guava_renderer_tpu.models.styleunet import StyleUNet

    ref = _load("ref_styleunet", "styleunet/styleunet.py")
    size, in_dim, out_dim, style_dim, num_mlp, cs = 32, 6, 4, 64, 2, 8.0
    tm = ref.StyleUNet(
        in_size=size, out_size=size, in_dim=in_dim, out_dim=out_dim,
        num_style_feat=style_dim, num_mlp=num_mlp, activation=False,
        channel_scale=cs, small=small,
        extra_style_dim=style_dim if extra else -1,
    ).eval()
    x = torch.randn(2, in_dim, size, size)
    es = torch.randn(2, style_dim) if extra else None
    with torch.no_grad():
        # randomize_noise=True (the reference default): the per-layer noise
        # weights are zero-initialized so the random noise contributes
        # exactly 0 here (and the small variant's stored-noise buffers have
        # mismatched shapes, so False doesn't even run upstream).
        ty = tm(x, extra_style=es).numpy()

    sd = {f"m.{k}": v for k, v in sd_numpy(tm).items()}
    params = convert_styleunet(
        sd, "m", in_size=size, out_size=size,
        channel_scale=cs, small=small, extra_style=extra, num_mlp=num_mlp,
    )
    fm = StyleUNet(in_size=size, out_size=size, in_dim=in_dim, out_dim=out_dim,
                   style_dim=style_dim, num_mlp=num_mlp, activation=False,
                   channel_scale=cs, small=small,
                   extra_style_dim=style_dim if extra else -1)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    esj = jnp.asarray(es.numpy()) if extra else None
    fy = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, xj, esj)
    np.testing.assert_allclose(
        np.asarray(fy).transpose(0, 3, 1, 2), ty, atol=2e-4, rtol=1e-3
    )


def test_reference_vertex_decoder_parity():
    from guava_renderer_tpu.models.decoders import VertexGSDecoder

    ref = _load("ref_feature_decoder", "feature_decoder.py")
    in_dim, dir_dim, color = 32, 27, 8
    tm = ref.Vertex_GS_Decoder(
        in_dim=in_dim, dir_dim=dir_dim, color_out_dim=color
    ).eval()
    f = torch.randn(2, 11, in_dim)
    d = torch.randn(2, dir_dim)
    with torch.no_grad():
        ty = tm(f, d)

    sd = {f"v.{k}": v for k, v in sd_numpy(tm).items()}
    params = convert_vertex_decoder(sd, "v")
    fm = VertexGSDecoder(in_dim=in_dim, color_dim=color)
    fy = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(f.numpy()), jnp.asarray(d.numpy()))
    for k in ("colors", "opacities", "scales", "rotations"):
        np.testing.assert_allclose(
            np.asarray(fy[k]), ty[k].numpy(), atol=1e-5, rtol=1e-4, err_msg=k
        )


def test_reference_uv_decoder_parity():
    from guava_renderer_tpu.models.decoders import UVPointGSDecoder

    ref = _load("ref_feature_decoder", "feature_decoder.py")
    in_dim, dir_dim, color = 24, 27, 8
    tm = ref.UV_Point_GS_Decoder(
        in_dim=in_dim, dir_dim=dir_dim, color_out_dim=color
    ).eval()
    f = torch.randn(2, in_dim, 6, 6)
    d = torch.randn(2, dir_dim)
    with torch.no_grad():
        ty = tm(f, d)

    sd = {f"u.{k}": v for k, v in sd_numpy(tm).items()}
    params = convert_uv_decoder(sd, "u")
    fm = UVPointGSDecoder(in_dim=in_dim, color_dim=color)
    fy = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(f.numpy().transpose(0, 2, 3, 1)),
                  jnp.asarray(d.numpy()))
    for k in ("colors", "opacities", "scales", "rotations", "local_pos"):
        np.testing.assert_allclose(
            np.asarray(fy[k]), ty[k].numpy(), atol=1e-5, rtol=1e-4, err_msg=k
        )


def test_reference_dino_encoder_parity():
    from guava_renderer_tpu.models.dpt_encoder import DinoDPTEncoder

    dim, depth, heads, grid = 32, 5, 4, 4
    out1, out2, hidden = 8, 16, 32
    feat_size, out_size = 14 * grid, 16

    mini = _MiniDinoHub(dim, depth, heads, grid)
    real_load = torch.hub.load
    torch.hub.load = lambda *a, **k: mini
    try:
        ref = _load("ref_dino_encoder", "dino_encoder.py")
        tm = ref.DINO_Enocder(
            output_dim=out1, output_dim_2=out2, hidden_dims=hidden
        ).eval()
    finally:
        torch.hub.load = real_load

    x = torch.rand(2, 3, feat_size, feat_size)
    with torch.no_grad():
        ty = tm(x, output_size=(out_size, out_size))

    sd = {f"e.{k}": v for k, v in sd_numpy(tm).items()}
    params = convert_dpt_encoder(sd, "e")
    fm = DinoDPTEncoder(
        out_dim_1=out1, out_dim_2=out2, hidden=hidden, output_size=out_size,
        vit_dim=dim, vit_depth=depth, vit_heads=heads, vit_pos_grid=grid,
    )
    fy = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(fy["f_global"]), ty["f_global"].numpy(), atol=2e-4, rtol=1e-3
    )
    for k in ("f_map1", "f_map2"):
        np.testing.assert_allclose(
            np.asarray(fy[k]).transpose(0, 3, 1, 2), ty[k].numpy(),
            atol=5e-4, rtol=1e-3, err_msg=k,
        )
