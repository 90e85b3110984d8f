"""DINO+DPT encoder conversion: full-forward activation parity vs torch.

Builds a miniature torch network with EXACTLY the reference DINO_Enocder
structure (ref: models/modules/net_module/dino_encoder.py:6-113 — ViT
intermediate layers, 1x1 projects, ConvT/identity/strided resize pyramid,
RGB concat, layer_rn, 4 FeatureFusionBlocks, low-level path, fuse/skip,
two output heads), converts its state_dict with convert_dpt_encoder, and
requires DinoDPTEncoder to reproduce f_map1/f_map2/f_global.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from guava_renderer_tpu.models.dpt_encoder import DinoDPTEncoder  # noqa: E402
from guava_renderer_tpu.train.weights import convert_dpt_encoder  # noqa: E402

DIM, HEADS, DEPTH, GRID = 16, 2, 5, 2
HID, OUT1, OUT2, S = 8, 3, 5, 16
PYR = (4, 4, 4, 4)

torch.manual_seed(0)


class TBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(DIM, eps=1e-6)
        self.qkv = tnn.Linear(DIM, 3 * DIM)
        self.proj = tnn.Linear(DIM, DIM)
        self.ls1 = tnn.Parameter(torch.rand(DIM) * 0.5 + 0.5)
        self.norm2 = tnn.LayerNorm(DIM, eps=1e-6)
        self.fc1 = tnn.Linear(DIM, 4 * DIM)
        self.fc2 = tnn.Linear(4 * DIM, DIM)
        self.ls2 = tnn.Parameter(torch.rand(DIM) * 0.5 + 0.5)

    def forward(self, x):
        B, N, D = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, N, 3, HEADS, D // HEADS)
        q, k, v = (qkv[:, :, j].transpose(1, 2) for j in range(3))
        a = torch.softmax(q @ k.transpose(-2, -1) * (D // HEADS) ** -0.5, dim=-1)
        h = (a @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.proj(h) * self.ls1
        return x + self.fc2(tF.gelu(self.fc1(self.norm2(x)))) * self.ls2


class TVit(tnn.Module):
    """get_intermediate_layers semantics: patch tokens only, final-normed."""

    def __init__(self):
        super().__init__()
        self.patch = tnn.Conv2d(3, DIM, 14, stride=14)
        self.cls = tnn.Parameter(torch.randn(1, 1, DIM))
        self.pos = tnn.Parameter(torch.randn(1, 1 + GRID * GRID, DIM) * 0.02)
        self.blocks = tnn.ModuleList([TBlock() for _ in range(DEPTH)])
        self.norm = tnn.LayerNorm(DIM, eps=1e-6)

    def forward(self, img, n=5):
        B = img.shape[0]
        x = self.patch(img).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls.expand(B, -1, -1), x], dim=1) + self.pos
        outs = []
        for i, b in enumerate(self.blocks):
            x = b(x)
            if i >= DEPTH - n:
                outs.append(self.norm(x)[:, 1:])  # patch tokens only
        return outs


class TRcu(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(HID, HID, 3, padding=1)
        self.conv2 = tnn.Conv2d(HID, HID, 3, padding=1)

    def forward(self, x):
        return self.conv2(tF.relu(self.conv1(tF.relu(x)))) + x


class TFfb(tnn.Module):
    def __init__(self):
        super().__init__()
        self.out_conv = tnn.Conv2d(HID, HID, 1)
        self.resConfUnit1 = TRcu()
        self.resConfUnit2 = TRcu()

    def forward(self, *xs, size=None):
        out = xs[0]
        if len(xs) == 2:
            out = out + self.resConfUnit1(xs[1])
        out = self.resConfUnit2(out)
        kw = {"scale_factor": 2} if size is None else {"size": size}
        out = tF.interpolate(out, **kw, mode="bilinear", align_corners=False)
        return self.out_conv(out)


class TDpt(tnn.Module):
    """Reference DINO_Enocder forward, miniature (ref: dino_encoder.py:66-113)."""

    def __init__(self):
        super().__init__()
        self.dino_model = TVit()
        self.projects = tnn.ModuleList([tnn.Conv2d(DIM, od, 1) for od in PYR])
        self.resize_layers = tnn.ModuleList([
            tnn.ConvTranspose2d(PYR[0], PYR[0], 4, stride=4),
            tnn.ConvTranspose2d(PYR[1], PYR[1], 2, stride=2),
            tnn.Identity(),
            tnn.Conv2d(PYR[3], PYR[3], 3, stride=2, padding=1),
        ])
        self.layer_rn = tnn.ModuleList(
            [tnn.Conv2d(od + 3, HID, 3, padding=1, bias=False) for od in PYR]
        )
        self.refinenet = tnn.ModuleList([TFfb() for _ in range(4)])
        self.project_l = tnn.Sequential(
            tnn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
            tnn.Conv2d(DIM, HID, 3, padding=1, bias=False),
            tnn.Upsample(scale_factor=4, mode="bilinear", align_corners=True),
            tnn.Conv2d(HID, HID // 2, 3, padding=1, bias=False),
        )
        self.fuse_l = tnn.Sequential(
            tnn.Conv2d(HID + HID // 2 + 3, HID, 3, padding=1, bias=False),
            tnn.LeakyReLU(inplace=True),
            tnn.Conv2d(HID, HID, 3, padding=1, bias=False),
        )
        self.skip_l = tnn.Conv2d(HID + 3, HID, 3, padding=1, bias=False)
        self.output_conv = tnn.Conv2d(HID, OUT1, 3, padding=1)
        self.output_conv_2 = tnn.Conv2d(HID, OUT2, 3, padding=1)

    def forward(self, images, output_size):
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        images = (images - mean) / std
        ph, pw = images.shape[-2] // 14, images.shape[-1] // 14
        low, *levels = self.dino_model(images, 5)
        feats = []
        for i, f in enumerate(levels):
            f = f.permute(0, 2, 1).reshape(f.shape[0], f.shape[-1], ph, pw)
            f = self.resize_layers[i](self.projects[i](f))
            # torchvision.transforms.functional.resize(antialias=True) on a
            # tensor lowers to exactly this interpolate call
            rgb = tF.interpolate(
                images, (f.shape[-2], f.shape[-1]), mode="bilinear",
                align_corners=False, antialias=True,
            ).detach()
            feats.append(self.layer_rn[i](torch.cat([rgb, f], dim=1)))
        path = self.refinenet[0](feats[3], size=feats[2].shape[2:])
        path = self.refinenet[1](path, feats[2], size=feats[1].shape[2:])
        path = self.refinenet[2](path, feats[1], size=feats[0].shape[2:])
        path = self.refinenet[3](path, feats[0])
        path = tF.interpolate(path, output_size, mode="bilinear", align_corners=False)
        img_l = tF.interpolate(images, output_size, mode="bilinear", align_corners=False)
        lo = low.permute(0, 2, 1).reshape(low.shape[0], low.shape[-1], ph, pw)
        lo = self.project_l(lo)
        lo = tF.interpolate(lo, output_size, mode="bilinear", align_corners=False)
        path = torch.cat([path, img_l], dim=1)
        path = self.fuse_l(torch.cat([path, lo], dim=1)) + self.skip_l(path)
        return {
            "f_map1": self.output_conv(path),
            "f_map2": self.output_conv_2(path),
            "f_global": levels[-1][:, 0],
        }


def _vit_sd(v: TVit, p: str) -> dict:
    sd = {
        p + "patch_embed.proj.weight": v.patch.weight,
        p + "patch_embed.proj.bias": v.patch.bias,
        p + "cls_token": v.cls,
        p + "pos_embed": v.pos,
        p + "norm.weight": v.norm.weight,
        p + "norm.bias": v.norm.bias,
    }
    for i, b in enumerate(v.blocks):
        q = f"{p}blocks.{i}."
        sd.update({
            q + "norm1.weight": b.norm1.weight, q + "norm1.bias": b.norm1.bias,
            q + "attn.qkv.weight": b.qkv.weight, q + "attn.qkv.bias": b.qkv.bias,
            q + "attn.proj.weight": b.proj.weight, q + "attn.proj.bias": b.proj.bias,
            q + "ls1.gamma": b.ls1,
            q + "norm2.weight": b.norm2.weight, q + "norm2.bias": b.norm2.bias,
            q + "mlp.fc1.weight": b.fc1.weight, q + "mlp.fc1.bias": b.fc1.bias,
            q + "mlp.fc2.weight": b.fc2.weight, q + "mlp.fc2.bias": b.fc2.bias,
            q + "ls2.gamma": b.ls2,
        })
    return sd


def test_dpt_encoder_conversion_forward_parity():
    m = TDpt().eval()
    # assemble the reference state_dict key layout under the dino_encoder prefix
    sd = {"dino_encoder." + k: v for k, v in m.state_dict().items()}
    sd.update(_vit_sd(m.dino_model, "dino_encoder.dino_model."))
    sd = {k: v.detach().numpy() for k, v in sd.items()}

    tree = convert_dpt_encoder(sd, "dino_encoder")

    img = np.random.default_rng(2).uniform(0, 1, (2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(img).permute(0, 3, 1, 2), output_size=(S, S))

    enc = DinoDPTEncoder(
        out_dim_1=OUT1, out_dim_2=OUT2, hidden=HID, output_size=S,
        vit_dim=DIM, vit_depth=DEPTH, vit_heads=HEADS, vit_pos_grid=GRID,
        pyramid_dims=PYR,
    )
    got = enc.apply({"params": tree}, jnp.asarray(img))

    np.testing.assert_allclose(
        np.asarray(got["f_global"]), want["f_global"].numpy(), atol=2e-5
    )
    for k in ("f_map1", "f_map2"):
        w = want[k].permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got[k]), w, atol=5e-4, err_msg=k)
