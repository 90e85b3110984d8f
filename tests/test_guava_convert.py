"""GUAVA checkpoint converter: forward-activation parity vs torch.

Strategy (VERDICT r1 #3): build miniature torch modules with EXACTLY the
reference's module/attribute structure (so their state_dict keys match the
released checkpoint's naming, ref: ubody_gaussian.py / feature_decoder.py /
styleunet.py / dino_encoder.py), randomly initialize them, convert the
state_dict with guava_renderer_tpu.train.weights, and compare forward
activations against our flax modules on the same inputs.
"""

import math

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

torch.manual_seed(0)


def sd_numpy(m) -> dict:
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


# ---------------------------------------------------------------------------
# torch minis: StyleGAN2 pieces (structure per ref styleunet.py:86-567)
# ---------------------------------------------------------------------------


class TModulatedConv2d(tnn.Module):
    def __init__(self, cin, cout, k, style_dim, demodulate=True, sample_mode=None):
        super().__init__()
        self.modulation = tnn.Linear(style_dim, cin)
        tnn.init.constant_(self.modulation.bias, 1.0)
        self.weight = tnn.Parameter(
            torch.randn(1, cout, cin, k, k) / math.sqrt(cin * k * k)
        )
        self.cout, self.k, self.demodulate, self.sample_mode = cout, k, demodulate, sample_mode

    def forward(self, x, style):
        b, c, h, w = x.shape
        s = self.modulation(style).view(b, 1, c, 1, 1)
        weight = self.weight * s
        if self.demodulate:
            demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
            weight = weight * demod.view(b, self.cout, 1, 1, 1)
        weight = weight.view(b * self.cout, c, self.k, self.k)
        if self.sample_mode == "upsample":
            x = tF.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        b, c, h, w = x.shape
        x = x.view(1, b * c, h, w)
        out = tF.conv2d(x, weight, padding=self.k // 2, groups=b)
        return out.view(b, self.cout, *out.shape[2:4])


class TStyleConv(tnn.Module):
    def __init__(self, cin, cout, k, style_dim, demodulate=True, sample_mode=None):
        super().__init__()
        self.modulated_conv = TModulatedConv2d(cin, cout, k, style_dim, demodulate, sample_mode)
        self.weight = tnn.Parameter(torch.zeros(1))
        self.bias = tnn.Parameter(torch.zeros(1, cout, 1, 1))

    def forward(self, x, style):
        out = self.modulated_conv(x, style) * 2**0.5
        # noise weight is zero-initialized -> no noise term needed
        return tF.leaky_relu(out + self.bias, 0.2)


class TToRGB(tnn.Module):
    def __init__(self, cin, cout, style_dim, upsample=True):
        super().__init__()
        self.upsample = upsample
        self.modulated_conv = TModulatedConv2d(cin, cout, 1, style_dim, demodulate=False)
        self.bias = tnn.Parameter(torch.zeros(1, cout, 1, 1))

    def forward(self, x, style, skip=None):
        out = self.modulated_conv(x, style) + self.bias
        if skip is not None:
            if self.upsample:
                skip = tF.interpolate(skip, scale_factor=2, mode="bilinear", align_corners=False)
            out = out + skip
        return out


class TResBlock(tnn.Module):
    def __init__(self, cin, cout, mode="down"):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cin, 3, 1, 1)
        self.conv2 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.skip = tnn.Conv2d(cin, cout, 1, bias=False)
        self.scale_factor = 0.5 if mode == "down" else 2

    def forward(self, x):
        out = tF.leaky_relu(self.conv1(x), 0.2)
        out = tF.interpolate(out, scale_factor=self.scale_factor, mode="bilinear", align_corners=False)
        out = tF.leaky_relu(self.conv2(out), 0.2)
        x = tF.interpolate(x, scale_factor=self.scale_factor, mode="bilinear", align_corners=False)
        return out + self.skip(x)


class TNorm(tnn.Module):
    def forward(self, x):
        return x * torch.rsqrt(torch.mean(x**2, dim=1, keepdim=True) + 1e-8)


class TConstantInput(tnn.Module):
    def __init__(self, ch, size=4):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(1, ch, size, size))

    def forward(self, b):
        return self.weight.repeat(b, 1, 1, 1)


def _chan_table(scale):
    base = {4: 256, 8: 256, 16: 256, 32: 256, 64: 128, 128: 64, 256: 32, 512: 16}
    return {k: int(v / scale) for k, v in base.items()}


class TGenerator(tnn.Module):
    """StyleGAN2GeneratorCSFT (+_small) (ref: styleunet.py:211-407)."""

    def __init__(self, out_size, out_dim, style_dim, num_mlp, cs, small):
        super().__init__()
        ch = _chan_table(cs)
        self.log_size = int(math.log2(out_size))
        self.small = small
        layers = [TNorm()]
        for _ in range(num_mlp):
            layers += [tnn.Linear(style_dim, style_dim), tnn.LeakyReLU(0.2, True)]
        self.style_mlp = tnn.Sequential(*layers)
        self.constant_input = TConstantInput(ch[4])
        self.style_conv1 = TStyleConv(ch[4], ch[4], 3, style_dim)
        self.to_rgb1 = TToRGB(ch[4], out_dim, style_dim, upsample=False)
        self.style_convs = tnn.ModuleList()
        self.to_rgbs = tnn.ModuleList()
        self.normal_convs = tnn.ModuleList()
        cin = ch[4]
        for i in range(3, self.log_size + 1):
            cout = ch[2**i]
            self.style_convs.append(TStyleConv(cin, cout, 3, style_dim, sample_mode="upsample"))
            if small:
                self.normal_convs.append(
                    tnn.Sequential(tnn.Conv2d(cout, cout, 3, padding=1), tnn.LeakyReLU(0.2, True))
                )
            else:
                self.style_convs.append(TStyleConv(cout, cout, 3, style_dim))
            self.to_rgbs.append(TToRGB(cout, out_dim, style_dim))
            cin = cout

    def forward(self, style, conditions):
        style = self.style_mlp(style)
        out = self.constant_input(style.shape[0])
        out = self.style_conv1(out, style)
        skip = self.to_rgb1(out, style)
        if self.small:
            i = 1
            for conv1, conv2, to_rgb in zip(self.style_convs, self.normal_convs, self.to_rgbs):
                out = conv1(out, style)
                if i < len(conditions):
                    out = out * conditions[(i - 1) * 2] + conditions[(i - 1) * 2 + 1]
                out = conv2(out)
                skip = to_rgb(out, style, skip)
                i += 1
        else:
            i = 1
            for conv1, conv2, to_rgb in zip(self.style_convs[::2], self.style_convs[1::2], self.to_rgbs):
                out = conv1(out, style)
                if i < len(conditions):
                    out = out * conditions[i - 1] + conditions[i]
                out = conv2(out, style)
                skip = to_rgb(out, style, skip)
                i += 2
        return skip


class TStyleUNet(tnn.Module):
    """(ref: styleunet.py:86-207); attribute names match the checkpoint."""

    def __init__(self, in_size, out_size, in_dim, out_dim, style_dim=64,
                 num_mlp=2, activation=False, cs=8.0, small=False, extra_style_dim=-1):
        super().__init__()
        ch = _chan_table(cs)
        self.log_size = int(math.log2(out_size))
        self.out_size, self.activation, self.extra_style_dim = out_size, activation, extra_style_dim
        self.conv_body_first = tnn.Conv2d(in_dim, ch[out_size], 1)
        self.conv_body_down = tnn.ModuleList()
        cin = ch[out_size]
        for i in range(self.log_size, 2, -1):
            cout = ch[2 ** (i - 1)]
            self.conv_body_down.append(TResBlock(cin, cout, "down"))
            cin = cout
        self.final_conv = tnn.Conv2d(cin, ch[4], 3, 1, 1)
        self.final_linear = tnn.Linear(ch[4] * 16, style_dim)
        if extra_style_dim > 0:
            self.style_fuse = tnn.Sequential(
                tnn.Linear(extra_style_dim + style_dim, style_dim),
                tnn.LeakyReLU(0.2, True),
                tnn.Linear(style_dim, style_dim),
            )
        self.conv_body_up = tnn.ModuleList()
        cin = ch[4]
        for i in range(3, self.log_size + 1):
            cout = ch[2**i]
            self.conv_body_up.append(TResBlock(cin, cout, "up"))
            cin = cout
        self.condition_scale = tnn.ModuleList()
        self.condition_shift = tnn.ModuleList()
        for i in range(3, self.log_size + 1):
            c = ch[2**i]
            for lst in (self.condition_scale, self.condition_shift):
                lst.append(tnn.Sequential(
                    tnn.Conv2d(c, c, 3, 1, 1), tnn.LeakyReLU(0.2, True), tnn.Conv2d(c, c, 3, 1, 1)
                ))
        self.stylegan_decoder = TGenerator(out_size, out_dim, style_dim, num_mlp, cs, small)

    def forward(self, x, extra_style=None):
        conditions, skips = [], []
        feat = tF.leaky_relu(self.conv_body_first(x), 0.2)
        for blk in self.conv_body_down:
            feat = blk(feat)
            skips.insert(0, feat)
        feat = tF.leaky_relu(self.final_conv(feat), 0.2)
        style = self.final_linear(feat.reshape(feat.size(0), -1))
        if self.extra_style_dim > 0 and extra_style is not None:
            style = self.style_fuse(torch.cat([style, extra_style], dim=1))
        for i, blk in enumerate(self.conv_body_up):
            feat = feat + skips[i]
            feat = blk(feat)
            conditions.append(self.condition_scale[i](feat).clone())
            conditions.append(self.condition_shift[i](feat).clone())
        img = self.stylegan_decoder(style, conditions)
        return torch.sigmoid(img) if self.activation else img


# ---------------------------------------------------------------------------
# tests: StyleUNet (both variants)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("small,extra", [(True, False), (False, True)])
def test_styleunet_conversion_parity(small, extra):
    from guava_renderer_tpu.models.styleunet import StyleUNet

    size, in_dim, out_dim, style_dim, num_mlp, cs = 32, 6, 4, 64, 2, 8.0
    tm = TStyleUNet(size, size, in_dim, out_dim, style_dim, num_mlp,
                    activation=False, cs=cs, small=small,
                    extra_style_dim=style_dim if extra else -1)
    tm.eval()
    x = torch.randn(2, in_dim, size, size)
    es = torch.randn(2, style_dim) if extra else None
    with torch.no_grad():
        ty = tm(x, es).numpy()

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
    fy = np.asarray(fy).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(fy, ty, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# tests: decoders
# ---------------------------------------------------------------------------


def test_vertex_decoder_conversion_parity():
    from guava_renderer_tpu.models.decoders import VertexGSDecoder

    in_dim, dir_dim, color = 32, 27, 8

    class TVert(tnn.Module):
        def __init__(self):
            super().__init__()
            h = in_dim // 2
            self.feature_layers = tnn.Sequential(
                tnn.Linear(in_dim, h), tnn.ReLU(True), tnn.Linear(h, h), tnn.ReLU(True),
                tnn.Linear(h, h), tnn.ReLU(True), tnn.Linear(h, h),
            )
            li = h + dir_dim
            for name, od in (("color_layers", color), ("opacity_layers", 1),
                             ("scale_layers", 3), ("rotation_layers", 4)):
                setattr(self, name, tnn.Sequential(
                    tnn.Linear(li, 128), tnn.ReLU(True), tnn.Linear(128, od)))

        def forward(self, f, dirs):
            f = self.feature_layers(f)
            dirs = dirs[:, None].expand(-1, f.shape[1], -1)
            f = torch.cat([f, dirs], dim=-1)
            return {
                "colors": self.color_layers(f),
                "opacities": torch.sigmoid(self.opacity_layers(f)),
                "scales": torch.sigmoid(self.scale_layers(f)) * 0.05,
                # reference default dim=1: normalize across vertices
                # (feature_decoder.py:55; see test_reference_parity.py)
                "rotations": tF.normalize(self.rotation_layers(f), dim=1),
            }

    tm = TVert().eval()
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
        np.testing.assert_allclose(np.asarray(fy[k]), ty[k].numpy(), atol=1e-5, rtol=1e-4)


def test_uv_decoder_conversion_parity():
    from guava_renderer_tpu.models.decoders import UVPointGSDecoder

    in_dim, dir_dim, color = 24, 27, 8

    class TUV(tnn.Module):
        def __init__(self):
            super().__init__()
            h1, h2 = max(in_dim, 128), max(in_dim // 2, 64)
            self.feature_conv = tnn.Sequential(
                tnn.Conv2d(in_dim + dir_dim, h1, 3, 1, 1), tnn.LeakyReLU(True and 0.01),
                tnn.Conv2d(h1, h1, 3, 1, 1), tnn.LeakyReLU(0.01),
                tnn.Conv2d(h1, h1, 3, 1, 1),
            )
            self.rot_head = tnn.Sequential(
                tnn.Conv2d(h1, h2, 3, padding=1), tnn.LeakyReLU(0.01), tnn.Conv2d(h2, 4, 1))
            self.scale_head = tnn.Sequential(
                tnn.Conv2d(h1, h2, 3, padding=1), tnn.LeakyReLU(0.01), tnn.Conv2d(h2, 3, 1))
            self.opacity_head = tnn.Sequential(
                tnn.Conv2d(h1, h2, 3, padding=1), tnn.LeakyReLU(0.01), tnn.Conv2d(h2, 1, 1))
            self.color_head = tnn.Sequential(
                tnn.Conv2d(h1, h1, 3, padding=1), tnn.LeakyReLU(0.01), tnn.Conv2d(h1, color, 1))
            self.local_pos_head = tnn.Sequential(
                tnn.Conv2d(h1, h1, 3, padding=1), tnn.LeakyReLU(0.01),
                tnn.Conv2d(h1, h2, 3, padding=1), tnn.LeakyReLU(0.01), tnn.Conv2d(h2, 3, 1))

        def forward(self, f, dirs):
            b, h, w = f.shape[0], f.shape[2], f.shape[3]
            dirs = dirs[:, :, None, None].expand(-1, -1, h, w)
            g = self.feature_conv(torch.cat([f, dirs], dim=1))
            out = {
                "colors": self.color_head(g),
                "opacities": torch.sigmoid(self.opacity_head(g)),
                "scales": torch.exp(self.scale_head(g)),
                "rotations": tF.normalize(self.rot_head(g), dim=1),
                "local_pos": self.local_pos_head(g),
            }
            return {k: v.permute(0, 2, 3, 1).contiguous() for k, v in out.items()}

    tm = TUV().eval()
    f = torch.randn(2, in_dim, 8, 8)
    d = torch.randn(2, dir_dim)
    with torch.no_grad():
        ty = tm(f, d)

    sd = {f"u.{k}": v for k, v in sd_numpy(tm).items()}
    params = convert_uv_decoder(sd, "u")
    fm = UVPointGSDecoder(in_dim=in_dim, color_dim=color)
    fy = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(f.numpy().transpose(0, 2, 3, 1)), jnp.asarray(d.numpy()))
    for k in ty:
        np.testing.assert_allclose(np.asarray(fy[k]), ty[k].numpy(), atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# tests: DPT encoder (mini ViT + full neck)
# ---------------------------------------------------------------------------


class TViTBlock(tnn.Module):
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
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        a = torch.softmax(q @ k.transpose(-2, -1) * (D // self.heads) ** -0.5, dim=-1)
        h = (a @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.ls1.gamma * self.attn.proj(h)
        h = self.norm2(x)
        h = self.mlp.fc2(tF.gelu(self.mlp.fc1(h)))
        return x + self.ls2.gamma * h


class TMiniDino(tnn.Module):
    def __init__(self, dim, depth, heads, grid):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, 14, stride=14)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + grid * grid, dim) * 0.02)
        self.blocks = tnn.ModuleList([TViTBlock(dim, heads) for _ in range(depth)])
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
                outs.append(self.norm(t))
        return outs


class TDPT(tnn.Module):
    """DINO_Enocder mini (ref: dino_encoder.py:6-113), small dims."""

    def __init__(self, dim, depth, heads, grid, out1, out2, hidden, pyr):
        super().__init__()
        self.dino_model = TMiniDino(dim, depth, heads, grid)
        self.projects = tnn.ModuleList([tnn.Conv2d(dim, od, 1) for od in pyr])
        self.resize_layers = tnn.ModuleList([
            tnn.ConvTranspose2d(pyr[0], pyr[0], 4, stride=4),
            tnn.ConvTranspose2d(pyr[1], pyr[1], 2, stride=2),
            tnn.Identity(),
            tnn.Conv2d(pyr[3], pyr[3], 3, stride=2, padding=1),
        ])
        self.layer_rn = tnn.ModuleList([
            tnn.Conv2d(od + 3, hidden, 3, 1, 1, bias=False) for od in pyr
        ])
        self.refinenet = tnn.ModuleList([TFFB(hidden) for _ in range(4)])
        self.project_l = tnn.Sequential(
            tnn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
            tnn.Conv2d(dim, hidden, 3, 1, 1, bias=False),
            tnn.Upsample(scale_factor=4, mode="bilinear", align_corners=True),
            tnn.Conv2d(hidden, hidden // 2, 3, 1, 1, bias=False),
        )
        self.fuse_l = tnn.Sequential(
            tnn.Conv2d(hidden + hidden // 2 + 3, hidden, 3, 1, 1, bias=False),
            tnn.LeakyReLU(True and 0.01),
            tnn.Conv2d(hidden, hidden, 3, 1, 1, bias=False),
        )
        self.skip_l = tnn.Conv2d(hidden + 3, hidden, 3, 1, 1, bias=False)
        self.output_conv = tnn.Conv2d(hidden, out1, 3, 1, 1)
        self.output_conv_2 = tnn.Conv2d(hidden, out2, 3, 1, 1)

    def forward(self, images, output_size):
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        images = (images - mean) / std
        ph, pw = images.shape[-2] // 14, images.shape[-1] // 14
        feats = self.dino_model.get_intermediate_layers(images, 5)
        low, *feats = feats
        outs = []
        for i, f in enumerate(feats):
            f = f[:, 1:].permute(0, 2, 1).reshape(f.shape[0], -1, ph, pw).contiguous()
            f = self.resize_layers[i](self.projects[i](f))
            rgb = tF.interpolate(images, (f.shape[-2], f.shape[-1]), mode="bilinear",
                                 align_corners=False, antialias=True)
            outs.append(torch.cat([rgb, f], dim=1))
        rns = [self.layer_rn[i](f) for i, f in enumerate(outs)]
        p = self.refinenet[0](rns[3], size=rns[2].shape[2:])
        p = self.refinenet[1](p, rns[2], size=rns[1].shape[2:])
        p = self.refinenet[2](p, rns[1], size=rns[0].shape[2:])
        p = self.refinenet[3](p, rns[0])
        p = tF.interpolate(p, output_size, mode="bilinear", align_corners=False)
        img_l = tF.interpolate(images, output_size, mode="bilinear", align_corners=False)
        lo = low[:, 1:].permute(0, 2, 1).reshape(low.shape[0], -1, ph, pw).contiguous()
        lo = self.project_l(lo)
        lo = tF.interpolate(lo, output_size, mode="bilinear", align_corners=False)
        p = torch.cat([p, img_l], dim=1)
        p = self.fuse_l(torch.cat([p, lo], dim=1)) + self.skip_l(p)
        return {
            "f_map1": self.output_conv(p),
            "f_map2": self.output_conv_2(p),
            # real get_intermediate_layers strips CLS, so the reference's
            # [:, 0] is the first PATCH token; this mini keeps CLS -> [:, 1]
            "f_global": feats[-1][:, 1],
        }


class TRCU(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, 1, 1)
        self.conv2 = tnn.Conv2d(f, f, 3, 1, 1)

    def forward(self, x):
        out = tF.relu(x)
        out = self.conv1(out)
        out = tF.relu(out)
        return self.conv2(out) + x


class TFFB(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.out_conv = tnn.Conv2d(f, f, 1)
        self.resConfUnit1 = TRCU(f)
        self.resConfUnit2 = TRCU(f)

    def forward(self, *xs, size=None):
        out = xs[0]
        if len(xs) == 2:
            out = out + self.resConfUnit1(xs[1])
        out = self.resConfUnit2(out)
        if size is None:
            out = tF.interpolate(out, scale_factor=2, mode="bilinear", align_corners=False)
        else:
            out = tF.interpolate(out, size=size, mode="bilinear", align_corners=False)
        return self.out_conv(out)


def test_dpt_encoder_conversion_parity():
    from guava_renderer_tpu.models.dpt_encoder import DinoDPTEncoder

    dim, depth, heads, grid = 32, 5, 4, 4
    out1, out2, hidden = 4, 8, 8
    pyr = (8, 8, 8, 8)
    feat, out_size = 56, 32  # 4x4 tokens

    tm = TDPT(dim, depth, heads, grid, out1, out2, hidden, pyr).eval()
    x = torch.rand(2, 3, feat, feat)
    with torch.no_grad():
        ty = tm(x, out_size)

    sd = {f"dino_encoder.{k}": v for k, v in sd_numpy(tm).items()}
    params = convert_dpt_encoder(sd, "dino_encoder")

    fm = DinoDPTEncoder(out_dim_1=out1, out_dim_2=out2, hidden=hidden,
                        output_size=out_size, vit_dim=dim, vit_depth=depth,
                        vit_heads=heads, vit_pos_grid=grid, pyramid_dims=pyr)
    fy = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(fy["f_global"]), ty["f_global"].numpy(), atol=2e-4, rtol=1e-3)
    for k in ("f_map1", "f_map2"):
        np.testing.assert_allclose(
            np.asarray(fy[k]).transpose(0, 3, 1, 2), ty[k].numpy(), atol=5e-4, rtol=1e-2)
