"""Weight-converter test against a synthetic torch-layout state dict."""

import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "convert_weights", os.path.join(REPO, "tools", "convert_weights.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def fake_dinov2_state(rng, depth=12, dim=768, grid=37):
    s = {}
    s["patch_embed.proj.weight"] = rng.normal(size=(dim, 3, 14, 14)).astype(np.float32)
    s["patch_embed.proj.bias"] = np.zeros(dim, np.float32)
    s["cls_token"] = rng.normal(size=(1, 1, dim)).astype(np.float32)
    s["pos_embed"] = rng.normal(size=(1, 1 + grid * grid, dim)).astype(np.float32) * 0.02
    for i in range(depth):
        b = f"blocks.{i}."
        s[b + "norm1.weight"] = np.ones(dim, np.float32)
        s[b + "norm1.bias"] = np.zeros(dim, np.float32)
        s[b + "attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32) * 0.02
        s[b + "attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        s[b + "attn.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32) * 0.02
        s[b + "attn.proj.bias"] = np.zeros(dim, np.float32)
        s[b + "ls1.gamma"] = np.ones(dim, np.float32)
        s[b + "norm2.weight"] = np.ones(dim, np.float32)
        s[b + "norm2.bias"] = np.zeros(dim, np.float32)
        s[b + "mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32) * 0.02
        s[b + "mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
        s[b + "mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32) * 0.02
        s[b + "mlp.fc2.bias"] = np.zeros(dim, np.float32)
        s[b + "ls2.gamma"] = np.ones(dim, np.float32)
    s["norm.weight"] = np.ones(dim, np.float32)
    s["norm.bias"] = np.zeros(dim, np.float32)
    return s


def test_dinov2_conversion_roundtrip(rng):
    tool = _load_tool()
    state = fake_dinov2_state(rng)
    params = tool.convert_dinov2(state)
    tool.validate_dinov2(params)

    # attention math parity on one block: torch-style qkv vs our flax layout
    import jax.numpy as jnp

    x = rng.normal(size=(1, 5, 768)).astype(np.float32)
    W = state["blocks.0.attn.qkv.weight"]
    torch_qkv = x @ W.T  # torch linear
    flax_qkv = np.asarray(jnp.asarray(x) @ jnp.asarray(params["block0"]["attn"]["qkv"]["kernel"]))
    np.testing.assert_allclose(torch_qkv, flax_qkv, atol=1e-4)


def test_dinov2_conversion_forward_activation_parity():
    """Full-forward parity: a tiny torch DINOv2-style ViT (patch conv, cls +
    pos embed, pre-LN blocks with LayerScale, final norm on intermediates)
    must produce the same tokens through our VisionTransformer after
    convert_dinov2_vit (SURVEY risk: gate conversions with activation diffs)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    import jax.numpy as jnp

    from guava_renderer_tpu.models.vit import VisionTransformer
    from guava_renderer_tpu.train.weights import convert_dinov2_vit

    dim, heads, depth, patch, grid = 16, 2, 3, 2, 3
    torch.manual_seed(0)

    class Blk(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            self.attn = tnn.ModuleDict({})
            self.attn_qkv = tnn.Linear(dim, 3 * dim)
            self.attn_proj = tnn.Linear(dim, dim)
            self.ls1_gamma = tnn.Parameter(torch.rand(dim) * 0.5 + 0.5)
            self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            self.fc1 = tnn.Linear(dim, 4 * dim)
            self.fc2 = tnn.Linear(4 * dim, dim)
            self.ls2_gamma = tnn.Parameter(torch.rand(dim) * 0.5 + 0.5)

        def forward(self, x):
            B, N, D = x.shape
            h = self.norm1(x)
            qkv = self.attn_qkv(h).reshape(B, N, 3, heads, D // heads)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q, k, v = (t.transpose(1, 2) for t in (q, k, v))
            a = torch.softmax(q @ k.transpose(-2, -1) * (D // heads) ** -0.5, dim=-1)
            h = (a @ v).transpose(1, 2).reshape(B, N, D)
            x = x + self.attn_proj(h) * self.ls1_gamma
            h = self.fc2(torch.nn.functional.gelu(self.fc1(self.norm2(x))))
            return x + h * self.ls2_gamma

    class MiniViT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.proj = tnn.Conv2d(3, dim, patch, stride=patch)
            self.cls = tnn.Parameter(torch.randn(1, 1, dim))
            self.pos = tnn.Parameter(torch.randn(1, 1 + grid * grid, dim) * 0.02)
            self.blocks = tnn.ModuleList([Blk() for _ in range(depth)])
            self.norm = tnn.LayerNorm(dim, eps=1e-6)

        def forward(self, img, n_last=2):
            B = img.shape[0]
            x = self.proj(img).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls.expand(B, -1, -1), x], dim=1) + self.pos
            outs = []
            for i, b in enumerate(self.blocks):
                x = b(x)
                if i >= depth - n_last:
                    outs.append(self.norm(x))
            return outs

    m = MiniViT().eval()
    sd = {}
    sd["patch_embed.proj.weight"] = m.proj.weight.detach().numpy()
    sd["patch_embed.proj.bias"] = m.proj.bias.detach().numpy()
    sd["cls_token"] = m.cls.detach().numpy()
    sd["pos_embed"] = m.pos.detach().numpy()
    for i, b in enumerate(m.blocks):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = b.norm1.weight.detach().numpy()
        sd[p + "norm1.bias"] = b.norm1.bias.detach().numpy()
        sd[p + "attn.qkv.weight"] = b.attn_qkv.weight.detach().numpy()
        sd[p + "attn.qkv.bias"] = b.attn_qkv.bias.detach().numpy()
        sd[p + "attn.proj.weight"] = b.attn_proj.weight.detach().numpy()
        sd[p + "attn.proj.bias"] = b.attn_proj.bias.detach().numpy()
        sd[p + "ls1.gamma"] = b.ls1_gamma.detach().numpy()
        sd[p + "norm2.weight"] = b.norm2.weight.detach().numpy()
        sd[p + "norm2.bias"] = b.norm2.bias.detach().numpy()
        sd[p + "mlp.fc1.weight"] = b.fc1.weight.detach().numpy()
        sd[p + "mlp.fc1.bias"] = b.fc1.bias.detach().numpy()
        sd[p + "mlp.fc2.weight"] = b.fc2.weight.detach().numpy()
        sd[p + "mlp.fc2.bias"] = b.fc2.bias.detach().numpy()
        sd[p + "ls2.gamma"] = b.ls2_gamma.detach().numpy()
    sd["norm.weight"] = m.norm.weight.detach().numpy()
    sd["norm.bias"] = m.norm.bias.detach().numpy()

    tree = convert_dinov2_vit(sd)

    img = np.random.default_rng(1).normal(size=(2, 6, 6, 3)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in m(torch.from_numpy(img).permute(0, 3, 1, 2))]

    vit = VisionTransformer(patch_size=patch, dim=dim, depth=depth,
                            num_heads=heads, pos_grid=grid, num_intermediate=2)
    got = vit.apply({"params": tree}, jnp.asarray(img))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-5)
