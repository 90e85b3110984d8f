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
