"""Shape/sanity tests for the Flax model zoo (small configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guava_renderer_tpu.models import (
    DinoDPTEncoder,
    SimpleUNet,
    StyleUNet,
    UVPointGSDecoder,
    VertexGSDecoder,
)
from guava_renderer_tpu.models.layers import harmonic_embedding, resize_bilinear


def test_harmonic_embedding_dim():
    x = jnp.ones((2, 3))
    e = harmonic_embedding(x, 4)
    assert e.shape == (2, 27)  # 3 * (2*4 + 1) — ref ubody_gaussian.py:44


def test_resize_align_corners_endpoints():
    x = jnp.arange(4.0).reshape(1, 1, 4, 1)
    y = resize_bilinear(x, (1, 7), align_corners=True)
    np.testing.assert_allclose(y[0, 0, :, 0], [0, 0.5, 1, 1.5, 2, 2.5, 3], atol=1e-6)


def test_dino_dpt_encoder_shapes():
    # tiny config: 70x70 input (5x5 patches), 64 output
    m = DinoDPTEncoder(out_dim_1=8, out_dim_2=16, hidden=32, output_size=64)
    x = jnp.zeros((1, 70, 70, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["f_map1"].shape == (1, 64, 64, 8)
    assert out["f_map2"].shape == (1, 64, 64, 16)
    assert out["f_global"].shape == (1, 768)
    assert np.isfinite(np.asarray(out["f_map1"])).all()


def test_encoder_backbone_frozen():
    m = DinoDPTEncoder(out_dim_1=4, out_dim_2=4, hidden=16, output_size=32)
    x = jnp.ones((1, 70, 70, 3)) * 0.5
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(m.apply(p, x)["f_map1"] ** 2)

    g = jax.grad(loss)(params)
    dino_g = jax.tree_util.tree_leaves(g["params"]["dino"])
    assert all(float(jnp.abs(t).max()) == 0.0 for t in dino_g)
    head_g = jax.tree_util.tree_leaves(g["params"]["output_conv"])
    assert any(float(jnp.abs(t).max()) > 0.0 for t in head_g)


@pytest.mark.parametrize("small", [False, True])
def test_styleunet_shapes(small):
    m = StyleUNet(in_size=64, out_size=64, in_dim=5, out_dim=3, small=small,
                  channel_scale=4, num_mlp=2, extra_style_dim=16)
    x = jnp.zeros((2, 64, 64, 5))
    extra = jnp.zeros((2, 16))
    params = m.init(jax.random.PRNGKey(0), x, extra, jax.random.PRNGKey(1))
    out = m.apply(params, x, extra, jax.random.PRNGKey(2))
    assert out.shape == (2, 64, 64, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid


def test_styleunet_downscale_input():
    # in_size 128 -> out 64 uses the extra first_down block
    m = StyleUNet(in_size=128, out_size=64, in_dim=4, out_dim=2,
                  channel_scale=4, num_mlp=1)
    x = jnp.zeros((1, 128, 128, 4))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (1, 64, 64, 2)


def test_simpleunet_shapes():
    m = SimpleUNet(in_size=64, out_size=64, in_dim=32, out_dim=3, channel_scale=4)
    x = jnp.zeros((1, 64, 64, 32))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (1, 64, 64, 3)


def test_vertex_decoder():
    m = VertexGSDecoder(in_dim=64)
    feats = jax.random.normal(jax.random.PRNGKey(3), (2, 100, 64))
    dirs = jax.random.normal(jax.random.PRNGKey(4), (2, 27))
    params = m.init(jax.random.PRNGKey(0), feats, dirs)
    out = m.apply(params, feats, dirs)
    assert out["colors"].shape == (2, 100, 32)
    assert out["opacities"].shape == (2, 100, 1)
    assert float(out["scales"].max()) <= 0.05
    # reference quirk: F.normalize(dim=1) normalizes across the VERTEX axis
    # (ref feature_decoder.py:58; see decoders.py) — per-quat norms are NOT
    # 1, but each (B, 4)-column across vertices is unit
    np.testing.assert_allclose(
        np.linalg.norm(out["rotations"], axis=1), 1.0, atol=1e-5
    )
    per_quat = np.linalg.norm(out["rotations"], axis=-1)
    assert float(np.abs(per_quat - 1.0).max()) > 0.1


def test_uv_decoder():
    m = UVPointGSDecoder(in_dim=32)
    feats = jnp.zeros((1, 16, 16, 32))
    dirs = jnp.zeros((1, 27))
    params = m.init(jax.random.PRNGKey(0), feats, dirs)
    out = m.apply(params, feats, dirs)
    assert out["colors"].shape == (1, 16, 16, 32)
    assert out["local_pos"].shape == (1, 16, 16, 3)
    assert float(out["scales"].min()) > 0.0  # exp
