"""Fast-lowering drop-ins: Conv (im2col) vs nn.Conv, matrix resize vs
jax.image.resize — exact-math replacements measured 5x/170x faster on-chip
(outputs/bench/tpu_diag_r8.log)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from guava_renderer_tpu.models.layers import Conv, resize_bilinear


@pytest.mark.parametrize("k,cin,cout,use_bias", [
    (3, 16, 16, True), (1, 8, 4, False), (5, 6, 10, True), (7, 4, 4, True),
])
def test_conv_matches_nn_conv(k, cin, cout, use_bias):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, cin)), jnp.float32)
    ref = nn.Conv(cout, (k, k), padding=k // 2, use_bias=use_bias)
    params = ref.init(jax.random.PRNGKey(0), x)
    want = ref.apply(params, x)
    got = Conv(cout, (k, k), padding=k // 2, use_bias=use_bias).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_conv_strided_fallback_matches():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 6)), jnp.float32)
    ref = nn.Conv(8, (3, 3), strides=(2, 2), padding=1)
    params = ref.init(jax.random.PRNGKey(0), x)
    want = ref.apply(params, x)
    got = Conv(8, (3, 3), strides=(2, 2), padding=1).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_conv_param_tree_matches_nn_conv():
    x = jnp.zeros((1, 8, 8, 5))
    a = nn.Conv(7, (3, 3), padding=1).init(jax.random.PRNGKey(0), x)
    b = Conv(7, (3, 3), padding=1).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for pa, pb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        assert pa.shape == pb.shape and pa.dtype == pb.dtype


@pytest.mark.parametrize("hw,size,antialias", [
    ((512, 512), (256, 256), True),
    ((512, 512), (256, 256), False),
    ((96, 64), (48, 32), True),
    ((37, 37), (74, 74), True),     # DPT-style odd upscale
    ((128, 128), (256, 256), False),
    ((518, 518), (512, 512), False),
])
def test_matrix_resize_matches_jax_image(hw, size, antialias):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, hw[0], hw[1], 3)), jnp.float32)
    want = jax.image.resize(x, (1, size[0], size[1], 3), method="bilinear",
                            antialias=antialias)
    got = resize_bilinear(x, size, antialias=antialias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
