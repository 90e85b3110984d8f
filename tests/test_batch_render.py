"""Frames-data-parallel offline rendering: mesh output must equal the
sequential single-device render exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from guava_renderer_tpu.avatar.state import GaussianAvatar
from guava_renderer_tpu.parallel.batch_render import (
    make_batch_frame_renderer,
    pad_to_multiple,
)
from guava_renderer_tpu.parallel.mesh import data_parallel_mesh
from guava_renderer_tpu.testing import make_micro_pipeline
from guava_renderer_tpu.train.pipeline import _unpack_params


def _synthetic_avatar(statics, num_vertices, rng):
    V = num_vertices
    uv_valid = np.asarray(statics.uvmap_mask).reshape(-1)
    N_uv = uv_valid.shape[0]

    def mk(shape, lo, hi):
        return jnp.asarray(rng.uniform(lo, hi, shape), jnp.float32)

    def quats(n):
        q = rng.normal(size=(1, n, 4)).astype(np.float32)
        return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))

    return GaussianAvatar(
        vtx_positions=mk((1, V, 3), -0.2, 0.2),
        vtx_colors=mk((1, V, 32), 0, 1),
        vtx_opacity=mk((1, V, 1), 0.3, 0.9),
        vtx_scales=mk((1, V, 3), 0.01, 0.05),
        vtx_rotations=quats(V),
        uv_local_xyz=mk((1, N_uv, 3), -0.3, 0.3),
        uv_colors=mk((1, N_uv, 32), 0, 1),
        uv_opacity=mk((1, N_uv, 1), 0.3, 0.9),
        uv_scales=mk((1, N_uv, 3), 0.05, 0.2),
        uv_rotations=quats(N_uv),
        uv_binding_face=jnp.asarray(np.asarray(statics.uvmap_f_idx).reshape(-1)),
        uv_face_bary=jnp.asarray(np.asarray(statics.uvmap_f_bary).reshape(-1, 3)),
        uv_valid=jnp.asarray(uv_valid),
    )


def test_batch_frame_renderer_matches_sequential():
    tp = make_micro_pipeline(batch_size=8)
    s = tp.statics
    rng = np.random.default_rng(0)
    avatar = _synthetic_avatar(s, tp.num_vertices, rng)

    tgt = tp.batch["target"]
    tgt_params = tgt["params"]          # (8, ...) leaves
    w2c = tgt["w2c"]                    # (8, 4, 4)

    mesh = data_parallel_mesh(8)
    rend = make_batch_frame_renderer(
        s.renderer, s.ehm, s.faces, _unpack_params,
        image_size=s.image_size, invtanfov=s.invtanfov, mesh=mesh,
    )
    renders, raws = rend(tp.params["renderer"], avatar, tgt_params, w2c)
    assert renders.shape == (8, s.image_size, s.image_size, 3)

    # sequential reference on one device with the identical computation
    from guava_renderer_tpu.avatar.deformer import deform_avatar
    from guava_renderer_tpu.core.cameras import Camera

    for i in (0, 3, 7):
        p_i = jax.tree_util.tree_map(lambda x: x[i : i + 1], tgt_params)
        body, flame = _unpack_params(p_i)
        gs = deform_avatar(avatar, s.ehm, s.faces, body, flame)
        cam = Camera(
            R=w2c[i][:3, :3], t=w2c[i][:3, 3],
            tanfovx=jnp.asarray(1.0 / s.invtanfov), tanfovy=jnp.asarray(1.0 / s.invtanfov),
            width=s.image_size, height=s.image_size,
        )
        out = s.renderer.apply({"params": tp.params["renderer"]}, gs, [cam])
        want = np.asarray(jnp.clip(out.renders[0], 0, 1))
        np.testing.assert_allclose(np.asarray(renders[i]), want, atol=2e-5)


def test_pad_to_multiple():
    tree = {"a": jnp.arange(5), "b": jnp.ones((5, 2))}
    padded, n = pad_to_multiple(tree, 8)
    assert n == 5
    assert padded["a"].shape == (8,) and padded["b"].shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(padded["a"][4:]), [4, 4, 4, 4])
    exact, n2 = pad_to_multiple({"a": jnp.arange(8)}, 8)
    assert n2 == 8 and exact["a"].shape == (8,)
