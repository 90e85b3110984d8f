"""Windowed face-table gather: parity + gradients vs the XLA gather spec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guava_renderer_tpu.ops.facegather import (
    build_face_sort_plan,
    face_window_gather,
    face_window_gather_reference,
)


def _make_plan(rng, N=2048, F=300, valid_frac=0.8):
    binding = rng.integers(0, F, N)
    valid = rng.uniform(size=N) < valid_frac
    plan = build_face_sort_plan(binding, valid)
    table = jnp.asarray(rng.normal(size=(plan.n_compact, 16)), jnp.float32)
    ids = jnp.asarray(plan.compact_ids)
    return plan, table, ids, binding, valid


def test_plan_consistency():
    rng = np.random.default_rng(0)
    plan, _, _, binding, valid = _make_plan(rng)
    # sorted compact ids are non-decreasing and invalid texels sort last
    assert np.all(np.diff(plan.compact_ids) >= 0)
    dummy = plan.n_compact - 1
    sorted_valid = valid[plan.perm]
    assert np.all((plan.compact_ids == dummy) == ~sorted_valid)
    # compact id -> original face round-trip for valid texels
    orig = binding[plan.perm]
    v = sorted_valid
    np.testing.assert_array_equal(plan.used_faces[plan.compact_ids[v]], orig[v])
    # inverse permutation really inverts
    np.testing.assert_array_equal(plan.perm[plan.inv_perm], np.arange(len(binding)))


def test_gather_matches_reference():
    rng = np.random.default_rng(1)
    plan, table, ids, _, _ = _make_plan(rng)
    got = face_window_gather(table, ids, plan)
    want = face_window_gather_reference(table, ids, plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_gather_matches_reference_uneven_chunks():
    # C not divisible by 16 exercises the k=1 path
    rng = np.random.default_rng(2)
    plan, table, ids, _, _ = _make_plan(rng, N=256 * 3, F=100)
    got = face_window_gather(table, ids, plan)
    want = face_window_gather_reference(table, ids, plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_gather_gradients_match_reference():
    rng = np.random.default_rng(3)
    plan, table, ids, _, _ = _make_plan(rng)
    w = jnp.asarray(rng.normal(size=(16, plan.n_texels)), jnp.float32)

    def loss_k(t):
        return jnp.sum(face_window_gather(t, ids, plan) * w)

    def loss_r(t):
        return jnp.sum(face_window_gather_reference(t, ids, plan) * w)

    gk = jax.grad(loss_k)(table)
    gr = jax.grad(loss_r)(table)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-4)


def test_dense_single_face_chunk():
    """All texels bound to one face (max window reuse, span 0)."""
    N, F = 512, 4
    binding = np.full(N, 2)
    valid = np.ones(N, bool)
    plan = build_face_sort_plan(binding, valid)
    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.normal(size=(plan.n_compact, 16)), jnp.float32)
    ids = jnp.asarray(plan.compact_ids)
    got = face_window_gather(table, ids, plan)
    want = face_window_gather_reference(table, ids, plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_planned_deform_matches_plain():
    """deform_with_vertices(plan=...) on a face-sorted avatar must equal
    the plain XLA-gather path on the same (sorted) inputs."""
    import jax.numpy as jnp

    from guava_renderer_tpu.avatar.deformer import (
        deform_with_vertices, sort_avatar_by_plan,
    )
    from guava_renderer_tpu.avatar.state import GaussianAvatar
    from guava_renderer_tpu.bodymodel.synthetic import _grid_mesh
    from guava_renderer_tpu.ops.facegather import (
        build_face_sort_plan, compact_faces,
    )

    rng = np.random.default_rng(21)
    gverts, gfaces = _grid_mesh(9, 9)
    V, F = gverts.shape[0], gfaces.shape[0]
    N, B = 512, 1
    verts = jnp.asarray(gverts[None] + rng.normal(0, 0.02, (B, V, 3)), jnp.float32)
    faces = jnp.asarray(gfaces, jnp.int32)
    T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, V, 4, 4))

    def mk(shape):
        return jnp.asarray(rng.normal(0, 1, shape), jnp.float32)

    quats = rng.normal(size=(B, N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    vq = rng.normal(size=(B, V, 4)).astype(np.float32)
    vq /= np.linalg.norm(vq, axis=-1, keepdims=True)
    binding = rng.integers(0, F, N)
    valid = (rng.uniform(size=N) < 0.8).astype(np.float32)
    avatar = GaussianAvatar(
        vtx_positions=verts,
        vtx_colors=mk((B, V, 32)),
        vtx_opacity=mk((B, V, 1)),
        vtx_scales=mk((B, V, 3)),
        vtx_rotations=jnp.asarray(vq),
        uv_local_xyz=mk((B, N, 3)),
        uv_colors=mk((B, N, 32)),
        uv_opacity=mk((B, N, 1)),
        uv_scales=mk((B, N, 3)),
        uv_rotations=jnp.asarray(quats),
        uv_binding_face=jnp.asarray(binding, jnp.int32),
        uv_face_bary=jnp.asarray(rng.dirichlet([1, 1, 1], N), jnp.float32),
        uv_valid=jnp.asarray(valid),
    )

    plan = build_face_sort_plan(binding, valid > 0)
    sorted_av = sort_avatar_by_plan(avatar, plan)
    cfaces = jnp.asarray(compact_faces(plan, gfaces))

    want = deform_with_vertices(sorted_av, verts, T, faces)
    got = deform_with_vertices(sorted_av, verts, T, faces,
                               plan=plan, compact_faces=cfaces)
    # invalid texels may differ in xyz/rot (dummy face) but are opacity-0;
    # compare valid texels exactly and opacity everywhere
    v = np.asarray(sorted_av.uv_valid) > 0
    for name in ("xyz", "rotation", "scaling"):
        a = np.asarray(getattr(got, name))[:, V:][:, v]
        b = np.asarray(getattr(want, name))[:, V:][:, v]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(got.opacity), np.asarray(want.opacity), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.colors), np.asarray(want.colors), atol=1e-6
    )


def test_frame_pipeline_planned_path_matches_plain(tmp_path):
    """FramePipeline's TPU-gated planned branch, forced on under the CPU
    interpreter, must render the same frame as the plain path."""
    import os

    import yaml

    from guava_renderer_tpu.cli.context import (
        build_runtime, init_params, resolve_config,
    )
    from guava_renderer_tpu.cli.inference import FramePipeline
    from guava_renderer_tpu.data.synthetic import write_synthetic_dataset
    from guava_renderer_tpu.data.tracked import TrackedVideoDataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds_dir = str(tmp_path / "ds")
    write_synthetic_dataset(ds_dir, n_videos=1, n_frames=2, image_size=48,
                            n_shape=8, n_exp=4)
    with open(os.path.join(repo, "configs/train/micro_synthetic.yaml")) as f:
        raw = yaml.safe_load(f)
    raw["DATASET"]["data_path"] = ds_dir
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)

    cfg = resolve_config(cfg_path)
    rt = build_runtime(cfg, synthetic_assets=True)
    params = init_params(rt, seed=0)["model"]
    m = cfg.MODEL
    ds = TrackedVideoDataset(
        ds_dir, "test",
        image_size=int(m.image_size),
        feature_img_size=int(m.feature_img_size),
        origin_image_size=int(cfg.DATASET.origin_image_size),
    )
    rec = ds[0]
    source, target = rec["source"], rec["target"]

    pipe = FramePipeline(rt, params)
    assert not pipe._use_plan  # CPU backend
    av_plain, _ = pipe.infer_avatar(source)
    out_plain = pipe.render_frame(av_plain, target)

    pipe2 = FramePipeline(rt, params)
    pipe2._use_plan = True
    av_planned, _ = pipe2.infer_avatar(source)
    assert pipe2._active_plan is not None
    out_planned = pipe2.render_frame(av_planned, target)

    np.testing.assert_allclose(
        np.asarray(out_planned["render"]), np.asarray(out_plain["render"]),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_planned["raw"]), np.asarray(out_plain["raw"]), atol=2e-5
    )


def test_frame_pipeline_grouped_matches_sequential(tmp_path):
    """render_frames (grouped two-phase prep xG / blend xG program) must
    produce the same images as render_frame one at a time — including a
    short final chunk that pads by replicating the last target."""
    import os

    import yaml

    from guava_renderer_tpu.cli.context import (
        build_runtime, init_params, resolve_config,
    )
    from guava_renderer_tpu.cli.inference import FramePipeline
    from guava_renderer_tpu.data.synthetic import write_synthetic_dataset
    from guava_renderer_tpu.data.tracked import TrackedVideoDataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds_dir = str(tmp_path / "ds")
    write_synthetic_dataset(ds_dir, n_videos=1, n_frames=4, image_size=48,
                            n_shape=8, n_exp=4)
    with open(os.path.join(repo, "configs/train/micro_synthetic.yaml")) as f:
        raw = yaml.safe_load(f)
    raw["DATASET"]["data_path"] = ds_dir
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)

    cfg = resolve_config(cfg_path)
    rt = build_runtime(cfg, synthetic_assets=True)
    params = init_params(rt, seed=0)["model"]
    m = cfg.MODEL
    ds = TrackedVideoDataset(
        ds_dir, "test",
        image_size=int(m.image_size),
        feature_img_size=int(m.feature_img_size),
        origin_image_size=int(cfg.DATASET.origin_image_size),
    )
    targets = [ds[i]["target"] for i in range(min(3, len(ds.frames)))]

    pipe = FramePipeline(rt, params)
    avatar, _ = pipe.infer_avatar(ds[0]["source"])
    seq = [pipe.render_frame(avatar, t) for t in targets]
    grp = pipe.render_frames(avatar, targets, group=2)  # 3 targets: 2+pad

    assert len(grp) == len(targets)
    for a, b in zip(seq, grp):
        np.testing.assert_allclose(
            np.asarray(a["render"]), np.asarray(b["render"]), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(a["raw"]), np.asarray(b["raw"]), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(a["invdepth"]), np.asarray(b["invdepth"]), atol=2e-5)
