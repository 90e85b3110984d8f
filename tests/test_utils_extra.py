"""PLY export, camera orbit, checkpoints, metrics, logging tests."""

import json
import os

import jax.numpy as jnp
import numpy as np

from guava_renderer_tpu.utils.camera_orbit import generate_novel_view_poses, look_at_w2c
from guava_renderer_tpu.utils.logging_utils import MovingAverageMeter, SpeedMeter
from guava_renderer_tpu.utils.ply import (
    load_gaussian_ply,
    save_gaussian_ply,
    save_point_ply,
)


def test_gaussian_ply_roundtrip(tmp_path, rng):
    P = 50
    xyz = rng.normal(size=(P, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    op = rng.uniform(0.01, 0.99, (P, 1)).astype(np.float32)
    sc = rng.uniform(0.001, 0.1, (P, 3)).astype(np.float32)
    rot = rng.normal(size=(P, 4)).astype(np.float32)
    path = str(tmp_path / "g.ply")
    save_gaussian_ply(path, xyz, rgb, op, sc, rot)
    data = load_gaussian_ply(path)
    np.testing.assert_allclose(data["x"], xyz[:, 0], atol=1e-6)
    # SH DC inverts back to rgb
    rgb_back = data["f_dc_0"] * 0.28209479177387814 + 0.5
    np.testing.assert_allclose(rgb_back, rgb[:, 0], atol=1e-5)
    # opacity logit inverts
    op_back = 1 / (1 + np.exp(-data["opacity"]))
    np.testing.assert_allclose(op_back, op[:, 0], atol=1e-4)
    np.testing.assert_allclose(np.exp(data["scale_1"]), sc[:, 1], rtol=1e-5)


def test_point_ply(tmp_path, rng):
    path = str(tmp_path / "p.ply")
    save_point_ply(path, rng.normal(size=(10, 3)), rng.uniform(0, 1, (10, 3)))
    raw = open(path, "rb").read()
    assert raw.startswith(b"ply\n")
    assert b"element vertex 10" in raw


def test_look_at_orbit_matches_reference_transcription():
    """Literal numpy transcription of the reference sampler
    (utils/camera_utils.py:33-66) as ground truth."""

    def ref_sample(h, v, lookat, radius):
        v = np.clip(v, 1e-5, np.pi - 1e-5) / np.pi
        phi = np.arccos(1 - 2 * v)
        theta = h
        origin = np.array(
            [
                radius * np.sin(phi) * np.cos(np.pi - theta),
                radius * np.cos(phi),
                radius * np.sin(phi) * np.sin(np.pi - theta),
            ]
        )
        fwd = lookat - origin
        fwd = fwd / np.linalg.norm(fwd)
        up0 = np.array([0.0, 1.0, 0.0])
        right = -np.cross(up0, fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        up /= np.linalg.norm(up)
        rot = np.eye(4)
        rot[:3, :3] = np.stack([right, up, fwd], axis=-1)
        trans = np.eye(4)
        trans[:3, 3] = origin
        c2w = trans @ rot
        flip = np.diag([1.0, -1.0, -1.0, 1.0])
        return np.linalg.inv(c2w) @ flip

    lookat = np.asarray([0.0, 0.75, 0.0])
    for h, v, r in [(np.pi / 2, np.pi / 2, 3.0), (1.2, 1.8, 2.0), (2.0, 1.0, 5.0)]:
        ours = look_at_w2c(h, v, lookat, r)
        ref = ref_sample(h, v, lookat, r)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    poses = generate_novel_view_poses(np.linalg.inv(ours), num_keyframes=8)
    assert len(poses) == 8
    for m in poses:
        np.testing.assert_allclose(
            np.linalg.norm(np.linalg.inv(m)[:3, 3]), r, rtol=1e-4
        )


def test_checkpoint_best_latest(tmp_path):
    from guava_renderer_tpu.train.checkpoints import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    state = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
    cm.save_latest(state, 10)
    cm.save_best(state, 10, 0.81)
    cm.save_best({"w": jnp.full((3, 3), 2.0), "b": jnp.ones(3)}, 20, 0.9)
    # only one best kept
    bests = [d for d in os.listdir(cm.dir) if d.startswith("best_")]
    assert bests == ["best_20_0.9000"]
    assert cm.best_ssim() == 0.9
    found = cm.find_checkpoint()
    assert found.endswith("best_20_0.9000")
    restored, it = cm.restore(state)
    assert it == 20
    np.testing.assert_allclose(restored["w"], 2.0)


def test_metrics_evaluate(tmp_path, rng):
    import cv2

    from guava_renderer_tpu.train.metrics import evaluate_tree

    scene = tmp_path / "scene1"
    (scene / "render").mkdir(parents=True)
    (scene / "gt").mkdir()
    for i in range(3):
        img = (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        noisy = np.clip(img.astype(int) + rng.integers(-10, 10, img.shape), 0, 255).astype(np.uint8)
        cv2.imwrite(str(scene / "gt" / f"{i}.png"), img)
        cv2.imwrite(str(scene / "render" / f"{i}.png"), noisy)
    out = evaluate_tree(str(tmp_path))
    assert out["aggregate"]["psnr"] > 20
    assert 0 < out["aggregate"]["ssim"] <= 1
    assert json.load(open(tmp_path / "results.json"))["aggregate"]["psnr"] > 20


def test_meters(tmp_path):
    m = MovingAverageMeter(window=3)
    for i in range(5):
        m.update({"loss": i})
    assert m.averages()["loss"] == 3.0  # mean of [2, 3, 4]
    sm = SpeedMeter()
    with sm.time_infer():
        pass
    with sm.time_frame():
        pass
    sm.dump(str(tmp_path / "speed_info.json"))
    d = json.load(open(tmp_path / "speed_info.json"))
    assert "infer_time" in d and "render_speed" in d
