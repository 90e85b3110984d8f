"""Integration checks against the real GUAVA auxiliary assets (skipped when
the asset directory is unavailable). The SMPL-X/FLAME model npz/pkl are
license-gated and may be absent; these tests only exercise files that ship
with the reference's assets folder."""

import os

import numpy as np
import pytest

ASSETS = os.environ.get("GUAVA_ASSETS_DIR", "/root/reference/assets")
SMPLX_DIR = os.path.join(ASSETS, "SMPLX")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SMPLX_DIR, "smplx_uv.obj")),
    reason="reference assets unavailable",
)


def test_uv_tables_match_reference_mask():
    from guava_renderer_tpu.bodymodel.data import parse_obj_uv, uv_face_tables

    _, tex, fv, fvt = parse_obj_uv(os.path.join(SMPLX_DIR, "smplx_uv.obj"))
    assert fv.shape == (20908, 3)
    tex = tex.copy()
    tex[:, 1] = 1.0 - tex[:, 1]
    fidx, fbary, fmask = uv_face_tables(tex, fvt, 512)

    # the shipped uv_mask npy was generated with a slightly different
    # convention than the in-code derivation; require high IoU only
    ref = np.load(
        os.path.join(SMPLX_DIR, "uv_masks", "uv_mask512_with_faceid_smplx.npy")
    ).reshape(512, 512)
    ref_mask = ref >= 0
    iou = (fmask & ref_mask).sum() / (fmask | ref_mask).sum()
    assert iou > 0.95, f"mask IoU too low: {iou}"

    # exact parity with the reference's own in-code derivation (cv2 fill)
    cv2 = pytest.importorskip("cv2")
    uvc = np.round(tex * 512).astype(np.int32)
    ref_idx = np.full((512, 512), -1, np.int32)
    for f in range(len(fvt)):
        cv2.drawContours(ref_idx, [uvc[fvt[f]]], 0, int(f), -1)
    np.testing.assert_array_equal(fidx, ref_idx)


def test_flame_lip_rings_present():
    from guava_renderer_tpu.bodymodel.data import _flame_lip_rings

    rings = _flame_lip_rings(os.path.join(ASSETS, "FLAME"))
    assert rings["upper"].shape == rings["lower"].shape
    assert rings["upper"].shape[0] == 15  # teeth row width matches reference


def test_mano_vertex_ids_load():
    import pickle

    with open(os.path.join(SMPLX_DIR, "MANO_SMPLX_vertex_ids.pkl"), "rb") as f:
        ids = pickle.load(f, encoding="latin1")
    assert set(ids) >= {"left_hand", "right_hand"}
    assert len(ids["left_hand"]) == len(ids["right_hand"]) == 778
