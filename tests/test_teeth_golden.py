"""Teeth-graft golden parity vs the reference construction.

The face test parses the reference's hard-coded 168-triple tables out of its
source (gated on /root/reference being present) and requires triple-for-
triple equality with our generated strips. The vertex test re-derives the
reference's row equations (ref: SMPLX.py:438-460) independently in numpy.
"""

import os
import re

import numpy as np
import pytest

from guava_renderer_tpu.bodymodel.teeth import ROWS, generate_teeth_vertices, teeth_faces

REF_SMPLX = "/root/reference/models/modules/smplx/SMPLX.py"


def _row_ids(n=15, base=0):
    return {k: base + np.arange(i * n, (i + 1) * n, dtype=np.int32) for i, k in enumerate(ROWS)}


@pytest.mark.skipif(not os.path.exists(REF_SMPLX), reason="reference not mounted")
def test_teeth_faces_match_reference_tables():
    src = open(REF_SMPLX).read()
    ref = []
    for name in ("f_teeth_upper", "f_teeth_lower"):
        m = re.search(name + r" = torch.tensor\(\[(.*?)\]\)", src, re.S)
        ref.extend(
            [tuple(map(int, t)) for t in re.findall(r"\[\s*(\d+),\s*(\d+),\s*(\d+)\s*\]", m.group(1))]
        )
    ref = np.asarray(ref, np.int32)
    ours = teeth_faces(_row_ids())
    assert ours.shape == ref.shape == (168, 3)
    np.testing.assert_array_equal(ours, ref)


def test_teeth_vertex_rows_match_reference_equations():
    rng = np.random.default_rng(3)
    up = rng.normal(size=(15, 3)).astype(np.float32) * 0.02 + np.array([0, 1.6, 0.05], np.float32)
    lo = up + rng.normal(size=(15, 3)).astype(np.float32) * 0.005 - np.array([0, 0.01, 0], np.float32)

    rows = generate_teeth_vertices(up, lo)

    # independent numpy transcription of ref SMPLX.py:438-460
    d = np.linalg.norm(up - lo, axis=-1, keepdims=True).mean()
    mid = (up + lo) / 2
    mid[:, 1] = mid[:, [1]].mean(0, keepdims=True)
    mid[:, 2] -= d * 1.5
    u_edge = mid + np.array([[0, d, 0]]) * 0.1
    u_root = u_edge + np.array([[0, d, 0]]) * 2
    l_edge = mid - np.array([[0, d, 0]]) * 0.1 - np.array([[0, 0, d]]) * 0.4
    l_root = l_edge - np.array([[0, d, 0]]) * 2
    th = d * 1.0
    want = {
        "upper_root": u_root, "lower_root": l_root,
        "upper_edge": u_edge, "lower_edge": l_edge,
        "upper_root_back": u_root - [0, 0, th], "upper_edge_back": u_edge - [0, 0, th],
        "lower_root_back": l_root - [0, 0, th], "lower_edge_back": l_edge - [0, 0, th],
    }
    for k in ROWS:
        np.testing.assert_allclose(rows[k], want[k], atol=1e-6, err_msg=k)


def test_teeth_faces_are_closed_strips():
    f = teeth_faces(_row_ids())
    # every boundary edge count: strips are open at the row ends only
    edges = {}
    for tri in f:
        for e in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            key = tuple(sorted(e))
            edges[key] = edges.get(key, 0) + 1
    assert max(edges.values()) <= 2  # manifold: no edge shared by >2 faces
