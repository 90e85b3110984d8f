"""Record store + tracked dataset + loader tests."""

import numpy as np
import pytest

from guava_renderer_tpu.data.loader import PrefetchLoader, collate, endless
from guava_renderer_tpu.data.store import RecordStore, RecordStoreWriter
from guava_renderer_tpu.data.synthetic import write_synthetic_dataset
from guava_renderer_tpu.data.tracked import TrackedVideoDataset


def test_record_store_roundtrip(tmp_path):
    p = str(tmp_path / "test.grv")
    with RecordStoreWriter(p) as w:
        w.put("a/b/c", b"hello")
        w.put("x", b"\x00\x01\x02" * 100)
        w.put("empty", b"")
    rs = RecordStore(p)
    assert rs.get("a/b/c") == b"hello"
    assert rs.get("x") == b"\x00\x01\x02" * 100
    assert rs.get("empty") == b""
    assert rs.get("missing") is None
    assert len(rs) == 3
    assert set(rs.keys()) == {"a/b/c", "x", "empty"}
    rs.close()


def test_record_store_native_backend(tmp_path):
    p = str(tmp_path / "n.grv")
    with RecordStoreWriter(p) as w:
        for i in range(500):
            w.put(f"key{i}", f"value{i}".encode())
    rs = RecordStore(p, native=True)
    assert rs.backend == "native", "C++ reader failed to build/load"
    for i in (0, 99, 499):
        assert rs.get(f"key{i}") == f"value{i}".encode()
    py = RecordStore(p, native=False)
    assert py.backend == "python"
    assert py.get("key42") == rs.get("key42")
    rs.close()


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_data")
    write_synthetic_dataset(str(d), n_videos=2, n_frames=5, image_size=96)
    return str(d)


def test_tracked_dataset_record_schema(dataset_dir):
    ds = TrackedVideoDataset(
        dataset_dir, "train", image_size=64, feature_img_size=70, origin_image_size=96
    )
    assert len(ds) > 0
    rec = ds[0]
    assert rec["source"]["image"].shape == (70, 70, 3)
    assert rec["target"]["image"].shape == (64, 64, 3)
    assert rec["target"]["mask"].shape == (64, 64, 1)
    assert rec["target"]["w2c"].shape == (4, 4)
    # the pytorch3d->COLMAP flip makes the camera look +z with positive depth
    assert rec["target"]["w2c"][2, 3] > 0
    p = rec["target"]["params"]
    assert p["body_pose"].shape == (21, 3)
    assert p["shape"].shape == (20,)
    assert p["joints_offset"].shape == (55, 3)
    assert rec["target"]["boxes"]["head_box"].shape == (4,)


def test_loader_batches_and_host_sharding(dataset_dir):
    ds = TrackedVideoDataset(
        dataset_dir, "train", image_size=64, feature_img_size=70, origin_image_size=96
    )
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    b = batches[0]
    assert b["source"]["image"].shape == (2, 70, 70, 3)
    assert b["target"]["params"]["body_pose"].shape == (2, 21, 3)

    # two-host sharding partitions the index space
    l0 = PrefetchLoader(ds, batch_size=1, shuffle=False, host_id=0, num_hosts=2)
    l1 = PrefetchLoader(ds, batch_size=1, shuffle=False, host_id=1, num_hosts=2)
    assert len(l0) + len(l1) == len(ds)

    # endless iterator crosses epoch boundaries
    it = endless(PrefetchLoader(ds, batch_size=2, shuffle=True))
    for _ in range(len(ds)):
        next(it)


def test_collate_nested():
    recs = [{"a": np.ones(3), "b": {"c": np.zeros((2, 2))}} for _ in range(4)]
    out = collate(recs)
    assert out["a"].shape == (4, 3)
    assert out["b"]["c"].shape == (4, 2, 2)
