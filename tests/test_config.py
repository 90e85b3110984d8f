import pytest

from guava_renderer_tpu.utils.config import ConfigDict, FrozenConfigError, load_config


def test_dot_access_and_readonly(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("MODEL:\n  dino_out_dim: 32\n  lr: 0.001\nDATA:\n  batch: 6\n")
    cfg = load_config(str(p))
    assert cfg.MODEL.dino_out_dim == 32
    assert cfg.DATA.batch == 6
    with pytest.raises(FrozenConfigError):
        cfg.MODEL.lr = 0.1
    cfg.set_readonly(False)
    cfg.MODEL.lr = 0.1
    assert cfg.MODEL.lr == 0.1


def test_merge_and_dump(tmp_path):
    base = ConfigDict({"a": 1, "b": {"c": 2, "d": 3}})
    merged = base.merge({"b": {"c": 9}, "e": 5})
    assert merged.b.c == 9 and merged.b.d == 3 and merged.e == 5
    out = tmp_path / "dump.yaml"
    merged._dump(str(out))
    cfg2 = load_config(str(out))
    assert cfg2.to_dict() == merged.to_dict()


def test_missing_key_message():
    cfg = ConfigDict({"x": 1})
    with pytest.raises(AttributeError, match="keys"):
        _ = cfg.y
