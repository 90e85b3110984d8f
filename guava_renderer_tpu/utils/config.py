"""Read-only dot-access YAML config system.

Capability parity with the reference's OmegaConf-backed ConfigDict
(ref: utils/general_utils.py:13-91) without the OmegaConf dependency:
YAML load, recursive dot access, read-only by default, raw-string dump,
and recursive merge of override files.
"""

from __future__ import annotations

import copy
import io
from typing import Any, Mapping

import yaml


class FrozenConfigError(AttributeError):
    pass


class ConfigDict:
    """Nested mapping with attribute access; read-only unless unlocked."""

    def __init__(self, data: Mapping[str, Any] | str | None = None, _readonly: bool = True):
        object.__setattr__(self, "_data", {})
        object.__setattr__(self, "_readonly", False)
        if isinstance(data, str):
            data = _load_yaml(data)
        if data:
            for k, v in dict(data).items():
                self._data[k] = _wrap(v, readonly=False)
        if _readonly:
            self.set_readonly(True)

    # -- access ------------------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        data = object.__getattribute__(self, "_data")
        if name in data:
            return data[name]
        raise AttributeError(f"config has no key {name!r}; keys: {sorted(data)}")

    def __getitem__(self, name: str) -> Any:
        return self._data[name]

    def get(self, name: str, default: Any = None) -> Any:
        return self._data.get(name, default)

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)

    # -- mutation ----------------------------------------------------------
    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, "_readonly"):
            raise FrozenConfigError(
                f"config is read-only; call set_readonly(False) before assigning {name!r}"
            )
        self._data[name] = _wrap(value, readonly=False)

    __setitem__ = __setattr__

    def set_readonly(self, readonly: bool) -> None:
        object.__setattr__(self, "_readonly", readonly)
        for v in self._data.values():
            if isinstance(v, ConfigDict):
                v.set_readonly(readonly)

    def merge(self, other: "ConfigDict | Mapping[str, Any]") -> "ConfigDict":
        """Recursive merge; `other` wins. Returns a new unlocked-then-locked config."""
        merged = _merge_dicts(self.to_dict(), _to_plain(other))
        return ConfigDict(merged)

    # -- export ------------------------------------------------------------
    def to_dict(self) -> dict:
        return _to_plain(self)

    def _raw_string(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def _dump(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self._raw_string())

    def __repr__(self) -> str:
        return f"ConfigDict({self.to_dict()!r})"

    def __deepcopy__(self, memo):
        return ConfigDict(copy.deepcopy(self.to_dict(), memo))


def _wrap(value: Any, readonly: bool) -> Any:
    if isinstance(value, Mapping):
        return ConfigDict(value, _readonly=readonly)
    if isinstance(value, (list, tuple)):
        return [_wrap(v, readonly) for v in value]
    return value


def _to_plain(value: Any) -> Any:
    if isinstance(value, ConfigDict):
        return {k: _to_plain(v) for k, v in value.items()}
    if isinstance(value, Mapping):
        return {k: _to_plain(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_to_plain(v) for v in value]
    return value


def _merge_dicts(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge_dicts(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_config(path: str, overrides: Mapping[str, Any] | None = None) -> ConfigDict:
    cfg = ConfigDict(path)
    if overrides:
        cfg = cfg.merge(overrides)
    return cfg


def pretty_config(cfg: ConfigDict, indent: int = 0) -> str:
    """Plain-text pretty printer (reference: utils/general_utils.py:93-121)."""
    buf = io.StringIO()
    pad = "  " * indent
    for k, v in cfg.items():
        if isinstance(v, ConfigDict):
            buf.write(f"{pad}{k}:\n")
            buf.write(pretty_config(v, indent + 1))
        else:
            buf.write(f"{pad}{k}: {v}\n")
    return buf.getvalue()


def to8b(x):
    """float [0,1] image -> uint8 (ref: utils/general_utils.py:316)."""
    import numpy as np

    return (np.clip(np.asarray(x), 0, 1) * 255).astype(np.uint8)


def inverse_sigmoid(x):
    """logit (ref: utils/general_utils.py:318-320)."""
    import numpy as np

    x = np.clip(np.asarray(x), 1e-7, 1 - 1e-7)
    return np.log(x / (1 - x))


def calc_parameters(params) -> int:
    """Total parameter count of a PyTree (ref: general_utils.py:284-292)."""
    import jax
    import numpy as np

    return sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "shape")
    )
