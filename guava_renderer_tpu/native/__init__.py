"""Native (C++) runtime components, built on demand with g++.

`lib_path(name)` compiles guava_renderer_tpu/native/<name>.cpp into a
cached shared object and returns its path; callers bind with ctypes.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "_build")


def lib_path(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.cpp")
    out = os.path.join(_BUILD, f"lib{name}.so")
    os.makedirs(_BUILD, exist_ok=True)
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True,
        )
    return out
