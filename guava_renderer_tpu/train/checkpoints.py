"""Checkpoint management: best/latest semantics over Orbax.

Parity with the reference (ref: main/trainer.py:191-231, SURVEY §5.4):
`latest` every check interval, `best_{iter}_{ssim:.4f}` keyed on validation
SSIM with old-best deletion, warm-start resume restoring global_iter
(ref: main/train.py:33-39), and `find_checkpoint` best->latest discovery
(ref: utils/general_utils.py:310-314).
"""

from __future__ import annotations

import os
import re
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, run_dir: str):
        self.dir = os.path.abspath(os.path.join(run_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    # -- save ---------------------------------------------------------------
    def save_latest(self, state, iteration: int) -> str:
        return self._save("latest", state, iteration)

    def save_named(self, name: str, state, iteration: int) -> str:
        return self._save(name, state, iteration)

    def save_best(self, state, iteration: int, ssim: float) -> str:
        for old in self._list("best_"):
            shutil.rmtree(os.path.join(self.dir, old), ignore_errors=True)
        return self._save(f"best_{iteration}_{ssim:.4f}", state, iteration)

    def _save(self, name: str, state, iteration: int) -> str:
        path = os.path.join(self.dir, name)
        shutil.rmtree(path, ignore_errors=True)
        payload = {"state": state, "iteration": np.asarray(iteration)}
        self._ckpt.save(path, payload)
        self._ckpt.wait_until_finished()
        return path

    # -- load ---------------------------------------------------------------
    def find_checkpoint(self) -> str | None:
        """best first, then latest (ref find_pt_file semantics)."""
        best = self._list("best_")
        if best:
            return os.path.join(self.dir, sorted(best)[-1])
        if os.path.isdir(os.path.join(self.dir, "latest")):
            return os.path.join(self.dir, "latest")
        return None

    def restore(self, template, path: str | None = None):
        path = path or self.find_checkpoint()
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {self.dir}")
        payload = self._ckpt.restore(
            path, {"state": template, "iteration": np.asarray(0)}
        )
        return payload["state"], int(payload["iteration"])

    def _list(self, prefix: str) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        return [
            d
            for d in os.listdir(self.dir)
            if d.startswith(prefix) and os.path.isdir(os.path.join(self.dir, d))
        ]

    def best_ssim(self) -> float:
        best = self._list("best_")
        if not best:
            return -1.0
        vals = []
        for b in best:
            m = re.match(r"best_\d+_([\d.]+)", b)
            if m:
                vals.append(float(m.group(1)))
        return max(vals) if vals else -1.0


def save_pytree(path: str, tree) -> None:
    """Whole-object save (the create_avatar torch.save role)."""
    ckpt = ocp.StandardCheckpointer()
    shutil.rmtree(path, ignore_errors=True)
    ckpt.save(os.path.abspath(path), tree)
    ckpt.wait_until_finished()


def load_pytree(path: str, template):
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), template)
