"""FLAME region mask system.

Parity with the reference's FlameMask (ref: models/modules/flame/
FLAME.py:682-1028): loads FLAME_masks.pkl region -> vertex-id sets, supports
order-preserving vertex queries and face queries (faces whose vertices all
belong to the region union), plus the hard-coded landmark rings from
flame_regions.py.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from .flame_regions import LIP_OUTSIDE_RING_LOWER, LIP_OUTSIDE_RING_UPPER

_EXTRA_REGIONS = {
    "lip_outside_ring_upper": LIP_OUTSIDE_RING_UPPER,
    "lip_outside_ring_lower": LIP_OUTSIDE_RING_LOWER,
}


class FlameMask:
    def __init__(self, masks_path: str | None = None, faces: np.ndarray | None = None):
        self.regions: dict[str, np.ndarray] = {}
        if masks_path and os.path.exists(masks_path):
            with open(masks_path, "rb") as f:
                masks = pickle.load(f, encoding="latin1")
            for k, v in masks.items():
                self.regions[k] = np.asarray(v, np.int64)
        self.regions.update({k: np.asarray(v, np.int64) for k, v in _EXTRA_REGIONS.items()})
        self.faces = None if faces is None else np.asarray(faces)

    def region_names(self) -> list[str]:
        return sorted(self.regions)

    def get_vid_by_region(self, regions: list[str], keep_order: bool = True) -> np.ndarray:
        """Vertex ids of the union of regions.

        keep_order=True preserves each region's stored order (load-bearing
        for the teeth lip rings); False returns the sorted unique union."""
        parts = [self.regions[r] for r in regions]
        cat = np.concatenate(parts) if parts else np.zeros(0, np.int64)
        if keep_order:
            _, first = np.unique(cat, return_index=True)
            return cat[np.sort(first)] if len(regions) > 1 else cat
        return np.unique(cat)

    def get_fid_by_region(self, regions: list[str], all_vertices: bool = True) -> np.ndarray:
        """Face ids touching (or fully inside, all_vertices=True) the region."""
        assert self.faces is not None, "construct with faces to query face ids"
        vids = set(self.get_vid_by_region(regions, keep_order=False).tolist())
        member = np.isin(self.faces, list(vids))
        hit = member.all(1) if all_vertices else member.any(1)
        return np.nonzero(hit)[0]
