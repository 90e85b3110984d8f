"""Torch -> Flax weight conversion.

The reference pulls `dinov2_vitb14` from torch.hub at model construction
(ref: models/modules/net_module/dino_encoder.py:11) and loads the released
GUAVA checkpoint (`best_*.pt`). Both are unavailable in offline containers,
so this tool converts them whenever the files exist:

  python tools/convert_weights.py --dinov2 dinov2_vitb14.pth --out dino.msgpack
  python tools/convert_weights.py --lpips alex.pth --out lpips.msgpack

Conversions are pure tensor-layout transforms (torch OIHW conv -> flax HWIO,
linear transpose); the mapping tables below document the name
correspondence for auditability.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t2f_conv(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, H, W) -> flax (H, W, I, O)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def t2f_dense(w: np.ndarray) -> np.ndarray:
    """torch linear (O, I) -> flax (I, O)."""
    return np.transpose(np.asarray(w))


def convert_dinov2(state: dict, depth: int = 12) -> dict:
    """torch-hub dinov2 state_dict -> our VisionTransformer param tree."""
    p: dict = {}
    p["patch_embed"] = {
        "kernel": t2f_conv(state["patch_embed.proj.weight"]),
        "bias": np.asarray(state["patch_embed.proj.bias"]),
    }
    p["cls_token"] = np.asarray(state["cls_token"])
    p["pos_embed"] = np.asarray(state["pos_embed"])
    for i in range(depth):
        b = f"blocks.{i}."
        p[f"block{i}"] = {
            "norm1": {
                "scale": np.asarray(state[b + "norm1.weight"]),
                "bias": np.asarray(state[b + "norm1.bias"]),
            },
            "attn": {
                "qkv": {
                    "kernel": t2f_dense(state[b + "attn.qkv.weight"]),
                    "bias": np.asarray(state[b + "attn.qkv.bias"]),
                },
                "proj": {
                    "kernel": t2f_dense(state[b + "attn.proj.weight"]),
                    "bias": np.asarray(state[b + "attn.proj.bias"]),
                },
            },
            "ls1": {"gamma": np.asarray(state[b + "ls1.gamma"])},
            "norm2": {
                "scale": np.asarray(state[b + "norm2.weight"]),
                "bias": np.asarray(state[b + "norm2.bias"]),
            },
            "mlp": {
                "Dense_0": {
                    "kernel": t2f_dense(state[b + "mlp.fc1.weight"]),
                    "bias": np.asarray(state[b + "mlp.fc1.bias"]),
                },
                "Dense_1": {
                    "kernel": t2f_dense(state[b + "mlp.fc2.weight"]),
                    "bias": np.asarray(state[b + "mlp.fc2.bias"]),
                },
            },
            "ls2": {"gamma": np.asarray(state[b + "ls2.gamma"])},
        }
    p["norm"] = {
        "scale": np.asarray(state["norm.weight"]),
        "bias": np.asarray(state["norm.bias"]),
    }
    return p


def validate_dinov2(params: dict) -> None:
    """Structural check: run our ViT with the converted tree."""
    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.models.vit import VisionTransformer

    vit = VisionTransformer()
    x = jnp.zeros((1, 70, 70, 3))
    template = vit.init(jax.random.PRNGKey(0), x)["params"]

    def flat(tree):
        return {
            jax.tree_util.keystr(k): np.asarray(v).shape
            for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    ft, fc = flat(template), flat(params)
    missing = sorted(set(ft) - set(fc))
    if missing:
        raise ValueError(f"converted tree is missing {missing[:10]} ...")
    mismatched = [k for k in ft if ft[k] != fc[k]]
    if mismatched:
        raise ValueError(
            f"shape mismatch: {[(k, ft[k], fc[k]) for k in mismatched[:5]]}"
        )
    out = vit.apply({"params": params}, x)
    assert len(out) == 5 and out[-1].shape == (1, 26, 768)
    print("dinov2 conversion validated: forward pass ok")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dinov2", type=str, default=None)
    ap.add_argument("--lpips", type=str, default=None)
    ap.add_argument("--net_type", type=str, default="alex")
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    import torch
    from flax.serialization import msgpack_serialize

    if args.dinov2:
        state = torch.load(args.dinov2, map_location="cpu")
        state = {k: v.numpy() for k, v in state.items()}
        params = convert_dinov2(state)
        validate_dinov2(params)
    elif args.lpips:
        import jax
        import jax.numpy as jnp

        from guava_renderer_tpu.train.lpips import LPIPS, load_torch_state

        state = torch.load(args.lpips, map_location="cpu")
        state = {k: v.numpy() for k, v in state.items()}
        m = LPIPS(net_type=args.net_type)
        x = jnp.zeros((1, 64, 64, 3))
        tmpl = m.init(jax.random.PRNGKey(0), x, x)
        params = load_torch_state(tmpl, state, args.net_type)["params"]
    else:
        raise SystemExit("provide --dinov2 or --lpips")

    with open(args.out, "wb") as f:
        f.write(msgpack_serialize(params))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
