"""LPIPS perceptual distance (Flax).

Parity with the reference's lpipsPyTorch
(ref: submodules/lpipsPyTorch/modules/lpips.py:17-37, networks.py): frozen
AlexNet or VGG16 feature stack, per-layer unit-normalization over channels,
learned 1x1 linear heads, spatial mean, summed over layers.

Weights: `load_torch_state` converts a torch LPIPS checkpoint (backbone +
lin heads) when one is provided; without it the backbone is random-init —
the loss mechanism, shapes, and gradients are identical, and the weights
slot in whenever the (license-gated, non-vendored) files are available.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_SHIFT = (-0.030, -0.088, -0.188)  # LPIPS 'scaling layer' constants
IMAGENET_SCALE = (0.458, 0.448, 0.450)


class AlexNetFeatures(nn.Module):
    """The 5 conv stages of AlexNet (torchvision layout)."""

    @nn.compact
    def __call__(self, x) -> list[jnp.ndarray]:
        feats = []
        x = nn.relu(nn.Conv(64, (11, 11), strides=4, padding=2, name="conv0")(x))
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(192, (5, 5), padding=2, name="conv1")(x))
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding=1, name="conv2")(x))
        feats.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, name="conv3")(x))
        feats.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, name="conv4")(x))
        feats.append(x)
        return feats


class VGG16Features(nn.Module):
    """VGG16 relu1_2 .. relu5_3 feature stages."""

    @nn.compact
    def __call__(self, x) -> list[jnp.ndarray]:
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        feats = []
        li = 0
        for stage, (ch, n) in enumerate(cfg):
            for _ in range(n):
                x = nn.relu(nn.Conv(ch, (3, 3), padding=1, name=f"conv{li}")(x))
                li += 1
            feats.append(x)
            if stage < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


_CHANNELS = {"alex": (64, 192, 384, 256, 256), "vgg": (64, 128, 256, 512, 512)}


class LPIPS(nn.Module):
    net_type: str = "alex"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """x, y: (B, H, W, 3) in [0, 1]. Returns mean LPIPS distance (scalar)."""
        # AlexNet's stride-4 stem + pools collapse sub-32px inputs to empty
        # feature maps (mean of empty = NaN). The reference never feeds tiny
        # crops (cal_box_loss resizes to 256^2, ref loss_utils.py:140-159);
        # for micro/CI configs we upsample to the 32px floor instead.
        if x.shape[1] < 32 or x.shape[2] < 32:
            shape = (x.shape[0], max(32, x.shape[1]), max(32, x.shape[2]), x.shape[3])
            x = jax.image.resize(x, shape, "linear")
            y = jax.image.resize(y, shape, "linear")
        shift = jnp.asarray(IMAGENET_SHIFT, x.dtype)
        scale = jnp.asarray(IMAGENET_SCALE, x.dtype)

        def norm_input(im):
            # The reference's lpipsPyTorch z-scores the caller's tensor as-is
            # (BaseNet.z_score, networks.py:48-49) and GUAVA feeds [0,1]
            # images directly (loss_utils.py:104) — no [0,1]->[-1,1] mapping,
            # unlike canonical richzhang LPIPS. We match the reference.
            return (im - shift) / scale

        backbone = (AlexNetFeatures if self.net_type == "alex" else VGG16Features)(
            name="backbone"
        )
        fx = backbone(norm_input(x))
        fy = backbone(norm_input(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            # official LPIPS lin heads are non-negative; keep random init
            # non-negative too so the distance stays PSD without weights
            lin = nn.Conv(1, (1, 1), use_bias=False,
                          kernel_init=nn.initializers.uniform(scale=0.1),
                          name=f"lin{i}")
            total = total + jnp.mean(lin(d))
        return total


def load_torch_state(params: dict, torch_state: dict, net_type: str = "alex") -> dict:
    """Convert a torch LPIPS state_dict into this module's params (in place copy).

    Torch conv weights (O, I, H, W) -> flax (H, W, I, O).
    """
    import copy
    import re

    params = copy.deepcopy(params)
    p = params["params"]

    def t2f(w):
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    def layer_index(key: str) -> int:
        nums = re.findall(r"\d+", key)
        return int(nums[0]) if nums else 0

    def assign(dst: dict, field: str, value: np.ndarray, key: str):
        if dst[field].shape != value.shape:
            raise ValueError(
                f"LPIPS conversion: {key} has shape {value.shape}, "
                f"expected {dst[field].shape}"
            )
        dst[field] = value

    # backbone convs: order by the NUMERIC layer index in the torch key
    # (string sort would put features.10 before features.3)
    conv_keys = sorted(
        (k for k in torch_state
         if "lin" not in k and k.endswith("weight")
         and np.asarray(torch_state[k]).ndim == 4),
        key=layer_index,
    )
    for i, k in enumerate(conv_keys):
        name = f"conv{i}"
        if name not in p["backbone"]:
            raise ValueError(f"LPIPS conversion: unexpected extra conv {k}")
        assign(p["backbone"][name], "kernel", t2f(torch_state[k]), k)
        bk = k[: -len("weight")] + "bias"
        if bk in torch_state:
            assign(p["backbone"][name], "bias", np.asarray(torch_state[bk]), bk)

    lin_keys = sorted(
        (k for k in torch_state if "lin" in k and k.endswith("weight")),
        key=layer_index,
    )
    for i, k in enumerate(lin_keys):
        assign(p[f"lin{i}"], "kernel", t2f(torch_state[k]), k)
    return params
