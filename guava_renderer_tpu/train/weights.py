"""Torch-checkpoint -> Flax parameter mapping + converted-weight loading.

The released GUAVA checkpoint (`best_*.pt`, ref: main/test.py:242-252) holds
two state_dicts: 'model' (Ubody_Gaussian_inferer, ref: ubody_gaussian.py:20-159
— including the frozen DINOv2 backbone under dino_encoder.dino_model.*) and
'render_model' (GaussianRenderer.nerual_refiner, ref: gaussian_render.py:7-17).
`convert_guava_state` maps both onto our {"inferer": ..., "renderer": ...}
param tree. All transforms are pure tensor-layout changes:

  torch Conv2d  (O, I, kH, kW)        -> flax Conv         (kH, kW, I, O)
  torch Linear  (O, I)                -> flax Dense        (I, O)
  torch ConvT2d (I, O, kH, kW)        -> flax ConvTranspose (kH, kW, I, O)
                                         with spatial flip (verified
                                         numerically vs torch)
  ModulatedConv2d.weight (1,O,I,k,k)  -> (k, k, I, O)
  final_linear over NCHW-flat         -> column permutation to NHWC-flat

The mapping tables are driven by the reference module definitions cited
inline, so the converter is testable against a synthetically initialized
torch model (tests/test_weight_convert.py) without the released file.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# primitive layout transforms
# ---------------------------------------------------------------------------


def t2f_conv(w) -> np.ndarray:
    """torch conv (O, I, H, W) -> flax (H, W, I, O)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def t2f_dense(w) -> np.ndarray:
    """torch linear (O, I) -> flax (I, O)."""
    return np.transpose(np.asarray(w))


def t2f_convT(w) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kH, kW) -> flax (kH, kW, I, O), spatially
    flipped (flax ConvTranspose does not flip; torch's adjoint does)."""
    k = np.transpose(np.asarray(w), (2, 3, 0, 1))
    return np.ascontiguousarray(k[::-1, ::-1])


def _conv(sd: dict, p: str, bias: bool = True) -> dict:
    out = {"kernel": t2f_conv(sd[p + ".weight"])}
    if bias:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _convT(sd: dict, p: str) -> dict:
    return {"kernel": t2f_convT(sd[p + ".weight"]), "bias": np.asarray(sd[p + ".bias"])}


def _dense(sd: dict, p: str) -> dict:
    return {"kernel": t2f_dense(sd[p + ".weight"]), "bias": np.asarray(sd[p + ".bias"])}


# ---------------------------------------------------------------------------
# shared blocks
# ---------------------------------------------------------------------------


def _resblock(sd: dict, p: str) -> dict:
    """Bilinear ResBlock (ref: styleunet.py:410-441) -> layers.ResBlock
    (anonymous convs: conv1->Conv_0, conv2->Conv_1, skip->Conv_2)."""
    return {
        "Conv_0": _conv(sd, p + ".conv1"),
        "Conv_1": _conv(sd, p + ".conv2"),
        "Conv_2": _conv(sd, p + ".skip", bias=False),
    }


def _rcu(sd: dict, p: str) -> dict:
    """ResidualConvUnit (ref: dino_encoder.py:118-170)."""
    return {"Conv_0": _conv(sd, p + ".conv1"), "Conv_1": _conv(sd, p + ".conv2")}


def _ffb(sd: dict, p: str, with_res1: bool) -> dict:
    """FeatureFusionBlock (ref: dino_encoder.py:173-228). The first refinenet
    stage never runs resConfUnit1 (no skip input) and our flax module only
    instantiates `res1` when a skip exists, so those torch params are dropped."""
    out = {
        "res2": _rcu(sd, p + ".resConfUnit2"),
        "Conv_0": _conv(sd, p + ".out_conv"),
    }
    if with_res1:
        out["res1"] = _rcu(sd, p + ".resConfUnit1")
    return out


def _modconv(sd: dict, p: str) -> dict:
    """ModulatedConv2d (ref: styleunet.py:518-567) -> ModulatedConv."""
    w = np.asarray(sd[p + ".weight"])[0]  # (O, I, k, k)
    return {
        "modulation": _dense(sd, p + ".modulation"),
        "weight": np.transpose(w, (2, 3, 1, 0)),  # (k, k, I, O)
    }


def _styleconv(sd: dict, p: str) -> dict:
    """StyleConv (ref: styleunet.py:489-516)."""
    return {
        "mod": _modconv(sd, p + ".modulated_conv"),
        "noise_weight": np.asarray(sd[p + ".weight"]).reshape(()),
        "bias": np.asarray(sd[p + ".bias"]).reshape(-1),
    }


def _torgb(sd: dict, p: str) -> dict:
    return {
        "mod": _modconv(sd, p + ".modulated_conv"),
        "bias": np.asarray(sd[p + ".bias"]).reshape(-1),
    }


def _final_linear(sd: dict, p: str, ch4: int) -> dict:
    """StyleUNet.final_linear flattens torch NCHW (C,4,4); our flax flattens
    NHWC (4,4,C). Permute the input columns accordingly."""
    w = np.asarray(sd[p + ".weight"])  # (style, C*16)
    idx = np.empty(ch4 * 16, np.int64)
    j = 0
    for h in range(4):
        for wx in range(4):
            for c in range(ch4):
                idx[j] = c * 16 + h * 4 + wx
                j += 1
    return {"kernel": np.transpose(w[:, idx]), "bias": np.asarray(sd[p + ".bias"])}


# ---------------------------------------------------------------------------
# StyleUNet / StyleGAN2 generator
# ---------------------------------------------------------------------------

_CHANNELS = {4: 256, 8: 256, 16: 256, 32: 256, 64: 128, 128: 64, 256: 32, 512: 16, 1024: 8}


def _chan(size: int, scale: float) -> int:
    return int(_CHANNELS[size] / scale)


def convert_generator(sd: dict, p: str, out_size: int, channel_scale: float,
                      small: bool, num_mlp: int = 8) -> dict:
    """StyleGAN2GeneratorCSFT[_small] (ref: styleunet.py:211-407)."""
    import math

    log_size = int(math.log2(out_size))
    out = {"style_mlp": {}}
    for i in range(num_mlp):
        # Sequential: [NormStyleCode, Linear, LeakyReLU, Linear, ...] -> 1+2i
        out["style_mlp"][f"mlp{i}"] = _dense(sd, f"{p}.style_mlp.{1 + 2 * i}")
    cw = np.asarray(sd[p + ".constant_input.weight"])  # (1, C, 4, 4)
    out["constant_input"] = np.transpose(cw, (0, 2, 3, 1))
    out["conv1"] = _styleconv(sd, p + ".style_conv1")
    out["to_rgb1"] = _torgb(sd, p + ".to_rgb1")
    for li in range(log_size - 2):
        if small:
            out[f"conv_up{li}"] = _styleconv(sd, f"{p}.style_convs.{li}")
            out[f"conv_plain{li}"] = _conv(sd, f"{p}.normal_convs.{li}.0")
        else:
            out[f"conv_up{li}"] = _styleconv(sd, f"{p}.style_convs.{2 * li}")
            out[f"conv_same{li}"] = _styleconv(sd, f"{p}.style_convs.{2 * li + 1}")
        out[f"to_rgb_up{li}"] = _torgb(sd, f"{p}.to_rgbs.{li}")
    return out


def convert_styleunet(sd: dict, p: str, in_size: int, out_size: int,
                      channel_scale: float = 1.0, small: bool = False,
                      extra_style: bool = False, num_mlp: int = 8) -> dict:
    """StyleUNet (ref: styleunet.py:86-207) -> models.styleunet.StyleUNet."""
    import math

    log_size = int(math.log2(out_size))
    out: dict = {}
    if in_size <= out_size:
        out["first"] = _conv(sd, p + ".conv_body_first")
    else:
        out["first"] = _conv(sd, p + ".conv_body_first.0")
        out["first_down"] = _resblock(sd, p + ".conv_body_first.1")
    for li in range(log_size - 2):
        out[f"down{li}"] = _resblock(sd, f"{p}.conv_body_down.{li}")
    out["final_conv"] = _conv(sd, p + ".final_conv")
    out["final_linear"] = _final_linear(sd, p + ".final_linear", _chan(4, channel_scale))
    if extra_style:
        out["style_fuse0"] = _dense(sd, p + ".style_fuse.0")
        out["style_fuse1"] = _dense(sd, p + ".style_fuse.2")
    for li in range(log_size - 2):
        out[f"up{li}"] = _resblock(sd, f"{p}.conv_body_up.{li}")
        # the flax module fuses the two first condition convs (shared
        # input) into one out-channel-concatenated conv, models/styleunet.py
        ca = _conv(sd, f"{p}.condition_scale.{li}.0")
        cb = _conv(sd, f"{p}.condition_shift.{li}.0")
        out[f"cond_a{li}"] = {
            "kernel": np.concatenate([ca["kernel"], cb["kernel"]], axis=-1),
            "bias": np.concatenate([ca["bias"], cb["bias"]]),
        }
        out[f"cond_scale{li}b"] = _conv(sd, f"{p}.condition_scale.{li}.2")
        out[f"cond_shift{li}b"] = _conv(sd, f"{p}.condition_shift.{li}.2")
    out["generator"] = convert_generator(
        sd, p + ".stylegan_decoder", out_size, channel_scale, small, num_mlp
    )
    return out


# ---------------------------------------------------------------------------
# ViT (DINOv2) + DPT encoder
# ---------------------------------------------------------------------------


def convert_dinov2_vit(sd: dict, p: str = "", depth: int | None = None) -> dict:
    """DINOv2 ViT-B/14 state_dict -> our VisionTransformer tree."""
    if depth is None:  # infer from the block keys present
        depth = 1 + max(
            int(k[len(p) + 7:].split(".")[0])
            for k in sd
            if k.startswith(p + "blocks.")
        )
    g = lambda k: np.asarray(sd[p + k])  # noqa: E731
    out = {
        "patch_embed": {
            "kernel": t2f_conv(sd[p + "patch_embed.proj.weight"]),
            "bias": g("patch_embed.proj.bias"),
        },
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }
    for i in range(depth):
        b = f"{p}blocks.{i}."
        out[f"block{i}"] = {
            "norm1": {"scale": np.asarray(sd[b + "norm1.weight"]),
                      "bias": np.asarray(sd[b + "norm1.bias"])},
            "attn": {
                "qkv": {"kernel": t2f_dense(sd[b + "attn.qkv.weight"]),
                        "bias": np.asarray(sd[b + "attn.qkv.bias"])},
                "proj": {"kernel": t2f_dense(sd[b + "attn.proj.weight"]),
                         "bias": np.asarray(sd[b + "attn.proj.bias"])},
            },
            "ls1": {"gamma": np.asarray(sd[b + "ls1.gamma"])},
            "norm2": {"scale": np.asarray(sd[b + "norm2.weight"]),
                      "bias": np.asarray(sd[b + "norm2.bias"])},
            "mlp": {
                "Dense_0": {"kernel": t2f_dense(sd[b + "mlp.fc1.weight"]),
                            "bias": np.asarray(sd[b + "mlp.fc1.bias"])},
                "Dense_1": {"kernel": t2f_dense(sd[b + "mlp.fc2.weight"]),
                            "bias": np.asarray(sd[b + "mlp.fc2.bias"])},
            },
            "ls2": {"gamma": np.asarray(sd[b + "ls2.gamma"])},
        }
    return out


def convert_dpt_encoder(sd: dict, p: str = "dino_encoder") -> dict:
    """DINO_Enocder (ref: dino_encoder.py:6-113) -> DinoDPTEncoder tree."""
    out: dict = {"dino": convert_dinov2_vit(sd, p + ".dino_model.")}
    for i in range(4):
        out[f"project{i}"] = _conv(sd, f"{p}.projects.{i}")
    out["resize0"] = _convT(sd, f"{p}.resize_layers.0")
    out["resize1"] = _convT(sd, f"{p}.resize_layers.1")
    out["resize3"] = _conv(sd, f"{p}.resize_layers.3")
    for i in range(4):
        out[f"layer_rn{i}"] = _conv(sd, f"{p}.layer_rn.{i}", bias=False)
    # refinenet[0] is applied without a skip input -> no res1 in our tree
    for i in range(4):
        out[f"refine{i}"] = _ffb(sd, f"{p}.refinenet.{i}", with_res1=(i > 0))
    # project_l Sequential: [Upsample, Conv, Upsample, Conv]
    out["project_l0"] = _conv(sd, f"{p}.project_l.1", bias=False)
    out["project_l1"] = _conv(sd, f"{p}.project_l.3", bias=False)
    out["fuse_l0"] = _conv(sd, f"{p}.fuse_l.0", bias=False)
    out["fuse_l1"] = _conv(sd, f"{p}.fuse_l.2", bias=False)
    out["skip_l"] = _conv(sd, f"{p}.skip_l", bias=False)
    out["output_conv"] = _conv(sd, f"{p}.output_conv")
    out["output_conv_2"] = _conv(sd, f"{p}.output_conv_2")
    return out


# ---------------------------------------------------------------------------
# decoders
# ---------------------------------------------------------------------------


def convert_vertex_decoder(sd: dict, p: str = "vertex_gs_decoder") -> dict:
    """Vertex_GS_Decoder (ref: feature_decoder.py:9-62)."""
    out = {}
    for i, ti in enumerate((0, 2, 4, 6)):
        out[f"trunk{i}"] = _dense(sd, f"{p}.feature_layers.{ti}")
    for ours, theirs in (("color", "color_layers"), ("opacity", "opacity_layers"),
                         ("scale", "scale_layers"), ("rotation", "rotation_layers")):
        out[f"{ours}0"] = _dense(sd, f"{p}.{theirs}.0")
        out[f"{ours}1"] = _dense(sd, f"{p}.{theirs}.2")
    return out


def convert_uv_decoder(sd: dict, p: str = "uv_point_decoder") -> dict:
    """UV_Point_GS_Decoder (ref: feature_decoder.py:64-137)."""
    out = {}
    for i, ti in enumerate((0, 2, 4)):
        out[f"trunk{i}"] = _conv(sd, f"{p}.feature_conv.{ti}")
    for ours, theirs in (("color", "color_head"), ("opacity", "opacity_head"),
                         ("scale", "scale_head"), ("rotation", "rot_head")):
        out[f"{ours}0"] = _conv(sd, f"{p}.{theirs}.0")
        out[f"{ours}1"] = _conv(sd, f"{p}.{theirs}.2")
    for i, ti in enumerate((0, 2, 4)):
        out[f"localpos{i}"] = _conv(sd, f"{p}.local_pos_head.{ti}")
    return out


# ---------------------------------------------------------------------------
# full checkpoint
# ---------------------------------------------------------------------------


def convert_guava_state(
    model_sd: dict,
    render_sd: dict,
    uvmap_size: int = 512,
    image_size: int = 512,
    num_mlp: int = 8,
    channel_scale: float = 1.0,
) -> dict:
    """Map the released GUAVA checkpoint's two state_dicts onto our
    {"inferer": ..., "renderer": ...} tree. Asset buffers baked into the
    torch module (ehm.*, smplx.*, v_template, laplacian_matrix,
    xy_image_coord, mesh_renderer.*, uv_mask_flat, noises.*) are static data
    owned by our asset layer and are intentionally not converted."""
    inferer: dict = {}
    inferer["dino_encoder"] = convert_dpt_encoder(model_sd, "dino_encoder")
    for i, ti in enumerate((0, 2, 4)):
        inferer[f"global_map{i}"] = _dense(model_sd, f"global_feature_mapping.{ti}")
        inferer[f"uv_style_map{i}"] = _dense(model_sd, f"uv_style_mapping.{ti}")
    inferer["vertex_base_feature"] = np.asarray(model_sd["vertex_base_feature"])
    # (32, U, U) -> (U, U, 32)
    inferer["uv_base_feature"] = np.transpose(
        np.asarray(model_sd["uv_base_feature"]), (1, 2, 0)
    )
    inferer["vertex_gs_decoder"] = convert_vertex_decoder(model_sd)
    inferer["uv_point_decoder"] = convert_uv_decoder(model_sd)
    inferer["uv_feature_decoder"] = convert_styleunet(
        model_sd, "uv_feature_decoder",
        in_size=uvmap_size, out_size=uvmap_size,
        channel_scale=channel_scale, small=False, extra_style=True,
        num_mlp=num_mlp,
    )

    renderer = {
        "neural_refiner": {
            "refiner": convert_styleunet(
                render_sd, "nerual_refiner",
                in_size=image_size, out_size=image_size,
                channel_scale=channel_scale, small=True, extra_style=False,
                num_mlp=num_mlp,
            )
        }
    }
    return {"inferer": inferer, "renderer": renderer}


# ---------------------------------------------------------------------------
# saving / loading
# ---------------------------------------------------------------------------


def save_converted_params(path: str, params: dict) -> None:
    from flax.serialization import msgpack_serialize

    with open(path, "wb") as f:
        f.write(msgpack_serialize(_to_numpy(params)))


def load_converted_params(path: str, template: dict) -> dict:
    """Load a converted msgpack against a template tree (shape-checked)."""
    from flax.serialization import msgpack_restore

    with open(path, "rb") as f:
        restored = msgpack_restore(f.read())
    return merge_params(template, restored, require_all=True)


def merge_params(template: dict, loaded: dict, require_all: bool = False,
                 path: str = "") -> dict:
    """Overlay `loaded` onto `template`, validating structure + shapes."""
    import jax.numpy as jnp

    if not isinstance(template, dict):
        t = np.asarray(template)
        l = np.asarray(loaded)
        if t.shape != l.shape:
            raise ValueError(f"shape mismatch at {path}: {t.shape} vs {l.shape}")
        return jnp.asarray(l, t.dtype)
    out = {}
    extra = set(loaded) - set(template)
    if extra:
        raise ValueError(f"unexpected keys at {path}: {sorted(extra)[:8]}")
    missing = set(template) - set(loaded)
    if missing and require_all:
        raise ValueError(f"missing keys at {path}: {sorted(missing)[:8]}")
    for k, v in template.items():
        out[k] = merge_params(v, loaded[k], require_all, f"{path}/{k}") if k in loaded else v
    return out


def _to_numpy(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    return np.asarray(tree)
