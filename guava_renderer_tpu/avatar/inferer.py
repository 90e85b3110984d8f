"""One-shot avatar prediction (the "sub-second" path).

Parity with `Ubody_Gaussian_inferer` (ref: ubody_gaussian.py:20-159):
DINO+DPT encoding of the source image; vertex branch = projection-sampled
features + learned per-vertex base + global token -> MLP decoder; UV branch
= inverse texture mapping of [rgb|f_map1] into the UV chart (visibility
masked) -> StyleUNet -> conv decoder with local_pos.

The flax module is pure: EHM geometry (deformed source-pose vertices) and
the static UV tables are call arguments; `build_avatar` orchestrates EHM,
mesh visibility, the network, and avatar assembly.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..bodymodel.ehm import BodyParams, EhmModel, FlameParams, ehm_forward
from ..models.decoders import UVPointGSDecoder, VertexGSDecoder
from ..models.dpt_encoder import DinoDPTEncoder
from ..models.layers import harmonic_embedding, leaky_relu, resize_bilinear
from ..models.styleunet import StyleUNet
from ..ops.meshraster import rasterize_mesh, visible_faces_mask
from .sampling import grid_sample, project_to_ndc
from .state import GaussianAvatar


class InfererConfig(NamedTuple):
    """Hashable subset of the MODEL config (ref: configs/train/ubody_512.yaml)."""

    image_size: int = 512
    uvmap_size: int = 512
    invtanfov: float = 24.0
    dino_out_dim: int = 32
    uv_out_dim: int = 96
    smplx_fea_dim: int = 128
    prj_out_dim: int = 128
    global_vertex_dim: int = 256
    color_dim: int = 32
    uv_base_dim: int = 32
    style_dim: int = 512
    num_mlp: int = 8
    channel_scale: float = 1.0
    # Backbone sizing (ViT-B/14 + DPT defaults; shrink for dry-run configs).
    vit_dim: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    pyramid_dims: tuple = (256, 512, 1024, 1024)


class UbodyGaussianInferer(nn.Module):
    cfg: InfererConfig
    num_vertices: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,          # (B, Hf, Wf, 3) in [0, 1] (518 for GUAVA)
        w2c: jnp.ndarray,            # (B, 4, 4)
        vertices: jnp.ndarray,       # (B, V, 3) EHM-deformed source-pose verts
        uv_texel_mask: jnp.ndarray,  # (B, U, U) f32 — chart mask x visibility
        uvmap_f_idx: jnp.ndarray,    # (U, U) i32
        uvmap_f_bary: jnp.ndarray,   # (U, U, 3)
        faces: jnp.ndarray,          # (F, 3) i32
    ) -> tuple[dict, dict, dict]:
        cfg = self.cfg
        B = image.shape[0]
        U = cfg.uvmap_size

        enc = DinoDPTEncoder(
            out_dim_1=cfg.dino_out_dim,
            out_dim_2=cfg.prj_out_dim,
            hidden=cfg.prj_out_dim // 2,
            output_size=cfg.image_size,
            vit_dim=cfg.vit_dim,
            vit_depth=cfg.vit_depth,
            vit_heads=cfg.vit_heads,
            pyramid_dims=cfg.pyramid_dims,
            dtype=self.dtype,
            name="dino_encoder",
        )
        feats = enc(image)
        f_map1, f_map2, f_global = feats["f_map1"], feats["f_map2"], feats["f_global"]

        # global feature MLP (ref: ubody_gaussian.py:40-42)
        g = f_global
        for i, act in ((0, True), (1, True), (2, False)):
            g = nn.Dense(cfg.global_vertex_dim, name=f"global_map{i}")(g)
            if act:
                g = leaky_relu(g, 0.01)

        cam_dirs = harmonic_embedding(w2c[:, :3, 2], 4)  # (B, 27)

        # ---- vertex branch ----
        ndc = project_to_ndc(vertices, w2c, cfg.invtanfov)
        vtx_sample = grid_sample(f_map2, ndc[..., :2], padding="border")  # (B, V, 128)
        base = self.param(
            "vertex_base_feature",
            nn.initializers.normal(1.0),
            (self.num_vertices, cfg.smplx_fea_dim),
        )
        vtx_feat = jnp.concatenate(
            [
                vtx_sample,
                jnp.broadcast_to(base[None], (B,) + base.shape),
                jnp.broadcast_to(g[:, None], (B, self.num_vertices, cfg.global_vertex_dim)),
            ],
            axis=-1,
        )
        vertex_gs = VertexGSDecoder(
            in_dim=cfg.prj_out_dim + cfg.smplx_fea_dim + cfg.global_vertex_dim,
            color_dim=cfg.color_dim,
            name="vertex_gs_decoder",
        )(vtx_feat, cam_dirs)

        # ---- uv branch ----
        img_rgb = resize_bilinear(image, (cfg.image_size, cfg.image_size))
        img_feat = jnp.concatenate([img_rgb, f_map1], axis=-1)  # (B, S, S, 35)

        # inverse texture mapping: texel -> surface point -> image sample
        tri = faces[uvmap_f_idx]                      # (U, U, 3)
        tri_pts = vertices[:, tri]                    # (B, U, U, 3, 3)
        surf = jnp.einsum("uvk,buvkj->buvj", uvmap_f_bary, tri_pts)
        surf_ndc = project_to_ndc(surf, w2c, cfg.invtanfov)
        uv_feats = grid_sample(img_feat, surf_ndc[..., :2], padding="zeros")
        uv_feats = uv_feats * uv_texel_mask[..., None]

        extra_style = f_global
        for i, act in ((0, True), (1, True), (2, False)):
            extra_style = nn.Dense(cfg.style_dim, name=f"uv_style_map{i}")(extra_style)
            if act:
                extra_style = leaky_relu(extra_style, 0.01)

        uv_feats = StyleUNet(
            in_size=U,
            out_size=U,
            in_dim=cfg.dino_out_dim + 3,
            out_dim=cfg.uv_out_dim,
            style_dim=cfg.style_dim,
            num_mlp=cfg.num_mlp,
            activation=False,
            channel_scale=cfg.channel_scale,
            extra_style_dim=cfg.style_dim,
            name="uv_feature_decoder",
        )(uv_feats, extra_style, rng=self.make_rng("noise") if self.has_rng("noise") else None)

        uv_base = self.param(
            "uv_base_feature", nn.initializers.normal(1.0), (U, U, cfg.uv_base_dim)
        )
        uv_full = jnp.concatenate(
            [uv_feats, jnp.broadcast_to(uv_base[None], (B, U, U, cfg.uv_base_dim))],
            axis=-1,
        )
        uv_gs = UVPointGSDecoder(
            in_dim=cfg.uv_out_dim + cfg.uv_base_dim,
            color_dim=cfg.color_dim,
            name="uv_point_decoder",
        )(uv_full, cam_dirs)
        # flatten the chart; static shapes (masking instead of pruning)
        uv_gs = {k: v.reshape(B, U * U, -1) for k, v in uv_gs.items()}

        extra = {"uvmap_texture": nn.sigmoid(uv_feats[..., :3])}
        return vertex_gs, uv_gs, extra


def build_avatar(
    inferer: UbodyGaussianInferer,
    params,
    ehm: EhmModel,
    faces: jnp.ndarray,
    uvmap_f_idx: jnp.ndarray,
    uvmap_f_bary: jnp.ndarray,
    uvmap_mask: jnp.ndarray,
    image: jnp.ndarray,
    w2c: jnp.ndarray,
    body: BodyParams,
    flame: FlameParams | None,
    image_size: int = 512,
    invtanfov: float = 24.0,
    rngs=None,
) -> tuple[GaussianAvatar, dict]:
    """EHM -> visibility -> network -> GaussianAvatar (ref call stack §3.2)."""
    from ..core.cameras import Camera

    res = ehm_forward(ehm, body, flame)
    verts = res.vertices
    B = verts.shape[0]
    U = uvmap_f_idx.shape[0]

    # per-item visibility via the mesh z-buffer (no_grad, ref :136-143)
    tanfov = 1.0 / invtanfov
    vis_list = []
    for b in range(B):
        cam = Camera(
            R=w2c[b, :3, :3],
            t=w2c[b, :3, 3],
            tanfovx=jnp.asarray(tanfov, jnp.float32),
            tanfovy=jnp.asarray(tanfov, jnp.float32),
            width=image_size,
            height=image_size,
        )
        mres = rasterize_mesh(jax.lax.stop_gradient(verts[b]), faces, cam)
        vis_list.append(visible_faces_mask(mres.face_idx, faces.shape[0]))
    visible = jnp.stack(vis_list)                      # (B, F)
    texel_vis = visible[:, uvmap_f_idx]                # (B, U, U)
    texel_mask = (texel_vis & uvmap_mask[None]).astype(jnp.float32)

    vertex_gs, uv_gs, extra = inferer.apply(
        params, image, w2c, verts, texel_mask,
        uvmap_f_idx, uvmap_f_bary, faces, rngs=rngs,
    )

    # assemble avatar state (sigmoid on the RGB channels, ref :186-187)
    def sig3(c):
        return jnp.concatenate([nn.sigmoid(c[..., :3]), c[..., 3:]], axis=-1)

    mask_flat = uvmap_mask.reshape(-1)
    avatar = GaussianAvatar(
        vtx_positions=jnp.broadcast_to(ehm.smplx["v_template"][None], verts.shape),
        vtx_colors=sig3(vertex_gs["colors"]),
        vtx_opacity=vertex_gs["opacities"],
        vtx_scales=vertex_gs["scales"],
        vtx_rotations=vertex_gs["rotations"],
        uv_local_xyz=uv_gs["local_pos"],
        uv_colors=sig3(uv_gs["colors"]),
        uv_opacity=uv_gs["opacities"],
        uv_scales=uv_gs["scales"],
        uv_rotations=uv_gs["rotations"],
        uv_binding_face=uvmap_f_idx.reshape(-1),
        uv_face_bary=uvmap_f_bary.reshape(-1, 3),
        uv_valid=mask_flat,
    )
    extra["ehm_result"] = res
    return avatar, extra
