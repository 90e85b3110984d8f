"""The canonical 512^2 benchmark scene — ONE construction shared by
bench.py (the fps headline), tools/crosscheck_tpu.py --full-scale (the
fidelity gate) and tools/tpu_diag.py (stage diagnostics), so the quality
evidence is traceable to the exact scene the bench times.

Full-scale synthetic rig (SMPL-X-scale vertex count + 512^2 UV chart) with
trained-avatar splat statistics: mostly sub-tile splats with a fat tail of
multi-tile ones (mixture mirrors tests/test_tpg_fidelity.py). FLOPs and
memory traffic match the real model; weight values don't affect speed.

RNG consumption order is load-bearing: it reproduces bench.py's historical
draws bit-for-bit so committed numbers stay comparable across rounds.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class BenchScene(NamedTuple):
    avatar: object            # GaussianAvatar (trained-stats splats)
    ehm: object               # EhmModel
    smplx: object
    extras: object
    faces: object             # (F, 3) jnp
    cam: object               # Camera at the bench viewpoint
    base_body: object         # BodyParams (frame-0 pose)
    base_flame: object        # FlameParams
    size: int
    uv: int


INVTANFOV = 24.0

# The zero-truncation cap ladder for the bench scene (descending rect-area
# classes; base tpg 2 catches the rest). Verified num_truncated == 0 at the
# 512^2 trained-stats scene — the rendered composite IS the uncapped
# reference composite (ref: rasterizer_impl.cu:292-311 duplicates with no
# caps). Shared by bench.py --size-classes, tools/tpu_window.sh and the
# --full-scale fidelity gate.
EXACT_LADDER = ((256, 256), (3840, 64), (28672, 16), (32768, 4))


def make_bench_scene(size: int = 512, uv: int = 512, body_side: int = 101,
                     head_side: int = 15) -> BenchScene:
    import jax.numpy as jnp

    from .avatar.state import GaussianAvatar
    from .bodymodel import synthetic_ehm
    from .bodymodel.ehm import BodyParams, EhmModel, FlameParams
    from .core.cameras import Camera

    # full-scale synthetic rig: ~10.5k vertices + uv^2 UV chart
    smplx, flame_m, extras = synthetic_ehm(
        body_side=body_side, head_side=head_side, uv_size=uv, n_shape=50,
        n_exp=20,
    )
    ehm = EhmModel.build(smplx, flame_m, extras)
    faces = jnp.asarray(smplx.faces)
    V = smplx.num_vertices
    N_uv = uv * uv
    rng = np.random.default_rng(0)

    uv_valid = jnp.asarray(extras.uvmap_mask.reshape(-1))

    def mk(shape, lo, hi):
        return jnp.asarray(rng.uniform(lo, hi, shape), jnp.float32)

    def trained_stats_scales(n, base):
        """Trained-avatar scale statistics: mostly sub-tile splats with a
        fat tail of multi-tile ones, instead of a flattering uniform draw.
        Scaled by `base` to land the same pixel-radius classes under this
        scene's focal/depth (f=size*invtanfov/2, d~30)."""
        u = rng.uniform(0, 1, n)
        s = np.where(
            u < 0.85, rng.lognormal(-4.2, 0.3, n),
            np.where(u < 0.95, rng.lognormal(-3.0, 0.3, n),
                     rng.lognormal(-1.9, 0.4, n)),
        ) * base
        aniso = rng.lognormal(0, 0.2, (n, 2))
        return jnp.asarray(
            np.stack([s, s * aniso[:, 0], s * aniso[:, 1]], -1), jnp.float32
        )[None]

    def trained_stats_opacity(n):
        return jnp.asarray(
            1.0 / (1.0 + np.exp(-rng.normal(-1.0, 1.5, (1, n, 1)))),
            jnp.float32)

    quats = rng.normal(size=(1, V, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    uv_quats = rng.normal(size=(1, N_uv, 4)).astype(np.float32)
    uv_quats /= np.linalg.norm(uv_quats, axis=-1, keepdims=True)

    avatar = GaussianAvatar(
        vtx_positions=jnp.asarray(smplx.v_template)[None],
        vtx_colors=mk((1, V, 32), 0, 1),
        vtx_opacity=trained_stats_opacity(V),
        vtx_scales=trained_stats_scales(V, 0.7),
        vtx_rotations=jnp.asarray(quats),
        uv_local_xyz=mk((1, N_uv, 3), -0.5, 0.5),
        uv_colors=mk((1, N_uv, 32), 0, 1),
        # uv scales are multiplied by the binding face's edge length
        # (~0.016 world for the 101-grid body) in the deformer; base 40
        # lands the same sub-tile/medium/multi-tile pixel-radius classes
        # as the vtx splats under this scene's focal/depth
        uv_opacity=trained_stats_opacity(N_uv),
        uv_scales=trained_stats_scales(N_uv, 40.0),
        uv_rotations=jnp.asarray(uv_quats),
        uv_binding_face=jnp.asarray(extras.uvmap_f_idx.reshape(-1)),
        uv_face_bary=jnp.asarray(extras.uvmap_f_bary.reshape(-1, 3)),
        uv_valid=uv_valid,
    )

    # Offline static compaction, mirroring the inference path the bench
    # models (cli/inference.py:infer_avatar prunes before rendering, as the
    # reference's prune_gaussians does): threshold 0 drops ONLY the
    # statically-dead chart rows (uv_valid False — they emit no instances
    # in any path, so the rendered image and the fidelity oracle are
    # bit-unchanged), cutting P 272.6k -> 186.6k: ~32% of projection math
    # and ~13% of instance-sort rows carried for nothing.
    from .avatar.state import prune_avatar

    avatar = prune_avatar(avatar, opacity_threshold=0.0)

    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 30.0  # long lens (invtanfov 24) needs distance
    cam = Camera(
        R=jnp.asarray(w2c[:3, :3]),
        t=jnp.asarray(w2c[:3, 3]),
        tanfovx=jnp.asarray(1.0 / INVTANFOV),
        tanfovy=jnp.asarray(1.0 / INVTANFOV),
        width=size,
        height=size,
    )

    base_body = BodyParams(
        shape=jnp.zeros((1, smplx.n_shape)),
        body_pose=jnp.zeros((1, 21, 3)),
    )
    base_flame = FlameParams(
        shape=jnp.zeros((1, smplx.n_shape)),
        exp=jnp.zeros((1, smplx.n_exp)),
        jaw=jnp.zeros((1, 3)),
    )
    return BenchScene(avatar, ehm, smplx, extras, faces, cam, base_body,
                      base_flame, size, uv)


def frame0_gaussians(sc: BenchScene):
    """Deformed frame-0 Gaussian set — exactly what bench.py's stats
    accounting and the fidelity gate render (base pose)."""
    from .avatar.deformer import deform_with_vertices
    from .bodymodel.ehm import ehm_forward

    res0 = ehm_forward(sc.ehm, sc.base_body, sc.base_flame)
    return deform_with_vertices(
        sc.avatar, res0.vertices, res0.vertex_transforms, sc.faces)
