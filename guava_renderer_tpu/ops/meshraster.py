"""Mesh z-buffer rasterizer (Pallas) — visibility and attribute rendering.

Replaces the reference's pytorch3d `rasterize_meshes` usage
(ref: utils/graphics_utils.py:253-355 GS_MeshRasterizer,
:471-492 BaseMeshRenderer.render_fragments) with a TPU tile rasterizer that
shares the Gaussian pipeline's binning: triangles are binned to 16x16 tiles
(XLA sort), then a Pallas kernel streams each tile's triangle run and keeps
the nearest hit per pixel (edge-function coverage, screen-space barycentric
depth; depth test is order-independent, so no depth sort is needed).

Outputs per pixel: instance index of the nearest face (-1 = background) and
its depth; face ids / barycentrics / interpolated attributes are recovered
with cheap XLA gathers. Used with stop_gradient semantics (the reference
queries visibility under no_grad, ubody_gaussian.py:136-143).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.cameras import Camera, project_points
from .gsplat import _interpret

_TF = 128  # packed triangle lanes: [x0,y0,z0, x1,y1,z1, x2,y2,z2, pad] (128-lane aligned for HBM DMA)


class MeshRasterResult(NamedTuple):
    face_idx: jnp.ndarray   # (H, W) i32, -1 = empty
    depth: jnp.ndarray      # (H, W) f32 (inf where empty)
    bary: jnp.ndarray       # (H, W, 3) f32 screen-space barycentrics


def _mesh_kernel(
    ranges_ref,
    packed_hbm,   # (N, 16) f32 triangles, tile-grouped
    best_ref,     # (tile, tile) i32 instance index
    z_ref,        # (tile, tile) f32
    buf,
    sems,
    *,
    tile: int,
    chunk: int,
    grid_x: int,
):
    G = chunk
    PIX = tile * tile
    t_idx = pl.program_id(0) * grid_x + pl.program_id(1)
    start = ranges_ref[t_idx]
    end = ranges_ref[t_idx + 1]
    num = end - start
    nchunks = pl.cdiv(num, G)

    y0 = pl.program_id(0) * tile
    x0 = pl.program_id(1) * tile
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = (x0 + lin % tile).astype(jnp.float32)
    py = (y0 + lin // tile).astype(jnp.float32)

    def dma(slot, c):
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(start + c * G, G)], buf.at[slot], sems.at[slot]
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def body(c, carry):
        best, z = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            dma(1 - slot, c + 1).start()

        dma(slot, c).wait()
        t = buf[slot]  # (G, 16)
        ax, ay, az = t[:, 0:1], t[:, 1:2], t[:, 2:3]
        bx, by, bz = t[:, 3:4], t[:, 4:5], t[:, 5:6]
        cx, cy, cz = t[:, 6:7], t[:, 7:8], t[:, 8:9]

        # signed areas (edge functions), w.r.t. pixel centers
        det = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        w0 = ((bx - px) * (cy - py) - (by - py) * (cx - px)) / det_safe
        w1 = ((cx - px) * (ay - py) - (cy - py) * (ax - px)) / det_safe
        w2 = 1.0 - w0 - w1

        j = jax.lax.broadcasted_iota(jnp.int32, (G, PIX), 0)
        j_valid = (j + c * G) < num
        eps = -1e-6
        inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps) & j_valid
        zpix = w0 * az + w1 * bz + w2 * cz
        inside = inside & (zpix > 0.0)
        zpix = jnp.where(inside, zpix, jnp.inf)

        zmin = jnp.min(zpix, axis=0, keepdims=True)  # (1, PIX)
        row = jax.lax.broadcasted_iota(jnp.int32, (G, PIX), 0)
        # first row achieving the min (deterministic tie-break)
        arg = jnp.min(jnp.where(zpix == zmin, row, G), axis=0, keepdims=True)
        inst = start + c * G + arg
        upd = zmin < z
        best = jnp.where(upd, inst, best)
        z = jnp.where(upd, zmin, z)
        return best, z

    best0 = jnp.full((1, PIX), -1, jnp.int32)
    z0 = jnp.full((1, PIX), jnp.inf, jnp.float32)
    best, z = jax.lax.fori_loop(0, nchunks, body, (best0, z0))
    best_ref[:] = best.reshape(1, 1, 1, PIX)
    z_ref[:] = z.reshape(1, 1, 1, PIX)


def rasterize_mesh(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    cam: Camera,
    tile: int = 16,
    chunk: int = 16,
    max_tiles_per_face: int = 32,
) -> MeshRasterResult:
    """Single-mesh z-buffer rasterization. verts (V, 3) world, faces (F, 3)."""
    H, W = cam.height, cam.width
    assert H % tile == 0 and W % tile == 0
    gx, gy = W // tile, H // tile
    num_tiles = gx * gy
    F = faces.shape[0]

    pix, z = project_points(cam, verts)  # (V, 2), (V,)
    tri = pix[faces]          # (F, 3, 2)
    tri_z = z[faces]          # (F, 3)
    valid = jnp.all(tri_z > 0.01, axis=-1)  # near-plane cull (conservative)

    # tile rect of the triangle bbox
    x0 = jnp.clip((tri[..., 0].min(1) / tile).astype(jnp.int32), 0, gx)
    y0 = jnp.clip((tri[..., 1].min(1) / tile).astype(jnp.int32), 0, gy)
    x1 = jnp.clip((tri[..., 0].max(1) / tile).astype(jnp.int32) + 1, 0, gx)
    y1 = jnp.clip((tri[..., 1].max(1) / tile).astype(jnp.int32) + 1, 0, gy)
    rw = jnp.maximum(x1 - x0, 0)
    rh = jnp.maximum(y1 - y0, 0)
    valid = valid & (rw > 0) & (rh > 0)

    tpf = max_tiles_per_face
    rw_c = jnp.minimum(rw, tpf)
    rh_c = jnp.minimum(rh, (tpf + rw_c - 1) // jnp.maximum(rw_c, 1))
    d = jnp.arange(tpf, dtype=jnp.int32)
    dy = d[None, :] // jnp.maximum(rw_c[:, None], 1)
    dx = d[None, :] % jnp.maximum(rw_c[:, None], 1)
    dup_valid = valid[:, None] & (dy < rh_c[:, None])
    tile_id = jnp.where(
        dup_valid, (y0[:, None] + dy) * gx + (x0[:, None] + dx), num_tiles
    ).astype(jnp.int32)

    fid = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[:, None], (F, tpf))
    # payload of the sort IS the face id of each instance
    sorted_tile, inst_fid = jax.lax.sort(
        (tile_id.reshape(-1), fid.reshape(-1)), num_keys=1
    )
    ranges = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), method="scan"
    ).astype(jnp.int32)

    packed = jnp.concatenate(
        [
            tri[:, 0], tri_z[:, 0:1],
            tri[:, 1], tri_z[:, 1:2],
            tri[:, 2], tri_z[:, 2:3],
            jnp.zeros((F, _TF - 9), jnp.float32),
        ],
        axis=-1,
    )  # (F, 16)
    inst = packed[inst_fid]  # per-instance triangle data (one row per face copy)

    G = chunk
    pad = ((inst.shape[0] + G - 1) // G + 1) * G - inst.shape[0]
    inst = jnp.concatenate([inst, jnp.zeros((pad, _TF), inst.dtype)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, tile * tile), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile * tile), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, G, _TF), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_mesh_kernel, tile=tile, chunk=G, grid_x=gx)
    best, zimg = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((gy, gx, 1, tile * tile), jnp.int32),
            jax.ShapeDtypeStruct((gy, gx, 1, tile * tile), jnp.float32),
        ],
        interpret=_interpret(),
    )(ranges, inst)
    best = best.reshape(gy, gx, tile, tile).transpose(0, 2, 1, 3).reshape(H, W)
    zimg = zimg.reshape(gy, gx, tile, tile).transpose(0, 2, 1, 3).reshape(H, W)

    hit = best >= 0
    face_idx = jnp.where(hit, inst_fid[jnp.maximum(best, 0)], -1)

    # barycentrics recomputed in XLA for hit pixels
    tri_hit = tri[jnp.maximum(face_idx, 0)]  # (H, W, 3, 2)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    a, b, c = tri_hit[..., 0, :], tri_hit[..., 1, :], tri_hit[..., 2, :]
    det = (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (c[..., 0] - a[..., 0])
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    w0 = ((b[..., 0] - xs) * (c[..., 1] - ys) - (b[..., 1] - ys) * (c[..., 0] - xs)) / det
    w1 = ((c[..., 0] - xs) * (a[..., 1] - ys) - (c[..., 1] - ys) * (a[..., 0] - xs)) / det
    bary = jnp.stack([w0, w1, 1.0 - w0 - w1], axis=-1)
    bary = jnp.where(hit[..., None], bary, 0.0)

    return MeshRasterResult(face_idx=face_idx, depth=zimg, bary=bary)


def visible_faces_mask(face_idx: jnp.ndarray, num_faces: int) -> jnp.ndarray:
    """(F,) bool — faces present in the id image (ref: graphics_utils.py:471-492)."""
    flat = face_idx.reshape(-1)
    mask = jnp.zeros((num_faces,), jnp.bool_)
    # route empty pixels (-1) out of range so they are dropped, not scattered
    idx = jnp.where(flat >= 0, flat, num_faces)
    return mask.at[idx].set(True, mode="drop")


def interpolate_attributes(
    res: MeshRasterResult,
    faces: jnp.ndarray,
    vertex_attrs: jnp.ndarray,
) -> jnp.ndarray:
    """Per-pixel interpolation of vertex attributes, 0 where empty.

    Covers the reference's position / LBS-weight mesh renders
    (ref: graphics_utils.py:440-469)."""
    tri = faces[jnp.maximum(res.face_idx, 0)]        # (H, W, 3)
    attrs = vertex_attrs[tri]                        # (H, W, 3, A)
    out = jnp.einsum("hwka,hwk->hwa", attrs, res.bary)
    return jnp.where((res.face_idx >= 0)[..., None], out, 0.0)
