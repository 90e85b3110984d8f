"""32-channel differentiable Gaussian tile rasterizer — TPU-native.

Replaces the reference's diff-gaussian-rasterization-32 CUDA pipeline
(ref: cuda_rasterizer/rasterizer_impl.cu:198-341 forward, :345-449 backward)
with a TPU-first design:

  stage 1  project (pure XLA, differentiable)     gsplat_project.py
  stage 2  tile binning (XLA sort, non-diff):     duplicate each Gaussian
           into its tile rect (static cap), lexicographic sort by
           (tile, depth) — jax.lax.sort replaces CUB radix sort; tile run
           boundaries via searchsorted replace identifyTileRanges.
  stage 3  per-tile blend (Pallas, custom_vjp):   each grid step owns a
           16x16 pixel tile, streams its depth-sorted instance run from HBM
           in chunks, computes alphas for chunk x pixels on the VPU, turns
           front-to-back compositing into a chunk-local cumulative product +
           one (pixels x chunk) @ (chunk x channels) MXU matmul, with
           early-exit when every pixel saturates (T < 1e-4).

Blending matches the CUDA renderCUDA<32> semantics exactly
(ref: forward.cu:276-397): alpha = min(0.99, a*exp(power)), skip power>0 or
alpha<1/255, per-pixel permanent stop when T would drop below 1e-4,
background blend, expected inverse depth (carried as channel 32).

The backward Pallas kernel replays each tile front-to-back, producing
per-INSTANCE gradients written contiguously (each instance belongs to one
tile, so there are no atomics — the CUDA kernel's atomicAdd storm becomes a
segment-sum in XLA), then XLA autodiff chains through stage 1.
Gradient conventions follow backward.cu:452-637, including flowing through
the 0.99 alpha clamp as identity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.cameras import Camera
from .gsplat_project import project_gaussians, tile_rect

# packed-instance layout (lanes)
_GEOM = 8            # [x, y, conic_a, conic_b, conic_c, alpha, 0, 0]
_CCH = 40            # [color 0..31, invdepth, 0 x7]
_PK = _GEOM + _CCH   # 48
NUM_CHANNELS = 32

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_MIN = 1e-4


def _interpret() -> bool:
    """Run Pallas in interpreter mode off-TPU (tests on the CPU backend)."""
    return jax.default_backend() != "tpu"


class RasterizeSettings(NamedTuple):
    tile: int = 16                   # pixels per tile side
    chunk: int = 32                  # Gaussians per inner step (sublane mult of 8)
    max_tiles_per_gaussian: int = 16  # duplication cap (rect truncated to fit)
    instance_budget: int | None = None  # cap on sorted instances (None = P*TPG)
    scale_modifier: float = 1.0
    antialiasing: bool = False


class BinnedInstances(NamedTuple):
    packed: jnp.ndarray       # (N, 48) f32 per-instance render data, (tile,depth)-sorted
    ranges: jnp.ndarray       # (T+1,) i32 run boundaries per tile
    gauss_idx: jnp.ndarray    # (N,) i32 instance -> gaussian id (for grad scatter)
    num_valid: jnp.ndarray    # () i32


# ---------------------------------------------------------------------------
# stage 2: binning
# ---------------------------------------------------------------------------


def bin_gaussians(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
    settings: RasterizeSettings,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Duplicate-with-keys + sort. Returns (ranges (T+1,), order (N,), num_valid).

    `order` indexes into the per-gaussian arrays; instances are grouped by
    tile and depth-ascending within each tile, invalid entries at the end.
    """
    tile = settings.tile
    tpg = settings.max_tiles_per_gaussian
    gx = (width + tile - 1) // tile
    gy = (height + tile - 1) // tile
    num_tiles = gx * gy
    P = mean2d.shape[0]

    x0, y0, x1, y1 = tile_rect(mean2d, radius, width, height, tile)
    rw = x1 - x0
    rh = y1 - y0
    valid = valid & (rw > 0) & (rh > 0)
    # truncate oversized rects to the duplication cap (rare huge splats lose
    # their outermost-tile fringe; the reference has no cap but >tpg-tile
    # splats are pathological for an avatar workload)
    rw_c = jnp.minimum(rw, tpg)
    rh_c = jnp.minimum(rh, (tpg + rw_c - 1) // jnp.maximum(rw_c, 1))

    d = jnp.arange(tpg, dtype=jnp.int32)
    dy = d[None, :] // jnp.maximum(rw_c[:, None], 1)
    dx = d[None, :] % jnp.maximum(rw_c[:, None], 1)
    dup_valid = valid[:, None] & (dy < rh_c[:, None])
    tile_id = (y0[:, None] + dy) * gx + (x0[:, None] + dx)
    tile_id = jnp.where(dup_valid, tile_id, num_tiles).astype(jnp.int32)

    depth_b = jnp.broadcast_to(depth[:, None], (P, tpg))
    gid = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], (P, tpg)
    )
    tile_flat = tile_id.reshape(-1)
    sorted_tile, _, order = jax.lax.sort(
        (tile_flat, depth_b.reshape(-1), gid.reshape(-1)), num_keys=2
    )
    num_valid = jnp.sum((tile_flat < num_tiles).astype(jnp.int32))

    if settings.instance_budget is not None and settings.instance_budget < order.shape[0]:
        sorted_tile = sorted_tile[: settings.instance_budget]
        order = order[: settings.instance_budget]

    ranges = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), method="sort"
    ).astype(jnp.int32)
    return ranges, order, num_valid


# ---------------------------------------------------------------------------
# stage 3: Pallas tile blend
# ---------------------------------------------------------------------------


def _cumprod_sublanes(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inclusive cumulative product along axis 0 (size n, power of two)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, k, axis=0)
        x = x * jnp.where(row >= k, shifted, 1.0)
        k *= 2
    return x


def _cumsum_sublanes(x: jnp.ndarray, n: int) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, k, axis=0)
        x = x + jnp.where(row >= k, shifted, 0.0)
        k *= 2
    return x


def _chunk_alphas(geom, px, py, j_valid):
    """Shared forward math for one chunk.

    geom (G, 8), px/py (1, PIX). Returns (alpha_masked (G, PIX), d0, d1, gexp).
    """
    xy0 = geom[:, 0:1]
    xy1 = geom[:, 1:2]
    ca = geom[:, 2:3]
    cb = geom[:, 3:4]
    cc = geom[:, 4:5]
    a_op = geom[:, 5:6]
    d0 = xy0 - px
    d1 = xy1 - py
    power = -0.5 * (ca * d0 * d0 + cc * d1 * d1) - cb * d0 * d1
    gexp = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, a_op * gexp)
    contrib = (power <= 0.0) & (alpha >= ALPHA_MIN) & j_valid
    return jnp.where(contrib, alpha, 0.0), d0, d1, gexp


def _fwd_kernel(
    # scalar prefetch
    ranges_ref,
    # inputs
    packed_hbm,
    bg_ref,
    # outputs
    out_ref,
    t_ref,
    # scratch
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

    # pixel coordinates of this tile, flattened (1, PIX)
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

    def cond(carry):
        c, T, dead, acc = carry
        return (c < nchunks) & jnp.logical_not(jnp.all(dead))

    def body(carry):
        c, T, dead, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            dma(1 - slot, c + 1).start()

        dma(slot, c).wait()
        data = buf[slot]  # (G, 48)
        geom = data[:, :_GEOM]
        colors = data[:, _GEOM:]  # (G, 40)

        j = jax.lax.broadcasted_iota(jnp.int32, (G, PIX), 0)
        j_valid = (j + c * G) < num
        at, _, _, _ = _chunk_alphas(geom, px, py, j_valid)
        at = jnp.where(dead, 0.0, at)

        P_incl = T * _cumprod_sublanes(1.0 - at, G)  # (G, PIX)
        live = P_incl >= T_MIN
        E = P_incl / (1.0 - at)  # exclusive prefix (safe: at <= 0.99)
        w = jnp.where(live, at * E, 0.0)

        acc = acc + jax.lax.dot_general(
            w,
            colors,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (PIX, 40)

        T_new = jnp.min(jnp.where(live, P_incl, jnp.inf), axis=0, keepdims=True)
        T = jnp.minimum(T, T_new)
        dead = dead | jnp.any((at > 0.0) & jnp.logical_not(live), axis=0, keepdims=True)
        return c + 1, T, dead, acc

    T0 = jnp.ones((1, PIX), jnp.float32)
    dead0 = jnp.zeros((1, PIX), jnp.bool_)
    acc0 = jnp.zeros((PIX, _CCH), jnp.float32)
    _, T, _, acc = jax.lax.while_loop(cond, body, (0, T0, dead0, acc0))

    out = acc + T.reshape(PIX, 1) * bg_ref[0][None, :]
    out_ref[:] = out.reshape(tile, tile, _CCH)
    t_ref[:] = T.reshape(1, 1, tile, tile)


def _bwd_kernel(
    ranges_ref,
    packed_hbm,
    bg_ref,
    t_in_ref,      # final_T (tile, tile)
    out_in_ref,    # forward output block (tile, tile, CCH)
    gout_ref,      # dL/dout block (tile, tile, CCH)
    # outputs
    dpacked_hbm,   # (N, 48) per-instance grads (ANY/HBM)
    # scratch
    buf,
    dbuf,
    sems,
    dsems,
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

    g_out = gout_ref[:].reshape(PIX, _CCH)          # (PIX, 40)
    T_final = t_in_ref[:].reshape(1, PIX)
    bg = bg_ref[0]                                   # (40,)
    # total foreground accumulation = out - T_final * bg
    acc_total = out_in_ref[:].reshape(PIX, _CCH) - T_final.reshape(PIX, 1) * bg[None, :]
    # u = g . acc_total per pixel; gbg = g . bg per pixel
    u = jnp.sum(g_out * acc_total, axis=-1).reshape(1, PIX)
    gbg = jnp.sum(g_out * bg[None, :], axis=-1).reshape(1, PIX)

    def dma_in(slot, c):
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(start + c * G, G)], buf.at[slot], sems.at[slot]
        )

    def dma_out(slot, c):
        return pltpu.make_async_copy(
            dbuf.at[slot], dpacked_hbm.at[pl.ds(start + c * G, G)], dsems.at[slot]
        )

    @pl.when(nchunks > 0)
    def _():
        dma_in(0, 0).start()

    def cond(carry):
        c, T, dead, gp = carry
        return c < nchunks  # must visit every chunk to zero its grads

    def body(carry):
        c, T, dead, gp = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            dma_in(1 - slot, c + 1).start()

        dma_in(slot, c).wait()
        # previous chunk's grad write must have finished before reuse
        @pl.when(c >= 2)
        def _():
            dma_out(slot, c - 2).wait()

        data = buf[slot]
        geom = data[:, :_GEOM]
        colors = data[:, _GEOM:]

        j = jax.lax.broadcasted_iota(jnp.int32, (G, PIX), 0)
        j_valid = (j + c * G) < num
        at, d0, d1, gexp = _chunk_alphas(geom, px, py, j_valid)
        at = jnp.where(dead, 0.0, at)

        P_incl = T * _cumprod_sublanes(1.0 - at, G)
        live = P_incl >= T_MIN
        E = P_incl / (1.0 - at)
        w = jnp.where(live, at * E, 0.0)
        used = live & (at > 0.0)

        # per-(instance,pixel) color-dot grads
        gc = jax.lax.dot_general(
            colors,
            g_out,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, PIX)
        wgc = w * gc
        prefix_incl = gp + _cumsum_sublanes(wgc, G)  # (G, PIX)
        suffix = u - prefix_incl                      # g . S_i
        inv1ma = 1.0 / (1.0 - at)
        # dL/dalpha_{i,pix}: color term + background term (backward.cu:598-618)
        dalpha_pix = jnp.where(
            used,
            E * gc - suffix * inv1ma - T_final * inv1ma * gbg,
            0.0,
        )

        # chain to geometry per instance (sum over pixels)
        a_op = geom[:, 5:6]
        capped = (a_op * gexp) > ALPHA_MAX
        # CUDA flows through the clamp as identity (backward.cu:583,635)
        dG = jnp.where(used, a_op * dalpha_pix, 0.0)
        dop = jnp.sum(jnp.where(used, gexp * dalpha_pix, 0.0), axis=1)
        del capped
        ca = geom[:, 2:3]
        cb = geom[:, 3:4]
        cc = geom[:, 4:5]
        gdx = gexp * d0
        gdy = gexp * d1
        dmx = jnp.sum(dG * (-gdx * ca - gdy * cb), axis=1)
        dmy = jnp.sum(dG * (-gdy * cc - gdx * cb), axis=1)
        dca = jnp.sum(dG * (-0.5 * gdx * d0), axis=1)
        dcb = jnp.sum(dG * (-gdx * d1), axis=1)
        dcc = jnp.sum(dG * (-0.5 * gdy * d1), axis=1)

        # per-instance color grads: (G, PIX) @ (PIX, 40)
        dcol = jax.lax.dot_general(
            w,
            g_out,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, 40)

        dgeom = jnp.stack(
            [dmx, dmy, dca, dcb, dcc, dop, jnp.zeros_like(dop), jnp.zeros_like(dop)],
            axis=-1,
        )  # (G, 8)
        dbuf[slot] = jnp.concatenate([dgeom, dcol], axis=-1)
        dma_out(slot, c).start()

        T_new = jnp.min(jnp.where(live, P_incl, jnp.inf), axis=0, keepdims=True)
        T = jnp.minimum(T, T_new)
        dead = dead | jnp.any((at > 0.0) & jnp.logical_not(live), axis=0, keepdims=True)
        gp_new = jnp.max(prefix_incl, axis=0, keepdims=True)  # cumsum is monotone? no —
        # wgc can be negative; take the true last row instead
        gp_new = prefix_incl[G - 1 : G, :]
        return c + 1, T, dead, gp_new

    T0 = jnp.ones((1, PIX), jnp.float32)
    dead0 = jnp.zeros((1, PIX), jnp.bool_)
    gp0 = jnp.zeros((1, PIX), jnp.float32)
    c_fin, _, _, _ = jax.lax.while_loop(cond, body, (0, T0, dead0, gp0))

    # drain outstanding grad writes
    @pl.when(c_fin >= 2)
    def _():
        dma_out(jax.lax.rem(c_fin, 2), c_fin - 2).wait()

    @pl.when(c_fin >= 1)
    def _():
        dma_out(jax.lax.rem(c_fin - 1, 2), c_fin - 1).wait()


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def blend_tiles(packed, ranges, bg, height, width, tile, chunk):
    out, t = _blend_fwd_call(packed, ranges, bg, height, width, tile, chunk)
    return out, t


def _blend_fwd_call(packed, ranges, bg, height, width, tile, chunk):
    gy = height // tile
    gx = width // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, _CCH), lambda i, j, r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile, _CCH), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, tile), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, _PK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, tile=tile, chunk=chunk, grid_x=gx)
    out, t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((height, width, _CCH), jnp.float32),
            jax.ShapeDtypeStruct((gy, gx, tile, tile), jnp.float32),
        ],
        interpret=_interpret(),
    )(ranges, packed, bg.reshape(1, _CCH))
    return out, t


def _blend_fwd(packed, ranges, bg, height, width, tile, chunk):
    out, t = _blend_fwd_call(packed, ranges, bg, height, width, tile, chunk)
    return (out, t), (packed, ranges, bg, out, t)


def _blend_bwd(height, width, tile, chunk, res, grads):
    packed, ranges, bg, out, t = res
    g_out, g_t = grads
    del g_t  # final_T treated as an auxiliary, non-differentiable output
    gy = height // tile
    gx = width // tile
    N = packed.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, _CCH), lambda i, j, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, tile), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile, _CCH), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile, _CCH), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, _PK), jnp.float32),
            pltpu.VMEM((2, chunk, _PK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_bwd_kernel, tile=tile, chunk=chunk, grid_x=gx)
    dpacked = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, _PK), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(ranges, packed, bg.reshape(1, _CCH), t, out, g_out)[0]

    # rows past the last valid instance were never written — zero them
    n_valid = ranges[-1]
    row = jnp.arange(N, dtype=jnp.int32)[:, None]
    dpacked = jnp.where(row < n_valid, dpacked, 0.0)

    # d(bg): sum over pixels of T * g_out (t is in (gy, gx, ty, tx) layout)
    t_img = t.transpose(0, 2, 1, 3).reshape(height, width)
    g_bg = jnp.einsum("hw,hwc->c", t_img, g_out)
    return dpacked, None, g_bg


blend_tiles.defvjp(_blend_fwd, _blend_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def rasterize(
    means3d: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    cam: Camera,
    bg: jnp.ndarray,
    settings: RasterizeSettings = RasterizeSettings(),
):
    """Differentiable single-image rasterization.

    API parity with GaussianRasterizer_32
    (ref: diff_gaussian_rasterization_32/__init__.py:143-207):
    means3d (P,3), colors (P,32) precomputed, opacities (P,1), scales (P,3),
    quats (P,4) wxyz, camera, bg (32,)
    -> (color (32,H,W), radii (P,), invdepth (1,H,W)).
    """
    H, W = cam.height, cam.width
    tile = settings.tile
    assert H % tile == 0 and W % tile == 0, "pad image dims to tile multiple"

    proj = project_gaussians(
        means3d, scales, quats, opacities, cam,
        settings.scale_modifier, settings.antialiasing,
    )
    ranges, order, _ = bin_gaussians(
        jax.lax.stop_gradient(proj.mean2d),
        jax.lax.stop_gradient(proj.depth),
        proj.radius,
        proj.valid,
        W, H, settings,
    )

    # gather per-instance packed data (differentiable take)
    invd = 1.0 / jnp.maximum(proj.depth, 1e-8)
    zeros2 = jnp.zeros((means3d.shape[0], 2), jnp.float32)
    pad7 = jnp.zeros((means3d.shape[0], _CCH - NUM_CHANNELS - 1), jnp.float32)
    per_gauss = jnp.concatenate(
        [
            proj.mean2d,
            proj.conic,
            proj.alpha[:, None],
            zeros2,
            colors,
            invd[:, None],
            pad7,
        ],
        axis=-1,
    )  # (P, 48)
    packed = per_gauss[order]
    # chunk DMAs may over-read past a short final run — pad by one chunk
    G = settings.chunk
    pad_rows = ((packed.shape[0] + G - 1) // G + 1) * G - packed.shape[0]
    packed = jnp.concatenate(
        [packed, jnp.zeros((pad_rows, _PK), packed.dtype)], axis=0
    )

    bg_ext = jnp.concatenate([bg, jnp.zeros(_CCH - NUM_CHANNELS, bg.dtype)])
    out, final_t = blend_tiles(packed, ranges, bg_ext, H, W, tile, settings.chunk)

    color = jnp.transpose(out[:, :, :NUM_CHANNELS], (2, 0, 1))
    invdepth = out[:, :, NUM_CHANNELS][None]
    return color, proj.radius, invdepth
