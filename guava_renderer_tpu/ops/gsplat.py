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
           in chunks (double-buffered DMA), computes alphas for
           chunk x pixels on the VPU, turns front-to-back compositing into a
           chunk-local cumulative product + one (channels x chunk) @
           (chunk x pixels) MXU matmul, with early-exit when every pixel
           saturates (T < 1e-4).

In-kernel layout is (channels, pixels): channels ride the sublanes, the 256
tile pixels fill exactly two 128-wide lanes — no lane<->sublane reshapes.
Tile-shaped tensors cross the Pallas boundary in (gy, gx, C, 256) layout and
are rearranged to images by XLA.

Blending matches the CUDA renderCUDA<32> semantics exactly
(ref: forward.cu:276-397): alpha = min(0.99, a*exp(power)), skip power>0 or
alpha<1/255, per-pixel permanent stop when T would drop below 1e-4,
background blend, expected inverse depth (carried as channel 32).

The backward Pallas kernel replays each tile front-to-back, producing
per-INSTANCE gradients written contiguously (each instance belongs to one
tile, so there are no atomics — the CUDA kernel's atomicAdd storm becomes a
differentiable gather/scatter-add in XLA), then XLA autodiff chains through
stage 1. Gradient conventions follow backward.cu:452-637, including flowing
through the 0.99 alpha clamp as identity.
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

# packed-instance layout (lanes). Rows are padded to 128 lanes: HBM DMA
# slices must be 128-aligned in the minor dimension, and Mosaic lays HBM
# refs out lane-padded regardless, so the padding costs no extra memory.
_GEOM = 8            # [x, y, conic_a, conic_b, conic_c, alpha, 0, 0]
_CCH = 40            # [color 0..31, invdepth, 0 x7]
_PK = 128            # geom(8) + colors(40) + pad(80)
NUM_CHANNELS = 32

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_MIN = 1e-4


_FORCE_INTERPRET = False  # diagnostics: compare interpret vs compiled on-chip


def _interpret() -> bool:
    """Run Pallas in interpreter mode off-TPU (tests on the CPU backend)."""
    return _FORCE_INTERPRET or jax.default_backend() != "tpu"


class RasterizeSettings(NamedTuple):
    tile: int = 16                   # pixels per tile side
    chunk: int = 32                  # Gaussians per inner step (sublane mult of 8)
    max_tiles_per_gaussian: int = 16  # duplication cap (rect truncated to fit)
    # Size-classed duplication: the `large_k` gaussians with the biggest
    # tile rects are pulled out of the base class and duplicated with cap
    # `tpg_large` instead. Trained avatars are mostly sub-tile splats with a
    # fat tail of big ones; a flat cap either truncates the tail (measured
    # -15 dB on a stress scene, tests/test_tpg_fidelity.py) or multiplies
    # the instance sort size by 8x. large_k=0 disables the class.
    large_k: int = 0
    tpg_large: int = 64
    # Multi-class capped duplication: ((count, cap), ...) ordered by
    # descending rect area — class 0 is the `count` biggest splats at
    # `cap` tiles each, and so on; the remainder uses
    # max_tiles_per_gaussian. Generalizes large_k/tpg_large (which it
    # supersedes when non-empty) so a geometric cap ladder can reach zero
    # truncation without exploding the static instance-sort size. Uses the
    # nopresort instance ordering (like streaming).
    size_classes: tuple = ()
    instance_budget: int | None = None  # cap on sorted instances (None = P*TPG)
    # Keep the first `vmem_classes` size classes RESIDENT IN VMEM during
    # the forward blend: the big-rect splats account for most row fetches
    # (top-4096 classes cover ~60% of instances on trained-avatar stats)
    # and every fetch otherwise pays the ~53-61 ns single-row DMA
    # descriptor floor. Classed instance ids are remapped to P+rank; the
    # kernel serves them from a (L, 128) VMEM table with no DMA at all.
    # Requires size_classes; the backward (RMW on the full gradient table)
    # is unchanged and uses the original ids.
    vmem_classes: int = 0
    # semaphore banks for the row-gather/RMW DMAs: spreading rows over
    # several semaphores lets Mosaic map them to distinct DMA queues
    # (parallel descriptor processing). chunk must be divisible by it.
    dma_banks: int = 1
    # False = skip the P-row depth presort and key the instance sort on
    # (tile, depth-bits) directly — one fewer ~4 ms pass-bound sort (see
    # _bin_nopresort). Depth TIES between distinct gaussians then resolve
    # by duplication order instead of gaussian id (real scenes: no ties).
    presort: bool = True
    # Exact per-instance tile culling: drop (gaussian, tile) instances whose
    # maximum alpha over the tile's pixel centers is below the blend's 1/255
    # floor (the analytic min of the conic quadratic over the tile box).
    # Bit-exact by construction — the blend skips those pixels anyway
    # (forward.cu:358-360) — while the rect bound alone keeps corner tiles
    # of big anisotropic splats whose ellipse never enters them. Each culled
    # instance saves one 512 B row DMA in the blend kernel (the frame's
    # single largest cost, ~10 ms of 40 ms at 454k instances).
    tile_cull: bool = True
    # Streaming blend: carry the packed per-gaussian payload THROUGH the
    # instance sort (jax.lax.sort moves every operand each pass — measured
    # pass-count bound, not payload-width bound) and blend from CONTIGUOUS
    # (chunk, 128) block DMAs instead of per-instance row gathers. The row
    # gather is DMA-descriptor-issue bound at ~53-61 ns/row no matter the
    # banks or row width (outputs/bench/tpu_window_r7/dma_bench.log) — at
    # ~390k instances that descriptor floor alone is ~10 ms of the frame.
    # Implies the nopresort instance ordering (depth ties resolve by
    # duplication order); incompatible with instance_budget.
    streaming: bool = False
    scale_modifier: float = 1.0
    antialiasing: bool = False
    # Priority-duplication window: when a splat's tile rect has more tiles
    # than its duplication cap, enumerate up to this many rect tiles and
    # keep the `cap` strongest by analytic max-alpha (_dup_tiles). 0 skips
    # the per-row (n, window) qmin sort entirely and enumerates the first
    # `cap` rect tiles row-major with the cull applied in place — for a
    # zero-truncation cap ladder (cap >= rect area by construction, see
    # tools/ladder_fit.py) the kept instance set is IDENTICAL, and the
    # duplication stage drops ~3M slot-qmin evaluations + per-row sorts at
    # the 512^2 bench scene. Leave >0 only for truncating configs, where
    # priority selection cuts the fringe instead of whole rect rows.
    priority_window: int = 16
    # bf16 packed rows for the forward blend: the per-gaussian table rides
    # HBM as (P, 128) bf16 — 256 B/row instead of 512 B through the
    # row-gather DMAs (the blend runs at ~0.9 of peak HBM BW). Geometry
    # (x, y, conic, alpha) is carried as bf16 hi/lo PAIRS reconstructed
    # in-kernel as hi + lo (~16-bit mantissa, |rel err| ~ 2^-16 — measured
    # >= 70 dB vs the f32 blend, tests/test_gsplat.py::test_bf16_rows);
    # colors + invdepth are plain bf16, which the MXU matmul rounds to in
    # BOTH paths anyway. The backward reconstructs the f32 table the
    # forward actually used (hi + lo exactly), so the replay is consistent
    # and gradients flow straight-through the packing.
    bf16_rows: bool = False
    # Early-exit cadence for the forward blend: check the all-pixels-
    # saturated flag every `exit_every` chunks (0 disables the check).
    # The flag is a vector->scalar reduce feeding the while-loop condition
    # — a full VPU-pipeline drain on the chunk critical path — so checking
    # every chunk costs serialization even when it saves row DMAs; on the
    # bench scene the exit fires after ~19% of chunks (tools/ee_probe.py),
    # so the saved fetches normally dominate. Tunable for the A/B.
    exit_every: int = 1


# ---------------------------------------------------------------------------
# stage 2: binning
# ---------------------------------------------------------------------------


def _capped_emit(rw, rh, cap):
    """Instances the row-major capped duplication emits per gaussian.

    rh_c uses ceil(cap/rw_c), so rw_c*rh_c may exceed cap by a partial last
    row — the slot enumeration stops at cap."""
    rw_c = jnp.minimum(rw, cap)
    rh_c = jnp.minimum(rh, (cap + rw_c - 1) // jnp.maximum(rw_c, 1))
    return jnp.minimum(rw_c * rh_c, cap)


def _cull_qcut(conic, alpha):
    """Per-gaussian threshold on the conic quadratic q = d^T conic d above
    which alpha = a0*exp(-q/2) falls below the blend's 1/255 floor.

    +inf (never cull) for non-positive-definite conics, where the q-min-
    over-box edge analysis below is invalid. The 1e-3 slack keeps analytic
    boundary cases strictly below what the blend's f32 exp could round up
    to the floor."""
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    psd = (ca > 0.0) & (cc > 0.0) & (ca * cc - cb * cb > 0.0)
    qcut = 2.0 * jnp.log(jnp.maximum(255.0 * alpha, 1.0)) + 1e-3
    return jnp.where(psd, qcut, jnp.inf)


def _dup_tiles(x0_, y0_, rw_, rh_, valid_, cap, cp_, tile, gx, num_tiles,
               window=16):
    """Per-gaussian rect -> (n, cap) tile ids (num_tiles = invalid slot).

    Without cull params: the first `cap` rect tiles row-major (the original
    static-cap semantics; what the CUDA-uncapped reference would emit when
    the rect fits). With cull params: PRIORITY duplication — enumerate up
    to a `window` of rect tiles, score each by the analytic max alpha over
    the tile (the same q-min the cull uses), and keep the `cap` strongest
    contributing tiles. Row-major truncation can drop a splat's CENTER
    tile (a 3x3 rect at cap 2 emits two corner tiles); priority selection
    makes the cap cut the fringe instead, and subsumes the cull (tiles
    below the 1/255 floor sort to +inf and come out invalid)."""
    rm_cap = cap if (cp_ is None or not window) else max(
        2 * cap, min(window, num_tiles))
    rw_c = jnp.minimum(rw_, rm_cap)
    rh_c = jnp.minimum(rh_, (rm_cap + rw_c - 1) // jnp.maximum(rw_c, 1))
    d = jnp.arange(rm_cap, dtype=jnp.int32)
    dy = d[None, :] // jnp.maximum(rw_c[:, None], 1)
    dx = d[None, :] % jnp.maximum(rw_c[:, None], 1)
    in_rect = valid_[:, None] & (dy < rh_c[:, None])
    tx = x0_[:, None] + dx
    ty = y0_[:, None] + dy
    if cp_ is None:
        return jnp.where(in_rect, ty * gx + tx, num_tiles).astype(jnp.int32)
    mx, my, ca, cb, cc, qcut = cp_
    qmin = _slot_qmin(tx, ty, mx, my, ca, cb, cc, tile)
    keep = in_rect & (qmin <= qcut[:, None])
    tid = (ty * gx + tx).astype(jnp.int32)
    if rm_cap == cap:
        # window=0: no priority selection — the first `cap` rect tiles
        # row-major, culled in place. Identical instance set whenever the
        # rect fits the cap (zero-truncation ladders guarantee it).
        return jnp.where(keep, tid, num_tiles).astype(jnp.int32)
    key = jnp.where(keep, qmin, jnp.inf)
    key_s, tid_s = jax.lax.sort((key, tid), dimension=1, num_keys=1)
    key_s = key_s[:, :cap]
    tid_s = tid_s[:, :cap]
    return jnp.where(jnp.isfinite(key_s), tid_s, num_tiles).astype(jnp.int32)


def _slot_qmin(tx, ty, mx, my, ca, cb, cc, tile):
    """Exact min of q(d) = ca*dx^2 + 2*cb*dx*dy + cc*dy^2 over the box of
    tile (tx, ty)'s pixel centers; d = pixel - mean.

    (n, cap) tile coords, (n,) per-gaussian params. For a PSD form the min
    over a box is 0 if the mean lies inside, else it lies on one of the four
    edges — each edge restriction is a 1-D quadratic minimized in closed
    form and clamped to the edge's extent."""
    mx = mx[:, None]
    my = my[:, None]
    ca = ca[:, None]
    cb = cb[:, None]
    cc = cc[:, None]
    bx0 = tx.astype(jnp.float32) * tile - mx
    bx1 = bx0 + (tile - 1)
    by0 = ty.astype(jnp.float32) * tile - my
    by1 = by0 + (tile - 1)

    def edge_x(e):  # dx = e fixed, minimize over dy in [by0, by1]
        dy = jnp.clip(-cb * e / jnp.maximum(cc, 1e-20), by0, by1)
        return (ca * e + 2.0 * cb * dy) * e + cc * dy * dy

    def edge_y(e):  # dy = e fixed, minimize over dx in [bx0, bx1]
        dx = jnp.clip(-cb * e / jnp.maximum(ca, 1e-20), bx0, bx1)
        return (cc * e + 2.0 * cb * dx) * e + ca * dx * dx

    qmin = jnp.minimum(
        jnp.minimum(edge_x(bx0), edge_x(bx1)),
        jnp.minimum(edge_y(by0), edge_y(by1)),
    )
    inside = (bx0 <= 0.0) & (bx1 >= 0.0) & (by0 <= 0.0) & (by1 >= 0.0)
    return jnp.where(inside, 0.0, qmin)


def bin_gaussians(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
    settings: RasterizeSettings,
    conic: jnp.ndarray | None = None,
    alpha: jnp.ndarray | None = None,
    payload: tuple | None = None,
    class_order: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Duplicate-with-keys + sort.

    With `payload` (tuple of (P,) arrays) the call returns
    (ranges, order, sorted_payload, num_valid, num_truncated): every column
    is duplicated and carried through the instance sort so the caller can
    assemble a contiguous per-instance table (streaming blend). The payload
    path always uses the nopresort ordering (depth ties resolve by
    duplication order instead of gaussian id; real scenes have no ties).

    Returns (ranges (T+1,), order (N,), num_valid, num_truncated).
    `order` indexes into the per-gaussian arrays; instances are grouped by
    tile and depth-ascending within each tile, invalid entries at the end.

    `num_truncated` counts tile instances LOST to the static caps (the
    per-gaussian `tpg`/`tpg_large` duplication budgets and the optional
    global `instance_budget`) — the CUDA reference is uncapped
    (rasterizer_impl.cu:292-301), so any nonzero value here is a quality
    delta vs the reference; bench/diag surface it so the silent cap is a
    visible number. Instances removed by the exact tile cull
    (settings.tile_cull, needs `conic`+`alpha`) are NOT counted: the blend
    provably ignores them (max alpha over the tile < 1/255), so dropping
    them is lossless.

    `class_order` (size_classes only): a precomputed (P,) permutation
    assigning gaussians to cap classes by position, replacing the
    per-frame area-rank sort + rank gathers. For animation, compute it
    ONCE from the clip's per-gaussian envelope areas
    (`envelope_class_order`): the envelope-fitted ladder guarantees every
    frame's rect fits its cap, so the kept instance set — and the render —
    is identical to per-frame ranking, while the P-row sort leaves the
    frame loop. `num_truncated` is still counted per-frame and reads
    nonzero if a pose escapes the envelope.
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
    # every tile instance an uncapped duplication would emit
    num_potential = jnp.sum(jnp.where(valid, rw * rh, 0))

    cull = settings.tile_cull and conic is not None and alpha is not None
    if cull:
        cp = (mean2d[:, 0], mean2d[:, 1], conic[:, 0], conic[:, 1],
              conic[:, 2], _cull_qcut(conic, alpha))
    else:
        cp = None

    def duplicate(x0_, y0_, rw_, rh_, valid_, gid_, depth_, cap, cp_):
        n = x0_.shape[0]
        tid = _dup_tiles(x0_, y0_, rw_, rh_, valid_, cap, cp_, tile, gx,
                         num_tiles, settings.priority_window)
        gid_b = jnp.broadcast_to(gid_[:, None], (n, cap))
        depth_b = jnp.broadcast_to(depth_[:, None], (n, cap))
        return tid.reshape(-1), gid_b.reshape(-1), depth_b.reshape(-1)

    gids0 = jnp.arange(P, dtype=jnp.int32)
    if class_order is not None and not settings.size_classes:
        raise ValueError("class_order requires size_classes")
    if payload is not None or not settings.presort or settings.size_classes:
        return _bin_nopresort(
            depth, x0, y0, rw, rh, valid, gids0, gx, num_tiles,
            num_potential, settings, P, cp, payload=payload,
            class_order=class_order,
        )

    # Pre-sort the P gaussians by depth (ties keep id order), then
    # duplicate in that order: a STABLE single-key tile sort of the
    # instances then yields per-tile depth order bit-identically to the
    # former (tile, depth) two-key sort — over 3x less key+payload data
    # through the big N-row sort (measured 10.5 ms of the 59 ms frame,
    # outputs/bench/tpu_window_20260817_064208/diag.log).
    b = max(int(gx).bit_length(), int(gy).bit_length())
    extra = cp if cp is not None else ()
    if 4 * b + 1 <= 31:
        # pack the five small rect fields into ONE i32 payload: the sort's
        # bitonic passes move every payload array each pass, so 3 arrays
        # (key, rect, gid) instead of 7 cuts the presort's data volume ~2x.
        # The tile-cull params (mean2d/conic/qcut, 6 f32) ride as extra
        # payloads when culling is on — the sort is pass-count bound, so
        # the added arrays cost little vs the blend rows they remove.
        rect = ((((x0 << b | y0) << b | rw) << b | rh) << 1) | valid.astype(
            jnp.int32)
        _, rect, gids, *extra = jax.lax.sort(
            (depth, rect, gids0, *extra), num_keys=1)
        valid = (rect & 1).astype(jnp.bool_)
        rh = (rect >> 1) & ((1 << b) - 1)
        rw = (rect >> (1 + b)) & ((1 << b) - 1)
        y0 = (rect >> (1 + 2 * b)) & ((1 << b) - 1)
        x0 = rect >> (1 + 3 * b)
    else:
        _, x0, y0, rw, rh, valid_i, gids, *extra = jax.lax.sort(
            (depth, x0, y0, rw, rh, valid.astype(jnp.int32), gids0, *extra),
            num_keys=1,
        )
        valid = valid_i.astype(jnp.bool_)
    cp = tuple(extra) if cp is not None else None

    rank = jnp.arange(P, dtype=jnp.int32)   # position = depth rank
    rank_bits = max(1, int(P - 1).bit_length())
    packed_ok = rank_bits + int(num_tiles).bit_length() <= 31

    large_k = min(settings.large_k, P)  # micro scenes: fewer splats than cap
    if large_k > 0:
        # promote the large_k biggest rects to the tpg_large class; the
        # flat cap loses whole tile rows of big splats otherwise (CUDA ref
        # has no cap at all, rasterizer_impl.cu:292-301)
        need = jnp.where(valid, rw * rh, -1)
        need_bits = int(num_tiles).bit_length()
        if rank_bits + need_bits + 1 <= 31:
            # pack (area+1, index) into ONE i32 so top_k sorts a single
            # array instead of a (value, index) pair — the pair form
            # measured 3.9 ms of the 11 ms bin stage at P=272k
            # (outputs/bench/tpu_window_r6/diag.log). Invalid rows pack to
            # index-only keys (< any valid key), preserving the old
            # "invalid picked only when fewer than large_k valid" order.
            packed_need = ((need + 1) << rank_bits) | jnp.arange(
                P, dtype=jnp.int32)
            top, _ = jax.lax.top_k(packed_need, large_k)
            large_pos = top & ((1 << rank_bits) - 1)
        else:
            _, large_pos = jax.lax.top_k(need, large_k)
        base_valid = valid.at[large_pos].set(False)
        tile_s, rank_s, _ = duplicate(
            x0, y0, rw, rh, base_valid, rank, depth, tpg, cp)
        lg = lambda a: a[large_pos]  # noqa: E731
        cp_l = tuple(lg(a) for a in cp) if cp is not None else None
        tile_l, rank_l, _ = duplicate(
            lg(x0), lg(y0), lg(rw), lg(rh), lg(valid), large_pos, lg(depth),
            settings.tpg_large, cp_l,
        )
        tile_flat = jnp.concatenate([tile_s, tile_l])
        rank_flat = jnp.concatenate([rank_s, rank_l])
        num_emitted = jnp.sum(
            jnp.where(base_valid, _capped_emit(rw, rh, tpg), 0)
        ) + jnp.sum(jnp.where(
            lg(valid), _capped_emit(lg(rw), lg(rh), settings.tpg_large), 0))
    else:
        tile_flat, rank_flat, _ = duplicate(
            x0, y0, rw, rh, valid, rank, depth, tpg, cp)
        num_emitted = jnp.sum(jnp.where(valid, _capped_emit(rw, rh, tpg), 0))

    # depth-rank-ordered gid stream matching the duplication layout
    if large_k > 0:
        gid_flat = jnp.concatenate([
            jnp.broadcast_to(gids[:, None], (P, tpg)).reshape(-1),
            jnp.broadcast_to(gids[large_pos][:, None],
                             (large_k, settings.tpg_large)).reshape(-1),
        ])
    else:
        gid_flat = jnp.broadcast_to(gids[:, None], (P, tpg)).reshape(-1)

    if packed_ok:
        # ONE i32 key (tile << rank_bits | depth-rank) + gid payload: over
        # 3x less data through the big sort than the former 2-key 3-array
        # form, bit-identical order (ties resolved exactly as before since
        # rank is unique)
        key = (tile_flat << rank_bits) | rank_flat
        sorted_key, order = jax.lax.sort((key, gid_flat), num_keys=1)
        sorted_tile = (sorted_key >> rank_bits).astype(jnp.int32)
    else:
        sorted_tile, _, order = jax.lax.sort(
            (tile_flat, rank_flat, gid_flat), num_keys=2
        )
    num_valid = jnp.sum((tile_flat < num_tiles).astype(jnp.int32))
    # lost to tpg/tpg_large caps (pre-cull: culled instances are lossless)
    num_truncated = num_potential - num_emitted
    return _finish_bin(sorted_tile, order, num_tiles, num_valid,
                       num_truncated, settings)


def _bin_nopresort(depth, x0, y0, rw, rh, valid, gids0, gx, num_tiles,
                   num_potential, settings, P, cp=None, payload=None,
                   class_order=None):
    """Binning without the P-row depth presort.

    The presorted path exists to shrink the instance-sort payload, but
    on-chip all three bin sorts measure ~4 ms each regardless of row count
    or payload width (272k 6-array presort == 272k top_k == 0.81M 2-array
    instance sort, outputs/bench/tpu_window_r7/diag.log) — the sorts are
    pass-count bound, not data bound. Dropping the presort removes a whole
    sort: the instance sort keys on (tile, depth-bits) directly, with the
    order-preserving monotone f32->i32 bitcast (depths of valid gaussians
    are positive, and invalid instances key on tile == num_tiles first).
    Stable sort ties resolve by gaussian id — the same semantics as the
    CUDA radix sort over [tile|depth] keys (rasterizer_impl.cu:292-311).

    With `payload` (a tuple of (P,) i32/f32 arrays), every payload column
    is duplicated alongside and carried THROUGH the instance sort (the
    streaming blend's contiguous table); returns
    (ranges, order, sorted_payload, num_valid, num_truncated) instead.
    """
    tpg = settings.max_tiles_per_gaussian
    large_k = min(settings.large_k, P)
    if settings.vmem_classes:
        if not settings.size_classes:
            raise ValueError("vmem_classes requires size_classes")
        if payload is None:
            raise ValueError(
                "vmem_classes needs a payload carrying the original "
                "gaussian ids (rasterize passes jnp.arange(P))")
    depth_bits = jax.lax.bitcast_convert_type(depth, jnp.int32)

    tile = settings.tile
    pay = payload if payload is not None else ()

    def duplicate(x0_, y0_, rw_, rh_, valid_, gid_, dkey_, cap, cp_, pay_):
        n = x0_.shape[0]
        tid = _dup_tiles(x0_, y0_, rw_, rh_, valid_, cap, cp_, tile, gx,
                         num_tiles, settings.priority_window)
        gid_b = jnp.broadcast_to(gid_[:, None], (n, cap))
        dkey_b = jnp.broadcast_to(dkey_[:, None], (n, cap))
        pay_b = tuple(
            jnp.broadcast_to(p[:, None], (n, cap)).reshape(-1) for p in pay_)
        return tid.reshape(-1), gid_b.reshape(-1), dkey_b.reshape(-1), pay_b

    if settings.size_classes:
        # Multi-class capped duplication (generalizes large_k/tpg_large):
        # ONE descending rank of all P gaussians by rect area, then class c
        # covers ranks [sum(counts[:c]), sum(counts[:c+1])) with cap
        # `caps[c]`; the remainder stays in the base class at `tpg`. A
        # geometric cap ladder matched to the area distribution (trained
        # avatars: a fat tail over 3 decades) reaches ZERO truncation at
        # ~2.5x the emitted instances in STATIC sort rows, where a flat
        # 2-class cap needs ~20x (the CUDA reference is uncapped,
        # rasterizer_impl.cu:292-301; a truncating config measured 22.7 dB
        # vs the uncapped render, tpu_window_20260818_101719/diag.log).
        if class_order is not None:
            # static assignment: the envelope order replaces the per-frame
            # area-rank sort (see bin_gaussians docstring)
            ranked = class_order
        else:
            need = jnp.where(valid, rw * rh, -1)
            id_bits = max(1, int(P - 1).bit_length())
            assert id_bits + int(num_tiles).bit_length() + 1 <= 31, (
                "size_classes rank packing needs area+id in 31 bits")
            packed_need = ((need + 1) << id_bits) | gids0
            ranked = jax.lax.sort(packed_need)[::-1] & ((1 << id_bits) - 1)

        # Gather the per-gaussian bin arrays into area-rank order once:
        # each class AND the base remainder then become static slices of
        # the ranked arrays. The former per-class gathers + base-over-all-P
        # layout paid P*tpg static sort rows for the base even though the
        # classed gaussians' base slots were always invalid. The gathers
        # are NOT free at this scale — 12 separate (P,) gathers measured
        # 5.0 ms/frame at P=185k (stages7, tpu_window_r5a) — so the five
        # rect/valid arrays ride ONE packed i32 gather when the grid fits
        # 7-bit tile coords (gx, gy <= 128 covers 4096px at tile 32;
        # rw, rh <= 128 by construction): 22.3 -> 7.5 ms on the full bin
        # path together with tile_cull=False
        # (tpu_window_r5a/dup_probe_pw0.log).
        rg = lambda a: a[ranked]  # noqa: E731
        gy = num_tiles // gx
        if gx <= 128 and gy <= 128:
            packed_rect = (
                (((((x0 << 7) | y0) << 8 | rw) << 8) | rh) << 1
            ) | valid.astype(jnp.int32)
            pk = rg(packed_rect)
            valid = (pk & 1).astype(jnp.bool_)
            rh = (pk >> 1) & 255
            rw = (pk >> 9) & 255
            y0 = (pk >> 17) & 127
            x0 = pk >> 24
        else:
            x0, y0, rw, rh = rg(x0), rg(y0), rg(rw), rg(rh)
            valid = rg(valid)
        depth_bits = rg(depth_bits)
        gids_r = ranked
        cp = tuple(rg(a) for a in cp) if cp is not None else None
        pay = tuple(rg(p) for p in pay)

        parts = []
        lids = []
        emitted = jnp.zeros((), jnp.int32)
        start = 0
        for ci, (count, cap) in enumerate(settings.size_classes):
            count = min(int(count), P - start)
            if count <= 0:
                break
            s = slice(start, start + count)
            if ci < settings.vmem_classes:
                # VMEM-resident class: instance ids remapped to P + rank so
                # the blend kernel serves these rows from its (L, 128) VMEM
                # table instead of paying the single-row DMA descriptor
                # floor. Original ids must ride in `payload` for the
                # backward's RMW gradient accumulation.
                gid_dup = (P + start
                           + jnp.arange(count, dtype=jnp.int32))
                lids.append(gids_r[s])
            else:
                gid_dup = gids_r[s]
            cp_c = tuple(a[s] for a in cp) if cp is not None else None
            parts.append(duplicate(
                x0[s], y0[s], rw[s], rh[s], valid[s], gid_dup,
                depth_bits[s], int(cap), cp_c, tuple(p[s] for p in pay),
            ))
            emitted = emitted + jnp.sum(jnp.where(
                valid[s], _capped_emit(rw[s], rh[s], int(cap)), 0))
            start += count
        s = slice(start, P)
        cp_b = tuple(a[s] for a in cp) if cp is not None else None
        parts.append(duplicate(
            x0[s], y0[s], rw[s], rh[s], valid[s], gids_r[s], depth_bits[s],
            tpg, cp_b, tuple(p[s] for p in pay)))
        emitted = emitted + jnp.sum(
            jnp.where(valid[s], _capped_emit(rw[s], rh[s], tpg), 0))

        tile_flat = jnp.concatenate([p[0] for p in parts])
        gid_flat = jnp.concatenate([p[1] for p in parts])
        dk_flat = jnp.concatenate([p[2] for p in parts])
        pay_flat = tuple(
            jnp.concatenate(cols) for cols in zip(*(p[3] for p in parts)))
        num_emitted = emitted
    elif large_k > 0:
        need = jnp.where(valid, rw * rh, -1)
        id_bits = max(1, int(P - 1).bit_length())
        if id_bits + int(num_tiles).bit_length() + 1 <= 31:
            packed_need = ((need + 1) << id_bits) | gids0
            top, _ = jax.lax.top_k(packed_need, large_k)
            large_pos = top & ((1 << id_bits) - 1)
        else:
            _, large_pos = jax.lax.top_k(need, large_k)
        base_valid = valid.at[large_pos].set(False)
        tile_s, gid_s, dk_s, pay_s = duplicate(
            x0, y0, rw, rh, base_valid, gids0, depth_bits, tpg, cp, pay)
        lg = lambda a: a[large_pos]  # noqa: E731
        cp_l = tuple(lg(a) for a in cp) if cp is not None else None
        tile_l, gid_l, dk_l, pay_l = duplicate(
            lg(x0), lg(y0), lg(rw), lg(rh), lg(valid), large_pos,
            lg(depth_bits), settings.tpg_large, cp_l,
            tuple(lg(p) for p in pay),
        )
        tile_flat = jnp.concatenate([tile_s, tile_l])
        gid_flat = jnp.concatenate([gid_s, gid_l])
        dk_flat = jnp.concatenate([dk_s, dk_l])
        pay_flat = tuple(
            jnp.concatenate([a, b]) for a, b in zip(pay_s, pay_l))
        num_emitted = jnp.sum(
            jnp.where(base_valid, _capped_emit(rw, rh, tpg), 0)
        ) + jnp.sum(jnp.where(
            lg(valid), _capped_emit(lg(rw), lg(rh), settings.tpg_large), 0))
    else:
        tile_flat, gid_flat, dk_flat, pay_flat = duplicate(
            x0, y0, rw, rh, valid, gids0, depth_bits, tpg, cp, pay)
        num_emitted = jnp.sum(jnp.where(valid, _capped_emit(rw, rh, tpg), 0))

    num_valid = jnp.sum((tile_flat < num_tiles).astype(jnp.int32))
    num_truncated = num_potential - num_emitted

    if payload is not None:
        if settings.instance_budget is not None:
            raise ValueError(
                "streaming/payload binning is incompatible with "
                "instance_budget (the budget compaction would have to "
                "re-gather every payload column)")
        # Split stable sort: XLA TPU compile time explodes with lax.sort
        # operand count when all outputs are consumed (~4 ops 40 s, 2x13
        # ops 195 s, 26 ops never — the r3 streaming payload sort died
        # mid-compile). lax.sort is STABLE, so K sorts with the IDENTICAL
        # (tile, depth-bits) keys produce the IDENTICAL permutation; the
        # payload columns ride in groups of <= _SORT_MAX_OPS-2 and the
        # results concatenate exactly as one big sort would.
        key, nkeys = _pack_sort_key(tile_flat, dk_flat, num_tiles)
        first = _SORT_MAX_OPS - 1 - nkeys
        sorted_key, *rest = jax.lax.sort(
            (*key, gid_flat, *pay_flat[:first]), num_keys=nkeys
        )
        skey = (sorted_key, *rest[:nkeys - 1])
        order, *spay0 = rest[nkeys - 1:]
        spay = list(spay0)
        for g in range(first, len(pay_flat), _SORT_MAX_OPS - nkeys):
            out_g = jax.lax.sort(
                (*key, *pay_flat[g:g + _SORT_MAX_OPS - nkeys]),
                num_keys=nkeys,
            )
            spay.extend(out_g[nkeys:])
        sorted_tile = _unpack_sort_tile(skey, num_tiles)
        ranges = jnp.searchsorted(
            sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
            method="scan",
        ).astype(jnp.int32)
        if settings.vmem_classes:
            lids_out = jnp.concatenate(lids) if lids else jnp.zeros(
                (0,), jnp.int32)
            return ranges, order, tuple(spay), lids_out, num_valid, \
                num_truncated
        return ranges, order, tuple(spay), num_valid, num_truncated

    key, nkeys = _pack_sort_key(tile_flat, dk_flat, num_tiles)
    out = jax.lax.sort((*key, gid_flat), num_keys=nkeys)
    sorted_tile = _unpack_sort_tile(out[:nkeys], num_tiles)
    return _finish_bin(sorted_tile, out[nkeys], num_tiles, num_valid,
                       num_truncated, settings)


def envelope_class_order(max_areas) -> jnp.ndarray:
    """Static size-class assignment from per-gaussian ENVELOPE rect areas
    (max tiles-covered over a clip's frames).

    Returns the (P,) permutation `bin_gaussians(class_order=...)` expects,
    with the same descending-area, descending-id tie order the dynamic
    per-frame rank sort produces — so on a single frame whose areas equal
    the envelope, static and dynamic binning are bit-identical."""
    import numpy as np

    a = np.asarray(max_areas).astype(np.int64).reshape(-1)
    P = a.shape[0]
    id_bits = max(1, int(P - 1).bit_length())
    packed = ((a + 1) << id_bits) | np.arange(P, dtype=np.int64)
    order = np.sort(packed)[::-1] & ((1 << id_bits) - 1)
    return jnp.asarray(order.astype(np.int32))


def _pack_sort_key(tile_flat, dk_flat, num_tiles):
    """Pack (tile, depth-bits) into ONE positive i32 key when they fit:
    tile in the high bits, the depth's top 31-tile_bits bits below. The
    instance sort is data-volume bound (ops x rows x passes — the r4
    streaming payload sort measured it directly), so 2 operands instead
    of 3 is a ~33% cut. Dropped low depth bits only reorder splats whose
    f32 depths agree to ~2^-14 relative; ties resolve stably by
    duplication order, the same policy as equal CUDA radix keys
    (rasterizer_impl.cu:292-311). Falls back to the two-key form when
    tile bits don't fit (huge grids)."""
    tb = int(num_tiles).bit_length()
    db = 31 - tb
    if db >= 20:
        # dk >= 0 for valid rows (depth > 0 bitcast) so the shift keeps the
        # top db depth bits exactly; invalid rows may carry a NEGATIVE dk
        # (culled depth <= 0 bitcast) whose arithmetic shift would set the
        # high bits and sort them FIRST — the mask bounds them under their
        # tile == num_tiles prefix, which dominates the key
        mask = (1 << db) - 1
        return ((tile_flat << db) | ((dk_flat >> (31 - db)) & mask),), 1
    return (tile_flat, dk_flat), 2


def _unpack_sort_tile(sorted_keys, num_tiles):
    if len(sorted_keys) == 1:
        tb = int(num_tiles).bit_length()
        return sorted_keys[0] >> (31 - tb)
    return sorted_keys[0]


def _finish_bin(sorted_tile, order, num_tiles, num_valid, num_truncated,
                settings):
    if settings.instance_budget is not None and settings.instance_budget < order.shape[0]:
        # Fair truncation: keep each tile's CLOSEST instances (round-robin by
        # depth rank within the tile) instead of chopping the (tile, depth)-
        # sorted tail, which would silently drop whole high-index tiles
        # (bottom image rows). Two extra sorts, paid only when a budget is set.
        N = order.shape[0]
        starts = jnp.searchsorted(
            sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), method="scan"
        ).astype(jnp.int32)
        pos = jnp.arange(N, dtype=jnp.int32)
        rank = pos - starts[sorted_tile]
        rank = jnp.where(sorted_tile < num_tiles, rank, N)  # invalid tail last
        _, _, keep_pos = jax.lax.sort((rank, pos, pos), num_keys=2)
        keep_pos = jnp.sort(keep_pos[: settings.instance_budget])  # restore (tile, depth)
        sorted_tile = sorted_tile[keep_pos]
        order = order[keep_pos]
        num_truncated = num_truncated + jnp.maximum(
            num_valid - settings.instance_budget, 0)

    ranges = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), method="scan"
    ).astype(jnp.int32)
    return ranges, order, num_valid, num_truncated


# ---------------------------------------------------------------------------
# stage 3: Pallas tile blend, (channels, pixels) layout
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


def _pixel_coords(tile: int):
    PIX = tile * tile
    y0 = pl.program_id(0) * tile
    x0 = pl.program_id(1) * tile
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = (x0 + lin % tile).astype(jnp.float32)
    py = (y0 + lin // tile).astype(jnp.float32)
    return px, py


def _chunk_alphas(geom, px, py, mask2d):
    """geom (G, _PK-slice), px/py (1, PIX), mask2d broadcastable to (G, PIX).

    Returns (alpha_masked, d0, d1, gexp), all (G, PIX). The power<=0 and
    alpha floor tests are fused into one select: power <= 0 <=> gexp <= 1,
    and a*gexp >= 1/255 bounds the contribution (ref: forward.cu:355-365).
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
    ag = a_op * gexp
    contrib = (gexp <= 1.0) & (ag >= ALPHA_MIN) & mask2d
    return jnp.where(contrib, jnp.minimum(ag, ALPHA_MAX), 0.0), d0, d1, gexp


_SORT_MAX_OPS = 13   # lax.sort operand-count compile cliff (see split sort)


def _idx_rows(chunk: int) -> int:
    """SMEM window rows per slot for the index stage (see helpers below)."""
    return 1 + (chunk + 127) // 128


def _row_gather_helpers(table_hbm, order_hbm, idx_sm, buf, sems, osems,
                        start, chunk, banks=1):
    """Two-stage fused gather: stage the chunk's instance->gaussian indices
    HBM->SMEM, then issue `chunk` single-row DMAs table[idx] -> VMEM.

    Replaces the XLA `per_gauss[order]` gather, which lowered to a 35 s
    (2.18M, 128) materialization on-chip (outputs/bench/tpu_diag_r3a) and
    also wrote + re-read the 1.1 GB packed array through HBM. Rows are
    _PK=128 f32 = exactly one 512 B lane-aligned line.

    Mosaic constraints (probed on-chip, tools/mosaic_probe.py): 1-D arrays
    only admit 1024-aligned slice shapes AND offsets, while 2-D dim-0
    slices are unconstrained (shape 1, dynamic offset both fine). So the
    instance->gaussian map rides as a 2-D (M, 128) i32 table; a chunk's G
    indices live at flat positions [p, p+G), fetched as the row window
    [p//128, p//128 + WR) and scalar-read at offset p%128."""
    G = chunk
    B = banks
    per = G // B
    WR = _idx_rows(G)

    def idx_dma(slot, c):
        p = start + c * G
        return pltpu.make_async_copy(
            order_hbm.at[pl.ds(p // 128, WR)], idx_sm.at[slot],
            osems.at[slot],
        )

    def rows_start(slot, c):
        o = jax.lax.rem(start + c * G, 128)
        for g in range(G):
            q = o + g
            pltpu.make_async_copy(
                table_hbm.at[pl.ds(idx_sm[slot, q // 128, jax.lax.rem(q, 128)], 1)],
                buf.at[slot, pl.ds(g, 1)],
                sems.at[slot, g % B],
            ).start()

    def rows_wait(slot):
        # DMA semaphores count BYTES (wait_dma2 sizes the wait from the
        # descriptor): one (per, _PK)-shaped wait per bank absorbs that
        # bank's row completions in a single scalar op
        for b in range(B):
            pltpu.make_async_copy(
                table_hbm.at[pl.ds(0, per)], buf.at[slot, pl.ds(0, per)],
                sems.at[slot, b],
            ).wait()

    return idx_dma, rows_start, rows_wait


def _gather_rows_kernel(ids_hbm, table_hbm, out_ref, buf, sems, idx_sm,
                        osems, *, chunk):
    """One (G, _PK) output block per grid step: stage the chunk's ids
    HBM->SMEM, issue G single-row DMAs table[id] -> VMEM (double-buffered
    one chunk ahead), copy to the block. G is a multiple of 128 so every
    SMEM index offset is static."""
    G = chunk
    WR = G // 128
    nchunks = pl.num_programs(0)
    c0 = pl.program_id(0)

    def idx_dma(slot, c):
        return pltpu.make_async_copy(
            ids_hbm.at[pl.ds(c * WR, WR)], idx_sm.at[slot], osems.at[slot]
        )

    def rows_start(slot):
        for g in range(G):
            pltpu.make_async_copy(
                table_hbm.at[pl.ds(idx_sm[slot, g // 128, g % 128], 1)],
                buf.at[slot, pl.ds(g, 1)],
                sems.at[slot],
            ).start()

    @pl.when(c0 == 0)
    def _():
        idx_dma(0, 0).start()
        idx_dma(0, 0).wait()
        rows_start(0)

    slot = jax.lax.rem(c0, 2)

    @pl.when(c0 + 1 < nchunks)
    def _():
        idx_dma(1 - slot, c0 + 1).start()
        idx_dma(1 - slot, c0 + 1).wait()
        rows_start(1 - slot)

    pltpu.make_async_copy(
        table_hbm.at[pl.ds(0, G)], buf.at[slot], sems.at[slot]
    ).wait()
    out_ref[:] = buf[slot]


def gather_rows(table: jnp.ndarray, ids: jnp.ndarray,
                chunk: int = 128) -> jnp.ndarray:
    """table[(L,) ids] -> (L, table.shape[1]) by in-kernel single-row DMAs.

    XLA's row gather materializes catastrophically on TPU (~16 us/row at
    2.2M rows, outputs/bench/tpu_diag_r3a); per-row DMA descriptors issue
    at the ~55 ns floor — 300x faster. Used to build the VMEM-resident
    classed table (rasterize vmem_classes) from per-gaussian columns.
    Out-of-range ids must not occur; pad ids with 0 (padded rows are
    returned and must be ignored by the caller)."""
    K = table.shape[1]
    L = ids.shape[0]
    Lp = -(-L // chunk) * chunk
    ids_pad = jnp.concatenate(
        [ids.astype(jnp.int32), jnp.zeros((Lp - L,), jnp.int32)])
    ids2d = ids_pad.reshape(-1, 128)
    out = pl.pallas_call(
        functools.partial(_gather_rows_kernel, chunk=chunk),
        grid=(Lp // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((chunk, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Lp, K), table.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, K), table.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2, chunk // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(ids2d, table)
    return out[:L]


def _rmw_helpers(dtable_hbm, idx_sm, dacc, dbuf, rsems, wsems, start, chunk,
                 num, banks=1):
    """Backward-pass read-modify-write accumulation of per-gaussian grads
    directly into the (P+1, _PK) gradient table, replacing the XLA
    scatter-add over per-instance rows (which lowers to a ~20 us/row
    serial loop — ~29 s/step at 512^2, outputs/bench/.../compile_train_512).

    Race-freedom: the Pallas grid is sequential on-core; within one tile
    every instance is a distinct gaussian (duplication emits one instance
    per (gaussian, tile), the large/base classes are disjoint), so all
    in-flight reads/writes inside a grid step touch distinct rows. Writes
    are drained in the epilogue before the next tile may read them.

    Tail slots (c*G + g >= num) are REDIRECTED to the table's dedicated
    dump row (last row, sliced off by the caller): a tail slot's index
    aliases the next tile's run (a gaussian that may ALSO appear earlier in
    this very chunk), and writing back its stale pre-read value would race
    with — and in issue order land after — the real accumulated gradient,
    silently erasing it. The redirect keeps the byte-counted waits uniform
    (still one row per DMA); garbage accumulating in the dump row is never
    read back."""
    G = chunk
    B = banks
    per = G // B
    dump = dtable_hbm.shape[0] - 1

    def _each(slot, c, fn):
        o = jax.lax.rem(start + c * G, 128)
        base = c * G
        for g in range(G):
            q = o + g
            idx = idx_sm[slot, q // 128, jax.lax.rem(q, 128)]
            fn(g, jnp.where(base + g < num, idx, dump))

    def acc_start(slot, c):
        _each(slot, c, lambda g, idx: pltpu.make_async_copy(
            dtable_hbm.at[pl.ds(idx, 1)], dacc.at[slot, pl.ds(g, 1)],
            rsems.at[slot, g % B]).start())

    def acc_wait(slot):
        # byte-counted wait per bank for the row reads (see rows_wait)
        for b in range(B):
            pltpu.make_async_copy(
                dtable_hbm.at[pl.ds(0, per)], dacc.at[slot, pl.ds(0, per)],
                rsems.at[slot, b],
            ).wait()

    def write_start(slot, c):
        _each(slot, c, lambda g, idx: pltpu.make_async_copy(
            dbuf.at[slot, pl.ds(g, 1)], dtable_hbm.at[pl.ds(idx, 1)],
            wsems.at[slot, g % B]).start())

    def write_wait(slot):
        # byte-counted wait per bank for the row writes (see rows_wait)
        for b in range(B):
            pltpu.make_async_copy(
                dbuf.at[slot, pl.ds(0, per)], dtable_hbm.at[pl.ds(0, per)],
                wsems.at[slot, b],
            ).wait()

    return acc_start, acc_wait, write_start, write_wait


def _fwd_kernel(
    ranges_ref,    # scalar prefetch (T+1,)
    table_hbm,     # (P_pad, _PK) per-gaussian packed rows
    order_hbm,     # (M, 128) i32 instance -> gaussian id (tile/depth sorted, flat row-major)
    bg_ref,        # (CCH, 1)
    out_ref,       # block (1, 1, CCH, PIX)
    t_ref,         # block (1, 1, 1, PIX)
    *refs,         # [cnt_ref (1, 1) i32 if emit_counts] + scratch
    tile: int,
    chunk: int,
    grid_x: int,
    banks: int = 1,
    exit_every: int = 1,
    emit_counts: bool = False,
    bf16_rows: bool = False,
):
    if emit_counts:
        cnt_ref, *refs = refs
    (buf, sems,
     idx_sm,       # scratch SMEM (2, WR, 128) i32 index windows
     osems,
     acc_ref,      # scratch (CCH, PIX)
     state_ref,    # scratch (8, PIX): row0 = T, row1 = dead
     flag_ref,     # scratch SMEM (1,): 1 when every pixel saturated
     ) = refs
    G = chunk
    PIX = tile * tile
    t_idx = pl.program_id(0) * grid_x + pl.program_id(1)
    start = ranges_ref[t_idx]
    end = ranges_ref[t_idx + 1]
    num = end - start
    nchunks = pl.cdiv(num, G)
    px, py = _pixel_coords(tile)

    idx_dma, rows_start, rows_wait = _row_gather_helpers(
        table_hbm, order_hbm, idx_sm, buf, sems, osems, start, G, banks)

    # prologue: indices chunk 0 -> rows chunk 0 in flight; indices chunk 1
    # staged so the steady-state body can always prefetch one chunk ahead
    @pl.when(nchunks > 0)
    def _():
        idx_dma(0, 0).start()
        idx_dma(0, 0).wait()
        rows_start(0, 0)

    @pl.when(nchunks > 1)
    def _():
        idx_dma(1, 1).start()

    acc_ref[:] = jnp.zeros((_CCH, PIX), jnp.float32)
    state_ref[:] = jnp.zeros((8, PIX), jnp.float32)
    state_ref[0:1, :] = jnp.ones((1, PIX), jnp.float32)
    flag_ref[0] = 0

    # loop state lives in scratch refs; the while carry is the chunk counter
    # only (Mosaic cannot yield padded vector carries from scf.while)
    def cond(c):
        if not exit_every:
            return c < nchunks
        return (c < nchunks) & (flag_ref[0] == 0)

    def body(c):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            idx_dma(1 - slot, c + 1).wait()
            rows_start(1 - slot, c + 1)

        @pl.when(c + 2 < nchunks)
        def _():
            idx_dma(slot, c + 2).start()

        rows_wait(slot)
        data = buf[slot]              # (G, _PK) f32 — or (G, _PK) bf16
        if bf16_rows:
            # geom rides as bf16 hi/lo pairs: value = hi + lo, exact to
            # ~2^-16 relative (see _pack_rows_bf16); colors are plain
            # bf16, upcast so the MXU sees the same f32->bf16 rounding
            # as the f32-table path
            geom = (data[:, :_GEOM].astype(jnp.float32)
                    + data[:, _GEOM:2 * _GEOM].astype(jnp.float32))
            colors = data[:, 2 * _GEOM:2 * _GEOM + _CCH].astype(jnp.float32)
        else:
            geom = data[:, :_GEOM]
            colors = data[:, _GEOM:_GEOM + _CCH]      # (G, CCH)

        T = state_ref[0:1, :]
        alive = state_ref[1:2, :] < 0.5

        j = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        mask2d = ((j + c * G) < num) & alive
        at, _, _, _ = _chunk_alphas(geom, px, py, mask2d)

        P_incl = T * _cumprod_sublanes(1.0 - at, G)   # (G, PIX)
        live = P_incl >= T_MIN
        # exclusive prefix = inclusive shifted down one row (row0 <- T)
        row0 = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0) == 0
        E = jnp.where(row0, T, pltpu.roll(P_incl, 1, axis=0))
        w = jnp.where(live, at * E, 0.0)

        # (CCH, PIX) += colors^T @ w  — MXU. Default (bf16-input) precision
        # is deliberate: f32 accumulate keeps the transmittance math exact,
        # and the ~3e-3 relative color rounding measures PSNR 63 dB vs the
        # f32 CPU oracle (outputs/bench/tpu_diag_r3a) — far inside the
        # 0.5 dB budget — at 1/6th the MXU passes of HIGHEST.
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            colors, w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        T_new = jnp.min(jnp.where(live, P_incl, jnp.inf), axis=0, keepdims=True)
        T = jnp.minimum(T, T_new)
        died = jnp.any((at > 0.0) & jnp.logical_not(live), axis=0, keepdims=True)
        dead_f = jnp.maximum(state_ref[1:2, :], died.astype(jnp.float32))
        state_ref[0:1, :] = T
        state_ref[1:2, :] = dead_f
        if exit_every == 1:
            flag_ref[0] = (jnp.min(dead_f) > 0.5).astype(jnp.int32)
        elif exit_every:
            # amortize the vector->scalar flag reduce (a VPU-pipeline
            # drain on the while-loop critical path) over exit_every
            # chunks; the exit overshoots at most exit_every-1 chunks
            @pl.when(jax.lax.rem(c, exit_every) == exit_every - 1)
            def _():
                flag_ref[0] = (jnp.min(dead_f) > 0.5).astype(jnp.int32)
        return c + 1

    cf = jax.lax.while_loop(cond, body, 0)

    # early-exit drain: body(cf-1) left rows for chunk cf and indices for
    # chunk cf+1 in flight; an un-waited DMA landing into reused scratch on
    # the next (sequential) grid step is a race
    @pl.when(cf < nchunks)
    def _():
        rows_wait(jax.lax.rem(cf, 2))

    @pl.when(cf + 1 < nchunks)
    def _():
        idx_dma(jax.lax.rem(cf + 1, 2), cf + 1).wait()

    T = state_ref[0:1, :]
    out = acc_ref[:] + bg_ref[:] * T               # (CCH,1)*(1,PIX)
    out_ref[:] = out.reshape(1, 1, _CCH, PIX)
    t_ref[:] = T.reshape(1, 1, 1, PIX)
    if emit_counts:
        cnt_ref[:] = jnp.full((1, 1, 8, 128), cf, jnp.int32)


def _row_gather_helpers_vmem(table_hbm, ltable, order_hbm, idx_sm, buf,
                             sems, osems, start, chunk, pb):
    """Row gather with a VMEM-resident class: ids < pb fetch their row from
    HBM by DMA (one shared byte-counting semaphore per slot, per-row
    conditional waits); ids >= pb copy row (id - pb) straight out of the
    (L, 128) VMEM table — no descriptor, no queue, no HBM touch. The
    single-row DMA descriptor floor is ~53-61 ns/row regardless of banks
    (outputs/bench/tpu_window_r7/dma_bench.log); on trained-avatar stats
    the VMEM classes absorb ~60% of all fetches."""
    G = chunk
    WR = _idx_rows(G)
    L = ltable.shape[0]

    def idx_dma(slot, c):
        p = start + c * G
        return pltpu.make_async_copy(
            order_hbm.at[pl.ds(p // 128, WR)], idx_sm.at[slot],
            osems.at[slot],
        )

    def _idx_at(slot, c, g):
        q = jax.lax.rem(start + c * G, 128) + g
        return idx_sm[slot, q // 128, jax.lax.rem(q, 128)]

    def rows_start(slot, c):
        for g in range(G):
            idx = _idx_at(slot, c, g)

            @pl.when(idx < pb)
            def _():
                pltpu.make_async_copy(
                    table_hbm.at[pl.ds(idx, 1)], buf.at[slot, pl.ds(g, 1)],
                    sems.at[slot],
                ).start()

    def rows_fill_wait(slot, c):
        # all conditional waits drain the shared byte counter exactly by
        # the issued rows; buf is only read after the loop completes, so
        # out-of-order landings are safe. VMEM fills are plain copies into
        # rows the DMAs never touch. NOTE: reads idx_sm[slot] — callers
        # must not restart idx_dma(slot, .) before this runs.
        for g in range(G):
            idx = _idx_at(slot, c, g)

            @pl.when(idx < pb)
            def _():
                pltpu.make_async_copy(
                    table_hbm.at[pl.ds(0, 1)], buf.at[slot, pl.ds(0, 1)],
                    sems.at[slot],
                ).wait()

            @pl.when(idx >= pb)
            def _():
                lrow = jnp.clip(idx - pb, 0, L - 1)
                buf[slot, pl.ds(g, 1)] = ltable[pl.ds(lrow, 1)]

    return idx_dma, rows_start, rows_fill_wait


def _fwd_kernel_vmem(
    ranges_ref,    # scalar prefetch (T+1,)
    table_hbm,     # (P_pad, _PK) per-gaussian packed rows
    order_hbm,     # (M, 128) i32 instance -> id (classed ids remapped >= pb)
    ltable_ref,    # (L, _PK) VMEM-resident classed rows (rank order)
    bg_ref,        # (CCH, 1)
    out_ref,
    t_ref,
    buf,
    sems,          # DMA (2,) shared byte counter per slot
    idx_sm,
    osems,
    acc_ref,
    state_ref,
    flag_ref,
    *,
    tile: int,
    chunk: int,
    grid_x: int,
    pb: int,
):
    """_fwd_kernel with the VMEM-resident classed table (same blend math,
    ref semantics forward.cu:276-397)."""
    G = chunk
    PIX = tile * tile
    t_idx = pl.program_id(0) * grid_x + pl.program_id(1)
    start = ranges_ref[t_idx]
    end = ranges_ref[t_idx + 1]
    num = end - start
    nchunks = pl.cdiv(num, G)
    px, py = _pixel_coords(tile)

    idx_dma, rows_start, rows_fill_wait = _row_gather_helpers_vmem(
        table_hbm, ltable_ref, order_hbm, idx_sm, buf, sems, osems, start,
        G, pb)

    @pl.when(nchunks > 0)
    def _():
        idx_dma(0, 0).start()
        idx_dma(0, 0).wait()
        rows_start(0, 0)

    @pl.when(nchunks > 1)
    def _():
        idx_dma(1, 1).start()

    acc_ref[:] = jnp.zeros((_CCH, PIX), jnp.float32)
    state_ref[:] = jnp.zeros((8, PIX), jnp.float32)
    state_ref[0:1, :] = jnp.ones((1, PIX), jnp.float32)
    flag_ref[0] = 0

    def cond(c):
        return (c < nchunks) & (flag_ref[0] == 0)

    def body(c):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            idx_dma(1 - slot, c + 1).wait()
            rows_start(1 - slot, c + 1)

        # waits + VMEM fills read idx_sm[slot]: must complete BEFORE the
        # c+2 index window may overwrite it (unlike _fwd_kernel, whose
        # byte-counted bank waits don't consult the indices)
        rows_fill_wait(slot, c)

        @pl.when(c + 2 < nchunks)
        def _():
            idx_dma(slot, c + 2).start()

        data = buf[slot]              # (G, _PK)
        geom = data[:, :_GEOM]
        colors = data[:, _GEOM:_GEOM + _CCH]      # (G, CCH)

        T = state_ref[0:1, :]
        alive = state_ref[1:2, :] < 0.5

        j = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        mask2d = ((j + c * G) < num) & alive
        at, _, _, _ = _chunk_alphas(geom, px, py, mask2d)

        P_incl = T * _cumprod_sublanes(1.0 - at, G)   # (G, PIX)
        live = P_incl >= T_MIN
        row0 = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0) == 0
        E = jnp.where(row0, T, pltpu.roll(P_incl, 1, axis=0))
        w = jnp.where(live, at * E, 0.0)

        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            colors, w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        T_new = jnp.min(jnp.where(live, P_incl, jnp.inf), axis=0, keepdims=True)
        T = jnp.minimum(T, T_new)
        died = jnp.any((at > 0.0) & jnp.logical_not(live), axis=0, keepdims=True)
        dead_f = jnp.maximum(state_ref[1:2, :], died.astype(jnp.float32))
        state_ref[0:1, :] = T
        state_ref[1:2, :] = dead_f
        flag_ref[0] = (jnp.min(dead_f) > 0.5).astype(jnp.int32)
        return c + 1

    cf = jax.lax.while_loop(cond, body, 0)

    # early-exit drain: body(cf-1) left rows for chunk cf in flight; its
    # idx window in idx_sm[rem(cf,2)] is still intact (only the OTHER
    # slot's window was restarted), so the conditional waits can re-read
    # the predicates
    @pl.when(cf < nchunks)
    def _():
        rows_fill_wait(jax.lax.rem(cf, 2), cf)

    @pl.when(cf + 1 < nchunks)
    def _():
        idx_dma(jax.lax.rem(cf + 1, 2), cf + 1).wait()

    T = state_ref[0:1, :]
    out = acc_ref[:] + bg_ref[:] * T
    out_ref[:] = out.reshape(1, 1, _CCH, PIX)
    t_ref[:] = T.reshape(1, 1, 1, PIX)


def _fwd_stream_kernel(
    ranges_ref,    # scalar prefetch (T+1,)
    stream_hbm,    # (M_pad, _PK) per-INSTANCE packed rows, (tile, depth) sorted
    bg_ref,        # (CCH, 1)
    out_ref,       # block (1, 1, CCH, PIX)
    t_ref,         # block (1, 1, 1, PIX)
    buf,
    sems,
    acc_ref,       # scratch (CCH, PIX)
    state_ref,     # scratch (8, PIX): row0 = T, row1 = dead
    flag_ref,      # scratch SMEM (1,): 1 when every pixel saturated
    *,
    tile: int,
    chunk: int,
    grid_x: int,
):
    """Streaming blend: the tile's instance run is CONTIGUOUS in the sorted
    stream table, so each chunk is ONE (G, _PK) block DMA at a dynamic dim-0
    offset instead of G single-row gathers — the gather's ~53-61 ns/row
    descriptor-issue floor (outputs/bench/tpu_window_r7/dma_bench.log)
    becomes ~one descriptor per chunk. Blend math is identical to
    _fwd_kernel (ref semantics: forward.cu:276-397)."""
    G = chunk
    PIX = tile * tile
    t_idx = pl.program_id(0) * grid_x + pl.program_id(1)
    start = ranges_ref[t_idx]
    end = ranges_ref[t_idx + 1]
    num = end - start
    nchunks = pl.cdiv(num, G)
    px, py = _pixel_coords(tile)

    def blk(slot, c):
        # over-reads past the run's end land in the next tile's rows (the
        # stream is contiguous; the table is padded by one chunk at the
        # very end) and are masked out of the blend below
        return pltpu.make_async_copy(
            stream_hbm.at[pl.ds(start + c * G, G)], buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        blk(0, 0).start()

    acc_ref[:] = jnp.zeros((_CCH, PIX), jnp.float32)
    state_ref[:] = jnp.zeros((8, PIX), jnp.float32)
    state_ref[0:1, :] = jnp.ones((1, PIX), jnp.float32)
    flag_ref[0] = 0

    def cond(c):
        return (c < nchunks) & (flag_ref[0] == 0)

    def body(c):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            blk(1 - slot, c + 1).start()

        blk(slot, c).wait()
        data = buf[slot]              # (G, _PK)
        geom = data[:, :_GEOM]
        colors = data[:, _GEOM:_GEOM + _CCH]      # (G, CCH)

        T = state_ref[0:1, :]
        alive = state_ref[1:2, :] < 0.5

        j = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        mask2d = ((j + c * G) < num) & alive
        at, _, _, _ = _chunk_alphas(geom, px, py, mask2d)

        P_incl = T * _cumprod_sublanes(1.0 - at, G)   # (G, PIX)
        live = P_incl >= T_MIN
        row0 = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0) == 0
        E = jnp.where(row0, T, pltpu.roll(P_incl, 1, axis=0))
        w = jnp.where(live, at * E, 0.0)

        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            colors, w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        T_new = jnp.min(jnp.where(live, P_incl, jnp.inf), axis=0, keepdims=True)
        T = jnp.minimum(T, T_new)
        died = jnp.any((at > 0.0) & jnp.logical_not(live), axis=0, keepdims=True)
        dead_f = jnp.maximum(state_ref[1:2, :], died.astype(jnp.float32))
        state_ref[0:1, :] = T
        state_ref[1:2, :] = dead_f
        flag_ref[0] = (jnp.min(dead_f) > 0.5).astype(jnp.int32)
        return c + 1

    cf = jax.lax.while_loop(cond, body, 0)

    # early-exit drain: body(cf-1) left the block for chunk cf in flight;
    # an un-waited DMA landing into reused scratch on the next grid step
    # is a race
    @pl.when(cf < nchunks)
    def _():
        blk(jax.lax.rem(cf, 2), cf).wait()

    T = state_ref[0:1, :]
    out = acc_ref[:] + bg_ref[:] * T
    out_ref[:] = out.reshape(1, 1, _CCH, PIX)
    t_ref[:] = T.reshape(1, 1, 1, PIX)


def _bwd_kernel(
    ranges_ref,
    table_hbm,     # (P_pad, _PK) per-gaussian packed rows
    order_hbm,     # (M, 128) i32
    bg_ref,        # (CCH, 1)
    t_in_ref,      # block (1, 1, 1, PIX)
    out_in_ref,    # block (1, 1, CCH, PIX)
    gout_ref,      # block (1, 1, CCH, PIX)
    dzero_ref,     # (P, _PK) zeros input, aliased to the output below
    dtable_hbm,    # out: (P, _PK) per-gaussian grads, aliased to dzero_ref;
                   # accumulated in place by row DMAs
    buf,
    dacc,
    dbuf,
    sems,
    rsems,
    wsems,
    idx_sm,        # scratch SMEM (2, WR, 128) i32 index windows
    osems,
    state_ref,     # scratch (8, PIX): row0 T, row1 dead, row2 gp
    *,
    tile: int,
    chunk: int,
    grid_x: int,
    banks: int = 1,
):
    G = chunk
    PIX = tile * tile
    t_idx = pl.program_id(0) * grid_x + pl.program_id(1)
    start = ranges_ref[t_idx]
    end = ranges_ref[t_idx + 1]
    num = end - start
    nchunks = pl.cdiv(num, G)
    px, py = _pixel_coords(tile)

    g_out = gout_ref[:].reshape(_CCH, PIX)
    T_final = t_in_ref[:].reshape(1, PIX)
    bg = bg_ref[:]                                  # (CCH, 1)
    acc_total = out_in_ref[:].reshape(_CCH, PIX) - bg * T_final
    u = jnp.sum(g_out * acc_total, axis=0, keepdims=True)   # (1, PIX)
    gbg = jnp.sum(g_out * bg, axis=0, keepdims=True)        # (1, PIX)

    idx_dma, rows_start, rows_wait = _row_gather_helpers(
        table_hbm, order_hbm, idx_sm, buf, sems, osems, start, G, banks)
    acc_start, acc_wait, write_start, write_wait = _rmw_helpers(
        dtable_hbm, idx_sm, dacc, dbuf, rsems, wsems, start, G, num, banks)

    @pl.when(nchunks > 0)
    def _():
        idx_dma(0, 0).start()
        idx_dma(0, 0).wait()
        rows_start(0, 0)
        acc_start(0, 0)

    @pl.when(nchunks > 1)
    def _():
        idx_dma(1, 1).start()

    state_ref[:] = jnp.zeros((8, PIX), jnp.float32)
    state_ref[0:1, :] = jnp.ones((1, PIX), jnp.float32)

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            idx_dma(1 - slot, c + 1).wait()
            rows_start(1 - slot, c + 1)
            acc_start(1 - slot, c + 1)

        rows_wait(slot)
        acc_wait(slot)

        # the row writes from two chunks ago must land before dbuf reuse
        @pl.when(c >= 2)
        def _():
            write_wait(slot)

        data = buf[slot]
        geom = data[:, :_GEOM]
        colors = data[:, _GEOM:_GEOM + _CCH]

        T = state_ref[0:1, :]
        alive = state_ref[1:2, :] < 0.5
        gp = state_ref[2:3, :]

        j = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        mask2d = ((j + c * G) < num) & alive
        at, d0, d1, gexp = _chunk_alphas(geom, px, py, mask2d)

        P_incl = T * _cumprod_sublanes(1.0 - at, G)
        live = P_incl >= T_MIN
        row0 = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0) == 0
        E = jnp.where(row0, T, pltpu.roll(P_incl, 1, axis=0))
        w = jnp.where(live, at * E, 0.0)
        used = live & (at > 0.0)

        # per-(instance,pixel) color-dot grads: (G, PIX) = colors @ g_out
        gc = jax.lax.dot_general(
            colors, g_out,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        wgc = w * gc
        prefix_incl = gp + _cumsum_sublanes(wgc, G)          # (G, PIX)
        suffix = u - prefix_incl                              # g . S_i
        inv1ma = 1.0 / (1.0 - at)
        # dL/dalpha (color + background terms, backward.cu:585-618)
        dalpha_pix = jnp.where(
            used,
            E * gc - suffix * inv1ma - T_final * inv1ma * gbg,
            0.0,
        )

        a_op = geom[:, 5:6]
        # CUDA flows through the 0.99 clamp as identity (backward.cu:583,635)
        dG = jnp.where(used, a_op * dalpha_pix, 0.0)
        ca = geom[:, 2:3]
        cb = geom[:, 3:4]
        cc = geom[:, 4:5]
        gdx = gexp * d0
        gdy = gexp * d1
        dop = jnp.sum(jnp.where(used, gexp * dalpha_pix, 0.0), axis=1, keepdims=True)
        dmx = jnp.sum(dG * (-gdx * ca - gdy * cb), axis=1, keepdims=True)
        dmy = jnp.sum(dG * (-gdy * cc - gdx * cb), axis=1, keepdims=True)
        dca = jnp.sum(dG * (-0.5 * gdx * d0), axis=1, keepdims=True)
        dcb = jnp.sum(dG * (-gdx * d1), axis=1, keepdims=True)
        dcc = jnp.sum(dG * (-0.5 * gdy * d1), axis=1, keepdims=True)

        # per-instance color grads: (G, CCH) = w @ g_out^T
        dcol = jax.lax.dot_general(
            w, g_out,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        zeros = jnp.zeros_like(dop)
        dgeom = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, dop, zeros, zeros], axis=1
        )  # (G, 8)
        pad = jnp.zeros((G, _PK - _GEOM - _CCH), jnp.float32)
        # accumulate: previous per-gaussian totals (gathered rows) + this
        # chunk's instance grads, written back row-by-row
        dbuf[slot] = dacc[slot] + jnp.concatenate([dgeom, dcol, pad], axis=1)
        write_start(slot, c)

        # the c+2 index window may only overwrite idx_sm[slot] after the
        # row writes above have latched their target rows
        @pl.when(c + 2 < nchunks)
        def _():
            idx_dma(slot, c + 2).start()

        T_new = jnp.min(jnp.where(live, P_incl, jnp.inf), axis=0, keepdims=True)
        died = jnp.any((at > 0.0) & jnp.logical_not(live), axis=0, keepdims=True)
        state_ref[0:1, :] = jnp.minimum(T, T_new)
        state_ref[1:2, :] = jnp.maximum(state_ref[1:2, :], died.astype(jnp.float32))
        state_ref[2:3, :] = prefix_incl[G - 1 : G, :]
        return 0

    # must visit every chunk (all instance grads must be accumulated)
    jax.lax.fori_loop(0, nchunks, body, 0)

    # drain outstanding row writes: the next grid step's tile may read any
    # of these rows
    @pl.when(nchunks >= 2)
    def _():
        write_wait(jax.lax.rem(nchunks, 2))

    @pl.when(nchunks >= 1)
    def _():
        write_wait(jax.lax.rem(nchunks - 1, 2))


# ---------------------------------------------------------------------------
# custom_vjp wrapper (tiled-layout boundary)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def blend_tiles(table, order, ranges, bg, height, width, tile, chunk,
                banks=1, exit_every=1):
    """Fused gather + blend: table (P, _PK) per-gaussian rows, order (N_pad,)
    i32 tile/depth-sorted instance->gaussian ids, ranges (T+1,).

    -> (out (gy, gx, CCH, tile*tile), final_T (gy, gx, 1, tile*tile)).
    The kernel gathers rows by DMA inside the tile loop — never
    materializing the (N, _PK) packed array XLA's gather took 35 s to
    build on-chip (outputs/bench/tpu_diag_r3a)."""
    return _blend_fwd_call(table, order, ranges, bg, height, width, tile,
                           chunk, banks, exit_every)


def _order_2d(order, chunk):
    """Flat instance->gaussian map -> the kernel's (M, 128) i32 layout.

    1-D HBM/VMEM refs only admit 1024-aligned DMA slices (shape AND offset,
    tools/mosaic_probe.py); 2-D dim-0 slices are unconstrained. Rows past
    the flat length absorb the last chunk's window over-read (zeros: row-0
    fetches whose lanes the blend masks out anyway)."""
    M = -(-order.shape[0] // 128) + _idx_rows(chunk)
    return jnp.pad(order, (0, M * 128 - order.shape[0])).reshape(M, 128)


def _blend_fwd_call(table, order, ranges, bg, height, width, tile, chunk,
                    banks=1, exit_every=1, emit_counts=False):
    if chunk % banks != 0:
        raise ValueError(
            f"chunk ({chunk}) must be divisible by dma_banks ({banks}): the "
            "byte-counted row-DMA waits absorb chunk//banks rows per bank — "
            "a remainder would leave un-waited DMAs corrupting later waits")
    gy = height // tile
    gx = width // tile
    PIX = tile * tile
    if table.shape[0] < chunk:
        # the byte-counted wait templates slice chunk//banks rows from the
        # table ref; micro scenes with P < chunk need tail padding
        table = jnp.pad(table, ((0, chunk - table.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_CCH, 1), lambda i, j, r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, _CCH, PIX), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, PIX), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((1, 1, 8, 128), lambda i, j, r: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)] if emit_counts else []),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, _PK), table.dtype),
            pltpu.SemaphoreType.DMA((2, banks)),
            pltpu.SMEM((2, _idx_rows(chunk), 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((_CCH, PIX), jnp.float32),
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(_fwd_kernel, tile=tile, chunk=chunk, grid_x=gx,
                               banks=banks, exit_every=exit_every,
                               emit_counts=emit_counts,
                               bf16_rows=table.dtype == jnp.bfloat16)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((gy, gx, _CCH, PIX), jnp.float32),
            jax.ShapeDtypeStruct((gy, gx, 1, PIX), jnp.float32),
        ] + ([jax.ShapeDtypeStruct((gy, gx, 8, 128), jnp.int32)]
             if emit_counts else []),
        interpret=_interpret(),
    )(ranges, table, _order_2d(order, chunk), bg.reshape(_CCH, 1))
    return tuple(outs)


def blend_probe(table, order, ranges, bg, height, width, tile, chunk,
                banks=1, exit_every=1):
    """Instrumented forward blend: (out, final_T, chunks_run (gy, gx, 8, 128) — count at [...,0,0]).

    Same kernel as blend_tiles plus a per-tile count of while-loop
    iterations actually executed — the ground truth for whether the
    early exit fires ON-CHIP (tools/ee_probe.py). Not differentiable."""
    return _blend_fwd_call(table, order, ranges, bg, height, width, tile,
                           chunk, banks, exit_every, emit_counts=True)


def _blend_fwd(table, order, ranges, bg, height, width, tile, chunk,
               banks=1, exit_every=1):
    out, t = _blend_fwd_call(table, order, ranges, bg, height, width, tile,
                             chunk, banks, exit_every)
    return (out, t), (table, order, ranges, bg, out, t)


def _blend_bwd(height, width, tile, chunk, banks, exit_every, res, grads):
    if chunk % banks != 0:
        raise ValueError(
            f"chunk ({chunk}) must be divisible by dma_banks ({banks})")
    table, order, ranges, bg, out, t = res
    g_out, g_t = grads
    del g_t  # final_T treated as an auxiliary, non-differentiable output
    gy = height // tile
    gx = width // tile
    PIX = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_CCH, 1), lambda i, j, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, PIX), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _CCH, PIX), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _CCH, PIX), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # zeros, aliased to output
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, _PK), jnp.float32),
            pltpu.VMEM((2, chunk, _PK), jnp.float32),
            pltpu.VMEM((2, chunk, _PK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, banks)),
            pltpu.SemaphoreType.DMA((2, banks)),
            pltpu.SemaphoreType.DMA((2, banks)),
            pltpu.SMEM((2, _idx_rows(chunk), 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((8, PIX), jnp.float32),
        ],
    )
    kernel = functools.partial(_bwd_kernel, tile=tile, chunk=chunk, grid_x=gx,
                               banks=banks)
    # the gradient table is accumulated IN PLACE by the kernel's row DMAs:
    # a zeros array rides in as the aliased input so untouched gaussians
    # keep zero gradients (input 7 counting the scalar-prefetch operand).
    # One extra row (sliced off below) is the tail-slot dump target — see
    # _rmw_helpers on why tail DMAs must not touch real gaussian rows. Both
    # tables are padded to >= chunk rows for the wait templates (micro
    # scenes with P < chunk).
    P = table.shape[0]
    rows = max(P + 1, chunk)
    if table.shape[0] < chunk:
        table = jnp.pad(table, ((0, chunk - table.shape[0]), (0, 0)))
    d_table = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, table.shape[1]), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={7: 0},
        interpret=_interpret(),
    )(ranges, table, _order_2d(order, chunk), bg.reshape(_CCH, 1), t, out,
      g_out, jnp.zeros((rows, table.shape[1]), table.dtype))[0]
    d_table = d_table[:P]

    # d(bg): sum over pixels of T * g_out
    g_bg = jnp.einsum("yxop,yxcp->c", t, g_out)
    return d_table, None, None, g_bg


blend_tiles.defvjp(_blend_fwd, _blend_bwd)


def _pack_rows_bf16(table: jnp.ndarray) -> jnp.ndarray:
    """(P, _PK) f32 rows -> (P, _PK) bf16 rows, 256 B/row through the DMAs.

    Layout: lanes [0:8) geometry bf16 HI, [8:16) geometry bf16 LO
    (value = hi + lo, |rel err| ~ 2^-16 — double the f32->bf16 mantissa),
    [16:56) colors+invdepth plain bf16 (the blend's MXU matmul rounds its
    color operand to bf16 in the f32 path too), rest zero pad."""
    geom = table[:, :_GEOM]
    hi = geom.astype(jnp.bfloat16)
    lo = (geom - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    colors = table[:, _GEOM:_GEOM + _CCH].astype(jnp.bfloat16)
    pad = jnp.zeros(
        (table.shape[0], _PK - 2 * _GEOM - _CCH), jnp.bfloat16)
    return jnp.concatenate([hi, lo, colors, pad], axis=-1)


def _unpack_rows_bf16(packed: jnp.ndarray) -> jnp.ndarray:
    """bf16 rows -> the f32 row layout holding EXACTLY the values the
    bf16 forward kernel reconstructed (hi + lo, bf16-rounded colors) —
    the backward replay on this table reproduces the forward's alphas
    bit-for-bit."""
    geom = (packed[:, :_GEOM].astype(jnp.float32)
            + packed[:, _GEOM:2 * _GEOM].astype(jnp.float32))
    colors = packed[:, 2 * _GEOM:2 * _GEOM + _CCH].astype(jnp.float32)
    pad = jnp.zeros((packed.shape[0], _PK - _GEOM - _CCH), jnp.float32)
    return jnp.concatenate([geom, colors, pad], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def blend_tiles_bf16(table, order, ranges, bg, height, width, tile, chunk,
                     banks=1, exit_every=1):
    """blend_tiles with the row table packed to bf16 in HBM (settings.
    bf16_rows): same f32 (P, _PK) table argument and same returns; the
    row-gather DMA traffic halves. Gradients are straight-through the
    bf16 quantization (d table = d reconstructed-table), and the
    backward replays on the exact values the forward used."""
    out, t = _blend_fwd_call(_pack_rows_bf16(table), order, ranges, bg,
                             height, width, tile, chunk, banks, exit_every)
    return out, t


def _blend_fwd_bf16(table, order, ranges, bg, height, width, tile, chunk,
                    banks=1, exit_every=1):
    packed = _pack_rows_bf16(table)
    out, t = _blend_fwd_call(packed, order, ranges, bg, height, width,
                             tile, chunk, banks, exit_every)
    return (out, t), (packed, order, ranges, bg, out, t)


def _blend_bwd_bf16(height, width, tile, chunk, banks, exit_every, res,
                    grads):
    packed, order, ranges, bg, out, t = res
    res_f32 = (_unpack_rows_bf16(packed), order, ranges, bg, out, t)
    return _blend_bwd(height, width, tile, chunk, banks, exit_every,
                      res_f32, grads)


blend_tiles_bf16.defvjp(_blend_fwd_bf16, _blend_bwd_bf16)


def _blend_fwd_call_vmem(table, ltable, order, ranges, bg, height, width,
                         tile, chunk, pb):
    gy = height // tile
    gx = width // tile
    PIX = tile * tile
    if table.shape[0] < chunk:
        table = jnp.pad(table, ((0, chunk - table.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            # constant index map: the pipeline loads the classed table into
            # VMEM once and keeps it resident across grid steps
            pl.BlockSpec((ltable.shape[0], _PK), lambda i, j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CCH, 1), lambda i, j, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, _CCH, PIX), lambda i, j, r: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, PIX), lambda i, j, r: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, _PK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2, _idx_rows(chunk), 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((_CCH, PIX), jnp.float32),
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(_fwd_kernel_vmem, tile=tile, chunk=chunk,
                               grid_x=gx, pb=pb)
    out, t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((gy, gx, _CCH, PIX), jnp.float32),
            jax.ShapeDtypeStruct((gy, gx, 1, PIX), jnp.float32),
        ],
        interpret=_interpret(),
    )(ranges, table, _order_2d(order, chunk), ltable, bg.reshape(_CCH, 1))
    return out, t


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def blend_tiles_vmem(table, ltable, order, order_orig, ranges, bg, height,
                     width, tile, chunk, pb, banks=1):
    """blend_tiles with the first vmem_classes size classes resident in
    VMEM. `order` carries remapped ids (classed ids >= pb index `ltable`);
    `order_orig` carries the original ids and drives the UNCHANGED backward
    (RMW accumulation into the full per-gaussian gradient table). `ltable`
    must equal table[lids] numerically (rasterize builds both from the same
    projection columns) and is treated as non-differentiable — its
    gradient contribution is exactly the rows the backward already
    accumulates through `table`."""
    return _blend_fwd_call_vmem(table, ltable, order, ranges, bg, height,
                                width, tile, chunk, pb)


def _blend_fwd_vmem(table, ltable, order, order_orig, ranges, bg, height,
                    width, tile, chunk, pb, banks=1):
    out, t = _blend_fwd_call_vmem(table, ltable, order, ranges, bg, height,
                                  width, tile, chunk, pb)
    return (out, t), (table, order_orig, ranges, bg, out, t)


def _blend_bwd_vmem(height, width, tile, chunk, pb, banks, res, grads):
    d_table, _, _, g_bg = _blend_bwd(height, width, tile, chunk, banks, 1,
                                     res, grads)
    return d_table, None, None, None, None, g_bg


blend_tiles_vmem.defvjp(_blend_fwd_vmem, _blend_bwd_vmem)


def _stream_fwd_call(stream, ranges, bg, height, width, tile, chunk):
    gy = height // tile
    gx = width // tile
    PIX = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_CCH, 1), lambda i, j, r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, _CCH, PIX), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, PIX), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, _PK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((_CCH, PIX), jnp.float32),
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(_fwd_stream_kernel, tile=tile, chunk=chunk,
                               grid_x=gx)
    out, t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((gy, gx, _CCH, PIX), jnp.float32),
            jax.ShapeDtypeStruct((gy, gx, 1, PIX), jnp.float32),
        ],
        interpret=_interpret(),
    )(ranges, stream, bg.reshape(_CCH, 1))
    return out, t


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def blend_tiles_stream(table, stream, order, ranges, bg, height, width,
                       tile, chunk, banks=1):
    """Streaming blend: stream (M_pad, _PK) per-INSTANCE rows in (tile,
    depth)-sorted order (contiguous tile runs), plus the per-GAUSSIAN table
    (P, _PK) and order/ranges the RMW backward kernel consumes.

    Forward reads ONLY `stream` (one block DMA per chunk); `table`/`order`
    exist so gradients flow to the per-gaussian rows through the same
    _bwd_kernel as the gather path. Callers must ensure stream rows carry
    the same values as table[order] (rasterize() builds both from one
    projection; colors are bf16-rounded in BOTH paths by the MXU matmul)."""
    out, t = _stream_fwd_call(stream, ranges, bg, height, width, tile, chunk)
    return out, t


def _blend_fwd_stream(table, stream, order, ranges, bg, height, width,
                      tile, chunk, banks):
    out, t = _stream_fwd_call(stream, ranges, bg, height, width, tile, chunk)
    return (out, t), (table, order, ranges, bg, out, t)


def _blend_bwd_stream(height, width, tile, chunk, banks, res, grads):
    d_table, _, _, g_bg = _blend_bwd(height, width, tile, chunk, banks, 1,
                                     res, grads)
    return d_table, None, None, None, g_bg


blend_tiles_stream.defvjp(_blend_fwd_stream, _blend_bwd_stream)


def _pack_colors_bf16(colors, invd):
    """(P, 32) f32 colors + (P,) invdepth -> (P, 17) i32 of bf16 pairs.

    bf16 is lossless w.r.t. the blend output: the MXU matmul rounds its
    color inputs to bf16 in BOTH paths (see _fwd_kernel's dot_general
    precision note), so pre-rounding through the sort changes nothing."""
    P = colors.shape[0]
    c = jnp.concatenate(
        [colors, invd[:, None], jnp.zeros((P, 1), colors.dtype)], axis=-1
    ).astype(jnp.bfloat16)                       # (P, 34)
    return jax.lax.bitcast_convert_type(c.reshape(P, 17, 2), jnp.int32)


def _unpack_colors_bf16(packed):
    """(M, 17) i32 -> (M, 34) f32 (colors 0..31, invdepth, pad)."""
    M = packed.shape[0]
    c = jax.lax.bitcast_convert_type(packed, jnp.bfloat16)  # (M, 17, 2)
    return c.reshape(M, 34).astype(jnp.float32)


def _tiled_to_image(x: jnp.ndarray, height: int, width: int, tile: int) -> jnp.ndarray:
    """(gy, gx, C, tile*tile) -> (height, width, C)."""
    gy, gx, C, _ = x.shape
    x = x.reshape(gy, gx, C, tile, tile)
    x = x.transpose(0, 3, 1, 4, 2)  # gy, ty, gx, tx, C
    return x.reshape(height, width, C)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


class RasterPrep(NamedTuple):
    """Per-frame raster prep: everything up to the Pallas blend.

    Splitting prep from the blend lets a frame loop run them PHASE-
    SEPARATED (prep xG into stacked HBM buffers, then blend xG): the
    interleaved composition measures ~8 ms/frame slower than the sum of
    the standalone stages on-chip, and grouping recovers the two-loop
    additivity (28.39 vs 33.29 ms/frame at G=4,
    outputs/bench/tpu_window_r4c/ee_stages6_newladder.log)."""

    table: jnp.ndarray    # (P, _PK) packed per-gaussian rows
    order: jnp.ndarray    # (N_pad,) i32 instance -> gaussian id
    ranges: jnp.ndarray   # (T+1,) i32 per-tile instance ranges
    radius: jnp.ndarray   # (P,) projected pixel radius (API parity)


def rasterize_prep(
    means3d: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    cam: Camera,
    settings: RasterizeSettings = RasterizeSettings(),
    class_order: jnp.ndarray | None = None,
) -> RasterPrep:
    """Projection + binning + packed-row build for the default (DMA
    row-gather) blend path. Differentiable: the table carries the
    custom_vjp's full gradient surface; binning outputs ride on
    stop_gradients exactly as in `rasterize`."""
    if settings.vmem_classes or settings.streaming:
        raise ValueError(
            "rasterize_prep covers the default blend path only "
            "(vmem_classes/streaming keep their fused form in rasterize)")
    H, W = cam.height, cam.width
    tile = settings.tile
    assert H % tile == 0 and W % tile == 0, "pad image dims to tile multiple"

    proj = project_gaussians(
        means3d, scales, quats, opacities, cam,
        settings.scale_modifier, settings.antialiasing,
    )
    contributing = proj.valid & (
        jax.lax.stop_gradient(proj.alpha) >= ALPHA_MIN
    )
    ranges, order, _, _ = bin_gaussians(
        jax.lax.stop_gradient(proj.mean2d),
        jax.lax.stop_gradient(proj.depth),
        proj.radius_bin, contributing, W, H, settings,
        conic=jax.lax.stop_gradient(proj.conic),
        alpha=jax.lax.stop_gradient(proj.alpha),
        class_order=class_order,
    )

    invd = 1.0 / jnp.maximum(proj.depth, 1e-8)
    P = means3d.shape[0]
    per_gauss = jnp.concatenate(
        [
            proj.mean2d,
            proj.conic,
            proj.alpha[:, None],
            jnp.zeros((P, 2), jnp.float32),
            colors,
            invd[:, None],
            jnp.zeros((P, _PK - _GEOM - NUM_CHANNELS - 1), jnp.float32),
        ],
        axis=-1,
    )  # (P, _PK)
    # pad order by one chunk: the kernel's index staging may over-read past
    # a short final run (padded entries point at row 0, lanes masked)
    G = settings.chunk
    pad_rows = ((order.shape[0] + G - 1) // G + 1) * G - order.shape[0]
    order = jnp.concatenate(
        [order, jnp.zeros((pad_rows,), order.dtype)], axis=0
    )
    return RasterPrep(per_gauss, order, ranges, proj.radius)


def rasterize_blend(
    prep: RasterPrep,
    bg: jnp.ndarray,
    height: int,
    width: int,
    settings: RasterizeSettings = RasterizeSettings(),
    channels_first: bool = True,
):
    """Blend a prepped frame (see RasterPrep): the Pallas fused
    gather+blend kernel plus the tiled->image relayout. Same returns as
    `rasterize`."""
    bg_ext = jnp.concatenate([bg, jnp.zeros(_CCH - NUM_CHANNELS, bg.dtype)])
    blend = blend_tiles_bf16 if settings.bf16_rows else blend_tiles
    out4, _ = blend(prep.table, prep.order, prep.ranges, bg_ext,
                    height, width, settings.tile, settings.chunk,
                    settings.dma_banks, settings.exit_every)
    out = _tiled_to_image(out4, height, width, settings.tile)
    if not channels_first:
        return (out[:, :, :NUM_CHANNELS],
                out[:, :, NUM_CHANNELS:NUM_CHANNELS + 1])
    color = jnp.transpose(out[:, :, :NUM_CHANNELS], (2, 0, 1))
    invdepth = out[:, :, NUM_CHANNELS][None]
    return color, invdepth


def rasterize(
    means3d: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    cam: Camera,
    bg: jnp.ndarray,
    settings: RasterizeSettings = RasterizeSettings(),
    channels_first: bool = True,
    class_order: jnp.ndarray | None = None,
):
    """Differentiable single-image rasterization.

    API parity with GaussianRasterizer_32
    (ref: diff_gaussian_rasterization_32/__init__.py:143-207):
    means3d (P,3), colors (P,32) precomputed, opacities (P,1), scales (P,3),
    quats (P,4) wxyz, camera, bg (32,)
    -> (color (32,H,W), radii (P,), invdepth (1,H,W)).

    channels_first=False returns (color (H,W,32), radii (P,), invdepth
    (H,W,1)) instead — the layout every downstream consumer (NHWC refiner,
    losses) actually wants, skipping two full-image relayouts per frame.
    """
    H, W = cam.height, cam.width
    tile = settings.tile
    assert H % tile == 0 and W % tile == 0, "pad image dims to tile multiple"

    if not settings.vmem_classes and not settings.streaming:
        prep = rasterize_prep(
            means3d, colors, opacities, scales, quats, cam, settings,
            class_order=class_order)
        out = rasterize_blend(prep, bg, H, W, settings, channels_first)
        return out[0], prep.radius, out[1]
    if settings.bf16_rows:
        raise ValueError(
            "bf16_rows covers the default (DMA row-gather) blend path "
            "only; vmem_classes/streaming keep their f32 tables")

    proj = project_gaussians(
        means3d, scales, quats, opacities, cam,
        settings.scale_modifier, settings.antialiasing,
    )
    # parity-exact cull: alpha < 1/255 can never pass the blend's floor test
    # (exp(power) <= 1 inside the rect), so such Gaussians skip binning
    # entirely — masked/zero-opacity splats cost nothing.
    contributing = proj.valid & (
        jax.lax.stop_gradient(proj.alpha) >= ALPHA_MIN
    )
    mean2d_sg = jax.lax.stop_gradient(proj.mean2d)
    depth_sg = jax.lax.stop_gradient(proj.depth)
    conic_sg = jax.lax.stop_gradient(proj.conic)
    alpha_sg = jax.lax.stop_gradient(proj.alpha)

    spay = None
    lids = None
    if settings.vmem_classes:
        # classed ids remapped to P+rank; original ids ride the payload for
        # the backward's RMW table accumulation
        Pn = means3d.shape[0]
        ranges, order, (order_orig,), lids, _, _ = bin_gaussians(
            mean2d_sg, depth_sg, proj.radius_bin, contributing, W, H,
            settings, conic=conic_sg, alpha=alpha_sg,
            payload=(jnp.arange(Pn, dtype=jnp.int32),),
            class_order=class_order,
        )
    elif settings.streaming:
        # the packed per-gaussian payload rides THROUGH the instance sort
        # (geometry f32 exact; colors+invdepth bf16-packed in i32 pairs —
        # lossless vs the blend's bf16-input MXU matmul)
        invd_sg = 1.0 / jnp.maximum(depth_sg, 1e-8)
        pc = _pack_colors_bf16(jax.lax.stop_gradient(colors), invd_sg)
        payload = (
            mean2d_sg[:, 0], mean2d_sg[:, 1],
            conic_sg[:, 0], conic_sg[:, 1], conic_sg[:, 2], alpha_sg,
            *(pc[:, i] for i in range(pc.shape[1])),
        )
        ranges, order, spay, _, _ = bin_gaussians(
            mean2d_sg, depth_sg, proj.radius_bin, contributing, W, H,
            settings, conic=conic_sg, alpha=alpha_sg, payload=payload,
            class_order=class_order,
        )

    # per-gaussian packed rows (differentiable: the custom_vjp's gradient
    # surface in BOTH paths)
    invd = 1.0 / jnp.maximum(proj.depth, 1e-8)
    P = means3d.shape[0]
    zeros2 = jnp.zeros((P, 2), jnp.float32)
    pad_tail = jnp.zeros((P, _PK - _GEOM - NUM_CHANNELS - 1), jnp.float32)
    per_gauss = jnp.concatenate(
        [
            proj.mean2d,
            proj.conic,
            proj.alpha[:, None],
            zeros2,
            colors,
            invd[:, None],
            pad_tail,
        ],
        axis=-1,
    )  # (P, _PK)
    # the blend kernel gathers rows itself from (order, per_gauss) — no XLA
    # gather, no (N, _PK) materialization. Pad order by one chunk so the
    # kernel's index staging may over-read past a short final run (padded
    # entries point at row 0; their lanes are masked in the blend).
    G = settings.chunk
    pad_rows = ((order.shape[0] + G - 1) // G + 1) * G - order.shape[0]
    order = jnp.concatenate(
        [order, jnp.zeros((pad_rows,), order.dtype)], axis=0
    )

    bg_ext = jnp.concatenate([bg, jnp.zeros(_CCH - NUM_CHANNELS, bg.dtype)])
    if settings.vmem_classes:
        order_orig = jnp.concatenate(
            [order_orig, jnp.zeros((pad_rows,), order_orig.dtype)], axis=0
        )
        # the VMEM table = per_gauss[lids] — bit-identical rows to what the
        # DMA path would fetch. In-kernel single-row-DMA gather: XLA column
        # gathers of the same rows measured ~+4.7 ms/frame at L=4096 on-chip
        # (bench_exact_vmem 18.34 fps vs all-DMA 20.08,
        # outputs/bench/tpu_window_r4a/), ~55 ns/row descriptor floor here.
        L = lids.shape[0]
        if L * _PK * 4 > 8 * 1024 * 1024:
            raise ValueError(
                f"vmem_classes table {L} rows = {L * _PK * 4 / 1e6:.1f} MB "
                "exceeds the 8 MB VMEM budget — fewer/smaller classes")
        ltable = gather_rows(jax.lax.stop_gradient(per_gauss), lids)
        out4, _ = blend_tiles_vmem(per_gauss, ltable, order, order_orig,
                                   ranges, bg_ext, H, W, tile,
                                   settings.chunk, P, settings.dma_banks)
    elif settings.streaming:
        M = spay[0].shape[0]
        g6 = jnp.stack(spay[:6], axis=1)                       # (M, 6)
        col34 = _unpack_colors_bf16(jnp.stack(spay[6:], axis=1))
        stream = jnp.concatenate(
            [
                g6,
                jnp.zeros((M, _GEOM - 6), jnp.float32),
                col34[:, :NUM_CHANNELS + 1],                    # colors+invd
                jnp.zeros((M, _PK - _GEOM - NUM_CHANNELS - 1), jnp.float32),
            ],
            axis=1,
        )
        # one-chunk tail margin: the last tile's final block may over-read
        stream = jnp.concatenate(
            [stream, jnp.zeros((G, _PK), jnp.float32)], axis=0)
        out4, _ = blend_tiles_stream(per_gauss, stream, order, ranges,
                                     bg_ext, H, W, tile, settings.chunk,
                                     settings.dma_banks)
    out = _tiled_to_image(out4, H, W, tile)  # (H, W, CCH)

    if not channels_first:
        return (out[:, :, :NUM_CHANNELS], proj.radius,
                out[:, :, NUM_CHANNELS:NUM_CHANNELS + 1])
    color = jnp.transpose(out[:, :, :NUM_CHANNELS], (2, 0, 1))
    invdepth = out[:, :, NUM_CHANNELS][None]
    return color, proj.radius, invdepth
