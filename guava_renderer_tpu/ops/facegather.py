"""Windowed face-table gather — the UV deformer's hot gather as MXU matmuls.

The per-frame UV deformation needs one (N~262k, 16) row gather of a
per-face table by each texel's static binding-face index
(ref: ubody_gaussian.py:257-271 gathers face quantities per bound point).
XLA lowers that gather at ~20 ns/row (tools/gather_probe.py) — ~5 ms of
the frame, pure data movement for a table that is only ~1.7 MB.

TPU-first replacement (no per-row access at all):

  * STATIC plan (per rig/avatar, numpy at build time): sort the texels by
    binding face, renumber the bound faces compactly (every compact id has
    >= 1 texel), and record each 256-texel chunk's window start. Sorted +
    compact means a chunk of 256 texels spans <= 256 consecutive compact
    face ids — so its table rows live in <= 3 aligned 128-face blocks.
  * KERNEL: the compact face table rides fully VMEM-resident as
    (Fc/128, 16, 128) face-blocks (channel sublanes x face lanes). Each
    chunk reads its 3 blocks by dynamic block index (legal dim-0 dynamic
    slicing), builds a one-hot (384, 256) selector from a sublane iota
    against the chunk's texel ids (texels ride the lanes — no transpose),
    and gathers via ONE MXU matmul (16,384)@(384,256) -> (16,256) rows in
    channel-major layout, exactly what the downstream component math wants.
  * BACKWARD (custom_vjp): d_table accumulates per chunk as
    drows(16,256) @ one_hot^T(256,384) into a VMEM-resident accumulator —
    the sequential TPU grid makes overlapping windows race-free.

Replaces ~5 ms of XLA gather with ~0.2 ms of MXU work + 1.7 MB residency.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CH = 16            # face-table channels
_T = 256            # texels per chunk
_FB = 128           # faces per block (lane width)
_WB = 3             # window blocks (127 misalign + 256 span <= 384)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@dataclasses.dataclass(frozen=True, eq=False)
class FaceSortPlan:
    """Static (numpy, trace-time) texel-sort plan for one rig.

    perm sorts texels by binding face; compact ids renumber bound faces
    densely (invalid texels bind a dummy trailing face). All shapes static.
    Hash/eq are by identity: the plan is a trace-time constant (used as a
    custom_vjp nondiff argument), built once per rig.
    """

    perm: np.ndarray            # (N,) texel permutation (sorted by face)
    inv_perm: np.ndarray        # (N,) inverse permutation
    compact_ids: np.ndarray     # (N,) i32 compact face id per SORTED texel
    used_faces: np.ndarray      # (Fc,) original face id per compact id
    chunk_block0: np.ndarray    # (C,) i32 first face-BLOCK of each chunk
    n_texels: int               # N (multiple of _T after padding upstream)
    n_compact: int              # Fc including the dummy face
    n_blocks: int               # padded block count (>= ceil(Fc/128) + WB-1)


def build_face_sort_plan(binding_face: np.ndarray,
                         valid: np.ndarray) -> FaceSortPlan:
    """Build the static plan from a rig's flat binding table."""
    binding_face = np.asarray(binding_face).reshape(-1).astype(np.int64)
    valid = np.asarray(valid).reshape(-1).astype(bool)
    N = binding_face.shape[0]
    assert N % _T == 0, f"texel count {N} must be a multiple of {_T}"

    used = np.unique(binding_face[valid])
    dummy = used.shape[0]
    safe = np.where(valid, binding_face, used[0] if used.size else 0)
    compact_unsorted = np.where(valid, np.searchsorted(used, safe), dummy)
    perm = np.argsort(compact_unsorted, kind="stable")
    inv_perm = np.argsort(perm, kind="stable")
    compact = compact_unsorted[perm]

    n_compact = dummy + 1
    chunk_f0 = compact.reshape(-1, _T)[:, 0]
    chunk_block0 = (chunk_f0 // _FB).astype(np.int32)
    n_blocks = -(-n_compact // _FB) + (_WB - 1)
    # the span proof needs compact ids consecutive within each chunk
    span = compact.reshape(-1, _T)[:, -1] - chunk_f0
    assert int(span.max(initial=0)) <= _T, "chunk face span exceeds window"
    # dummy face must also be reachable: it is (< n_compact <= blocks*128)
    return FaceSortPlan(
        perm=perm.astype(np.int32),
        inv_perm=inv_perm.astype(np.int32),
        compact_ids=compact.astype(np.int32),
        used_faces=used.astype(np.int32),
        chunk_block0=chunk_block0,
        n_texels=N,
        n_compact=n_compact,
        n_blocks=int(n_blocks),
    )


def compact_faces(plan: FaceSortPlan, faces: np.ndarray) -> np.ndarray:
    """(F, 3) mesh faces -> (Fc, 3) compact-id face table (static numpy).

    The trailing dummy face (bound by invalid texels) reuses a real
    triangle so its frame math stays NaN-free; invalid texels are
    opacity-masked downstream.
    """
    faces = np.asarray(faces)
    used = faces[plan.used_faces]
    dummy = used[:1] if used.size else faces[:1]
    return np.concatenate([used, dummy], axis=0).astype(np.int32)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(b0_sm, ids_ref, table_ref, out_ref, *, k):
    """grid step owns k chunks; table_ref (NB, 16, 128) VMEM-resident."""
    c0 = pl.program_id(0) * k
    for j in range(k):
        b0 = b0_sm[c0 + j]
        win = jnp.concatenate(
            [table_ref[b0 + w] for w in range(_WB)], axis=-1
        )                                           # (16, 384)
        ids = ids_ref[j, :]                         # (256,) lanes
        rel = ids - b0 * _FB                        # in [0, 384)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (_WB * _FB, _T), 0)
        one_hot = (w_iota == rel[None, :]).astype(jnp.float32)
        out_ref[j] = jax.lax.dot_general(
            win, one_hot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (16, 256)


def _bwd_kernel(b0_sm, ids_ref, drows_ref, dtab_ref, acc, *, k, nsteps):
    c0 = pl.program_id(0) * k

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for j in range(k):
        b0 = b0_sm[c0 + j]
        ids = ids_ref[j, :]
        rel = ids - b0 * _FB
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (_WB * _FB, _T), 0)
        one_hot_t = (w_iota == rel[None, :]).astype(jnp.float32)  # (384, 256)
        dwin = jax.lax.dot_general(
            drows_ref[j], one_hot_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (16, 384)
        for w in range(_WB):
            acc[b0 + w] = acc[b0 + w] + dwin[:, w * _FB:(w + 1) * _FB]

    @pl.when(pl.program_id(0) == nsteps - 1)
    def _():
        dtab_ref[...] = acc[...]


def _pack_table(table: jnp.ndarray, n_blocks: int) -> jnp.ndarray:
    """(Fc, 16) -> (NB, 16, 128) face-block layout (channel sub x face lane)."""
    Fc = table.shape[0]
    pad = n_blocks * _FB - Fc
    t = jnp.pad(table, ((0, pad), (0, 0)))
    return jnp.transpose(t.reshape(n_blocks, _FB, _CH), (0, 2, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def face_window_gather(table: jnp.ndarray, ids: jnp.ndarray,
                       plan: FaceSortPlan) -> jnp.ndarray:
    """table (Fc, 16) x SORTED compact ids (N,) -> rows (16, N).

    Output is channel-major: rows[c, t] = table[ids[t], c].
    """
    return _fwd_call(table, ids, plan)


def _fwd_call(table, ids, plan):
    N, NB = plan.n_texels, plan.n_blocks
    C = N // _T
    k = 16 if C % 16 == 0 else 1
    packed = _pack_table(table, NB)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k),
        grid=(C // k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((k, _T), lambda c: (c, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole table resident
        ],
        out_specs=pl.BlockSpec((k, _CH, _T), lambda c: (c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, _CH, _T), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(plan.chunk_block0), ids.reshape(C, _T), packed)
    return jnp.transpose(out, (1, 0, 2)).reshape(_CH, N)


def _gather_fwd(table, ids, plan):
    return _fwd_call(table, ids, plan), (table, ids)


def _gather_bwd(plan, res, drows):
    table, ids = res
    N, NB = plan.n_texels, plan.n_blocks
    C = N // _T
    k = 16 if C % 16 == 0 else 1
    drows_blocks = jnp.transpose(
        drows.reshape(_CH, C, _T), (1, 0, 2)
    )                                                # (C, 16, 256)
    dpacked = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, nsteps=C // k),
        grid=(C // k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((k, _T), lambda c: (c, 0)),
            pl.BlockSpec((k, _CH, _T), lambda c: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, _CH, _FB), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB, _CH, _FB), jnp.float32)],
        interpret=_interpret(),
    )(jnp.asarray(plan.chunk_block0), ids.reshape(C, _T), drows_blocks)
    # (NB, 16, 128) -> (Fc, 16)
    dtab = jnp.transpose(dpacked, (0, 2, 1)).reshape(NB * _FB, _CH)
    return dtab[: table.shape[0]], None


face_window_gather.defvjp(_gather_fwd, _gather_bwd)


def face_window_gather_reference(table: jnp.ndarray, ids: jnp.ndarray,
                                 plan: FaceSortPlan) -> jnp.ndarray:
    """XLA-gather spec implementation (tests / CPU fallback)."""
    del plan
    return jnp.transpose(table[ids], (1, 0))
