"""Empirical Mosaic constraint probes via the axon AOT compile service.

Each experiment AOT-compiles (never runs) a minimal Pallas kernel isolating
one DMA pattern the rasterizer's fused row-gather needs. Run standalone:

    python tools/mosaic_probe.py [--platform axon] [--exp NAME]

Findings drive ops/gsplat.py's gather design; results are logged one line
per experiment: `EXP <name> OK|FAIL <first error line>`.
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _compile(fn, *args):
    import jax

    jax.jit(fn).lower(*args).compile()


def exp_idx32(jnp, pl, pltpu):
    """1-D i32 HBM->SMEM DMA, slice shape 32, dynamic start (the failing
    pattern: 'slice shape along dim 0 must be aligned to tiling (1024)')."""
    import jax

    N = 1024 * 64

    def kernel(order_ref, o_ref, idx_sm, sem):
        start = o_ref.shape[0] * 0
        pltpu.make_async_copy(
            order_ref.at[pl.ds(start, 32)], idx_sm.at[0], sem
        ).start()
        pltpu.make_async_copy(
            order_ref.at[pl.ds(start, 32)], idx_sm.at[0], sem
        ).wait()
        o_ref[0, 0] = idx_sm[0, 0]

    def fn(order):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[
                pltpu.SMEM((2, 32), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(order)

    _compile(fn, jnp.zeros((N,), jnp.int32))


def exp_idx1024(jnp, pl, pltpu):
    """1-D i32 HBM/VMEM->SMEM DMA, slice shape 1024, DYNAMIC UNALIGNED
    start (from a scalar-prefetch value)."""
    import jax

    N = 1024 * 64

    def kernel(s_ref, order_ref, o_ref, idx_sm, sem):
        start = s_ref[0]
        pltpu.make_async_copy(
            order_ref.at[pl.ds(start, 1024)], idx_sm.at[0], sem
        ).start()
        pltpu.make_async_copy(
            order_ref.at[pl.ds(start, 1024)], idx_sm.at[0], sem
        ).wait()
        o_ref[0, 0] = idx_sm[0, 0]

    def fn(s, order):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((2, 1024), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(s, order)

    _compile(fn, jnp.zeros((4,), jnp.int32), jnp.zeros((N,), jnp.int32))


def exp_row1(jnp, pl, pltpu):
    """(1, 128) f32 single-row DMA from a big (HBM-resident) table at a
    dynamic scalar index — the core of the fused row gather."""
    import jax

    P = 300_000  # 150 MB > VMEM, must stay HBM

    def kernel(s_ref, table_ref, o_ref, buf, sem):
        idx = s_ref[0]
        pltpu.make_async_copy(
            table_ref.at[pl.ds(idx, 1)], buf.at[0, pl.ds(0, 1)], sem
        ).start()
        pltpu.make_async_copy(
            table_ref.at[pl.ds(idx, 1)], buf.at[0, pl.ds(0, 1)], sem
        ).wait()
        o_ref[0, :] = buf[0, 0, :]

    def fn(s, table):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 128), lambda i, r: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 1, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(s, table)

    _compile(fn, jnp.zeros((4,), jnp.int32), jnp.zeros((P, 128), jnp.float32))


def exp_row1_loop(jnp, pl, pltpu):
    """32 single-row DMAs driven by SMEM indices + a shared semaphore —
    the actual inner pattern of the fused gather (chunk fill)."""
    import jax

    P = 300_000
    G = 32

    def kernel(s_ref, table_ref, o_ref, idx_sm, buf, sem):
        del s_ref
        for g in range(G):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_sm[0, g], 1)],
                buf.at[0, pl.ds(g, 1)], sem.at[0],
            ).start()
        for g in range(G):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(0, 1)], buf.at[0, pl.ds(g, 1)], sem.at[0]
            ).wait()
        o_ref[:, :] = buf[0]

    def fn(s, table):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((G, 128), lambda i, r: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((2, G), jnp.int32),
                pltpu.VMEM((2, G, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((G, 128), jnp.float32),
        )(s, table)

    _compile(fn, jnp.zeros((4,), jnp.int32), jnp.zeros((P, 128), jnp.float32))


def exp_row8(jnp, pl, pltpu):
    """(8, 128) aligned-window DMA fallback: row idx fetched via its
    surrounding 8-row window at (idx//8)*8."""
    import jax

    P = 300_000

    def kernel(s_ref, table_ref, o_ref, buf, sem):
        idx = s_ref[0]
        base = (idx // 8) * 8
        pltpu.make_async_copy(
            table_ref.at[pl.ds(base, 8)], buf.at[0], sem
        ).start()
        pltpu.make_async_copy(
            table_ref.at[pl.ds(base, 8)], buf.at[0], sem
        ).wait()
        o_ref[0, :] = buf[0, 0, :]

    def fn(s, table):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 128), lambda i, r: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(s, table)

    _compile(fn, jnp.zeros((4,), jnp.int32), jnp.zeros((P, 128), jnp.float32))


def exp_idx2d(jnp, pl, pltpu):
    """(M,128) i32 index table: DMA a 2-row window at a dynamic row offset
    into SMEM, then scalar-read with dynamic sub-indices — the Mosaic-legal
    replacement for 1-D index slices (1-D needs 1024-aligned shape AND
    offset; 2-D dim-0 offsets are unconstrained)."""
    import jax

    M = 4096

    def kernel(s_ref, order_ref, o_ref, idx_sm, sem):
        p = s_ref[0]
        r = p // 128
        o = p % 128
        pltpu.make_async_copy(
            order_ref.at[pl.ds(r, 2)], idx_sm.at[0], sem
        ).start()
        pltpu.make_async_copy(
            order_ref.at[pl.ds(r, 2)], idx_sm.at[0], sem
        ).wait()
        q = o + 31
        o_ref[0, 0] = idx_sm[0, q // 128, q % 128]

    def fn(s, order):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.SMEM((2, 2, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(s, order)

    _compile(fn, jnp.zeros((4,), jnp.int32), jnp.zeros((M, 128), jnp.int32))


def exp_row64(jnp, pl, pltpu):
    """(1, 64) f32 single-row DMA from a (P, 64) table — half-lane rows.
    If legal AND dense in HBM, packing _PK=64 halves gather bytes."""
    import jax

    P = 300_000

    def kernel(s_ref, table_ref, o_ref, buf, sem):
        idx = s_ref[0]
        pltpu.make_async_copy(
            table_ref.at[pl.ds(idx, 1)], buf.at[0, pl.ds(0, 1)], sem
        ).start()
        pltpu.make_async_copy(
            table_ref.at[pl.ds(idx, 1)], buf.at[0, pl.ds(0, 1)], sem
        ).wait()
        o_ref[0, :] = buf[0, 0, :]

    def fn(s, table):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 64), lambda i, r: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 1, 64), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, 64), jnp.float32),
        )(s, table)

    _compile(fn, jnp.zeros((4,), jnp.int32), jnp.zeros((P, 64), jnp.float32))


EXPERIMENTS = ["idx32", "idx1024", "idx2d", "row1", "row1_loop", "row8", "row64"]


def run_one(name: str, platform: str) -> tuple[bool, str]:
    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform(platform)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fn = globals()[f"exp_{name}"]
    try:
        fn(jnp, pl, pltpu)
        return True, ""
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        for line in msg.splitlines():
            if "Mosaic" in line or "aligned" in line or "slice" in line.lower():
                return False, line.strip()[:300]
        return False, msg.splitlines()[0][:300] if msg else type(e).__name__


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="axon")
    ap.add_argument("--exp", default=None, choices=EXPERIMENTS)
    ap.add_argument("--child", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        ok, err = run_one(args.child, args.platform)
        print(f"EXP {args.child} {'OK' if ok else 'FAIL'} {err}", flush=True)
        sys.exit(0 if ok else 1)

    import subprocess

    exps = [args.exp] if args.exp else EXPERIMENTS
    for name in exps:
        # one subprocess per experiment: a poisoned backend or fatal
        # compile error must not sink the rest
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--platform", args.platform, "--child", name],
            capture_output=True, text=True, timeout=600,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("EXP ")]
        if line:
            print(line[-1], flush=True)
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()
            print(f"EXP {name} CRASH {tail[-1][:200] if tail else ''}",
                  flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
