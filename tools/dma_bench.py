"""Row-gather DMA throughput micro-bench (the blend kernel's bottleneck).

stage blend (window 20260817_011351) measured ~630 ns/instance with no
early exit — descriptor-bound, not bandwidth-bound (32 x 512 B row DMAs
per chunk). This bench isolates the gather loop and compares:

  contig   one (G,128) contiguous DMA per chunk (lower bound, old layout)
  rows1    G row DMAs, one semaphore bank (the current kernel)
  rowsB<k> G row DMAs spread over k semaphore banks, one byte-counted
           wait per bank — tests whether Mosaic maps distinct semaphores
           to distinct DMA queues (parallel descriptor processing)

    python tools/dma_bench.py [--platform axon] [--rows 262144]

Timing: in-jit fori loop with an index-data dependency and scalar fetch
(tunnel RTT amortized, no output transfer).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G = 32
_PK = 128


def build(platform, rows, p_rows):
    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform(platform)
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.uniform(0, 1, (p_rows, _PK)), jnp.float32)
    # -2: the rows_pipe_2rows variant reads (idx, idx+1) pairs
    idx = rng.integers(0, p_rows - 2, rows).astype(np.int32)
    M = -(-rows // 128) + 2
    idx2d = np.zeros((M, 128), np.int32)
    idx2d.reshape(-1)[:rows] = idx
    return table, jnp.asarray(idx2d)


def make_pipelined(name, rows):
    """Double-buffered row gather across a 1-D grid — the production
    kernel's structure (start c+1 in the other slot, wait c, consume) —
    measuring true pipelined ns/row instead of bare DMA latency.

    rows_pipe_bf16: same gather over a bf16 table (256 B rows) — if this
    halves ns/row the gather is byte/transaction-bound and a hi/lo bf16
    packed-row layout buys ~2x in the blend; if not it is descriptor-
    issue-bound and only FEWER rows help.
    rows_pipe_2rows: one (2,128) DMA per two instances (half the
    descriptors, same bytes) — the upper bound for any row-pairing scheme."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunks = rows // G
    dt = jnp.bfloat16 if name == "rows_pipe_bf16" else jnp.float32
    pair = name == "rows_pipe_2rows"

    def kernel(idx_hbm, table_hbm, o_ref, buf, sems, idx_sm, osems, acc_ref):
        c0 = pl.program_id(0)

        def idx_dma(slot, c):
            return pltpu.make_async_copy(
                idx_hbm.at[pl.ds((c * G) // 128, 2)], idx_sm.at[slot],
                osems.at[slot],
            )

        def rows_start(slot, c):
            o = jax.lax.rem(c * G, 128)
            if pair:
                for g in range(0, G, 2):
                    q = o + g
                    src = table_hbm.at[pl.ds(
                        idx_sm[slot, q // 128, jax.lax.rem(q, 128)], 2)]
                    pltpu.make_async_copy(
                        src, buf.at[slot, pl.ds(g, 2)], sems.at[slot]
                    ).start()
                return
            for g in range(G):
                q = o + g
                if name == "contig_pipe":
                    src = table_hbm.at[
                        pl.ds(jax.lax.rem(c * 7, 1024) * G + g, 1)]
                else:
                    src = table_hbm.at[
                        pl.ds(idx_sm[slot, q // 128, jax.lax.rem(q, 128)], 1)]
                pltpu.make_async_copy(
                    src, buf.at[slot, pl.ds(g, 1)], sems.at[slot]
                ).start()

        def rows_wait(slot):
            pltpu.make_async_copy(
                table_hbm.at[pl.ds(0, G)], buf.at[slot], sems.at[slot]
            ).wait()

        @pl.when(c0 == 0)
        def _():
            acc_ref[0, 0] = 0.0
            idx_dma(0, 0).start()
            idx_dma(0, 0).wait()
            rows_start(0, 0)

        slot = jax.lax.rem(c0, 2)

        @pl.when(c0 + 1 < nchunks)
        def _():
            idx_dma(1 - slot, c0 + 1).start()
            idx_dma(1 - slot, c0 + 1).wait()
            rows_start(1 - slot, c0 + 1)

        rows_wait(slot)
        acc_ref[0, 0] += buf[slot, 0, 0].astype(jnp.float32)

        @pl.when(c0 == nchunks - 1)
        def _():
            o_ref[0, 0] = acc_ref[0, 0]

    def fn(idx2d, table):
        return pl.pallas_call(
            kernel,
            grid=(nchunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, G, _PK), dt),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((2, 2, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((1, 1), jnp.float32),
            ],
            interpret=jax.default_backend() != "tpu",
        )(idx2d, table.astype(dt))

    return fn


def make_variant(name, banks, rows):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if name in ("rows_pipe", "contig_pipe", "rows_pipe_bf16",
                "rows_pipe_2rows"):
        return make_pipelined(name, rows)

    nchunks = rows // G

    def kernel(idx_hbm, table_hbm, o_ref, buf, sems, idx_sm, osems, acc_ref):
        c0 = pl.program_id(0)

        def idx_dma():
            return pltpu.make_async_copy(
                idx_hbm.at[pl.ds((c0 * G) // 128, 2)], idx_sm.at[0],
                osems,
            )

        idx_dma().start()
        idx_dma().wait()
        o = jax.lax.rem(c0 * G, 128)

        if name == "contig":
            cp = pltpu.make_async_copy(
                table_hbm.at[pl.ds(jax.lax.rem(c0 * 7, 1024) * G, G)],
                buf.at[0], sems.at[0, 0],
            )
            cp.start()
            cp.wait()
        else:
            for g in range(G):
                q = o + g
                pltpu.make_async_copy(
                    table_hbm.at[
                        pl.ds(idx_sm[0, q // 128, jax.lax.rem(q, 128)], 1)],
                    buf.at[0, pl.ds(g, 1)],
                    sems.at[0, g % banks],
                ).start()
            per = G // banks
            for b in range(banks):
                pltpu.make_async_copy(
                    table_hbm.at[pl.ds(0, per)],
                    buf.at[0, pl.ds(0, per)],
                    sems.at[0, b],
                ).wait()

        @pl.when(c0 == 0)
        def _():
            acc_ref[0, 0] = 0.0

        acc_ref[0, 0] += buf[0, 0, 0]

        @pl.when(c0 == nchunks - 1)
        def _():
            o_ref[0, 0] = acc_ref[0, 0]

    def fn(idx2d, table):
        return pl.pallas_call(
            kernel,
            grid=(nchunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((1, G, _PK), jnp.float32),
                pltpu.SemaphoreType.DMA((1, max(banks, 1))),
                pltpu.SMEM((1, 2, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((1, 1), jnp.float32),
            ],
            interpret=jax.default_backend() != "tpu",
        )(idx2d, table)

    return fn


def run_variant(name, banks, rows, table, idx2d, reps=3, iters=4):
    import jax
    import jax.numpy as jnp

    fn = make_variant(name, banks, rows)

    @jax.jit
    def run(seed):
        def body(i, acc):
            idx_dep = idx2d + (acc * 1e-30).astype(jnp.int32)
            return acc + fn(idx_dep, table)[0, 0] * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(seed) * 0.0)

    t0 = time.time()
    float(run(0))
    tc = time.time() - t0
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.time()
        float(run(r))
        best = min(best, (time.time() - t0) / iters)
    ns_row = best / rows * 1e9
    print(f"[{name:8s} banks={banks}] compile={tc:5.1f}s "
          f"steady={best*1000:7.2f}ms  {ns_row:7.1f} ns/row", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="axon")
    ap.add_argument("--rows", type=int, default=262144)
    ap.add_argument("--p-rows", type=int, default=262144)
    ap.add_argument("--variants", default="rows_pipe:1,rows_pipe_bf16:1,rows_pipe_2rows:1,contig_pipe:1",
                    help="comma list of name:banks")
    ap.add_argument("--skip-probe", action="store_true",
                    help="accepted for playbook symmetry (no probe here)")
    args = ap.parse_args()

    table, idx2d = build(args.platform, args.rows, args.p_rows)
    pairs = [(v.split(":")[0], int(v.split(":")[1]))
             for v in args.variants.split(",")]
    for name, banks in pairs:
        try:
            run_variant(name, banks, args.rows, table, idx2d)
        except Exception as e:  # noqa: BLE001
            print(f"[{name} banks={banks}] FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
