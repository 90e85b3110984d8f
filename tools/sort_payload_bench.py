"""Payload-carrying instance sort probe (rasterizer v2 feasibility).

The blend kernel's row gather is DMA-descriptor-issue bound (~53-61 ns/row
regardless of banks or row width, outputs/bench/tpu_window_r7/dma_bench.log).
The structural escape is to stop gathering: carry the per-gaussian payload
THROUGH the instance sort (jax.lax.sort moves every operand each pass) so
the blend streams contiguous (chunk, lanes) blocks instead of issuing one
descriptor per instance. This probe prices that sort on-chip:

  key_gid     (key, gid)                      — today's bigsort (baseline)
  key_6f      + 6 f32 geometry                — x, y, conic a/b/c, alpha
  key_full    + 6 f32 + 17 i32 (34 bf16 lanes)— colors+invdepth packed in pairs
  key_24f     + 23 f32                        — unpacked f32 colors (upper bound)
  presort_pay P-row depth presort carrying the same 23 payloads

and measures the contiguous block-stream read the new blend would do:

  stream      (M, 128) f32 read in (512, 128) double-buffered block DMAs

Decision rule: v2 wins if  sort(key_full) - sort(key_gid) + stream
               <  rows * ~42 ns (the measured fused-gather blend cost).

    python tools/sort_payload_bench.py [--platform axon] [--rows 809984]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, reps=3, iters=4):
    import jax

    f = jax.jit(fn)
    t0 = time.time()
    c = f.lower(*args).compile()
    tc = time.time() - t0
    float(c(*args))  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(c(*args))
        best = min(best, (time.time() - t0) / iters)
    print(f"[{name:12s}] compile={tc:5.1f}s steady={best*1e3:8.2f}ms",
          flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="axon")
    ap.add_argument("--rows", type=int, default=809984)  # parity M (0.81M)
    ap.add_argument("--p", type=int, default=272384)     # parity P
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument("--variants", default="key_gid,key_6f,key_full,key_24f,"
                    "presort_pay,stream")
    args = ap.parse_args()

    from guava_renderer_tpu.utils.platform import pin_platform
    pin_platform(args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    M, P = args.rows, args.p
    ITERS = 4
    want = set(args.variants.split(","))

    def sort_bench(n, nf32, ni32, label):
        key = jnp.asarray(rng.integers(0, 1 << 30, n), jnp.int32)
        gid = jnp.asarray(rng.integers(0, P, n), jnp.int32)
        f32s = [jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
                for _ in range(nf32)]
        i32s = [jnp.asarray(rng.integers(0, 1 << 30, n), jnp.int32)
                for _ in range(ni32)]

        def fn(key, gid, *ops):
            def body(i, acc):
                k = key + i  # data dependency: fresh sort each iter
                out = jax.lax.sort((k, gid, *ops), num_keys=1)
                return acc + out[0][0].astype(jnp.float32) + out[1][-1]
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        timeit(label, fn, key, gid, *f32s, *i32s)

    if "key_gid" in want:
        sort_bench(M, 0, 0, "key_gid")
    if "key_6f" in want:
        sort_bench(M, 6, 0, "key_6f")
    if "key_full" in want:
        sort_bench(M, 6, 17, "key_full")
    if "key_24f" in want:
        sort_bench(M, 23, 0, "key_24f")
    if "presort_pay" in want:
        sort_bench(P, 23, 1, "presort_pay")

    if "stream" in want:
        BLK = 512
        nblk = M // BLK
        table = jnp.asarray(rng.uniform(0, 1, (nblk * BLK, 128)), jnp.float32)

        def kernel(t_hbm, o_ref, buf, sems, acc):
            c0 = pl.program_id(0)

            @pl.when(c0 == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)
                pltpu.make_async_copy(
                    t_hbm.at[pl.ds(0, BLK)], buf.at[0], sems.at[0]).start()

            @pl.when(c0 + 1 < nblk)
            def _():
                pltpu.make_async_copy(
                    t_hbm.at[pl.ds((c0 + 1) * BLK, BLK)],
                    buf.at[(c0 + 1) % 2], sems.at[(c0 + 1) % 2]).start()

            pltpu.make_async_copy(
                t_hbm.at[pl.ds(c0 * BLK, BLK)], buf.at[c0 % 2],
                sems.at[c0 % 2]).wait()
            acc[:] = acc[:] + jnp.sum(buf[c0 % 2], axis=0, keepdims=True)

            @pl.when(c0 == nblk - 1)
            def _():
                o_ref[:] = acc[:]

        interpret = jax.default_backend() != "tpu"
        stream = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 128), lambda c: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, BLK, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((1, 128), jnp.float32),
            ],
            interpret=interpret,
        )

        def fn(t):
            def body(i, acc):
                # 1-element dynamic-update keeps a data dependency between
                # iters without an O(M) elementwise pass
                return acc + stream(t.at[0, 0].add(acc * 1e-20))[0, 0]
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        dt = timeit("stream", fn, table)
        nb = nblk * BLK * 128 * 4
        print(f"[stream] {nb/1e6:.0f} MB/iter -> {nb/dt/1e9:.0f} GB/s "
              f"({dt/ (nblk*BLK) * 1e9:.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
