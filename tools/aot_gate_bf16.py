"""AOT Mosaic gate for the bf16-row blend kernel (settings.bf16_rows).

Interpret mode cannot validate Mosaic DMA legality (CLAUDE.md): the
bf16 path's new surface is (1, 128)-bf16 row DMAs (256 B) into a bf16
VMEM scratch + lane-sliced bf16 compute. This lowers + compiles the
forward AND backward blend at bench shapes on the axon platform —
compile-only, ~no chip time — and prints GATE OK/FAIL.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from guava_renderer_tpu.utils.platform import pin_platform
    pin_platform("axon")

    import jax
    import jax.numpy as jnp

    from guava_renderer_tpu.ops.gsplat import _PK, blend_tiles_bf16

    P, N, T, tile, chunk = 8192, 1 << 16, 256, 32, 32
    size = 512
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (P, _PK), jnp.float32)
    order = jnp.zeros((N,), jnp.int32)
    ranges = jnp.linspace(0, N, T + 1).astype(jnp.int32)
    bg = jnp.zeros((40,), jnp.float32)

    def fwd(t_, o_, r_, b_):
        out, tt = blend_tiles_bf16(t_, o_, r_, b_, size, size, tile, chunk)
        return jnp.sum(out) + jnp.sum(tt)

    def fwdbwd(t_, o_, r_, b_):
        return jax.grad(lambda t: fwd(t, o_, r_, b_))(t_)

    for name, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
        t0 = time.time()
        try:
            jax.jit(fn).lower(table, order, ranges, bg).compile()
            print(f"[gate] {name}: COMPILE OK ({time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[gate] {name}: FAIL {type(e).__name__}: "
                  f"{str(e)[:800]}", flush=True)
            return 1
    print("GATE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
