"""Probe round 2: transposed expand einsum + small-row gathers for step-1.

Round-1 findings (/tmp/gather_probe2.log, committed to DEVLOG below):
  9 scalar gathers (N=262k)      23.96 ms   <- the deformer today
  one (N,16) f32 row gather       5.36 ms   <- small rows are FINE
  expand einsum (...,W)@(...,C=12)  5.01 ms <- minor dim 12 wastes MXU lanes
  blockize transpose roundtrip    4.25 ms   <- avoid: keep block order

This round: (a) the TRANSPOSED expand 'bcw,bwk->bck' with K=1024 minor
(full lanes), (b) (F,16) row gathers for the verts->faces step, (c) the
full window-construction + expand chain.

    python tools/gather_probe2.py [--platform axon]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 512 * 512
V = 10601
F = 21076


def _timeit(label, fn, *args, reps=3, iters=8):
    import jax
    import jax.numpy as jnp

    def scalarize(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    @jax.jit
    def run(seed):
        def body(i, acc):
            a = list(args)
            a[0] = a[0] + (acc * 1e-30 + i * 0.0).astype(a[0].dtype)
            return acc + scalarize(fn(*a)) * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(seed) * 0.0)

    t0 = time.time()
    float(run(0))
    t_compile = time.time() - t0
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.time()
        float(run(r))
        best = min(best, (time.time() - t0) / iters)
    print(f"[{label}] compile+first={t_compile:.1f}s steady={best*1000:.2f}ms"
          f" (x{iters} in-jit)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="axon")
    args = ap.parse_args()
    from guava_renderer_tpu.utils.platform import pin_platform

    pin_platform(args.platform)
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # (a) transposed expand: values (Nb, C, W) @ one-hot (Nb, W, K)
    Nb, K, W, C = 256, 1024, 256, 20
    Gm = np.zeros((Nb, W, K), np.float32)
    rows = rng.integers(0, W, (Nb, K))
    Gm[np.arange(Nb)[:, None], rows, np.arange(K)[None, :]] = 1.0
    G = jnp.asarray(Gm, jnp.bfloat16)
    vals = jnp.asarray(rng.uniform(0, 1, (Nb, C, W)), jnp.float32)

    def expand_T(vals_, G_):
        hi = vals_.astype(jnp.bfloat16)
        lo = (vals_ - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (
            jnp.einsum("bcw,bwk->bck", hi, G_,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bcw,bwk->bck", lo, G_,
                         preferred_element_type=jnp.float32)
        )

    _timeit(f"expand_T ({Nb},{C},{W})@({Nb},{W},{K}) hi/lo", jax.jit(expand_T),
            vals, G)

    def expand_T_bf16(vals_, G_):
        return jnp.einsum("bcw,bwk->bck", vals_.astype(jnp.bfloat16), G_,
                          preferred_element_type=jnp.float32)

    _timeit("expand_T single bf16 pass", jax.jit(expand_T_bf16), vals, G)

    # (b) step-1: 3 (F,16)-row gathers from (V,16)
    x16 = jnp.asarray(rng.uniform(0, 1, (V, 16)), jnp.float32)
    fb = [jnp.asarray(rng.integers(0, V, F).astype(np.int32)) for _ in range(3)]

    def step1_rows(x16_, f0, f1, f2):
        return x16_[f0] + 2.0 * x16_[f1] + 3.0 * x16_[f2]

    _timeit("step1 3x (F,16)<-(V,16) rows", jax.jit(step1_rows), x16, *fb)

    # (b2) (N,16) row gather in bf16 (half the bytes)
    x16b = x16.astype(jnp.bfloat16)
    fN = jnp.asarray(rng.integers(0, V, N).astype(np.int32))

    def rowsN_bf16(x_, f_):
        return x_[f_]

    _timeit("(N,16)<-(V,16) rows bf16", jax.jit(rowsN_bf16), x16b, fN)
    _timeit("(N,16)<-(V,16) rows f32", jax.jit(rowsN_bf16), x16, fN)

    # (c) full chain: pad faces -> strided windows (comps-major) -> expand
    s = W // 2
    Fp = (Nb + 1) * s
    fvC = jnp.asarray(rng.uniform(0, 1, (C, Fp)), jnp.float32)

    def chain(fvC_, G_):
        rs = fvC_.reshape(C, Nb + 1, s)
        Vw = jnp.concatenate([rs[:, :Nb, :], rs[:, 1:Nb + 1, :]], axis=2)
        Vw = jnp.transpose(Vw, (1, 0, 2))  # (Nb, C, W)
        hi = Vw.astype(jnp.bfloat16)
        lo = (Vw - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (
            jnp.einsum("bcw,bwk->bck", hi, G_,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bcw,bwk->bck", lo, G_,
                         preferred_element_type=jnp.float32)
        )

    _timeit("chain window+expand_T", jax.jit(chain), fvC, G)


if __name__ == "__main__":
    main()
