"""On-chip probe: which formulation of the deformer's static gather is fast?

The deform stage measured 21.2 ms for 9 (B=1, N=262k)-from-(B=1, V=10.6k)
component gathers (outputs/bench/tpu_diag_r4_deform) — the ENTIRE per-frame
deformation cost beyond ehm_forward. All indices are static per avatar, so
any static routing structure is fair game. Variants:

  g_b1       vx[:, f] with B=1 leading (the current deformer form)
  g_flat     flat 1-D x[f] per component
  g_take     jnp.take(x, f) per component
  g_rows16   one (N,16)-row gather from (V,16) packed components
  expand     block-sparse one-hot einsum (Nb,1024,W)bf16 @ (Nb,W,C) windows
             (the proposed MXU replacement; W=256 window, hi/lo bf16 split)

    python tools/gather_probe.py [--platform axon]
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
C = 12


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
    x = jnp.asarray(rng.uniform(0, 1, (V,)), jnp.float32)
    xb = x[None]
    x16 = jnp.asarray(rng.uniform(0, 1, (V, 16)), jnp.float32)
    f_np = [rng.integers(0, V, N).astype(np.int32) for _ in range(9)]
    fs = [jnp.asarray(a) for a in f_np]
    f = fs[0]
    f_sorted = jnp.asarray(np.sort(f_np[0]))

    # 9 DISTINCT index arrays (CSE-proof) over 9 distinct source slices
    def g_b1(xb_, *fs_):
        return sum(xb_[:, fi] * (i + 1) for i, fi in enumerate(fs_))

    def g_flat(x_, *fs_):
        return sum(x_[fi] * (i + 1) for i, fi in enumerate(fs_))

    def g_take(x_, *fs_):
        return sum(jnp.take(x_, fi, axis=0) * (i + 1)
                   for i, fi in enumerate(fs_))

    def g_rows16(x16_, f_):
        return x16_[f_]

    def g_1(x_, f_):
        return x_[f_]

    _timeit("g_b1 9x (1,N)<-(1,V)", jax.jit(g_b1), xb, *fs)
    _timeit("g_flat 9x (N,)<-(V,)", jax.jit(g_flat), x, *fs)
    _timeit("g_take 9x (N,)<-(V,)", jax.jit(g_take), x, *fs)
    _timeit("g_rows16 (N,16)<-(V,16)", jax.jit(g_rows16), x16, f)
    _timeit("g_1 single (N,)<-(V,)", jax.jit(g_1), x, f)
    _timeit("g_1 sorted idx", jax.jit(g_1), x, f_sorted)

    # --- block-sparse expand prototype: windows + one-hot einsum ---
    Nb, K, W = 256, 1024, 256
    s = W // 2   # stride; windows overlap by 2x (concat of 2 shifted reshapes)
    Fp = (Nb + 1) * s  # one chunk per block plus the overlap tail
    Gm = np.zeros((Nb, K, W), np.float16)  # placeholder one-hot density
    # emulate realistic one-hot: each row one 1 at a pseudo-random col
    cols = rng.integers(0, W, (Nb, K))
    Gm[np.arange(Nb)[:, None], np.arange(K)[None, :], cols] = 1.0
    G = jnp.asarray(Gm, jnp.bfloat16)
    fv = jnp.asarray(rng.uniform(0, 1, (Fp, C)), jnp.float32)

    def expand(fv_, G_):
        rs = fv_.reshape(-1, s, C)                       # (Fp/s, s, C)
        # windows: block b covers rows [b, b+2) of rs -> (Nb, 2s=W, C)
        Vw = jnp.concatenate([rs[:Nb], rs[1:Nb + 1]], axis=1)
        hi = Vw.astype(jnp.bfloat16)
        lo = (Vw - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = (
            jnp.einsum("bkw,bwc->bkc", G_, hi,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bkw,bwc->bkc", G_, lo,
                         preferred_element_type=jnp.float32)
        )
        return out

    _timeit(f"expand einsum ({Nb},{K},{W})x{C}c hi/lo", jax.jit(expand), fv, G)

    # step-1 cost: 9 (F,)-from-(V,) gathers
    ff = jnp.asarray(rng.integers(0, V, F).astype(np.int32))

    def g_step1(x_, f_):
        return sum(x_[f_] for _ in range(9))

    _timeit("step1 9x (F,)<-(V,)", jax.jit(g_step1), x, ff)

    # texel-tile block transpose cost: (512,512,C)->(256,1024,C) and back
    img = jnp.asarray(rng.uniform(0, 1, (512, 512, C)), jnp.float32)

    def blockize(im):
        t = im.reshape(16, 32, 16, 32, C).transpose(0, 2, 1, 3, 4)
        b = t.reshape(256, 1024, C)
        back = b.reshape(16, 16, 32, 32, C).transpose(0, 2, 1, 3, 4)
        return back.reshape(512, 512, C)

    _timeit("blockize+unblockize (512,512,C)", jax.jit(blockize), img)


if __name__ == "__main__":
    main()
