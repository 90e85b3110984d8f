"""Duplication-cap fidelity on a trained-avatar-like stress scene
(VERDICT r2 item 5).

The CUDA reference duplicates every gaussian into EVERY tile its rect
touches (ref: rasterizer_impl.cu:292-301 — no cap). Our static-shape
binning caps duplication; a flat cap of 8 measured -15 dB on this scene's
fat tail of big splats. The size-classed path (small cap for everyone +
a big cap for the `large_k` biggest rects) must be exact here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guava_renderer_tpu.core.cameras import Camera
from guava_renderer_tpu.ops.gsplat import RasterizeSettings, rasterize
from guava_renderer_tpu.ops.gsplat_reference import rasterize_reference

SIZE = 96
P = 600


@pytest.fixture(scope="module")
def stress_scene():
    """Clustered splats, log-normal scale mixture: 85% sub-tile, 10%
    medium, 5% large (multi-tile rects that overflow a flat cap)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 0.25, (P, 3)).astype(np.float32)
    centers[:, 2] = 4.0 + rng.uniform(-0.5, 0.5, P)
    u = rng.uniform(0, 1, P)
    s = np.where(
        u < 0.85, rng.lognormal(-4.2, 0.3, P),
        np.where(u < 0.95, rng.lognormal(-3.0, 0.3, P),
                 rng.lognormal(-1.9, 0.4, P)),
    ).astype(np.float32)
    scales = np.stack(
        [s, s * rng.lognormal(0, 0.2, P), s * rng.lognormal(0, 0.2, P)], -1
    ).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = rng.uniform(0, 1, (P, 32)).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.normal(-1.0, 1.5, P)))).astype(np.float32)[:, None]
    cam = Camera(R=jnp.eye(3), t=jnp.zeros(3),
                 tanfovx=jnp.asarray(0.33), tanfovy=jnp.asarray(0.33),
                 width=SIZE, height=SIZE)
    bg = jnp.zeros(32)
    args = tuple(map(jnp.asarray, (centers, colors, opac, scales, quats)))
    ref, _, _ = rasterize_reference(*args, cam, bg)
    return args, cam, bg, np.asarray(ref)


def _psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)


def test_flat_cap_truncates_fat_tail(stress_scene):
    """Documents the failure mode: a flat ROW-MAJOR cap of 8 loses
    big-splat cores (tile_cull=False disables the priority duplication
    that otherwise keeps the strongest tiles)."""
    args, cam, bg, ref = stress_scene
    out, _, _ = jax.jit(lambda *a: rasterize(
        *a, cam, bg, RasterizeSettings(tile=16, chunk=8, tile_cull=False,
                                       max_tiles_per_gaussian=8)))(*args)
    assert _psnr(np.asarray(out), ref) < 40.0, \
        "stress scene no longer stresses the flat cap — regenerate it"


def test_priority_duplication_beats_row_major_under_cap(stress_scene):
    """With the cull params present, the cap keeps the strongest tiles
    (q-min priority): the same flat cap of 8 must render far closer to the
    oracle than the row-major truncation above."""
    args, cam, bg, ref = stress_scene
    st = RasterizeSettings(tile=16, chunk=8, max_tiles_per_gaussian=8)
    out, _, _ = jax.jit(lambda *a: rasterize(*a, cam, bg, st))(*args)
    out_rm, _, _ = jax.jit(lambda *a: rasterize(
        *a, cam, bg, st._replace(tile_cull=False)))(*args)
    p_pri = _psnr(np.asarray(out), ref)
    p_rm = _psnr(np.asarray(out_rm), ref)
    assert p_pri > p_rm + 6.0, (p_pri, p_rm)


def test_size_classed_duplication_is_exact(stress_scene):
    """parity-style settings: small cap 4 + large class -> oracle-exact."""
    args, cam, bg, ref = stress_scene
    st = RasterizeSettings(tile=16, chunk=8, max_tiles_per_gaussian=4,
                           large_k=64, tpg_large=64)
    out, _, _ = jax.jit(lambda *a: rasterize(*a, cam, bg, st))(*args)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
    assert _psnr(np.asarray(out), ref) > 60.0


def test_size_classed_gradients_flow(stress_scene):
    """The top_k promotion is on stop_gradient geometry; grads must still
    flow to all inputs (promoted and base class alike)."""
    args, cam, bg, _ = stress_scene
    st = RasterizeSettings(tile=16, chunk=8, max_tiles_per_gaussian=4,
                           large_k=64, tpg_large=64)

    def loss(m, c, o, s, q):
        col, _, _ = rasterize(m, c, o, s, q, cam, bg, st)
        return jnp.sum(col ** 2)

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(*args)
    for g, name in zip(grads, ("means", "colors", "opac", "scales", "quats")):
        assert bool(jnp.all(jnp.isfinite(g))), name
        assert float(jnp.abs(g).max()) > 0, name

def test_truncation_counter(stress_scene):
    """num_truncated (VERDICT r2 item 6) turns the silent cap into a
    number: positive under the flat cap that visibly truncates, zero at
    the size-classed parity settings that are oracle-exact."""
    from guava_renderer_tpu.ops.gsplat import ALPHA_MIN, bin_gaussians
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians

    args, cam, bg, _ = stress_scene
    means, colors, opac, scales, quats = args

    def count(st):
        proj = project_gaussians(means, scales, quats, opac, cam,
                                 st.scale_modifier, st.antialiasing)
        contributing = proj.valid & (proj.alpha.reshape(-1) >= ALPHA_MIN)
        _, _, nv, ntr = jax.jit(
            lambda m, d, r, v: bin_gaussians(m, d, r, v, SIZE, SIZE, st)
        )(proj.mean2d, proj.depth, proj.radius_bin, contributing)
        return int(nv), int(ntr)

    nv_flat, ntr_flat = count(RasterizeSettings(
        tile=16, chunk=8, max_tiles_per_gaussian=8))
    assert ntr_flat > 0, "flat cap should truncate the stress scene"

    nv_sc, ntr_sc = count(RasterizeSettings(
        tile=16, chunk=8, max_tiles_per_gaussian=4, large_k=64, tpg_large=64))
    assert ntr_sc == 0, f"size-classed parity settings truncate {ntr_sc}"
    assert nv_sc == nv_flat + ntr_flat  # counter is exactly the shortfall

    # a global instance budget below num_valid is counted too
    nv_b, ntr_b = count(RasterizeSettings(
        tile=16, chunk=8, max_tiles_per_gaussian=4, large_k=64, tpg_large=64,
        instance_budget=nv_sc - 100))
    assert ntr_b == 100


def test_tile32_parity_quality(stress_scene):
    """The parity config runs tile 32 (fewer duplicates, +8% on-chip).
    Tile size only changes binning granularity/cap geometry, not blending:
    quality vs the dense oracle must stay far above the 0.5 dB budget."""
    args, cam, bg, ref = stress_scene
    st = RasterizeSettings(tile=32, chunk=8, max_tiles_per_gaussian=2,
                           large_k=64, tpg_large=64)
    out, _, _ = jax.jit(lambda *a: rasterize(*a, cam, bg, st))(*args)
    assert _psnr(np.asarray(out), ref) > 60.0


def test_tile_cull_lossless_and_effective(stress_scene):
    """The exact tile cull (settings.tile_cull) must (a) remove a real
    fraction of instances on the stress scene's big anisotropic splats and
    (b) leave the render within f32 re-association noise of the uncull'd
    one (culled instances have max alpha < 1/255 over their tile, which the
    blend skips per pixel anyway — forward.cu:358-360; the only delta is
    cumprod chunk regrouping)."""
    from guava_renderer_tpu.ops.gsplat import ALPHA_MIN, bin_gaussians
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians

    args, cam, bg, ref = stress_scene
    means, colors, opac, scales, quats = args

    def run(st, presort):
        st = st._replace(presort=presort)
        out, _, _ = jax.jit(lambda *a: rasterize(*a, cam, bg, st))(*args)
        proj = project_gaussians(means, scales, quats, opac, cam)
        contributing = proj.valid & (proj.alpha.reshape(-1) >= ALPHA_MIN)
        _, _, nv, ntr = jax.jit(
            lambda m, d, r, v, c2, al: bin_gaussians(
                m, d, r, v, SIZE, SIZE, st, conic=c2, alpha=al)
        )(proj.mean2d, proj.depth, proj.radius_bin, contributing,
          proj.conic, proj.alpha)
        return np.asarray(out), int(nv), int(ntr)

    base = RasterizeSettings(tile=16, chunk=8, max_tiles_per_gaussian=4,
                             large_k=64, tpg_large=64)
    for presort in (True, False):
        out_cull, nv_cull, ntr_cull = run(base._replace(tile_cull=True), presort)
        out_rect, nv_rect, ntr_rect = run(base._replace(tile_cull=False), presort)
        assert nv_cull < nv_rect, (nv_cull, nv_rect)
        # truncation counts cap losses only (pre-cull), identical either way
        assert ntr_cull == ntr_rect == 0
        np.testing.assert_allclose(out_cull, out_rect, atol=2e-5)
        assert _psnr(out_cull, ref) > 60.0


def test_multiclass_duplication_is_exact(stress_scene):
    """size_classes ladder (generalized large_k): oracle-exact with far
    fewer static sort rows than one huge flat class. 3 classes + base."""
    args, cam, bg, ref = stress_scene
    st = RasterizeSettings(tile=16, chunk=8, max_tiles_per_gaussian=2,
                           size_classes=((16, 64), (48, 24), (96, 8)))
    out, _, _ = jax.jit(lambda *a: rasterize(*a, cam, bg, st))(*args)
    assert _psnr(np.asarray(out), ref) > 60.0


def test_multiclass_truncation_counter_and_rows(stress_scene):
    """the ladder reaches zero truncation; a too-short ladder reports the
    shortfall (never silently)."""
    from guava_renderer_tpu.ops.gsplat import ALPHA_MIN, bin_gaussians
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians

    args, cam, bg, _ = stress_scene
    means, colors, opac, scales, quats = args

    def count(st):
        proj = project_gaussians(means, scales, quats, opac, cam,
                                 st.scale_modifier, st.antialiasing)
        contributing = proj.valid & (proj.alpha.reshape(-1) >= ALPHA_MIN)
        ranges, order, nv, ntr = jax.jit(
            lambda m, d, r, v: bin_gaussians(m, d, r, v, SIZE, SIZE, st)
        )(proj.mean2d, proj.depth, proj.radius_bin, contributing)
        return int(nv), int(ntr), int(order.shape[0])

    nv, ntr, rows = count(RasterizeSettings(
        tile=16, chunk=8, max_tiles_per_gaussian=2,
        size_classes=((16, 64), (48, 24), (96, 8))))
    assert ntr == 0, f"ladder should be truncation-free, lost {ntr}"
    # static rows: classed gaussians leave the base slice entirely
    # (ranked-slice binning), so the base contributes (P - classed)*tpg
    assert rows == (P - 16 - 48 - 96) * 2 + 16 * 64 + 48 * 24 + 96 * 8

    nv2, ntr2, _ = count(RasterizeSettings(
        tile=16, chunk=8, max_tiles_per_gaussian=2,
        size_classes=((8, 16),)))
    assert ntr2 > 0
    assert nv2 + ntr2 == nv + ntr


def test_multiclass_gradients_flow(stress_scene):
    args, cam, bg, _ = stress_scene
    st = RasterizeSettings(tile=16, chunk=8, max_tiles_per_gaussian=2,
                           size_classes=((16, 64), (48, 24), (96, 8)))

    def loss(m, c, o, s, q):
        col, _, _ = rasterize(m, c, o, s, q, cam, bg, st)
        return jnp.sum(col ** 2)

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(*args)
    for g, name in zip(grads, ("means", "colors", "opac", "scales", "quats")):
        assert bool(jnp.all(jnp.isfinite(g))), name
        assert float(jnp.abs(g).max()) > 0, name


def test_vmem_classes_matches_dma_path(stress_scene):
    """VMEM-resident classed table: forward must be BIT-identical to the
    all-DMA multiclass path (ltable rows are the same f32 values), and
    gradients must match exactly (the backward is the identical RMW kernel
    driven by the original ids)."""
    args, cam, bg, ref = stress_scene
    base = RasterizeSettings(tile=16, chunk=8, max_tiles_per_gaussian=2,
                             size_classes=((16, 64), (48, 24), (96, 8)))
    vm = base._replace(vmem_classes=2)

    out_d, rad_d, invd_d = jax.jit(lambda *a: rasterize(*a, cam, bg, base))(*args)
    out_v, rad_v, invd_v = jax.jit(lambda *a: rasterize(*a, cam, bg, vm))(*args)
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(out_d))
    np.testing.assert_array_equal(np.asarray(invd_v), np.asarray(invd_d))
    np.testing.assert_array_equal(np.asarray(rad_v), np.asarray(rad_d))
    assert _psnr(np.asarray(out_v), ref) > 60.0

    def loss(st):
        def f(m, c, o, s, q):
            col, _, invd = rasterize(m, c, o, s, q, cam, bg, st)
            return jnp.sum(col ** 2) + jnp.sum(invd)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))(*args)

    for gd, gv, name in zip(loss(base), loss(vm),
                            ("means", "colors", "opac", "scales", "quats")):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(gd),
                                   rtol=1e-6, atol=1e-7, err_msg=name)


def test_priority_window_zero_matches_priority_on_exact_ladder(stress_scene):
    """priority_window=0 (row-major dup, no per-row qmin sorts) renders the
    IDENTICAL image when the cap ladder is zero-truncation: every rect fits
    its cap, so the kept (gaussian, tile) instance set is the same — only
    the enumeration order differs, which the instance sort re-orders
    identically (ops/gsplat.py:_dup_tiles window=0 fast path)."""
    args, cam, bg, ref = stress_scene
    base = RasterizeSettings(tile=16, chunk=8, max_tiles_per_gaussian=2,
                             size_classes=((16, 64), (48, 24), (96, 8)))
    # the premise — this ladder truncates nothing on this scene — must
    # hold or the image comparison below fails with an opaque diff
    from guava_renderer_tpu.ops.gsplat import ALPHA_MIN, bin_gaussians
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians

    proj = project_gaussians(args[0], args[3], args[4], args[2], cam,
                             1.0, False)
    contributing = proj.valid & (proj.alpha >= ALPHA_MIN)
    *_, ntr = bin_gaussians(
        proj.mean2d, proj.depth, proj.radius_bin, contributing,
        cam.width, cam.height, base, conic=proj.conic, alpha=proj.alpha)
    assert int(ntr) == 0, f"ladder no longer zero-truncation: {int(ntr)}"
    out_p, _, _ = jax.jit(lambda *a: rasterize(
        *a, cam, bg, base._replace(priority_window=16)))(*args)
    out_rm, _, _ = jax.jit(lambda *a: rasterize(
        *a, cam, bg, base._replace(priority_window=0)))(*args)
    np.testing.assert_allclose(np.asarray(out_rm), np.asarray(out_p),
                               atol=2e-5)
    assert _psnr(np.asarray(out_rm), ref) > 60.0
