"""Gaussian rasterizer golden tests: Pallas tile kernel vs the naive dense
oracle (identical blending math), analytic scenes, and gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guava_renderer_tpu.core.cameras import Camera, look_at_camera
from guava_renderer_tpu.ops.gsplat import RasterizeSettings, rasterize
from guava_renderer_tpu.ops.gsplat_project import project_gaussians
from guava_renderer_tpu.ops.gsplat_reference import rasterize_reference

C = 32


def make_scene(rng, P=64, spread=0.5, z0=3.0, opacity_hi=0.9):
    means = np.zeros((P, 3), np.float32)
    means[:, 0] = rng.uniform(-spread, spread, P)
    means[:, 1] = rng.uniform(-spread, spread, P)
    means[:, 2] = rng.uniform(z0 - 0.5, z0 + 0.5, P)
    colors = rng.uniform(0, 1, (P, C)).astype(np.float32)
    opac = rng.uniform(0.2, opacity_hi, (P, 1)).astype(np.float32)
    scales = rng.uniform(0.02, 0.08, (P, 3)).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return tuple(jnp.asarray(x) for x in (means, colors, opac, scales, quats))


def make_cam(size=64):
    # camera at origin looking +z
    return Camera(
        R=jnp.eye(3),
        t=jnp.zeros(3),
        tanfovx=jnp.asarray(0.5),
        tanfovy=jnp.asarray(0.5),
        width=size,
        height=size,
    )


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    return make_scene(rng)


def test_pallas_matches_reference(scene):
    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    bg = jnp.linspace(0.0, 1.0, C)
    out_p, radii_p, invd_p = rasterize(
        means, colors, opac, scales, quats, cam, bg,
        RasterizeSettings(chunk=16),
    )
    out_r, radii_r, invd_r = rasterize_reference(
        means, colors, opac, scales, quats, cam, bg
    )
    np.testing.assert_array_equal(radii_p, radii_r)
    np.testing.assert_allclose(out_p, out_r, atol=2e-5)
    np.testing.assert_allclose(invd_p, invd_r, atol=2e-5)


def test_reference_window_crop(scene):
    """window=(y0,x0,h,w) must equal the same crop of the full render —
    the full-scale fidelity gate composites a 128^2 center crop this way
    (tools/crosscheck_tpu.py --full-scale)."""
    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    bg = jnp.linspace(0.0, 1.0, C)
    full, _, invd_full = rasterize_reference(
        means, colors, opac, scales, quats, cam, bg
    )
    crop, _, invd_crop = rasterize_reference(
        means, colors, opac, scales, quats, cam, bg, window=(16, 8, 32, 48)
    )
    np.testing.assert_array_equal(full[:, 16:48, 8:56], crop)
    np.testing.assert_array_equal(invd_full[:, 16:48, 8:56], invd_crop)


def test_pallas_matches_reference_dense_overlap():
    """Many overlapping near-opaque Gaussians exercise early termination."""
    rng = np.random.default_rng(11)
    means, colors, opac, scales, quats = make_scene(
        rng, P=128, spread=0.15, opacity_hi=0.999
    )
    opac = jnp.clip(opac * 1.2, 0, 0.999)
    cam = make_cam(32)
    bg = jnp.zeros(C)
    out_p, _, invd_p = rasterize(
        means, colors, opac, scales, quats, cam, bg, RasterizeSettings(chunk=8)
    )
    out_r, _, invd_r = rasterize_reference(means, colors, opac, scales, quats, cam, bg)
    np.testing.assert_allclose(out_p, out_r, atol=3e-5)
    np.testing.assert_allclose(invd_p, invd_r, atol=3e-5)


def test_empty_scene_gives_background():
    cam = make_cam(32)
    bg = jnp.linspace(0.2, 0.8, C)
    means = jnp.asarray([[0.0, 0.0, -5.0]])  # behind camera -> culled
    out, radii, invd = rasterize(
        means,
        jnp.ones((1, C)),
        jnp.ones((1, 1)),
        jnp.full((1, 3), 0.05),
        jnp.asarray([[1.0, 0, 0, 0]]),
        cam,
        bg,
    )
    assert int(radii[0]) == 0
    np.testing.assert_allclose(
        out, np.broadcast_to(np.asarray(bg)[:, None, None], (C, 32, 32)), atol=1e-6
    )
    np.testing.assert_allclose(invd, 0.0, atol=1e-7)


def test_single_gaussian_analytic():
    """One isotropic Gaussian at the center: peak alpha and color at center."""
    cam = make_cam(32)
    bg = jnp.zeros(C)
    col = jnp.ones((1, C)) * 0.7
    out, radii, invd = rasterize(
        jnp.asarray([[0.0, 0.0, 2.0]]),
        col,
        jnp.asarray([[0.8]]),
        jnp.full((1, 3), 0.08),
        jnp.asarray([[1.0, 0, 0, 0]]),
        cam,
        bg,
    )
    out = np.asarray(out)
    # center pixels = (31/2, 31/2) -> peak near pixels 15/16
    # peak sits between pixel centers (mean at 15.5): alpha there is
    # op * exp(-0.5 * 0.5 / sigma^2) with sigma_px^2 ~= (0.08*32/2)^2 + 0.3
    patch = out[0, 14:18, 14:18]
    assert patch.max() > 0.7 * 0.8 * 0.85
    # symmetric
    np.testing.assert_allclose(out[0, 15, 14], out[0, 15, 17], atol=1e-3)
    # invdepth near center ~ alpha * (1/2.0)
    assert abs(float(invd[0, 15, 15]) / float(out[0, 15, 15] / 0.7) - 0.5) < 0.01


def test_depth_ordering():
    """A front opaque Gaussian must hide one behind it."""
    cam = make_cam(32)
    bg = jnp.zeros(C)
    means = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 1.5]])
    colors = jnp.stack([jnp.ones(C), jnp.zeros(C)])
    opac = jnp.asarray([[0.99], [0.99]])
    scales = jnp.full((2, 3), 0.2)
    quats = jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    out, _, _ = rasterize(means, colors, opac, scales, quats, cam, bg)
    # the near gaussian (black) dominates: center far below 0.5
    assert float(out[0, 15, 15]) < 0.05


def test_gradients_match_reference(scene):
    means, colors, opac, scales, quats = scene
    cam = make_cam(32)
    bg = jnp.zeros(C)
    target = jnp.ones((C, 32, 32)) * 0.3

    def loss_pallas(m, c, o, s, q):
        out, _, _ = rasterize(m, c, o, s, q, cam, bg, RasterizeSettings(chunk=8))
        return jnp.mean((out - target) ** 2)

    def loss_ref(m, c, o, s, q):
        out, _, _ = rasterize_reference(m, c, o, s, q, cam, bg)
        return jnp.mean((out - target) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(means, colors, opac, scales, quats)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(means, colors, opac, scales, quats)
    names = ["means", "colors", "opac", "scales", "quats"]
    for n, a, b in zip(names, gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4, err_msg=n)


def test_gradient_finite_difference():
    rng = np.random.default_rng(3)
    means, colors, opac, scales, quats = make_scene(rng, P=8)
    cam = make_cam(16)
    bg = jnp.zeros(C)

    def loss(o):
        out, _, _ = rasterize(means, colors, o, scales, quats, cam, bg,
                              RasterizeSettings(chunk=8))
        return jnp.sum(out[:4] ** 2)

    g = jax.grad(loss)(opac)
    eps = 1e-3
    for i in [0, 3, 5]:
        do = jnp.zeros_like(opac).at[i, 0].set(eps)
        fd = (loss(opac + do) - loss(opac - do)) / (2 * eps)
        np.testing.assert_allclose(g[i, 0], fd, rtol=5e-2, atol=1e-4)


def test_projection_radius_and_depth(scene):
    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    proj = project_gaussians(means, scales, quats, opac, cam)
    assert bool(jnp.all(proj.depth[proj.valid] > 0.2))
    assert bool(jnp.all(proj.radius[proj.valid] > 0))


def test_look_at_camera_projection():
    cam = look_at_camera([0, 0, -3], [0, 0, 0], width=32, height=32)
    from guava_renderer_tpu.core.cameras import project_points

    px, z = project_points(cam, jnp.asarray([[0.0, 0.0, 0.0]]))
    np.testing.assert_allclose(z[0], 3.0, atol=1e-5)
    np.testing.assert_allclose(px[0], [15.5, 15.5], atol=1e-4)


def test_instance_budget_truncation(scene):
    """A tight instance budget must still render the nearest Gaussians
    (overflow drops the farthest within each tile ordering)."""
    means, colors, opac, scales, quats = scene
    cam = make_cam(32)
    bg = jnp.zeros(C)
    full, _, _ = rasterize(
        means, colors, opac, scales, quats, cam, bg,
        RasterizeSettings(chunk=8, max_tiles_per_gaussian=8),
    )
    tight, _, _ = rasterize(
        means, colors, opac, scales, quats, cam, bg,
        RasterizeSettings(chunk=8, max_tiles_per_gaussian=8, instance_budget=64),
    )
    assert np.isfinite(np.asarray(tight)).all()
    # budget large enough to hold everything reproduces the full render
    huge, _, _ = rasterize(
        means, colors, opac, scales, quats, cam, bg,
        RasterizeSettings(chunk=8, max_tiles_per_gaussian=8,
                          instance_budget=64 * 8 * 8 * 100),
    )
    np.testing.assert_allclose(huge, full, atol=1e-6)


def test_instance_budget_truncation_is_fair_across_tiles():
    """Over-budget scenes drop the deepest instances per tile (round-robin),
    not whole trailing tiles — the bottom image rows must keep rendering."""
    rng = np.random.default_rng(11)
    means, colors, opac, scales, quats = make_scene(rng, P=128, spread=1.2)
    cam = make_cam(64)
    bg = jnp.zeros(C)
    tight, _, _ = rasterize(
        means, colors, opac, scales, quats, cam, bg,
        RasterizeSettings(tile=16, chunk=8, max_tiles_per_gaussian=8,
                          instance_budget=96),
    )
    img = np.asarray(tight)  # (C, H, W)
    # with splats across the whole frame, every 16px tile row must show ink
    for y in range(0, 64, 16):
        assert np.abs(img[:, y : y + 16, :]).max() > 1e-3, f"tile row {y} empty"


def test_gradients_border_straddling_short_runs():
    """Regression (ADVICE r2, high): backward RMW tail slots must not erase
    real gradient accumulations.

    Splats sitting exactly on tile borders are duplicated into adjacent
    tiles; with per-tile runs shorter than the chunk, a tile's last chunk
    over-reads into the NEXT tile's instances — gaussians that may also
    appear as real slots in the same chunk. Before the dump-row redirect,
    the tail's stale write-back landed after the real accumulated gradient
    and silently erased it (observed up to 170% relative error)."""
    rng = np.random.default_rng(42)
    P = 6
    means = np.zeros((P, 3), np.float32)
    # camera at origin, fov 0.5, 32px image, tile 16: the x=16px tile
    # border is NDC x=0 -> world x=0 at any depth. Put every splat on the
    # border with enough scale to straddle both tiles.
    means[:, 0] = rng.normal(0, 0.002, P)
    means[:, 1] = rng.uniform(-0.3, 0.3, P)
    means[:, 2] = rng.uniform(2.5, 3.5, P)
    colors = jnp.asarray(rng.uniform(0, 1, (P, C)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.4, 0.9, (P, 1)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.1, 0.2, (P, 3)), jnp.float32)
    quats = np.asarray(rng.normal(size=(P, 4)), np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    means, quats = jnp.asarray(means), jnp.asarray(quats)
    cam = make_cam(32)
    bg = jnp.zeros(C)
    target = jnp.full((C, 32, 32), 0.25)
    settings = RasterizeSettings(tile=16, chunk=8, max_tiles_per_gaussian=8)

    def loss_pallas(m, c, o, s, q):
        out, _, _ = rasterize(m, c, o, s, q, cam, bg, settings)
        return jnp.mean((out - target) ** 2)

    def loss_ref(m, c, o, s, q):
        out, _, _ = rasterize_reference(m, c, o, s, q, cam, bg)
        return jnp.mean((out - target) ** 2)

    args = (means, colors, opac, scales, quats)
    # forward must already agree (the bug was gradient-only)
    out_p, _, _ = rasterize(*args, cam, bg, settings)
    out_r, _, _ = rasterize_reference(*args, cam, bg)
    np.testing.assert_allclose(out_p, out_r, atol=3e-5)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for n, a, b in zip(["means", "colors", "opac", "scales", "quats"], gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4, err_msg=n)


def test_chunk_not_divisible_by_banks_raises():
    """Regression (ADVICE r2, medium): a dma_banks that does not divide
    chunk would leave un-waited row DMAs (silent corruption on TPU)."""
    cam = make_cam(32)
    rng = np.random.default_rng(0)
    args = make_scene(rng, P=8)
    with pytest.raises(ValueError, match="divisible by dma_banks"):
        rasterize(*args, cam, jnp.zeros(C),
                  RasterizeSettings(chunk=8, dma_banks=3))


def test_zero_opacity_gaussians_are_free_and_invisible():
    """alpha < 1/255 is culled before binning with zero image effect."""
    cam = make_cam(32)
    bg = jnp.linspace(0, 1, C)
    rng2 = np.random.default_rng(5)
    means, colors, opac, scales, quats = make_scene(rng2, P=32)
    opac0 = opac.at[16:].set(0.0)  # half the splats invisible
    with_zero, _, _ = rasterize(means, colors, opac0, scales, quats, cam, bg)
    only_active, _, _ = rasterize(
        means[:16], colors[:16], opac0[:16], scales[:16], quats[:16], cam, bg
    )
    np.testing.assert_allclose(with_zero, only_active, atol=1e-6)


def test_invdepth_gradients_match_reference(scene):
    """The invdepth output is differentiable like the CUDA rasterizer's
    (ref: cuda_rasterizer/backward.cu:457-476 dL_invdepths -> means/alpha
    chain, surfaced at __init__.py:84-141): channel 32 of the packed rows
    rides the same backward paths as the colors (dcol + the alpha dot), and
    per_gauss packs invd = 1/depth differentiably (VERDICT r2 item 5)."""
    means, colors, opac, scales, quats = scene
    cam = make_cam(32)
    bg = jnp.zeros(C)
    target = jnp.full((1, 32, 32), 0.4)

    def loss_pallas(m, c, o, s, q):
        _, _, invd = rasterize(m, c, o, s, q, cam, bg, RasterizeSettings(chunk=8))
        return jnp.mean((invd - target) ** 2)

    def loss_ref(m, c, o, s, q):
        _, _, invd = rasterize_reference(m, c, o, s, q, cam, bg)
        return jnp.mean((invd - target) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 2, 3, 4))(means, colors, opac, scales, quats)
    gr = jax.grad(loss_ref, argnums=(0, 2, 3, 4))(means, colors, opac, scales, quats)
    assert any(float(jnp.abs(g).max()) > 0 for g in gp), "invdepth grads all zero"
    for n, a, b in zip(["means", "opac", "scales", "quats"], gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4, err_msg=n)


def test_nopresort_binning_matches_presort(scene):
    """settings.presort=False keys the instance sort on (tile, depth-bits)
    directly — the render must match the presorted path exactly (depths in
    the scene are distinct, so tie-breaking differences cannot appear)."""
    means, colors, opac, scales, quats = scene
    cam = make_cam(48)
    bg = jnp.linspace(0, 1, C)
    a = rasterize(means, colors, opac, scales, quats, cam, bg,
                  RasterizeSettings(chunk=8, large_k=4, tpg_large=16))
    b = rasterize(means, colors, opac, scales, quats, cam, bg,
                  RasterizeSettings(chunk=8, large_k=4, tpg_large=16,
                                    presort=False))
    for x, y, n in zip(a, b, ["color", "radii", "invdepth"]):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-6, err_msg=n)


def test_nopresort_gradients_match(scene):
    means, colors, opac, scales, quats = scene
    cam = make_cam(32)
    bg = jnp.zeros(C)

    def loss(st):
        def f(m, c, o, s, q):
            col, _, _ = rasterize(m, c, o, s, q, cam, bg, st)
            return jnp.sum(col ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(means, colors, opac, scales, quats)

    ga = loss(RasterizeSettings(chunk=8))
    gb = loss(RasterizeSettings(chunk=8, presort=False))
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_antialiasing_matches_reference_with_cull(scene):
    """antialiasing rescales alpha (forward.cu:215-223); the tile cull's
    qcut must use the rescaled alpha, so the culled render still matches
    the oracle with antialiasing on."""
    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    bg = jnp.zeros(C)
    st = RasterizeSettings(chunk=16, antialiasing=True, tile_cull=True)
    out_p, radii_p, _ = rasterize(means, colors, opac, scales, quats, cam, bg, st)
    out_r, radii_r, _ = rasterize_reference(
        means, colors, opac, scales, quats, cam, bg, antialiasing=True
    )
    np.testing.assert_array_equal(radii_p, radii_r)
    np.testing.assert_allclose(out_p, out_r, atol=2e-5)


def test_nhwc_layout_matches_chw(scene):
    """rasterize(channels_first=False) is the same image in NHWC."""
    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    bg = jnp.linspace(0.0, 1.0, C)
    st = RasterizeSettings(chunk=16)
    chw, radii_a, invd_a = rasterize(means, colors, opac, scales, quats, cam, bg, st)
    hwc, radii_b, invd_b = rasterize(
        means, colors, opac, scales, quats, cam, bg, st, channels_first=False
    )
    np.testing.assert_array_equal(np.transpose(np.asarray(chw), (1, 2, 0)), hwc)
    np.testing.assert_array_equal(np.asarray(invd_a)[0], np.asarray(invd_b)[..., 0])
    np.testing.assert_array_equal(radii_a, radii_b)


def test_peraxis_bin_extent_covers_all_contributions():
    """Brute-force guard for the per-axis binning box: every pixel where
    alpha >= 1/255 AND inside the reference's 3-sigma circle box must lie
    inside the (rx, ry) box — the oracle shares tile_rect, so this checks
    the bound itself, not oracle-vs-pallas agreement."""
    from guava_renderer_tpu.ops.gsplat import ALPHA_MIN

    rng = np.random.default_rng(11)
    P = 400
    means = np.zeros((P, 3), np.float32)
    means[:, 0] = rng.uniform(-0.6, 0.6, P)
    means[:, 1] = rng.uniform(-0.6, 0.6, P)
    means[:, 2] = rng.uniform(2.5, 4.5, P)
    # heavy anisotropy + full opacity range incl. ~1.0 (the nsig>3 regime)
    scales = np.stack([
        rng.lognormal(-3.0, 1.0, P),
        rng.lognormal(-3.0, 1.0, P) * rng.lognormal(0, 1.0, P),
        rng.lognormal(-3.0, 1.0, P) * rng.lognormal(0, 1.0, P),
    ], -1).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.004, 1.0, (P, 1)).astype(np.float32)
    cam = make_cam(96)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), cam)

    m = np.asarray(proj.mean2d)
    con = np.asarray(proj.conic)
    al = np.asarray(proj.alpha)
    r3 = np.asarray(proj.radius).astype(np.float64)
    rb = np.asarray(proj.radius_bin).astype(np.float64)  # (P, 2)
    valid = np.asarray(proj.valid)

    ys, xs = np.mgrid[0:96, 0:96].astype(np.float64)
    bad = 0
    for i in range(P):
        if not valid[i]:
            continue
        dx = m[i, 0] - xs
        dy = m[i, 1] - ys
        power = -0.5 * (con[i, 0] * dx * dx + con[i, 2] * dy * dy) - con[i, 1] * dx * dy
        contrib = (np.exp(power) * al[i] >= ALPHA_MIN) & (power <= 0)
        in_circle_box = (np.abs(dx) <= r3[i]) & (np.abs(dy) <= r3[i])
        in_axis_box = (np.abs(dx) <= rb[i, 0]) & (np.abs(dy) <= rb[i, 1])
        bad += int(np.any(contrib & in_circle_box & ~in_axis_box))
    assert bad == 0, f"{bad} gaussians have contributing pixels outside (rx, ry)"


# ---------------------------------------------------------------------------
# streaming blend path (payload-carrying sort + contiguous block DMAs)
# ---------------------------------------------------------------------------


def test_streaming_matches_base_with_bf16_colors(scene):
    """The streaming blend carries colors bf16-packed through the instance
    sort; feeding the GATHER path bf16-pre-rounded colors must reproduce the
    streaming color channels exactly (geometry rides f32 in both paths, and
    the blend weights depend only on geometry). On TPU the MXU rounds color
    inputs to bf16 in both paths anyway (see _fwd_kernel precision note), so
    streaming is lossless there; this isolates the one intended delta."""
    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    bg = jnp.linspace(0.0, 1.0, C)
    colors_bf = colors.astype(jnp.bfloat16).astype(jnp.float32)
    out_s, radii_s, invd_s = rasterize(
        means, colors, opac, scales, quats, cam, bg,
        RasterizeSettings(chunk=16, streaming=True),
    )
    out_b, radii_b, invd_b = rasterize(
        means, colors_bf, opac, scales, quats, cam, bg,
        RasterizeSettings(chunk=16, presort=False),
    )
    np.testing.assert_array_equal(radii_s, radii_b)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_b), atol=2e-6)
    # invdepth is bf16-rounded in the stream (documented delta)
    np.testing.assert_allclose(
        np.asarray(invd_s), np.asarray(invd_b), atol=2e-3)


def test_streaming_dense_overlap_and_large_k(scene):
    """Early termination + the size-classed (large_k) duplication both ride
    the payload sort; check against the dense oracle at bf16 tolerance."""
    rng = np.random.default_rng(23)
    means, colors, opac, scales, quats = make_scene(
        rng, P=128, spread=0.15, opacity_hi=0.999
    )
    opac = jnp.clip(opac * 1.2, 0, 0.999)
    cam = make_cam(32)
    bg = jnp.zeros(C)
    out_s, _, invd_s = rasterize(
        means, colors, opac, scales, quats, cam, bg,
        RasterizeSettings(chunk=8, streaming=True, large_k=4, tpg_large=16),
    )
    out_r, _, invd_r = rasterize_reference(
        means, colors, opac, scales, quats, cam, bg)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r), atol=4e-3)
    np.testing.assert_allclose(np.asarray(invd_s), np.asarray(invd_r), atol=2e-3)


def test_streaming_with_size_class_ladder(scene):
    """streaming + size_classes is the production exact config (the 23-col
    payload rides the SPLIT stable sorts — identical keys, identical
    permutation); must match the non-streaming ladder render at bf16 color
    tolerance and reach zero truncation."""
    rng = np.random.default_rng(29)
    means, colors, opac, scales, quats = make_scene(
        rng, P=256, spread=0.2, opacity_hi=0.98
    )
    cam = make_cam(64)
    bg = jnp.linspace(0.0, 1.0, C)
    ladder = ((8, 64), (24, 24), (64, 8))
    colors_bf = colors.astype(jnp.bfloat16).astype(jnp.float32)
    out_s, radii_s, invd_s = rasterize(
        means, colors, opac, scales, quats, cam, bg,
        RasterizeSettings(chunk=16, streaming=True, size_classes=ladder),
    )
    out_b, radii_b, _ = rasterize(
        means, colors_bf, opac, scales, quats, cam, bg,
        RasterizeSettings(chunk=16, presort=False, size_classes=ladder),
    )
    np.testing.assert_array_equal(radii_s, radii_b)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_b),
                               atol=2e-6)


def test_streaming_gradients_close(scene):
    """Gradients flow through the per-gaussian table (same RMW backward as
    the gather path); only the residual out/T differ by bf16 color rounding,
    so grads agree to ~bf16 relative tolerance."""
    means, colors, opac, scales, quats = scene
    cam = make_cam(32)
    bg = jnp.zeros(C)

    def grads(st):
        def f(m, c, o, s, q):
            col, _, invd = rasterize(m, c, o, s, q, cam, bg, st)
            return jnp.sum(col ** 2) + 0.1 * jnp.sum(invd)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(
            means, colors, opac, scales, quats)

    gs = grads(RasterizeSettings(chunk=8, streaming=True))
    gb = grads(RasterizeSettings(chunk=8, presort=False))
    for name, x, y in zip("means colors opac scales quats".split(), gs, gb):
        scale = float(jnp.max(jnp.abs(y))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(x) / scale, np.asarray(y) / scale, atol=2e-2,
            err_msg=name)


def test_streaming_empty_scene():
    cam = make_cam(32)
    bg = jnp.linspace(0.2, 0.8, C)
    means = jnp.asarray([[0.0, 0.0, -5.0]])  # behind camera -> culled
    out, radii, invd = rasterize(
        means, jnp.ones((1, C)), jnp.ones((1, 1)), jnp.full((1, 3), 0.05),
        jnp.asarray([[1.0, 0, 0, 0]]), cam, bg,
        RasterizeSettings(chunk=8, streaming=True),
    )
    assert int(radii[0]) == 0
    np.testing.assert_allclose(
        out, np.broadcast_to(np.asarray(bg)[:, None, None], (C, 32, 32)),
        atol=1e-6)


def test_streaming_rejects_instance_budget(scene):
    means, colors, opac, scales, quats = scene
    cam = make_cam(32)
    with pytest.raises(ValueError, match="instance_budget"):
        rasterize(
            means, colors, opac, scales, quats, cam, jnp.zeros(C),
            RasterizeSettings(chunk=8, streaming=True, instance_budget=256),
        )


def test_prep_blend_split_matches_rasterize(scene):
    """rasterize_prep + rasterize_blend (the grouped frame loop's phase
    split, bench.py --group) must be bit-identical to the fused rasterize
    on the default path."""
    from guava_renderer_tpu.ops.gsplat import rasterize_blend, rasterize_prep

    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    bg = jnp.linspace(0.0, 1.0, C)
    st = RasterizeSettings(chunk=16, size_classes=((8, 16), (32, 4)))
    out_f, radii_f, invd_f = rasterize(
        means, colors, opac, scales, quats, cam, bg, st,
        channels_first=False)
    prep = rasterize_prep(means, colors, opac, scales, quats, cam, st)
    out_s, invd_s = rasterize_blend(prep, bg, 64, 64, st,
                                    channels_first=False)
    np.testing.assert_array_equal(radii_f, prep.radius)
    np.testing.assert_array_equal(out_f, out_s)
    np.testing.assert_array_equal(invd_f, invd_s)


def test_prep_rejects_fused_only_modes(scene):
    from guava_renderer_tpu.ops.gsplat import rasterize_prep

    means, colors, opac, scales, quats = scene
    cam = make_cam(32)
    with pytest.raises(ValueError, match="default blend path"):
        rasterize_prep(means, colors, opac, scales, quats, cam,
                       RasterizeSettings(chunk=8, streaming=True))


def test_static_class_order_matches_dynamic(scene):
    """class_order computed from this frame's own areas must reproduce the
    dynamic per-frame area-rank binning bit-exactly (envelope_class_order
    mirrors the packed-sort tie order), and report zero truncation on a
    zero-truncation ladder."""
    from guava_renderer_tpu.ops.gsplat import (
        ALPHA_MIN, bin_gaussians, envelope_class_order,
    )
    from guava_renderer_tpu.ops.gsplat_project import (
        project_gaussians, tile_rect,
    )

    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    bg = jnp.linspace(0.0, 1.0, C)
    st = RasterizeSettings(chunk=16, size_classes=((8, 32), (24, 16)),
                           max_tiles_per_gaussian=4)

    proj = project_gaussians(means, scales, quats, opac, cam, 1.0, False)
    contributing = proj.valid & (proj.alpha >= ALPHA_MIN)
    x0, y0, x1, y1 = tile_rect(proj.mean2d, proj.radius_bin, 64, 64,
                               st.tile)
    areas = np.where(np.asarray(contributing),
                     np.asarray((x1 - x0) * (y1 - y0)), 0)
    order = envelope_class_order(areas)

    out_dyn, _, invd_dyn = rasterize(
        means, colors, opac, scales, quats, cam, bg, st)
    out_st, _, invd_st = rasterize(
        means, colors, opac, scales, quats, cam, bg, st,
        class_order=order)
    np.testing.assert_array_equal(out_dyn, out_st)
    np.testing.assert_array_equal(invd_dyn, invd_st)

    *_, ntr = bin_gaussians(
        proj.mean2d, proj.depth, proj.radius_bin, contributing, 64, 64,
        st, conic=proj.conic, alpha=proj.alpha, class_order=order)
    assert int(ntr) == 0


def test_static_class_order_counts_envelope_escape(scene):
    """A DELIBERATELY wrong static order (ascending area: big splats in
    low-cap classes) must surface truncation through the per-frame
    counter — the guard that makes the static assignment honest."""
    from guava_renderer_tpu.ops.gsplat import ALPHA_MIN, bin_gaussians
    from guava_renderer_tpu.ops.gsplat_project import (
        project_gaussians, tile_rect,
    )

    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    st = RasterizeSettings(chunk=16, size_classes=((8, 32), (24, 16)),
                           max_tiles_per_gaussian=1)
    proj = project_gaussians(means, scales, quats, opac, cam, 1.0, False)
    contributing = proj.valid & (proj.alpha >= ALPHA_MIN)
    x0, y0, x1, y1 = tile_rect(proj.mean2d, proj.radius_bin, 64, 64,
                               st.tile)
    areas = np.asarray((x1 - x0) * (y1 - y0))
    wrong = jnp.asarray(np.argsort(areas).astype(np.int32))  # ascending!
    *_, ntr_dyn = bin_gaussians(
        proj.mean2d, proj.depth, proj.radius_bin, contributing, 64, 64,
        st, conic=proj.conic, alpha=proj.alpha)
    *_, ntr_wrong = bin_gaussians(
        proj.mean2d, proj.depth, proj.radius_bin, contributing, 64, 64,
        st, conic=proj.conic, alpha=proj.alpha, class_order=wrong)
    assert int(ntr_wrong) > int(ntr_dyn)


def test_class_order_requires_size_classes(scene):
    from guava_renderer_tpu.ops.gsplat import ALPHA_MIN, bin_gaussians
    from guava_renderer_tpu.ops.gsplat_project import project_gaussians

    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    proj = project_gaussians(means, scales, quats, opac, cam, 1.0, False)
    with pytest.raises(ValueError, match="size_classes"):
        bin_gaussians(
            proj.mean2d, proj.depth, proj.radius_bin, proj.valid, 64, 64,
            RasterizeSettings(chunk=16),
            class_order=jnp.zeros((means.shape[0],), jnp.int32))


def test_bf16_rows_matches_f32_blend(scene):
    """settings.bf16_rows packs the row table to bf16 (geometry hi/lo
    pairs, bf16 colors): the render must stay within bf16-color rounding
    of the f32-table blend (the MXU rounds colors to bf16 in BOTH paths,
    so the only added error is the ~2^-16 geometry reconstruction)."""
    from guava_renderer_tpu.ops.gsplat import rasterize

    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    bg = jnp.zeros((C,), jnp.float32)
    base = RasterizeSettings(chunk=16)
    b16 = base._replace(bf16_rows=True)
    out_f32, _, inv_f32 = rasterize(
        means, colors, opac, scales, quats, cam, bg, base)
    out_b16, _, inv_b16 = rasterize(
        means, colors, opac, scales, quats, cam, bg, b16)
    err = float(jnp.max(jnp.abs(out_b16 - out_f32)))
    mse = float(jnp.mean((out_b16 - out_f32) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-20))
    assert psnr > 70.0, (psnr, err)
    assert float(jnp.max(jnp.abs(inv_b16 - inv_f32))) < 3e-2


def test_bf16_rows_gradients_close(scene):
    """bf16_rows gradients: straight-through the packing, backward replay
    on exactly the forward's reconstructed values."""
    from guava_renderer_tpu.ops.gsplat import rasterize

    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    bg = jnp.zeros((C,), jnp.float32)

    def loss(st):
        def f(m, c, o, s, q):
            out, _, inv = rasterize(m, c, o, s, q, cam, bg, st)
            return jnp.sum(out ** 2) + jnp.sum(inv ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(
            means, colors, opac, scales, quats)

    g_f32 = loss(RasterizeSettings(chunk=16))
    g_b16 = loss(RasterizeSettings(chunk=16, bf16_rows=True))
    # a handful of splat-pixel pairs sit ON the 1/255 contribution floor
    # and flip with the ~2^-16 geometry quantization (a discrete boundary,
    # inherent to any quantized forward) — so gate on direction + the bulk
    # of the distribution, not the max
    for name, a, b in zip(("means", "colors", "opac"), g_f32, g_b16):
        a, b = np.asarray(a), np.asarray(b)
        cos = float((a * b).sum()
                    / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-2)
        assert cos > 0.9999, (name, cos)
        assert float(np.percentile(rel, 99)) < 0.15, (
            name, float(np.percentile(rel, 99)))


def test_bf16_rows_rejects_vmem_and_streaming(scene):
    from guava_renderer_tpu.ops.gsplat import rasterize

    means, colors, opac, scales, quats = scene
    cam = make_cam(64)
    bg = jnp.zeros((C,), jnp.float32)
    st = RasterizeSettings(chunk=16, bf16_rows=True, streaming=True,
                          presort=False)
    with pytest.raises(ValueError, match="bf16_rows"):
        rasterize(means, colors, opac, scales, quats, cam, bg, st)
