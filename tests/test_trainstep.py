"""Train-step tests: optimizer grouping, NaN scrub, DP over the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from guava_renderer_tpu.parallel.mesh import data_parallel_mesh, shard_batch
from guava_renderer_tpu.train.trainstep import (
    TrainState,
    make_accum_train_step,
    make_optimizer,
    make_parallel_train_step,
    make_sample_scan_step,
    make_train_step,
)


def toy_params():
    return {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)},
        "refiner": {"generator": {"style_mlp": {"mlp0": {"kernel": jnp.ones((4, 4))}}}},
        "final_linear": {"kernel": jnp.ones((4, 4))},
    }


def toy_loss(params, batch, iteration):
    x, y = batch["x"], batch["y"]
    pred = x @ params["dense"]["kernel"] + params["dense"]["bias"]
    pred = pred @ params["refiner"]["generator"]["style_mlp"]["mlp0"]["kernel"]
    pred = pred @ params["final_linear"]["kernel"]
    loss = jnp.mean((pred - y) ** 2)
    return loss, {"loss": loss}


def make_batch(n=8):
    rng = np.random.default_rng(0)
    return {
        "x": jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        "y": jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
    }


def test_lr_groups_move_at_different_rates():
    params = toy_params()
    opt = make_optimizer(params, learning_rate=1e-2)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step = make_train_step(toy_loss, opt)
    new_state, loss, _ = step(state, make_batch())
    d_normal = float(jnp.abs(new_state.params["dense"]["kernel"] - 1.0).max())
    d_slow_a = float(
        jnp.abs(
            new_state.params["refiner"]["generator"]["style_mlp"]["mlp0"]["kernel"] - 1.0
        ).max()
    )
    d_slow_b = float(jnp.abs(new_state.params["final_linear"]["kernel"] - 1.0).max())
    # adam step magnitude ~ lr * group scale
    assert d_normal > 0
    np.testing.assert_allclose(d_slow_a / d_normal, 0.1, rtol=0.05)
    np.testing.assert_allclose(d_slow_b / d_normal, 0.1, rtol=0.05)


def test_nan_grads_scrubbed():
    params = {"dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
              "refiner": {"generator": {"style_mlp": {"mlp0": {"kernel": jnp.ones((2, 2))}}}},
              "final_linear": {"kernel": jnp.ones((2, 2))}}

    def bad_loss(p, batch, it):
        # produces NaN grad for bias via 0/0 but finite loss elsewhere
        loss = jnp.sum(p["dense"]["kernel"]) + jnp.sum(
            jnp.where(p["dense"]["bias"] == 0, 0.0, jnp.sqrt(p["dense"]["bias"]))
        ) + 0.0 * jnp.sum(p["final_linear"]["kernel"]) + 0.0 * jnp.sum(
            p["refiner"]["generator"]["style_mlp"]["mlp0"]["kernel"]
        )
        return loss, {}

    opt = make_optimizer(params, learning_rate=1e-2)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step = make_train_step(bad_loss, opt)
    new_state, loss, _ = step(state, None)
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_parallel_step_matches_single_device():
    params = toy_params()
    opt = make_optimizer(params, learning_rate=1e-2)
    batch = make_batch(8)

    # single
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step = make_train_step(toy_loss, opt)
    s1, loss1, _ = step(state, batch)

    # 8-device DP
    mesh = data_parallel_mesh()
    assert mesh.devices.size == 8
    pstep = make_parallel_train_step(toy_loss, opt, mesh)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    sharded = shard_batch(batch, mesh)
    s8, loss8, _ = pstep(state, sharded)
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lr_schedule_decays():
    params = toy_params()
    opt = make_optimizer(params, learning_rate=1e-2, lr_decay_rate=0.5, lr_decay_iter=10)
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    step = make_train_step(toy_loss, opt)
    batch = make_batch()
    deltas = []
    prev = state.params["dense"]["kernel"]
    for i in range(12):
        state, _, _ = step(state, batch)
        cur = state.params["dense"]["kernel"]
        deltas.append(float(jnp.abs(cur - prev).mean()))
        prev = cur
    # step size shrinks roughly by half over the schedule
    assert deltas[-1] < deltas[0] * 0.8


def test_row_sharded_render_matches_single_device():
    import jax.numpy as jnp

    from guava_renderer_tpu.core.cameras import Camera
    from guava_renderer_tpu.ops.gsplat import RasterizeSettings, rasterize
    from guava_renderer_tpu.parallel.sharded_render import rasterize_row_sharded

    rng = np.random.default_rng(9)
    P_ = 48
    means = np.zeros((P_, 3), np.float32)
    means[:, 0] = rng.uniform(-0.5, 0.5, P_)
    means[:, 1] = rng.uniform(-0.5, 0.5, P_)
    means[:, 2] = rng.uniform(2.5, 3.5, P_)
    colors = jnp.asarray(rng.uniform(0, 1, (P_, 32)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, (P_, 1)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.02, 0.08, (P_, 3)), jnp.float32)
    quats = rng.normal(size=(P_, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    quats = jnp.asarray(quats)
    means = jnp.asarray(means)
    cam = Camera(R=jnp.eye(3), t=jnp.zeros(3), tanfovx=jnp.asarray(0.5),
                 tanfovy=jnp.asarray(0.5), width=64, height=64)
    bg = jnp.linspace(0, 1, 32)
    st = RasterizeSettings(chunk=8, max_tiles_per_gaussian=8)

    ref, radii_ref, invd_ref = rasterize(means, colors, opac, scales, quats, cam, bg, st)
    mesh = data_parallel_mesh(4)  # 4 bands of 16 rows
    out, radii, invd = rasterize_row_sharded(
        means, colors, opac, scales, quats, cam, bg, mesh, st
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(invd), np.asarray(invd_ref), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(radii), np.asarray(radii_ref))


def test_parallel_eval_step_mesh_wide_mean():
    """make_parallel_eval_step pmeans per-shard metrics — the result must
    equal the global over-the-full-batch mean (fabric.all_reduce parity,
    ref: main/trainer.py:175-181)."""
    from guava_renderer_tpu.train.trainstep import make_parallel_eval_step

    params = toy_params()
    batch = make_batch(8)

    def metrics_fn(params, b):
        pred = b["x"] @ params["dense"]["kernel"] + params["dense"]["bias"]
        return {"mse": jnp.mean((pred - b["y"]) ** 2), "mean_x": jnp.mean(b["x"])}

    mesh = data_parallel_mesh(8)
    estep = make_parallel_eval_step(metrics_fn, mesh)
    out = estep(params, shard_batch(batch, mesh))

    # per-item metrics averaged over all shards == global mean (equal shards)
    per_item_mse = []
    per_item_mx = []
    for i in range(8):
        b1 = {k: v[i : i + 1] for k, v in batch.items()}
        m = metrics_fn(params, b1)
        per_item_mse.append(float(m["mse"]))
        per_item_mx.append(float(m["mean_x"]))
    np.testing.assert_allclose(float(out["mse"]), np.mean(per_item_mse), rtol=1e-5)
    np.testing.assert_allclose(float(out["mean_x"]), np.mean(per_item_mx), rtol=1e-5)


def test_sample_scan_step_matches_batched():
    """Per-sample grad accumulation (the only batch>1 shape the TPU
    compiler accepts at 512^2) must equal the batched step: every loss
    term is a per-sample mean, so accumulation differs only in fp order."""
    params = toy_params()
    opt = make_optimizer(params, learning_rate=1e-2)
    batch = make_batch(4)

    state = TrainState(params, opt.init(params), jnp.asarray(0))
    s_b, loss_b, m_b = make_train_step(toy_loss, opt)(state, batch)

    state = TrainState(params, opt.init(params), jnp.asarray(0))
    s_s, loss_s, m_s = make_sample_scan_step(toy_loss, opt)(state, batch)

    np.testing.assert_allclose(float(loss_b), float(loss_s), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_b.params),
                    jax.tree_util.tree_leaves(s_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_accum_step_matches_batched():
    """Host-loop gradient accumulation (the only decomposition the TPU
    compile service accepts at 512^2) must equal the batched step: every
    loss term is a per-sample mean, so the split differs only in fp
    summation order."""
    params = toy_params()
    opt = make_optimizer(params, learning_rate=1e-2)
    batch = make_batch(8)

    state = TrainState(params, opt.init(params), jnp.asarray(0))
    s_b, loss_b, m_b = make_train_step(toy_loss, opt)(state, batch)

    # 2-device mesh, 4 microbatches of (2 devices x 1 sample)
    mesh = data_parallel_mesh(2)
    astep = make_accum_train_step(toy_loss, opt, mesh)
    microbatches = [
        shard_batch(
            jax.tree_util.tree_map(lambda x, i=i: x[2 * i:2 * i + 2], batch),
            mesh)
        for i in range(4)
    ]
    params_a = jax.tree_util.tree_map(jnp.copy, params)
    state = TrainState(params_a, opt.init(params_a), jnp.asarray(0))
    s_a, loss_a, m_a = astep(state, microbatches)

    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_b["loss"]), float(m_a["loss"]), rtol=1e-5)
    assert int(s_a.iteration) == 1
    for a, b in zip(jax.tree_util.tree_leaves(s_b.params),
                    jax.tree_util.tree_leaves(s_a.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_parallel_sample_scan_full_pipeline():
    """shard_map'd sample-scan step on the real micro pipeline (B=2/device)
    matches the batched parallel step."""
    from guava_renderer_tpu.testing import make_micro_pipeline
    from guava_renderer_tpu.train.pipeline import make_loss_fn

    tp = make_micro_pipeline(batch_size=4)  # 2 devices x 2 samples
    loss_fn = make_loss_fn(tp.statics, tp.lpips_params)
    mesh = data_parallel_mesh(2)
    opt = make_optimizer(tp.params)
    batch = shard_batch(tp.batch, mesh)

    # fresh param copies per call: the parallel step DONATES the TrainState
    fresh = lambda: jax.tree_util.tree_map(jnp.copy, tp.params)  # noqa: E731

    params = fresh()
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    pstep = make_parallel_train_step(loss_fn, opt, mesh)
    s_b, loss_b, _ = pstep(state, batch)

    params = fresh()
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    pscan = make_parallel_train_step(loss_fn, opt, mesh, sample_scan=True)
    s_s, loss_s, _ = pscan(state, batch)

    np.testing.assert_allclose(float(loss_b), float(loss_s), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_b.params),
                    jax.tree_util.tree_leaves(s_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_accum_full_pipeline():
    """Host-loop accum step on the real micro pipeline (2 microbatches of
    2 devices x 1 sample) matches the batched parallel step."""
    from guava_renderer_tpu.testing import make_micro_pipeline
    from guava_renderer_tpu.train.pipeline import make_loss_fn

    tp = make_micro_pipeline(batch_size=4)
    loss_fn = make_loss_fn(tp.statics, tp.lpips_params)
    mesh = data_parallel_mesh(2)
    opt = make_optimizer(tp.params)
    fresh = lambda: jax.tree_util.tree_map(jnp.copy, tp.params)  # noqa: E731

    params = fresh()
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    pstep = make_parallel_train_step(loss_fn, opt, mesh)
    s_b, loss_b, _ = pstep(state, shard_batch(tp.batch, mesh))

    microbatches = [
        shard_batch(
            jax.tree_util.tree_map(
                lambda x, i=i: x[2 * i:2 * i + 2]
                if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0 else x,
                tp.batch),
            mesh)
        for i in range(2)
    ]
    params = fresh()
    state = TrainState(params, opt.init(params), jnp.asarray(0))
    astep = make_accum_train_step(loss_fn, opt, mesh)
    s_a, loss_a, _ = astep(state, microbatches)

    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_b.params),
                    jax.tree_util.tree_leaves(s_a.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
