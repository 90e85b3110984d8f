"""Training step: full pipeline forward + backward, data-parallel over a mesh.

Optimizer parity with the reference (ref: ubody_gaussian.py:422-457):
Adam betas (0.0, 0.99); 'style_mlp'/'final_linear' parameters at 0.1x lr;
LinearLR decay from lr to lr*decay_rate over decay_iter steps. NaN-gradient
scrubbing reproduces trainer.py:96-97 (param.grad.nan_to_num_()).

Parallelism: `make_parallel_train_step` shard_maps the per-device step over
the 'data' axis of a Mesh — per-device local batch, explicit psum of grads
and metrics over ICI (the DDP all-reduce + fabric.all_reduce equivalents,
ref: main/trainer.py:95,175-181).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    iteration: jnp.ndarray


def _lr_labels(params) -> Any:
    """'slow' for style_mlp / final_linear leaves, 'normal' otherwise."""

    def label(path, _):
        keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        joined = "/".join(keys)
        if "style_mlp" in joined or "final_linear" in joined:
            return "slow"
        return "normal"

    return jax.tree_util.tree_map_with_path(label, params)


def scrub_nan_grads() -> optax.GradientTransformation:
    """torch.nan_to_num_ on gradients (ref: trainer.py:96-97)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0), updates
        )
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    params,
    learning_rate: float = 1e-4,
    lr_decay_rate: float = 0.03,
    lr_decay_iter: int = 200000,
) -> optax.GradientTransformation:
    schedule = optax.linear_schedule(
        init_value=1.0, end_value=lr_decay_rate, transition_steps=lr_decay_iter
    )

    def adam(scale: float):
        return optax.chain(
            scrub_nan_grads(),
            optax.scale_by_adam(b1=0.0, b2=0.99),
            optax.scale_by_schedule(schedule),
            optax.scale(-learning_rate * scale),
        )

    return optax.multi_transform(
        {"normal": adam(1.0), "slow": adam(0.1)}, _lr_labels(params)
    )


def make_train_step(
    loss_fn: Callable[[Any, Any, jnp.ndarray], tuple[jnp.ndarray, dict]],
    optimizer: optax.GradientTransformation,
    axis_name: str | None = None,
):
    """loss_fn(params, batch, iteration) -> (loss, metrics)."""

    def step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, state.iteration
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.iteration + 1)
        return new_state, loss, metrics

    return step


def _lift_consts(fn, *example_args):
    """Trace fn on sharding-free abstract args and return (closed, consts)
    where `closed(*args, *consts)` replays the jaxpr with its constvars
    supplied at runtime. jax.closure_convert hoists only TRACER consts —
    concrete closed-over arrays (the EHM/UV tables, ~50 MB) stay embedded
    as dense MLIR constants and the remote TPU compile service rejects the
    module (HTTP 500); this lifts them into ordinary arguments."""
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        example_args,
    )
    flat_abs, in_tree = jax.tree_util.tree_flatten(abstract)
    out_tree_box = []

    def flat_fn(*flat):
        args = jax.tree_util.tree_unflatten(in_tree, flat)
        out = fn(*args)
        flat_out, out_tree = jax.tree_util.tree_flatten(out)
        if not out_tree_box:
            out_tree_box.append(out_tree)
        return flat_out

    cj = jax.make_jaxpr(flat_fn)(*flat_abs)
    consts = [jnp.asarray(c) for c in cj.consts]

    n_pos = len(example_args)

    def closed(*all_args):
        args, cs = all_args[:n_pos], all_args[n_pos:]
        flat = jax.tree_util.tree_flatten(args)[0]
        outs = jax.core.eval_jaxpr(cj.jaxpr, list(cs), *flat)
        return jax.tree_util.tree_unflatten(out_tree_box[0], outs)

    return closed, consts


def make_sample_scan_step(
    loss_fn: Callable[[Any, Any, jnp.ndarray], tuple[jnp.ndarray, dict]],
    optimizer: optax.GradientTransformation,
    axis_name: str | None = None,
):
    """make_train_step with per-SAMPLE gradient accumulation via lax.scan.

    The local batch is processed one sample at a time (each re-expanded to
    batch dim 1), gradients/metrics averaged in the scan carry. Every loss
    term is a per-sample mean, so the result equals the batched step up to
    fp summation order. Two wins on the 16 GiB chip at 512^2: (a) peak
    temps are one sample's (~3 GiB) instead of B's, and (b) the compiled
    program is the KNOWN-GOOD batch-1 program plus a scan — the XLA TPU
    compiler crashes outright on any batch>=2 512^2 step (HTTP 500 across
    remat/no-remat/unrolled/lax.map renderers, compile_train_512_b*.log)
    while batch-1 compiles, scanned renderer included."""

    def step(state: TrainState, batch):
        B = jax.tree_util.tree_leaves(batch)[0].shape[0]
        vg = jax.value_and_grad(loss_fn, has_aux=True)

        def one(carry, sample):
            gsum, lsum, msum = carry
            sample1 = jax.tree_util.tree_map(lambda x: x[None], sample)
            (loss, metrics), grads = vg(
                state.params, sample1, state.iteration)
            carry = (
                jax.tree_util.tree_map(jnp.add, gsum, grads),
                lsum + loss,
                jax.tree_util.tree_map(jnp.add, msum, metrics),
            )
            return carry, None

        shapes = jax.eval_shape(
            vg, state.params,
            jax.tree_util.tree_map(lambda x: x[:1], batch),
            state.iteration)
        (l0, m0), g0 = shapes
        zeros = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda s: jnp.zeros(s.shape, s.dtype), t)
        init = (zeros(g0), jnp.zeros(l0.shape, l0.dtype), zeros(m0))
        (gsum, lsum, msum), _ = jax.lax.scan(one, init, batch)
        grads = jax.tree_util.tree_map(lambda g: g / B, gsum)
        loss = lsum / B
        metrics = jax.tree_util.tree_map(lambda m: m / B, msum)

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.iteration + 1)
        return new_state, loss, metrics

    return step


def make_accum_train_step(
    loss_fn: Callable[[Any, Any, jnp.ndarray], tuple[jnp.ndarray, dict]],
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    batch_spec=P("data"),
):
    """Gradient accumulation with a HOST-level microbatch loop.

    The remote TPU compile service crashes (HTTP 500, tpu_compile_helper
    exit 1) on EVERY 512^2 train-step program whose data arrays carry a
    leading batch dim >= 2 — batched, remat'd, lax.map'd renderer, and
    even the lax.scan sample-scan variant (where all *compute* is
    batch-1-shaped) all fail, while the plain batch-1 step compiles and
    runs (outputs/bench/tpu_window_20260818_232000/, .._023954/). The
    robust decomposition keeps every *compiled program* batch-1 per
    device and moves the microbatch loop to the host:

      grad:  shard_map'd value_and_grad at local batch 1, grads/loss/
             metrics pmean'd over 'data' (one optical microbatch =
             n_devices samples)
      acc:   jitted tree-add into running sums (sums donated)
      apply: jitted optimizer update from the averaged sums (state and
             sums donated)

    step(state, microbatches) consumes a LIST of already-sharded
    microbatches; the effective batch is len(microbatches) * n_devices.
    Equals the batched step up to fp summation order. Peak HBM = one
    microbatch's temps + params + opt state + two grads copies.
    """
    state_spec = P()
    cache: dict = {}

    def _ensure(state, mb):
        if "grad" in cache:
            return
        local = jax.tree_util.tree_map(
            lambda x: x[:1]
            if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0 else x,
            mb,
        )
        closed, consts = _lift_consts(
            loss_fn, state.params, local, state.iteration)
        n = len(consts)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(state_spec, batch_spec, state_spec) + (P(),) * n,
            out_specs=(state_spec, state_spec, state_spec),
            check_vma=False,
        )
        def g(params, batch, iteration, *cs):
            lf = lambda p, b, i: closed(p, b, i, *cs)  # noqa: E731
            (loss, metrics), grads = jax.value_and_grad(
                lf, has_aux=True)(params, batch, iteration)
            return (
                jax.lax.pmean(loss, "data"),
                jax.lax.pmean(metrics, "data"),
                jax.lax.pmean(grads, "data"),
            )

        cache["grad"] = jax.jit(g)
        cache["consts"] = consts

        def acc(sums, loss, metrics, grads):
            lsum, msum, gsum, cnt = sums
            return (
                lsum + loss,
                jax.tree_util.tree_map(jnp.add, msum, metrics),
                jax.tree_util.tree_map(jnp.add, gsum, grads),
                cnt + 1,
            )

        cache["acc"] = jax.jit(acc, donate_argnums=(0,))

        def apply(state, sums):
            lsum, msum, gsum, cnt = sums
            cnt = cnt.astype(jnp.float32)
            grads = jax.tree_util.tree_map(lambda x: x / cnt, gsum)
            loss = lsum / cnt
            metrics = jax.tree_util.tree_map(lambda m: m / cnt, msum)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.iteration + 1), \
                loss, metrics

        cache["apply"] = jax.jit(apply, donate_argnums=(0, 1))

    def step(state, microbatches):
        assert len(microbatches) >= 1
        _ensure(state, microbatches[0])
        consts = cache["consts"]
        loss, metrics, grads = cache["grad"](
            state.params, microbatches[0], state.iteration, *consts)
        sums = (loss, metrics, grads, jnp.asarray(1, jnp.int32))
        for mb in microbatches[1:]:
            loss, metrics, grads = cache["grad"](
                state.params, mb, state.iteration, *consts)
            sums = cache["acc"](sums, loss, metrics, grads)
        return cache["apply"](state, sums)

    def lower_grad(state, mb):
        """AOT hook: lower the batch-1 grad program (the only compile the
        TPU service must survive; acc/apply are trivial)."""
        _ensure(state, mb)
        return cache["grad"].lower(
            state.params, mb, state.iteration, *cache["consts"])

    step.lower_grad = lower_grad
    step.consts = lambda: cache["consts"]
    return step


def make_parallel_eval_step(forward_metrics_fn, mesh: Mesh, batch_spec=P("data")):
    """shard_map'd eval: batch sharded over 'data', metrics pmean'd mesh-wide.

    The explicit-collective equivalent of the reference's
    `fabric.all_reduce(metric, reduce_op="mean")` (ref: main/trainer.py:175-181).
    forward_metrics_fn(params, batch) -> dict of scalar metrics."""
    cache: dict = {}

    def _ensure(params, batch):
        if "fn" in cache:
            return
        local = jax.tree_util.tree_map(
            lambda x: x[: max(1, x.shape[0] // mesh.devices.size)]
            if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0 else x,
            batch,
        )
        closed, consts = _lift_consts(forward_metrics_fn, params, local)
        n = len(consts)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), batch_spec) + (P(),) * n,
            out_specs=P(),
            check_vma=False,
        )
        def estep(params, batch, *consts):
            metrics = closed(params, batch, *consts)
            return jax.lax.pmean(metrics, "data")

        cache["fn"] = jax.jit(estep)
        cache["consts"] = consts

    def peval(params, batch):
        _ensure(params, batch)
        return cache["fn"](params, batch, *cache["consts"])

    return peval


def make_parallel_train_step(
    loss_fn,
    optimizer,
    mesh: Mesh,
    batch_spec=P("data"),
    sample_scan: bool = False,
):
    """shard_map'd DP step: params replicated, batch sharded over 'data'."""
    state_spec = P()  # replicated

    # The loss closure carries the EHM/UV tables (shapedirs alone is
    # ~44 MB); closed-over device arrays lower as DENSE MLIR CONSTANTS, so
    # the serialized train-step module hits ~52 MB and the remote TPU
    # compile service rejects it (HTTP 500, compile_train_512_b3.log).
    # closure_convert hoists every jaxpr constant into explicit arguments
    # once at first call (shapes are fixed for the whole run), and the
    # hoisted consts ride as replicated shard_map inputs.
    cache: dict = {}

    def _ensure(state, batch):
        if "fn" in cache:
            return
        # hoist from the LOSS (collective-free): tracing the full step
        # here would hit the pmean's unbound 'data' axis
        # the lifted jaxpr is shape-specialized: per-device batch for the
        # batched step, batch 1 for the sample-scan step (which re-expands
        # each scanned sample to a leading dim of 1)
        nb = 1 if sample_scan else None
        local = jax.tree_util.tree_map(
            lambda x: x[: nb or max(1, x.shape[0] // mesh.devices.size)]
            if hasattr(x, "shape") and getattr(x, "ndim", 0) > 0 else x,
            batch,
        )
        # manual const lift — see _lift_consts (closure_convert hoists
        # only tracer consts; the EHM/UV tables would stay embedded)
        closed, consts = _lift_consts(
            loss_fn, state.params, local, state.iteration)
        n = len(consts)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(state_spec, batch_spec) + (P(),) * n,
            out_specs=(state_spec, state_spec, state_spec),
            check_vma=False,
        )
        def sm(state, batch, *consts):
            lf = lambda p, b, i: closed(p, b, i, *consts)  # noqa: E731
            mk = (make_sample_scan_step if sample_scan
                  else make_train_step)
            return mk(lf, optimizer, axis_name="data")(state, batch)

        # donate the incoming TrainState: at 512^2 the step's temporaries
        # are ~9.4 GiB and holding two full param+optimizer copies
        # alongside them exhausts the 16 GiB chip (measured: second step
        # OOM, tpu_window_20260817_011351). The driver loop rebinds
        # `state = pstep(state, ...)`, so the donated buffers are never
        # reused. CPU ignores donation (tests unaffected).
        cache["fn"] = jax.jit(sm, donate_argnums=(0,))
        cache["consts"] = consts

    def pstep(state, batch):
        _ensure(state, batch)
        return cache["fn"](state, batch, *cache["consts"])

    def lower(state, batch):
        """AOT hook (tools/compile_train_512.py): lower the cached jit
        without executing anything."""
        _ensure(state, batch)
        return cache["fn"].lower(state, batch, *cache["consts"])

    pstep.lower = lower
    # AOT callers (compile_train_512) need the lifted consts to invoke the
    # compiled executable directly: compiled(state, batch, *pstep.consts())
    pstep.consts = lambda: cache["consts"]
    return pstep
