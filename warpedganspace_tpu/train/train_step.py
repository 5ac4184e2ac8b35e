"""The jit-compiled contrastive training step.

One call fuses the *entire* reference hot loop (lib/trainer.py:184-254) into a
single XLA program: sample (z, path index k, signed magnitude eps) -> generate
G(z) -> warp direction from the support sets -> generate G(z, eps*dir) ->
reconstructor forward -> CE + L1 loss -> backward through the frozen generator
into S and through R -> two Adam updates. Both generator forwards and the
backward live in the same program, so XLA schedules/fuses them together and no
host sync happens inside an iteration.

Parallelism: with a mesh, the batch is sharded over the "data" axis via
sharding constraints; parameters stay replicated and XLA derives the gradient
all-reduce (SPMD, runs over ICI). RNG is a pure function of (seed, iteration),
so resume reproduces the exact sample stream.

Optimizers (reference lib/trainer.py:153-156): two independent Adams, one for
the support sets (masked so alphas/gammas only train when configured), one for
the reconstructor (masked so BatchNorm running stats never receive optimizer
updates — they are refreshed functionally by the train-mode forward).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from warpedganspace_tpu.core.sampling import sample_batch_directives
from warpedganspace_tpu.models.api import GeneratorBundle, cast_params_bf16
from warpedganspace_tpu.models.reconstructor import Reconstructor
from warpedganspace_tpu.models.support_sets import SupportSets
from warpedganspace_tpu.parallel.mesh import shard_batch


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    batch_size: int
    num_support_sets: int
    min_shift_magnitude: float
    max_shift_magnitude: float
    lambda_cls: float = 1.0
    lambda_reg: float = 0.25
    support_set_lr: float = 1e-4
    reconstructor_lr: float = 1e-4
    z_truncation: float | None = None
    shift_in_w_space: bool = False
    # Generator compute dtype during training. The generator is frozen, so
    # bfloat16 only affects the gradient PATH through it (the warp, the
    # reconstructor and the loss stay float32); halves G time and memory.
    generator_dtype: str = "float32"
    # Reconstructor compute dtype: bfloat16 runs R's conv trunk (fwd+bwd) in
    # bf16 with float32 master params, BN statistics and heads — R at 1024^2
    # is bandwidth-bound, measured 110 -> 70 ms fwd+bwd at bs12 on v5e.
    reconstructor_dtype: str = "float32"
    # G->R image handoff layout: "s2d" keeps the pair in the generator tail's
    # native S2D layout (skips G's from_s2d and feeds R's re-derived S2D stem
    # — exact; requires G.supports_s2d_out and a ResNet reconstructor).
    pair_layout: str = "nhwc"


def _bn_stat_mask(params):
    """False for BatchNorm running-stat leaves ('mean'/'var'), True elsewhere."""

    def mask_of(tree):
        if isinstance(tree, dict):
            return {
                k: (False if k in ("mean", "var") else mask_of(v)) for k, v in tree.items()
            }
        if isinstance(tree, (list, tuple)):
            return type(tree)(mask_of(v) for v in tree)
        return True

    return mask_of(params)


def _labels(mask_tree):
    return jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask_tree)


def make_optimizers(S: SupportSets, cfg: TrainStepConfig):
    """Two Adams (reference lib/trainer.py:153-156), with frozen leaves —
    untrained alphas/gammas for S, BN running stats for R — routed to
    ``set_to_zero`` so they never receive optimizer updates (the loss *does*
    depend on frozen alphas/gammas, so simply masking would leak raw grads)."""
    opt_s = optax.multi_transform(
        {"train": optax.adam(cfg.support_set_lr), "freeze": optax.set_to_zero()},
        lambda p: _labels(S.trainable_mask(p)),
    )
    opt_r = optax.multi_transform(
        {"train": optax.adam(cfg.reconstructor_lr), "freeze": optax.set_to_zero()},
        lambda p: _labels(_bn_stat_mask(p)),
    )
    return opt_s, opt_r


def init_train_state(key, G: GeneratorBundle, S: SupportSets, R: Reconstructor, cfg):
    """Initialize (s_params, r_params, opt states)."""
    ks, kr = jax.random.split(key)
    s_params = S.init(ks)
    r_params = R.init(kr)
    opt_s, opt_r = make_optimizers(S, cfg)
    return {
        "s_params": s_params,
        "r_params": r_params,
        "opt_s": opt_s.init(s_params),
        "opt_r": opt_r.init(r_params),
    }


def _make_raw_step(
    G: GeneratorBundle,
    S: SupportSets,
    R: Reconstructor,
    cfg: TrainStepConfig,
    mesh=None,
):
    """The un-jitted step body shared by :func:`make_train_step` (one
    iteration per dispatch) and :func:`make_train_step_scan` (k iterations
    per dispatch via lax.scan)."""
    opt_s, opt_r = make_optimizers(S, cfg)

    g_bf16 = cfg.generator_dtype == "bfloat16"
    g_dtype = jnp.bfloat16 if g_bf16 else jnp.float32
    r_dtype = jnp.bfloat16 if cfg.reconstructor_dtype == "bfloat16" else None
    s2d_pair = cfg.pair_layout == "s2d"
    if s2d_pair and not G.supports_s2d_out:
        raise ValueError(
            f"pair_layout='s2d' needs a generator with supports_s2d_out ({G.name})"
        )
    g_kwargs = {"out_layout": "s2d"} if s2d_pair else {}

    def for_r(img):
        # R casts its input to r_dtype anyway; skip the f32 round-trip when
        # the generator already produced that dtype.
        if r_dtype is not None and img.dtype == r_dtype:
            return img
        return img.astype(jnp.float32)

    def loss_fn(s_params, r_params, g_params, z, idx, mags):
        z_g = z.astype(g_dtype)
        img = for_r(G.apply(g_params, z_g, **g_kwargs))
        latent = (
            G.get_w(g_params, z_g).astype(jnp.float32)
            if cfg.shift_in_w_space else z
        )
        direction = S.direction(s_params, latent, idx)
        shift = mags[:, None] * direction
        img_shifted = for_r(G.apply(g_params, z_g, shift.astype(g_dtype), **g_kwargs))
        apply_r = R.apply_pair_s2d if s2d_pair else R.apply
        logits, mag_hat, new_r_params = apply_r(
            r_params, img, img_shifted, train=True, dtype=r_dtype
        )
        cls_loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, idx)
        )
        reg_loss = jnp.mean(jnp.abs(mag_hat - mags))
        total = cfg.lambda_cls * cls_loss + cfg.lambda_reg * reg_loss
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == idx).astype(jnp.float32))
        return total, (cls_loss, reg_loss, acc, new_r_params)

    def step(state, g_params, seed_key, iteration):
        if g_bf16:
            g_params = cast_params_bf16(g_params)
        key = jax.random.fold_in(seed_key, iteration)
        z, idx, mags = sample_batch_directives(
            key,
            cfg.batch_size,
            G.dim_z,
            cfg.num_support_sets,
            cfg.min_shift_magnitude,
            cfg.max_shift_magnitude,
            cfg.z_truncation,
        )
        # Shard the batch across the data axis; params remain replicated.
        z = shard_batch(z, mesh)
        idx = shard_batch(idx, mesh)
        mags = shard_batch(mags, mesh)

        (total, (cls_loss, reg_loss, acc, new_r_params)), (gs, gr) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state["s_params"], state["r_params"], g_params, z, idx, mags)

        s_updates, new_opt_s = opt_s.update(gs, state["opt_s"], state["s_params"])
        s_params = optax.apply_updates(state["s_params"], s_updates)
        r_updates, new_opt_r = opt_r.update(gr, state["opt_r"], state["r_params"])
        # Apply weight updates on top of the stat-refreshed params: running
        # stats receive zero optimizer updates (masked), so they keep the fresh
        # values from the train-mode forward.
        r_params = optax.apply_updates(new_r_params, r_updates)

        new_state = {
            "s_params": s_params,
            "r_params": r_params,
            "opt_s": new_opt_s,
            "opt_r": new_opt_r,
        }
        metrics = {
            "accuracy": acc,
            "classification_loss": cls_loss,
            "regression_loss": reg_loss,
            "total_loss": total,
        }
        return new_state, metrics

    return step


def make_train_step(
    G: GeneratorBundle,
    S: SupportSets,
    R: Reconstructor,
    cfg: TrainStepConfig,
    mesh=None,
    donate: bool = True,
):
    """Build the jitted train step: (state, g_params, seed_key, iteration) -> (state, metrics)."""
    step = _make_raw_step(G, S, R, cfg, mesh=mesh)
    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_train_step_scan(
    G: GeneratorBundle,
    S: SupportSets,
    R: Reconstructor,
    cfg: TrainStepConfig,
    mesh=None,
    k: int = 8,
    donate: bool = True,
):
    """k consecutive iterations as ONE XLA program (lax.scan over the step).

    Exact: the sample stream is a pure function of (seed_key, iteration) —
    scanning iteration over [i, i+k) reproduces k individual step() calls, so
    resume/checkpoint semantics are unchanged at chunk boundaries. Metrics
    come back stacked (k,) per key, one entry per iteration.

    This amortizes the per-dispatch host/runtime cost over k iterations —
    built for the small fast configs (SNGAN 32²/64² at >100 steps/s) where a
    single step is too short to hide dispatch; the 1024² configs run 100+ ms
    per step and gain nothing (see PERFORMANCE.md "SNGAN train-step part
    attribution").
    """
    raw = _make_raw_step(G, S, R, cfg, mesh=mesh)
    g_bf16 = cfg.generator_dtype == "bfloat16"

    def stepk(state, g_params, seed_key, iteration):
        if g_bf16:
            # One cast for the whole chunk (identity if already bf16).
            g_params_c = cast_params_bf16(g_params)
        else:
            g_params_c = g_params

        def body(st, it):
            return raw(st, g_params_c, seed_key, it)

        return jax.lax.scan(body, state, iteration + jnp.arange(k))

    donate_argnums = (0,) if donate else ()
    return jax.jit(stepk, donate_argnums=donate_argnums)
