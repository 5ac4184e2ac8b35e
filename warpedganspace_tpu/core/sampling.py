"""Latent-code and training-directive sampling.

Replaces the reference's torch/scipy global-RNG sampling (lib/aux.py:39-53,
lib/trainer.py:203-221) with threaded ``jax.random`` keys so that every sample
is a pure function of (seed, iteration) — reproducible, jittable, and
per-device forkable for data parallelism.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("batch_size", "dim_z", "truncation"))
def sample_z(key, batch_size: int, dim_z: int, truncation: float | None = None):
    """Sample z ~ N(0, I), optionally truncated to [-truncation, truncation].

    Parity: reference lib/aux.py:39-53 (torch.randn / scipy truncnorm.rvs).
    """
    if truncation is None or truncation == 1.0:
        return jax.random.normal(key, (batch_size, dim_z), dtype=jnp.float32)
    return jax.random.truncated_normal(
        key, -truncation, truncation, (batch_size, dim_z), dtype=jnp.float32
    )


def sample_shift_magnitudes(key, batch_size: int, min_mag: float, max_mag: float):
    """Sample signed shift magnitudes the way the reference trainer does.

    Reference (lib/trainer.py:203-221): build a pool of 2B magnitudes — B drawn
    from U[-max, -min] followed by B from U[min, max] — then pick B of them
    *without replacement* with probability proportional to the pool index
    (``torch.multinomial(input=arange(2B), ...)``). That index weighting is a
    reference quirk (index 0 can never be chosen; later/positive entries are
    favored) which we replicate exactly via the Gumbel top-k trick: drawing the
    B largest values of log(w_i) + Gumbel_i realizes weighted sampling without
    replacement with weights w_i (Efraimidis-Spirakis).
    """
    k_pos, k_neg, k_pick = jax.random.split(key, 3)
    span = min_mag - max_mag  # negative span, as in the reference expression
    pos = span * jax.random.uniform(k_pos, (batch_size,)) + max_mag      # U[min, max]
    neg = span * jax.random.uniform(k_neg, (batch_size,)) - min_mag      # U[-max, -min]
    pool = jnp.concatenate([neg, pos])                                   # (2B,)
    weights = jnp.arange(2 * batch_size, dtype=jnp.float32)
    gumbel = jax.random.gumbel(k_pick, (2 * batch_size,))
    keys = jnp.where(weights > 0, jnp.log(weights), -jnp.inf) + gumbel
    _, picked = jax.lax.top_k(keys, batch_size)
    return pool[picked]


@functools.partial(
    jax.jit,
    static_argnames=(
        "batch_size",
        "dim_z",
        "num_support_sets",
        "min_shift_magnitude",
        "max_shift_magnitude",
        "z_truncation",
    ),
)
def sample_batch_directives(
    key,
    batch_size: int,
    dim_z: int,
    num_support_sets: int,
    min_shift_magnitude: float,
    max_shift_magnitude: float,
    z_truncation: float | None = None,
):
    """Sample one training batch's stochastic inputs in a single jitted call.

    Returns (z, set_idx, magnitudes):
        z          (B, dim_z) latent codes,
        set_idx    (B,) int32 target support-set indices ~ U{0..K-1}
                   (reference lib/trainer.py:203),
        magnitudes (B,) signed shift magnitudes (reference :206-221).
    """
    kz, ki, km = jax.random.split(key, 3)
    z = sample_z(kz, batch_size, dim_z, z_truncation)
    set_idx = jax.random.randint(ki, (batch_size,), 0, num_support_sets)
    mags = sample_shift_magnitudes(km, batch_size, min_shift_magnitude, max_shift_magnitude)
    return z, set_idx, mags
