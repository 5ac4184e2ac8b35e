"""Sampling tests: z truncation, magnitude pool quirk replication."""
import numpy as np

import jax
import jax.numpy as jnp

from warpedganspace_tpu.core.sampling import (
    sample_batch_directives,
    sample_shift_magnitudes,
    sample_z,
)


def test_sample_z_truncation_bounds():
    z = sample_z(jax.random.key(0), 512, 64, truncation=0.7)
    assert z.shape == (512, 64)
    assert float(jnp.max(jnp.abs(z))) <= 0.7


def test_sample_z_standard_normal_moments():
    z = sample_z(jax.random.key(1), 4096, 32)
    assert abs(float(jnp.mean(z))) < 0.02
    assert abs(float(jnp.std(z)) - 1.0) < 0.02


def test_shift_magnitudes_in_band():
    mags = sample_shift_magnitudes(jax.random.key(2), 256, 0.15, 0.25)
    a = np.abs(np.asarray(mags))
    assert a.min() >= 0.15 - 1e-6
    assert a.max() <= 0.25 + 1e-6


def test_shift_magnitudes_positive_bias():
    """The reference's index-weighted pool sampling favors positive magnitudes
    (lib/trainer.py:214-221); our Gumbel top-k replication must show the same
    bias: the expected positive fraction is ~0.69 for B=64 (vs 0.5 unbiased)."""
    keys = jax.random.split(jax.random.key(3), 64)
    frac = np.mean(
        [np.mean(np.asarray(sample_shift_magnitudes(k, 64, 0.1, 0.2)) > 0) for k in keys]
    )
    assert 0.64 < frac < 0.75


def test_batch_directives_shapes():
    z, idx, mags = sample_batch_directives(
        jax.random.key(4), 32, 128, 64, 0.15, 0.25, z_truncation=None
    )
    assert z.shape == (32, 128)
    assert idx.shape == (32,) and idx.dtype == jnp.int32
    assert int(idx.min()) >= 0 and int(idx.max()) < 64
    assert mags.shape == (32,)
