"""Fused StyleGAN2 tail kernel (ops/sg2_tail_pallas.py).

The kernel runs in interpret mode off-TPU (rbf_pallas._interpret), so these
tests exercise the REAL kernel logic — grid/DMA/halo/phase algebra, the
flatshift K-window builds, per-sample modulation, noise epilogues — on the CPU
harness; scripts/check_kernels_tpu.py re-validates on hardware. Comparisons
run under ``jax.default_matmul_precision('highest')`` (see
test_proggan_pallas.py for why).
"""
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warpedganspace_tpu.models import stylegan2 as sg
from warpedganspace_tpu.ops import s2d as s2d_ops
from warpedganspace_tpu.ops import sg2_tail_pallas as stp
from warpedganspace_tpu.ops.fused_act import fused_leaky_relu


def _cvec(v, f):
    return jnp.tile(v, (1, f))[:, None, None, :]


def _section_twin(x, w_up, w_same, w_rgb, s1, d1, s2, d2, s3,
                  n1, nw1, b1, n2, nw2, b2, rgb_b):
    """fold-x composition of one tail section (mirrors the FOLDX branches of
    models/stylegan2.py styled_conv/to_rgb with explicit mod/demod vectors)."""
    c = w_up.shape[3]
    fi = x.shape[-1] // w_up.shape[2]
    fo = 2 * fi

    def add_noise(x, n, nw):
        wg = x.shape[2]
        f = n.shape[2] // wg
        n_f = n.reshape(n.shape[0], n.shape[1], wg, f)
        return x + nw * jnp.repeat(n_f, x.shape[-1] // f, axis=-1)

    x = x * _cvec(s1, fi)
    x = sg._foldx_conv(x, sg._foldx_up_kernel(w_up, fi), up=True)
    x = x * _cvec(d1, fo)
    x = add_noise(x, n1, nw1)
    x = fused_leaky_relu(x, jnp.tile(b1, fo))

    x = x * _cvec(s2, fo)
    x = sg._foldx_conv(x, s2d_ops.fold_x_same_conv_kernel(w_same, fo), up=False)
    x = x * _cvec(d2, fo)
    x = add_noise(x, n2, nw2)
    x = fused_leaky_relu(x, jnp.tile(b2, fo))

    rgb = sg._foldx_conv(x * _cvec(s3, fo),
                         s2d_ops.fold_x_diag_1x1_kernel(w_rgb, fo), up=False)
    rgb = rgb + jnp.tile(rgb_b, fo)
    return rgb, x


def _section_args(key, c, b, r):
    ks = jax.random.split(key, 12)
    return dict(
        w_up=jax.random.normal(ks[0], (3, 3, 2 * c, c)) * 0.1,
        w_same=jax.random.normal(ks[1], (3, 3, c, c)) * 0.1,
        w_rgb=jax.random.normal(ks[2], (1, 1, c, 3)) * 0.2,
        s1=1.0 + 0.3 * jax.random.normal(ks[3], (b, 2 * c)),
        d1=1.0 + 0.2 * jax.random.normal(ks[4], (b, c)),
        s2=1.0 + 0.3 * jax.random.normal(ks[5], (b, c)),
        d2=1.0 + 0.2 * jax.random.normal(ks[6], (b, c)),
        s3=1.0 + 0.3 * jax.random.normal(ks[7], (b, c)),
        n1=jax.random.normal(ks[8], (1, r, r, 1)),
        nw1=jnp.asarray(0.7),
        b1=jax.random.normal(ks[9], (c,)) * 0.1,
        n2=jax.random.normal(ks[10], (1, r, r, 1)),
        nw2=jnp.asarray(-0.4),
        b2=jax.random.normal(ks[11], (c,)) * 0.1,
        rgb_b=jnp.asarray([0.05, -0.1, 0.2]),
    )


@pytest.mark.parametrize("c,wg,b", [(64, 8, 2), (32, 8, 2), (16, 8, 1)])
def test_fused_section_matches_foldx_composition(c, wg, b):
    r = wg * 128 // c
    fi = 64 // c
    x = jax.random.normal(jax.random.key(c), (b, r // 2, wg, 128))
    args = _section_args(jax.random.key(c + 1), c, b, r)
    with jax.default_matmul_precision("highest"):
        ref_rgb, ref_x2 = _section_twin(x, **args)
        got_rgb, got_x2 = stp.fused_section(x, want_x2=True, **args)
    # rgb comes back with k width-groups merged into lanes — a pure row-major
    # relabeling of the fold-x rgb.
    k = stp.rgb_merge_factor(c, wg)
    assert got_rgb.shape == (b, r, wg // k, k * 3 * 128 // c)
    assert ref_rgb.shape == (b, r, wg, 3 * 128 // c)
    np.testing.assert_allclose(np.asarray(got_x2), np.asarray(ref_x2),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(got_rgb).reshape(ref_rgb.shape),
                               np.asarray(ref_rgb), atol=3e-5, rtol=3e-5)


def test_fused_section_multistripe_rgb_only():
    # r = 128 > the f32 max stripe (64) -> 2 stripes: exercises the halo DMA
    # branches, the per-stripe noise fetch across inner-batch steps, the
    # cross-stripe m-row recompute and want_x2=False.
    c, wg, b = 32, 32, 2
    r = wg * 128 // c
    assert r == 128
    x = jax.random.normal(jax.random.key(0), (b, r // 2, wg, 128))
    args = _section_args(jax.random.key(1), c, b, r)
    with jax.default_matmul_precision("highest"):
        ref_rgb, _ = _section_twin(x, **args)
        got_rgb = stp.fused_section(x, want_x2=False, **args)
    k = stp.rgb_merge_factor(c, wg)
    assert got_rgb.shape == (b, r, wg // k, k * 12)
    np.testing.assert_allclose(np.asarray(got_rgb).reshape(ref_rgb.shape),
                               np.asarray(ref_rgb), atol=3e-5, rtol=3e-5)


def test_fused_section_validates_shapes():
    c, wg, b = 32, 8, 1
    r = wg * 128 // c
    x = jax.random.normal(jax.random.key(0), (b, r // 2, wg, 128))
    args = _section_args(jax.random.key(1), c, b, r)
    bad = dict(args, w_same=jnp.zeros((3, 3, c, c + 1)))
    with pytest.raises(ValueError):
        stp.fused_section(x, **bad)
    with pytest.raises(ValueError):
        stp.fused_section(x[..., :64], **args)


# ---------------------------------------------------------------------------
# Model-level routing (StyleGAN2Generator tail_layout='pallas')

def _small_gens(resolution):
    base = sg.StyleGAN2Generator(resolution=resolution, n_mlp=2,
                                 channel_multiplier=1)
    return (dc.replace(base, tail_layout="pallas"),
            dc.replace(base, tail_layout="foldx"))


@pytest.mark.parametrize("resolution", [256, 512])
def test_model_pallas_tail_matches_foldx(resolution):
    # resolution 256 @ cm=1 engages one fused section (C=64); 512 engages two
    # (C=64 then C=32, exercising the x2 handoff between kernels).
    gen_p, gen_f = _small_gens(resolution)
    params = gen_f.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 512))
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(gen_f.apply(params, z))
        got = np.asarray(gen_p.apply(params, z))
    assert got.shape == ref.shape == (2, resolution, resolution, 3)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=5e-5)


def test_model_pallas_s2d_out_falls_back_to_s2d():
    gen_p, _ = _small_gens(256)
    gen_s = dc.replace(gen_p, tail_layout="s2d")
    params = gen_p.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 512))
    a = gen_p.apply(params, z, out_layout="s2d")
    b = gen_s.apply(params, z, out_layout="s2d")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_pallas_randomized_noise_falls_back_to_foldx():
    gen_p, gen_f = _small_gens(256)
    params = gen_p.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (1, 512))
    a = gen_p.synthesis(params, jnp.repeat(gen_p.style(params, z)[:, None, :],
                                           gen_p.n_latent, axis=1),
                        randomize_noise=True, noise_key=jax.random.key(7))
    b = gen_f.synthesis(params, jnp.repeat(gen_f.style(params, z)[:, None, :],
                                           gen_f.n_latent, axis=1),
                        randomize_noise=True, noise_key=jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_pallas_grad_safety_net():
    # Differentiating the pallas path must work (fold-x twin VJP) and match
    # the fold-x composition's gradient.
    gen_p, gen_f = _small_gens(256)
    params = gen_p.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (1, 512))
    with jax.default_matmul_precision("highest"):
        gp = jax.grad(lambda z: jnp.sum(gen_p.apply(params, z) ** 2))(z)
        gf = jax.grad(lambda z: jnp.sum(gen_f.apply(params, z) ** 2))(z)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gf),
                               atol=2e-4, rtol=2e-4)


def test_merged_skip_blur_up_matches_foldx_blur():
    # All three fold regimes: entry (fp=1 -> fm), strided (fp=2 -> fm) and
    # the equal-fold pair path (fp == fm), against the fold-x blur-upsample
    # composition + logical reshape.
    r_in, w_in = 16, 64
    for fp, fm in [(1, 8), (2, 8), (8, 8)]:
        skip = jax.random.normal(jax.random.key(fp), (2, r_in, w_in // fp, fp * 3))
        got = stp.merged_skip_blur_up(skip, fm)
        kk = sg._foldx_up_blur_kernel(3, fp, skip.dtype)
        ref = sg._foldx_conv(skip, kk, up=True)  # (2, 2r, w/fp... fold 2fp)
        ref = ref.reshape(got.shape)
        assert got.shape == (2, 2 * r_in, 2 * w_in // fm, fm * 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
