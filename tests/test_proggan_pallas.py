"""Fused ProgGAN tail kernel (ops/proggan_tail_pallas.py).

The kernel runs in interpret mode off-TPU (rbf_pallas._interpret), so these
tests exercise the REAL kernel logic — grid/DMA/halo/phase algebra — on the
CPU harness; scripts/check_kernels_tpu.py re-validates on hardware. All
comparisons run under ``jax.default_matmul_precision('highest')``: at the
default (TPU-emulating) precision both the kernel and the composition round
matmul operands to bf16, so only the f32 path is exactly comparable.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warpedganspace_tpu.models.proggan import _BLOCK_SPECS, ProgGANGenerator
from warpedganspace_tpu.nn import core as nn
from warpedganspace_tpu.ops import proggan_tail_pallas as ptp

# Tiny chain matching the fused-tail pattern: entry at block 4 (up 128->64),
# then (64,64), (32,32), (16,16) + head; final resolution 64^2.
TINY_CH = [128, 128, 128, 128, 128, 64, 64, 32, 32, 16, 16]


def _section_twin(x, w_up, b_up, s_up, w_same, b_same, s_same, head=None):
    x = nn.pixel_norm(x)
    x = nn.upsample_nearest(x, 2)
    x = nn.conv2d({"w": w_up}, x, padding=1)
    x = x * s_up + b_up
    x = jnp.where(x >= 0, x, 0.2 * x)
    x = nn.pixel_norm(x)
    x = nn.conv2d({"w": w_same}, x, padding=1)
    x = x * s_same + b_same
    x = jnp.where(x >= 0, x, 0.2 * x)
    if head is not None:
        w_out, b_out, s_out = head
        x = nn.pixel_norm(x)
        x = nn.conv2d({"w": w_out}, x, padding=0)
        x = x * s_out + b_out
    return x


def _section_args(key, c):
    ks = jax.random.split(key, 6)
    return (jax.random.normal(ks[0], (3, 3, 2 * c, c)) * 0.1,
            jax.random.normal(ks[1], (c,)) * 0.1,
            jnp.asarray(1.3),
            jax.random.normal(ks[2], (3, 3, c, c)) * 0.1,
            jax.random.normal(ks[3], (c,)) * 0.1,
            jnp.asarray(0.8))


@pytest.mark.parametrize("c", [16, 64])
def test_fused_section_matches_composition(c):
    key = jax.random.key(c)
    # width must give wg = W / (64/c) >= 8 and % 8 == 0
    w = 8 * (64 // c)
    x = jax.random.normal(key, (2, 8, w, 2 * c))
    args = _section_args(jax.random.key(c + 1), c)
    with jax.default_matmul_precision("highest"):
        ref = _section_twin(x, *args)
        got = ptp.unfold_x(
            ptp.fused_section(ptp.fold_x(x, 64 // c), *args), 128 // c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_section_multistripe_and_head():
    # R = 512 > _MAX_STRIPE -> 2 stripes; exercises the halo DMA branches,
    # the cross-stripe up-row recompute and the RGB head.
    c = 16
    key = jax.random.key(0)
    x = jax.random.normal(key, (1, 256, 64, 2 * c))
    args = _section_args(jax.random.key(1), c)
    ks = jax.random.split(jax.random.key(2), 2)
    head = (jax.random.normal(ks[0], (1, 1, c, 3)) * 0.2,
            jax.random.normal(ks[1], (3,)) * 0.1,
            jnp.asarray(1.1))
    with jax.default_matmul_precision("highest"):
        ref = _section_twin(x, *args, head=head)
        got = ptp.unfold_x(
            ptp.fused_section(ptp.fold_x(x, 64 // c), *args, head=head),
            128 // c)
    assert got.shape == ref.shape == (1, 512, 128, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_model_pallas_tail_matches_nhwc():
    gen_p = ProgGANGenerator(dim_z=128, tail_layout="pallas")
    gen_n = ProgGANGenerator(dim_z=128, tail_layout="nhwc")
    params = gen_p.init(jax.random.key(0), channels=TINY_CH)
    z = jax.random.normal(jax.random.key(1), (2, 128))
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(lambda p, z: gen_n.apply(p, z))(params, z)
        got = jax.jit(lambda p, z: gen_p.apply(p, z))(params, z)
    assert got.shape == ref.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_pallas_tail_s2d_out_falls_back_to_s2d_composition():
    gen_p = ProgGANGenerator(dim_z=128, tail_layout="pallas")
    gen_s = ProgGANGenerator(dim_z=128, tail_layout="s2d")
    params = gen_p.init(jax.random.key(0), channels=TINY_CH)
    z = jax.random.normal(jax.random.key(1), (2, 128))
    a = gen_p.apply(params, z, out_layout="s2d")
    b = gen_s.apply(params, z, out_layout="s2d")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_tail_falls_back_on_nonmatching_chain():
    # The default test chain (512 everywhere then an abrupt 16) does not end
    # in the halving (up, same) pattern -> pallas must route to nhwc, not die.
    ch = [512, 256, 256, 128, 128]
    gen_p = ProgGANGenerator(tail_layout="pallas")
    gen_n = ProgGANGenerator(tail_layout="nhwc")
    params = gen_p.init(jax.random.key(0), channels=ch)
    z = jax.random.normal(jax.random.key(1), (2, 512))
    a = gen_p.apply(params, z)
    b = gen_n.apply(params, z)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tail_sections_from_blocks_real_chain():
    gen = ProgGANGenerator()
    params = jax.eval_shape(lambda k: gen.init(k), jax.random.key(0))
    n_head, sections = ptp.tail_sections_from_blocks(
        params["blocks"], _BLOCK_SPECS)
    assert n_head == 12  # blocks 12..17 fuse: (64,64) (32,32) (16,16)
    assert [s["up"]["conv"]["w"].shape[3] for s in sections] == [64, 32, 16]


def test_pallas_tail_grad_safety_net():
    # Differentiating the pallas path must work (jnp-twin VJP) and match the
    # nhwc composition's gradient.
    gen_p = ProgGANGenerator(dim_z=128, tail_layout="pallas")
    gen_n = ProgGANGenerator(dim_z=128, tail_layout="nhwc")
    params = gen_p.init(jax.random.key(0), channels=TINY_CH)
    z = jax.random.normal(jax.random.key(1), (1, 128))
    with jax.default_matmul_precision("highest"):
        gp = jax.grad(lambda z: jnp.sum(gen_p.apply(params, z) ** 2))(z)
        gn = jax.grad(lambda z: jnp.sum(gen_n.apply(params, z) ** 2))(z)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gn),
                               atol=1e-4, rtol=1e-4)
