"""StyleGAN2 generator parity vs the reference torch implementation.

The reference model imports CUDA-JIT ops at module import
(models/StyleGAN2/op/__init__.py), which cannot build in this CPU-only image.
We inject a pure-torch `models.StyleGAN2.op` stub implementing the documented
op semantics (upfirdn2d_native, op/upfirdn2d.py:152-186; fused bias+leaky-relu,
op/fused_act.py:73-86) before importing the reference Generator, then check our
JAX port end-to-end at 256px (same code paths as 1024, 2 fewer blocks).
"""
import math
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_utils import add_reference_to_path, state_dict_numpy, torch_or_skip


def _install_op_stub(torch):
    """Pure-torch stand-ins for the reference CUDA ops, faithful to
    upfirdn2d_native / fused_bias_act semantics."""
    F = torch.nn.functional

    def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
        b, c, in_h, in_w = x.shape
        kh, kw = kernel.shape
        pad_x0, pad_x1, pad_y0, pad_y1 = pad[0], pad[1], pad[0], pad[1]
        out = x.reshape(b * c, 1, in_h, 1, in_w, 1)
        out = F.pad(out, [0, up - 1, 0, 0, 0, up - 1])
        out = out.reshape(b * c, 1, in_h * up, in_w * up)
        out = F.pad(out, [max(pad_x0, 0), max(pad_x1, 0), max(pad_y0, 0), max(pad_y1, 0)])
        out = out[
            :,
            :,
            max(-pad_y0, 0) : out.shape[2] - max(-pad_y1, 0),
            max(-pad_x0, 0) : out.shape[3] - max(-pad_x1, 0),
        ]
        w = torch.flip(kernel, [0, 1]).reshape(1, 1, kh, kw)
        out = F.conv2d(out, w)
        out = out[:, :, ::down, ::down]
        return out.reshape(b, c, out.shape[2], out.shape[3])

    def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2**0.5):
        if bias is not None:
            shape = [1] * x.ndim
            shape[1] = bias.shape[0]
            x = x + bias.reshape(shape)
        return scale * F.leaky_relu(x, negative_slope)

    class FusedLeakyReLU(torch.nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2**0.5):
            super().__init__()
            self.bias = torch.nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, x):
            return fused_leaky_relu(x, self.bias, self.negative_slope, self.scale)

    mod = types.ModuleType("models.StyleGAN2.op")
    mod.upfirdn2d = upfirdn2d
    mod.fused_leaky_relu = fused_leaky_relu
    mod.FusedLeakyReLU = FusedLeakyReLU
    sys.modules["models.StyleGAN2.op"] = mod


@pytest.fixture(scope="module")
def ref_generator():
    torch = torch_or_skip()
    add_reference_to_path()
    _install_op_stub(torch)
    from models.StyleGAN2.model import Generator as RefStyleGAN2

    torch.manual_seed(0)
    G = RefStyleGAN2(256, 512, 8).eval()
    return torch, G


def _convert(G, resolution):
    from warpedganspace_tpu.convert.stylegan2 import stylegan2_params_from_state_dict

    return stylegan2_params_from_state_dict(state_dict_numpy(G), resolution)


def test_mapping_network_parity(ref_generator):
    torch, G = ref_generator
    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    gen = StyleGAN2Generator(resolution=256)
    params = _convert(G, 256)
    z = np.random.RandomState(0).randn(4, 512).astype(np.float32)
    with torch.no_grad():
        ref_w = G.get_latent(torch.from_numpy(z)).numpy()
    w = np.asarray(gen.get_w(params, jnp.asarray(z)))
    np.testing.assert_allclose(w, ref_w, rtol=1e-3, atol=1e-5)


def test_synthesis_parity_z_space(ref_generator):
    torch, G = ref_generator
    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    gen = StyleGAN2Generator(resolution=256)
    params = _convert(G, 256)
    z = np.random.RandomState(1).randn(2, 512).astype(np.float32)
    with torch.no_grad():
        ref_img = G([torch.from_numpy(z)], input_is_latent=False, randomize_noise=False)[0].numpy()
    img = np.asarray(gen.apply(params, jnp.asarray(z)))
    img_nchw = img.transpose(0, 3, 1, 2)
    assert img_nchw.shape == ref_img.shape == (2, 3, 256, 256)

    peak = ref_img.max() - ref_img.min()
    psnr = 10 * math.log10(peak**2 / float(np.mean((img_nchw - ref_img) ** 2)))
    assert psnr > 40.0, f"PSNR {psnr:.1f} dB"
    np.testing.assert_allclose(img_nchw, ref_img, rtol=5e-2, atol=5e-3)


def test_synthesis_parity_w_space_with_shift(ref_generator):
    torch, G = ref_generator
    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    gen = StyleGAN2Generator(resolution=256, shift_in_w_space=True)
    params = _convert(G, 256)
    rng = np.random.RandomState(2)
    z = rng.randn(1, 512).astype(np.float32)
    shift = 0.05 * rng.randn(1, 512).astype(np.float32)

    with torch.no_grad():
        w_ref = G.get_latent(torch.from_numpy(z))
        ref_img = G([w_ref + torch.from_numpy(shift)], input_is_latent=True,
                    randomize_noise=False)[0].numpy()
    img = np.asarray(gen.apply(params, jnp.asarray(z), jnp.asarray(shift)))
    img_nchw = img.transpose(0, 3, 1, 2)
    peak = ref_img.max() - ref_img.min()
    psnr = 10 * math.log10(peak**2 / float(np.mean((img_nchw - ref_img) ** 2)))
    assert psnr > 40.0, f"PSNR {psnr:.1f} dB"


def test_truncation_and_mixing(ref_generator):
    torch, G = ref_generator
    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    gen = StyleGAN2Generator(resolution=256)
    params = _convert(G, 256)
    rng = np.random.RandomState(3)
    z1 = rng.randn(1, 512).astype(np.float32)
    z2 = rng.randn(1, 512).astype(np.float32)

    with torch.no_grad():
        trunc_ref = G.mean_latent(64)
        ref_img = G(
            [torch.from_numpy(z1), torch.from_numpy(z2)],
            input_is_latent=False,
            inject_index=7,
            truncation=0.7,
            truncation_latent=trunc_ref,
            randomize_noise=False,
        )[0].numpy()

    img = np.asarray(
        gen.forward(
            params,
            [jnp.asarray(z1), jnp.asarray(z2)],
            inject_index=7,
            truncation=0.7,
            truncation_latent=jnp.asarray(trunc_ref.numpy()),
        )
    ).transpose(0, 3, 1, 2)
    peak = ref_img.max() - ref_img.min()
    psnr = 10 * math.log10(peak**2 / float(np.mean((img - ref_img) ** 2)))
    assert psnr > 40.0, f"PSNR {psnr:.1f} dB"


def test_remat_matches_no_remat():
    """Gradients through the remat'd synthesis equal the plain ones."""
    import jax

    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    gen = StyleGAN2Generator(resolution=64)
    gen_remat = StyleGAN2Generator(resolution=64, remat=True)
    params = gen.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 512))
    shift = jnp.zeros_like(z)

    def loss(g, s):
        return jnp.mean(jnp.square(g.apply(params, z, s)))

    l1, g1 = jax.value_and_grad(lambda s: loss(gen, s))(shift)
    l2, g2 = jax.value_and_grad(lambda s: loss(gen_remat, s))(shift)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-7)


def test_synthesis_parity_nchw_tail():
    """channel_multiplier=1 puts C=64/32 at res 128/256, exercising the NCHW
    small-channel layout switch; output must still match the reference."""
    torch = torch_or_skip()
    add_reference_to_path()
    _install_op_stub(torch)
    from models.StyleGAN2.model import Generator as RefStyleGAN2

    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    torch.manual_seed(1)
    G = RefStyleGAN2(256, 512, 2, channel_multiplier=1).eval()
    gen = StyleGAN2Generator(resolution=256, n_mlp=2, channel_multiplier=1)
    params = _convert(G, 256)

    z = np.random.RandomState(7).randn(2, 512).astype(np.float32)
    with torch.no_grad():
        ref_img = G([torch.from_numpy(z)], input_is_latent=False,
                    randomize_noise=False)[0].numpy()
    img = np.asarray(gen.apply(params, jnp.asarray(z))).transpose(0, 3, 1, 2)
    peak = ref_img.max() - ref_img.min()
    psnr = 10 * math.log10(peak**2 / float(np.mean((img - ref_img) ** 2)))
    assert psnr > 40.0, f"PSNR {psnr:.1f} dB"


def test_synthesis_parity_s2d_chain():
    """channel_multiplier=1 at 512px gives TWO consecutive <128-channel blocks,
    exercising the S2D->S2D upsample conv and blur-up kernels."""
    torch = torch_or_skip()
    add_reference_to_path()
    _install_op_stub(torch)
    from models.StyleGAN2.model import Generator as RefStyleGAN2

    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    torch.manual_seed(2)
    G = RefStyleGAN2(512, 512, 2, channel_multiplier=1).eval()
    gen = StyleGAN2Generator(resolution=512, n_mlp=2, channel_multiplier=1)
    params = _convert(G, 512)

    z = np.random.RandomState(8).randn(1, 512).astype(np.float32)
    with torch.no_grad():
        ref_img = G([torch.from_numpy(z)], input_is_latent=False,
                    randomize_noise=False)[0].numpy()
    img = np.asarray(gen.apply(params, jnp.asarray(z))).transpose(0, 3, 1, 2)
    assert img.shape == ref_img.shape == (1, 3, 512, 512)
    peak = ref_img.max() - ref_img.min()
    psnr = 10 * math.log10(peak**2 / float(np.mean((img - ref_img) ** 2)))
    assert psnr > 40.0, f"PSNR {psnr:.1f} dB"


def test_tail_layouts_equivalent():
    """s2d / nchw / nhwc tail layouts produce the same images."""
    import dataclasses as dc

    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    # resolution 256 @ channel_multiplier 1 has 64/32-channel blocks, so the
    # tail layouts actually engage (128 would be all-NHWC and vacuous).
    base = StyleGAN2Generator(resolution=256, n_mlp=2, channel_multiplier=1)
    params = base.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 512))
    outs = {}
    for layout in ("s2d", "nchw", "nhwc", "foldx"):
        gen = dc.replace(base, tail_layout=layout)
        outs[layout] = np.asarray(gen.apply(params, z))
    np.testing.assert_allclose(outs["s2d"], outs["nhwc"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outs["nchw"], outs["nhwc"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outs["foldx"], outs["nhwc"], rtol=1e-4, atol=1e-5)


def test_remat_policies_same_output():
    """remat False / 'tail' / True are pure memory/recompute trades — the
    forward output and gradients must be identical."""
    import jax
    import jax.numpy as jnp

    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    gens = {
        r: StyleGAN2Generator(resolution=128, channel_multiplier=1, n_mlp=2, remat=r)
        for r in (False, "tail", True)
    }
    params = gens[False].init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 512))
    sh = 0.05 * jax.random.normal(jax.random.key(2), (2, 512))

    outs = {r: g.apply(params, z, sh) for r, g in gens.items()}
    np.testing.assert_allclose(np.asarray(outs["tail"]), np.asarray(outs[False]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[True]), np.asarray(outs[False]),
                               rtol=1e-6, atol=1e-6)

    def loss(g):
        def f(s):
            return jnp.sum(g.apply(params, z, s) ** 2)
        return jax.grad(f)(sh)

    g_tail, g_off = loss(gens["tail"]), loss(gens[False])
    np.testing.assert_allclose(np.asarray(g_tail), np.asarray(g_off), rtol=1e-4, atol=1e-5)


def test_out_layout_s2d_matches_nhwc():
    """apply(out_layout='s2d') is exactly to_s2d(apply()) — with the S2D tail
    it skips the final from_s2d; with other tails it pays one transpose."""
    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator
    from warpedganspace_tpu.ops.s2d import to_s2d

    z = jax.random.normal(jax.random.key(1), (2, 512))
    for tail in ("s2d", "nhwc", "foldx"):
        gen = StyleGAN2Generator(resolution=256, n_mlp=2, channel_multiplier=1,
                                 tail_layout=tail)
        params = gen.init(jax.random.key(0))
        a = gen.apply(params, z)
        b = gen.apply(params, z, out_layout="s2d")
        assert b.shape == (2, 128, 128, 12)
        np.testing.assert_allclose(b, to_s2d(a), atol=1e-6)


def test_apply_head_tail_split_exact():
    """apply_head + apply_tail must reproduce apply bit-exactly at every
    legal split point (the train step's low-res fusion relies on this)."""
    import jax
    import jax.numpy as jnp

    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    for wspace in (True, False):
        gen = StyleGAN2Generator(resolution=64, n_mlp=2, shift_in_w_space=wspace)
        p = gen.init(jax.random.key(0))
        z = jax.random.normal(jax.random.key(1), (2, 512))
        s = 0.1 * jax.random.normal(jax.random.key(2), (2, 512))
        want = gen.apply(p, z, s)
        for stop_res in (8, 16, 32):
            got = gen.apply_tail(p, gen.apply_head(p, z, s, stop_res=stop_res),
                                 stop_res=stop_res)
            assert float(jnp.max(jnp.abs(got - want))) == 0.0, (wspace, stop_res)

    # nhwc tail never transitions fmt, so splits past the <128-channel
    # boundary (res 256 at cm=1: 64 channels) are legal there — and only
    # there: the s2d layout must reject them.
    gen = StyleGAN2Generator(resolution=256, n_mlp=2, channel_multiplier=1,
                             tail_layout="nhwc")
    p = gen.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (1, 512))
    want = gen.apply(p, z)
    got = gen.apply_tail(p, gen.apply_head(p, z, stop_res=256), stop_res=256)
    assert float(jnp.max(jnp.abs(got - want))) == 0.0

    gen_s2d = StyleGAN2Generator(resolution=256, n_mlp=2, channel_multiplier=1)
    import pytest

    with pytest.raises(ValueError, match="transition"):
        gen_s2d.apply_head(p, z, stop_res=256)
