"""Op-level tests: upfirdn2d vs naive model, fused_leaky_relu."""
import math

import numpy as np
import pytest

import jax.numpy as jnp

from warpedganspace_tpu.ops import fused_leaky_relu, upfirdn2d


def naive_upfirdn2d(x_nhwc, kernel, up, down, pad):
    """Straightforward numpy model of the reference upfirdn2d_native
    (op/upfirdn2d.py:152-186): zero-stuff (trailing zeros included), pad/crop,
    correlate with the flipped kernel, downsample."""
    up_y = up_x = up
    down_y = down_x = down
    pad_x0, pad_x1, pad_y0, pad_y1 = pad[0], pad[1], pad[0], pad[1]
    b, h, w, c = x_nhwc.shape
    out = np.zeros((b, h * up_y, w * up_x, c), dtype=np.float64)
    out[:, ::up_y, ::up_x, :] = x_nhwc
    # Edge pad (positive) then crop (negative).
    out = np.pad(
        out,
        (
            (0, 0),
            (max(pad_y0, 0), max(pad_y1, 0)),
            (max(pad_x0, 0), max(pad_x1, 0)),
            (0, 0),
        ),
    )
    out = out[
        :,
        max(-pad_y0, 0) : out.shape[1] - max(-pad_y1, 0),
        max(-pad_x0, 0) : out.shape[2] - max(-pad_x1, 0),
        :,
    ]
    kh, kw = kernel.shape
    wk = np.flip(kernel, (0, 1))
    oh = out.shape[1] - kh + 1
    ow = out.shape[2] - kw + 1
    res = np.zeros((b, oh, ow, c), dtype=np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = out[:, i : i + kh, j : j + kw, :]
            res[:, i, j, :] = np.einsum("bhwc,hw->bc", patch, wk)
    return res[:, ::down_y, ::down_x, :]


@pytest.mark.parametrize(
    "up,down,pad",
    [
        (1, 1, (1, 1)),
        (2, 1, (2, 1)),   # StyleGAN2 upsample mode
        (1, 2, (1, 1)),   # StyleGAN2 downsample mode
        (2, 2, (1, 1)),
        (1, 1, (-1, 2)),  # negative padding (crop)
    ],
)
def test_upfirdn2d_matches_naive(up, down, pad):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    k = rng.randn(4, 4).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad))
    want = naive_upfirdn2d(x, k, up, down, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_output_size_formula():
    x = jnp.ones((1, 16, 16, 2))
    k = jnp.ones((3, 3)) / 9.0
    out = upfirdn2d(x, k, up=2, down=1, pad=(2, 1))
    # (16*2 + 2 + 1 - 3)//1 + 1 = 33
    assert out.shape == (1, 33, 33, 2)


def test_fused_leaky_relu():
    x = jnp.array([[-1.0, 2.0], [3.0, -4.0]])
    b = jnp.array([0.5, -0.5])
    out = fused_leaky_relu(x, b, negative_slope=0.2, scale=math.sqrt(2.0))
    pre = np.array([[-0.5, 1.5], [3.5, -4.5]])
    want = math.sqrt(2.0) * np.where(pre >= 0, pre, 0.2 * pre)
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_nearest_up_conv_merged_kernel_exact():
    """[2x nearest-up -> conv3x3(pad 1)] == one lhs-dilated conv with the
    merged 4x4 kernel (ops/s2d.py) — the BigGAN/SNGAN/ProgGAN up-block
    reformulation. Exact at HIGHEST matmul precision, including borders."""
    import jax

    from warpedganspace_tpu.nn import core as nn
    from warpedganspace_tpu.ops import s2d

    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 5, 7, 6))
    w = jax.random.normal(jax.random.key(1), (3, 3, 6, 4))
    with jax.default_matmul_precision("highest"):
        ref = nn.conv2d({"w": w}, nn.upsample_nearest(x, 2), padding=1)
        got = s2d.nearest_up_conv_merged_apply(
            x, s2d.nearest_up_conv_merged_kernel(w))
    assert got.shape == ref.shape == (2, 10, 14, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
