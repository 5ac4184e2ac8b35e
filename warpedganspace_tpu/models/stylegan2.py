"""StyleGAN2 (config-f, FFHQ 256/1024) generator.

Behavioral parity with reference ``models/StyleGAN2/model.py``: 8-layer mapping
network with PixelNorm and equalized lr (lr_mul 0.01, :286-295), constant 4x4
input (:243-249), styled modulated/demodulated convs with blur-composed up-
sampling (:148-237, :252-267), fixed registered noise buffers (:325-329, used
when randomize_noise=False — the pipeline default, gan_load.py wrapper), skip-
accumulated ToRGB (:270-282), truncation (:370-374) and style mixing via
inject_index (:376-387).

TPU-first re-design (NOT a translation):

- The reference materializes per-sample conv weights and runs a grouped conv
  with groups=batch (model.py:187-228) — hostile to the MXU. Here modulation
  uses the exact linear-algebra factorization: conv(x, w * s_b) ==
  conv(x * s_b, w) for per-input-channel styles s_b, and demodulation is a
  per-(sample, out-channel) scalar computed as
  rsqrt(sum_i s_i^2 * W2[i,o] + eps) with W2[i,o] = sum_kh,kw w^2 — one tiny
  (B,in)x(in,out) matmul. Every sample shares ONE conv weight, so XLA tiles a
  single large convolution onto the MXU. NOTE: the reference adds eps *inside*
  rsqrt over the *scaled* weight (scale*w*style), which this reproduces
  exactly by folding the equalized-lr scale into w at conversion time.
- The stride-2 transposed conv (model.py:210-218) becomes an lhs-dilated
  convolution with the spatially-flipped kernel — the XLA-native form.
- upfirdn2d blurs use :mod:`warpedganspace_tpu.ops.upfirdn2d` (one fused XLA
  conv per blur; see that module).
- Equalized-lr runtime scales (EqualLinear :110-131, ModulatedConv :177-178)
  are folded into the stored weights by the converter — valid because the
  generator is frozen — so apply() touches each weight exactly once.

Activations NHWC; weights HWIO.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax import lax

from warpedganspace_tpu.nn import core as nn
from warpedganspace_tpu.ops.fused_act import fused_leaky_relu
from warpedganspace_tpu.ops.upfirdn2d import upfirdn2d

BLUR_KERNEL = (1.0, 3.0, 3.0, 1.0)


def _make_blur_kernel(gain: float = 1.0) -> jnp.ndarray:
    k = jnp.asarray(BLUR_KERNEL, dtype=jnp.float32)
    k = jnp.outer(k, k)
    return k / jnp.sum(k) * gain


def channels_dict(channel_multiplier: int = 2) -> dict[int, int]:
    """Per-resolution channel table (reference model.py:297-307)."""
    return {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


def _modulate(w_hwio, style, demodulate: bool):
    """Per-sample modulation factors.

    Args:
        w_hwio: (kh, kw, in, out) scale-folded weight.
        style:  (B, in) modulation (output of the style EqualLinear).

    Returns (s, d): input scaling (B, in) and output demod (B, out) or None.
    """
    if not demodulate:
        return style, None
    w2 = jnp.sum(jnp.square(w_hwio), axis=(0, 1))  # (in, out)
    denom = jnp.square(style) @ w2                 # (B, out)
    d = lax.rsqrt(denom + 1e-8)
    return style, d


def _cvec(v, fmt):
    """Broadcast a (B, C) per-sample channel vector to the activation layout."""
    return v[:, None, None, :] if fmt == "NHWC" else v[:, :, None, None]


def modulated_conv2d(p: dict, x, style, demodulate: bool = True, upsample: bool = False,
                     fmt: str = "NHWC"):
    """Styled conv: modulation -> conv (or lhs-dilated 'transposed' conv) ->
    demodulation [-> blur when upsampling].

    ``fmt`` selects the activation layout: the high-resolution synthesis tail
    has <=64 channels, which NHWC would pad to the 128-wide lane dimension
    (measured 5.3x HBM expansion at 1024^2); running it NCHW puts W on the
    lanes instead.
    """
    w = p["w"]  # (kh, kw, in, out), equalized-lr scale folded in
    kh = w.shape[0]
    s = nn.linear(p["mod"], style)  # (B, in); bias_init=1 folded in converter
    s, d = _modulate(w, s, demodulate)

    x = x * _cvec(s, fmt)
    if upsample:
        # conv_transpose(stride 2, pad 0) == lhs-dilated correlation with the
        # spatially flipped kernel, full (k-1) padding. Alternatives measured
        # on v5e and found SLOWER: fusing the 4x4 blur into a 6x6 dilated
        # kernel (127 vs 149 img/s f32 — dilated zeros quadruple MXU work) and
        # a polyphase/pixel-shuffle decomposition of that composite (111 f32 /
        # 138 bf16 vs 155 bf16) — XLA already optimizes the 3x3 dilation well.
        w_t = jnp.flip(w, axis=(0, 1))
        x = lax.conv_general_dilated(
            x,
            w_t,
            window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kh - 1, kh - 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=(fmt, "HWIO", fmt),
        )
    else:
        pad = kh // 2
        x = lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=(fmt, "HWIO", fmt),
        )
    if d is not None:
        x = x * _cvec(d, fmt)
    if upsample:
        # Blur: kernel gain factor^2=4, pad (1, 1) for k=3, f=2, blur len 4
        # (reference ModulatedConv2d :160-166).
        pad0 = (len(BLUR_KERNEL) - 2 - (kh - 1) + 1) // 2 + 1
        pad1 = (len(BLUR_KERNEL) - 2 - (kh - 1)) // 2 + 1
        x = upfirdn2d(x, _make_blur_kernel(gain=4.0), pad=(pad0, pad1), data_format=fmt)
    return x


def styled_conv(p: dict, x, style, noise=None, upsample: bool = False, fmt: str = "NHWC"):
    """StyledConv: modulated conv + noise injection + fused bias/leaky-relu
    (reference :252-267). ``upsample`` is static structure (convs alternate
    up/plain), NOT a params leaf — a bool leaf would be traced under jit."""
    x = modulated_conv2d(p, x, style, demodulate=True, upsample=upsample, fmt=fmt)
    if noise is not None:
        if fmt == "NCHW":
            noise = jnp.transpose(noise, (0, 3, 1, 2))  # (1, H, W, 1) -> (1, 1, H, W)
        x = x + p["noise_weight"] * noise
    return fused_leaky_relu(x, p["act_bias"], channel_axis=-1 if fmt == "NHWC" else 1)


def to_rgb(p: dict, x, style, skip=None, fmt: str = "NHWC"):
    """ToRGB with skip accumulation through a blur-upsample (reference :270-282)."""
    out = modulated_conv2d(p, x, style, demodulate=False, upsample=False, fmt=fmt)
    out = out + (p["bias"] if fmt == "NHWC" else p["bias"][:, None, None])
    if skip is not None:
        # Upsample(blur): kernel gain 4, pad0=(p+1)//2+f-1, pad1=p//2, p=len-2.
        skip = upfirdn2d(skip, _make_blur_kernel(gain=4.0), up=2, pad=(2, 1),
                         data_format=fmt)
        out = out + skip
    return out


@dataclasses.dataclass(frozen=True)
class StyleGAN2Generator:
    resolution: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    shift_in_w_space: bool = False
    # Rematerialize per-resolution blocks during backprop-through-G (training
    # at 1024^2 with bs 8-12 otherwise exhausts HBM — SURVEY hard part #2).
    remat: bool = False

    @property
    def dim_z(self) -> int:
        return 512

    @property
    def log_size(self) -> int:
        return int(math.log2(self.resolution))

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    # --------------------------------------------------------------------- init
    def init(self, key: jax.Array) -> dict:
        """Random init with the same distributions/scale-folding the converter
        produces (weights ~ N(0, scale^2))."""
        ch = channels_dict(self.channel_multiplier)
        keys = iter(jax.random.split(key, 256))

        def eq_linear(in_dim, out_dim, lr_mul=1.0, bias_init=0.0):
            scale = (1.0 / math.sqrt(in_dim)) * lr_mul
            return {
                "w": jax.random.normal(next(keys), (in_dim, out_dim)) / lr_mul * scale,
                "b": jnp.full((out_dim,), bias_init),
            }

        def styled(in_ch, out_ch, k):
            scale = 1.0 / math.sqrt(in_ch * k * k)
            return {
                "w": jax.random.normal(next(keys), (k, k, in_ch, out_ch)) * scale,
                "mod": eq_linear(self.style_dim, in_ch, bias_init=1.0),
                "noise_weight": jnp.zeros(()),
                "act_bias": jnp.zeros((out_ch,)),
            }

        def rgb(in_ch):
            scale = 1.0 / math.sqrt(in_ch)
            return {
                "w": jax.random.normal(next(keys), (1, 1, in_ch, 3)) * scale,
                "mod": eq_linear(self.style_dim, in_ch, bias_init=1.0),
                "bias": jnp.zeros((3,)),
            }

        params = {
            "mapping": [
                eq_linear(self.style_dim, self.style_dim, lr_mul=0.01)
                for _ in range(self.n_mlp)
            ],
            "const_input": jax.random.normal(next(keys), (1, 4, 4, ch[4])),
            "conv1": styled(ch[4], ch[4], 3),
            "to_rgb1": rgb(ch[4]),
            "convs": [],
            "to_rgbs": [],
            "noises": [
                jax.random.normal(
                    next(keys), (1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1)
                )
                for i in range(self.num_layers)
            ],
        }
        in_ch = ch[4]
        for i in range(3, self.log_size + 1):
            out_ch = ch[2**i]
            params["convs"].append(styled(in_ch, out_ch, 3))
            params["convs"].append(styled(out_ch, out_ch, 3))
            params["to_rgbs"].append(rgb(out_ch))
            in_ch = out_ch
        return params

    # ------------------------------------------------------------------ mapping
    def style(self, params: dict, z: jax.Array) -> jax.Array:
        """Mapping network Z -> W: PixelNorm + 8x EqualLinear(fused lrelu)
        (reference :286-295; ``get_latent`` :356-357)."""
        x = nn.pixel_norm(z)
        for layer in params["mapping"]:
            x = nn.linear(layer, x)
            # EqualLinear fused activation: bias is added pre-activation by
            # nn.linear (bias folded with lr_mul), so only the gain remains.
            x = fused_leaky_relu(x, None)
        return x

    def get_w(self, params: dict, z: jax.Array) -> jax.Array:
        return self.style(params, z)

    def mean_latent(self, params: dict, key: jax.Array, n_latent: int) -> jax.Array:
        z = jax.random.normal(key, (n_latent, self.style_dim))
        return jnp.mean(self.style(params, z), axis=0, keepdims=True)

    # ---------------------------------------------------------------- synthesis
    def synthesis(
        self,
        params: dict,
        latent: jax.Array,
        noise=None,
        randomize_noise: bool = False,
        noise_key=None,
    ) -> jax.Array:
        """Run the synthesis network on per-layer W latents (B, n_latent, 512)."""
        b = latent.shape[0]
        if noise is None:
            if randomize_noise:
                keys = jax.random.split(
                    noise_key if noise_key is not None else jax.random.key(0),
                    self.num_layers,
                )
                noise = [
                    jax.random.normal(keys[i], (b,) + params["noises"][i].shape[1:])
                    for i in range(self.num_layers)
                ]
            else:
                noise = params["noises"]

        ch = channels_dict(self.channel_multiplier)
        out = jnp.tile(params["const_input"], (b, 1, 1, 1))
        out = styled_conv(params["conv1"], out, latent[:, 0], noise[0])
        skip = to_rgb(params["to_rgb1"], out, latent[:, 1])

        def block(block_params, out, skip, lat3, n1, n2, fmt):
            conv_up, conv, rgb = block_params
            sc = styled_conv
            rg = to_rgb
            if self.remat:
                # Per-op remat: the backward then holds ONE high-res temp set
                # at a time (at 1024^2 the conv temps are lane-padded to ~4GB
                # each regardless of batch — XLA assigns feature-minor conv
                # layouts — so per-block remat still OOMs a 16GB chip).
                sc = jax.checkpoint(styled_conv, static_argnums=(4, 5))
                rg = jax.checkpoint(to_rgb, static_argnums=(4,))
            out = sc(conv_up, out, lat3[:, 0], n1, True, fmt)
            out = sc(conv, out, lat3[:, 1], n2, False, fmt)
            skip = rg(rgb, out, lat3[:, 2], skip, fmt)
            return out, skip

        if self.remat:
            block = jax.checkpoint(block, static_argnums=(6,))

        i = 1
        fmt = "NHWC"
        for idx in range(len(params["to_rgbs"])):
            res = 2 ** (idx + 3)
            # Switch the (out, skip) state to NCHW once channels drop below the
            # 128 lane width (resolutions >= 512 with channel_multiplier=2):
            # NHWC there pads C to 128 — a measured 4-5x HBM/bandwidth waste.
            if fmt == "NHWC" and ch[res] < 128:
                out = jnp.transpose(out, (0, 3, 1, 2))
                skip = jnp.transpose(skip, (0, 3, 1, 2))
                fmt = "NCHW"
            block_params = (
                params["convs"][2 * idx],
                params["convs"][2 * idx + 1],
                params["to_rgbs"][idx],
            )
            out, skip = block(
                block_params, out, skip, latent[:, i : i + 3],
                noise[2 * idx + 1], noise[2 * idx + 2], fmt,
            )
            i += 2
        if fmt == "NCHW":
            skip = jnp.transpose(skip, (0, 2, 3, 1))
        return skip

    def forward(
        self,
        params: dict,
        styles,
        input_is_latent: bool = False,
        inject_index: int | None = None,
        truncation: float = 1.0,
        truncation_latent=None,
        noise=None,
        randomize_noise: bool = False,
    ) -> jax.Array:
        """Full forward with style mixing / truncation (reference :359-403).

        ``styles`` is a list of (B, 512) latents, as in the reference. With two
        styles, ``inject_index`` must be given explicitly (the reference draws
        it with Python's RNG at trace-incompatible call time; pass it in).
        """
        if not input_is_latent:
            styles = [self.style(params, s) for s in styles]
        if truncation < 1.0:
            styles = [
                truncation_latent + truncation * (s - truncation_latent) for s in styles
            ]
        if len(styles) < 2:
            latent = jnp.repeat(styles[0][:, None, :], self.n_latent, axis=1)
        else:
            if inject_index is None:
                inject_index = self.n_latent // 2
            l1 = jnp.repeat(styles[0][:, None, :], inject_index, axis=1)
            l2 = jnp.repeat(styles[1][:, None, :], self.n_latent - inject_index, axis=1)
            latent = jnp.concatenate([l1, l2], axis=1)
        return self.synthesis(
            params, latent, noise=noise, randomize_noise=randomize_noise
        )

    # -------------------------------------------------------- uniform G contract
    def make_noise(self, key: jax.Array):
        """Fresh per-layer noise buffers (reference Generator.make_noise :333-342)."""
        keys = jax.random.split(key, self.num_layers)
        return [
            jax.random.normal(keys[i], (1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1))
            for i in range(self.num_layers)
        ]

    def apply(self, params: dict, z: jax.Array, shift=None, latent_is_w: bool = False):
        """Uniform wrapper contract (reference StyleGAN2Wrapper.forward,
        models/gan_load.py:157-179): shifts live in W-space when
        ``shift_in_w_space``, else in Z-space."""
        if self.shift_in_w_space:
            w = z if latent_is_w else self.style(params, z)
            if shift is not None:
                w = w + shift
            return self.forward(params, [w], input_is_latent=True)
        if shift is not None:
            z = z + shift
        return self.forward(params, [z], input_is_latent=False)


# =========================================================================== #
#  Discriminator (reference model.py:453-503 — unused by the WarpedGANSpace   #
#  pipeline but part of the model family surface).                            #
# =========================================================================== #


def _conv_layer(p: dict, x, downsample: bool, activate: bool = True):
    """ConvLayer (reference :424-450): [blur +] equal-conv [+ fused lrelu].
    Equalized-lr scales are folded into ``w`` at conversion."""
    k = p["w"].shape[0]
    if downsample:
        # Blur pad: pl = (p+1)//2, pr = p//2 with p = len(blur)-2 + (k-1).
        pb = (len(BLUR_KERNEL) - 2) + (k - 1)
        x = upfirdn2d(x, _make_blur_kernel(), pad=((pb + 1) // 2, pb // 2))
        x = lax.conv_general_dilated(
            x, p["w"], window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        pad = k // 2
        x = lax.conv_general_dilated(
            x, p["w"], window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if activate:
        x = fused_leaky_relu(x, p.get("act_bias"))
    elif "b" in p:
        x = x + p["b"]
    return x


def _d_res_block(p: dict, x):
    """ResBlock (reference :439-450): conv -> downsample conv, blur-conv skip,
    sum scaled by 1/sqrt(2)."""
    out = _conv_layer(p["conv1"], x, downsample=False)
    out = _conv_layer(p["conv2"], out, downsample=True)
    skip = _conv_layer(p["skip"], x, downsample=True, activate=False)
    return (out + skip) / math.sqrt(2.0)


def _minibatch_stddev(x, group_size: int = 4, eps: float = 1e-8):
    """Minibatch stddev feature (reference :489-495), NHWC."""
    b, h, w, c = x.shape
    group = min(b, group_size)
    y = x.reshape(group, b // group, h, w, c)
    std = jnp.sqrt(jnp.var(y, axis=0) + eps)            # (b/group, h, w, c)
    s = jnp.mean(std, axis=(1, 2, 3), keepdims=True)    # (b/group, 1, 1, 1)
    s = jnp.tile(s, (group, h, w, 1))                   # (b, h, w, 1)
    return jnp.concatenate([x, s], axis=-1)


@dataclasses.dataclass(frozen=True)
class StyleGAN2Discriminator:
    resolution: int = 1024
    channel_multiplier: int = 2

    @property
    def log_size(self) -> int:
        return int(math.log2(self.resolution))

    def init(self, key: jax.Array) -> dict:
        ch = channels_dict(self.channel_multiplier)
        keys = iter(jax.random.split(key, 64))

        def conv(i, o, k, act=True):
            p = {"w": jax.random.normal(next(keys), (k, k, i, o)) / math.sqrt(i * k * k)}
            if act:
                p["act_bias"] = jnp.zeros((o,))
            return p

        def eq_linear(i, o, bias_init=0.0):
            return {
                "w": jax.random.normal(next(keys), (i, o)) / math.sqrt(i),
                "b": jnp.full((o,), bias_init),
            }

        params = {"conv_in": conv(3, ch[self.resolution], 1), "blocks": []}
        in_ch = ch[self.resolution]
        for i in range(self.log_size, 2, -1):
            out_ch = ch[2 ** (i - 1)]
            params["blocks"].append(
                {
                    "conv1": conv(in_ch, in_ch, 3),
                    "conv2": conv(in_ch, out_ch, 3),
                    "skip": {"w": jax.random.normal(next(keys), (1, 1, in_ch, out_ch))
                             / math.sqrt(in_ch)},
                }
            )
            in_ch = out_ch
        params["final_conv"] = conv(in_ch + 1, ch[4], 3)
        params["final_linear1"] = eq_linear(ch[4] * 16, ch[4])
        params["final_linear2"] = eq_linear(ch[4], 1)
        return params

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        """(B, H, W, 3) -> (B, 1) realness logits."""
        b = x.shape[0]
        h = _conv_layer(params["conv_in"], x, downsample=False)
        for bp in params["blocks"]:
            h = _d_res_block(bp, h)
        h = _minibatch_stddev(h)
        h = _conv_layer(params["final_conv"], h, downsample=False)
        # Torch flattens NCHW C-order before the linear head.
        h = h.transpose(0, 3, 1, 2).reshape(b, -1)
        h = nn.linear(params["final_linear1"], h)
        h = fused_leaky_relu(h, None)
        return nn.linear(params["final_linear2"], h)
