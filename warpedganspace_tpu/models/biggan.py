"""BigGAN 128x128 class-conditional ImageNet generator (ch=96, hier-z).

Behavioral parity with reference ``models/BigGAN/BigGAN.py`` + ``layers.py``
under the shipped ``generator_config.json`` (G_ch=96, dim_z=120, hier=True,
G_shared=True, shared_dim=128, attention at 64x64, SN param, bn norm style,
cross_replica=False, mybn=False):

- Hierarchical latent: z is split into 6 chunks of 20; chunk 0 feeds the first
  linear, chunks 1..5 are concatenated with the 128-d shared class embedding to
  condition each block (BigGAN.py:102-111, 224-229).
- GBlock: ccbn -> ReLU -> 2x nearest-up -> conv3x3 -> ccbn -> ReLU -> conv3x3,
  plus a 1x1 shortcut on the upsampled input (layers.py:372-405).
- ccbn at eval: batch-norm with stored stats (no affine), then per-sample
  class-conditional gain (1 + Linear(y)) and bias Linear(y) (layers.py:275-326).
  Training runs G in eval mode (reference trainer.py:144), so stored stats are
  always used.
- SA-GAN attention at 64x64 (layers.py:141-166).
- Output: affine BN -> ReLU -> conv3x3 -> tanh (BigGAN.py:170-174, 242-243).

TPU-first notes:

- Spectral normalization is folded into the weights at conversion time: at eval
  the reference runs one power-iteration step from the stored u buffer with
  update=False (layers.py:85-95, 30-47) — a deterministic scalar divide, which
  the converter reproduces in numpy once. apply() therefore touches plain
  dense weights only.
- Attention is expressed with einsum over (B, HW, C) tensors — two batched
  matmuls on the MXU — instead of reshape/bmm chains.
- Class sampling (BigGANWrapper.mixed_classes, gan_load.py:73-77): when ``y``
  is not given, a class per batch element is drawn from ``target_classes`` with
  a key derived deterministically from the z values. Deliberate deviation: the
  reference redraws classes independently on every forward, so the (original,
  shifted) training pair can get DIFFERENT classes when several target classes
  are configured; deriving the key from z makes the pair consistent (identical
  behavior for a single target class, which all reference scripts use).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from warpedganspace_tpu.nn import core as nn


# Dataset registries (reference models/BigGAN/utils.py:7-32).
IMSIZE_DICT = {"I32": 32, "I32_hdf5": 32, "I64": 64, "I64_hdf5": 64,
               "I128": 128, "I128_hdf5": 128, "I256": 256, "I256_hdf5": 256,
               "C10": 32, "C100": 32}
NCLASS_DICT = {"I32": 1000, "I32_hdf5": 1000, "I64": 1000, "I64_hdf5": 1000,
               "I128": 1000, "I128_hdf5": 1000, "I256": 1000, "I256_hdf5": 1000,
               "C10": 10, "C100": 100}


def biggan_arch(ch: int = 96, resolution: int = 128, attention: str = "64") -> dict:
    """Generator architecture table, all reference resolutions
    (reference BigGAN.py:13-52). ``attention`` is the reference's G_attn
    spec — underscore-separated resolutions, e.g. "32_64"."""
    tables = {
        512: {
            "in_channels": [ch * m for m in [16, 16, 8, 8, 4, 2, 1]],
            "out_channels": [ch * m for m in [16, 8, 8, 4, 2, 1, 1]],
            "resolution": [8, 16, 32, 64, 128, 256, 512],
        },
        256: {
            "in_channels": [ch * m for m in [16, 16, 8, 8, 4, 2]],
            "out_channels": [ch * m for m in [16, 8, 8, 4, 2, 1]],
            "resolution": [8, 16, 32, 64, 128, 256],
        },
        128: {
            "in_channels": [ch * m for m in [16, 16, 8, 4, 2]],
            "out_channels": [ch * m for m in [16, 8, 4, 2, 1]],
            "resolution": [8, 16, 32, 64, 128],
        },
        64: {
            "in_channels": [ch * m for m in [16, 16, 8, 4]],
            "out_channels": [ch * m for m in [16, 8, 4, 2]],
            "resolution": [8, 16, 32, 64],
        },
        32: {
            "in_channels": [ch * m for m in [4, 4, 4]],
            "out_channels": [ch * m for m in [4, 4, 4]],
            "resolution": [8, 16, 32],
        },
    }
    arch = tables[resolution]
    attn_res = {int(a) for a in str(attention).split("_")}
    arch["attention"] = [r in attn_res for r in arch["resolution"]]
    return arch


def _ccbn(p: dict, x, cond, eps: float = 1e-5):
    """Class-conditional BN, eval mode (layers.py:303-322)."""
    mean, var = p["mean"], p["var"]
    xhat = (x - mean) * jax.lax.rsqrt(var + eps)
    gain = 1.0 + nn.linear(p["gain"], cond)   # (B, C)
    bias = nn.linear(p["bias"], cond)
    return xhat * gain[:, None, None, :] + bias[:, None, None, :]


def _attention(p: dict, x):
    """SA-GAN non-local block (layers.py:141-166). x: (B, H, W, C).

    The softmax(theta phi^T) g chain runs through the fused Pallas kernel
    (ops/attn_pallas.py) — the (B, HW, HW/4) attention matrix stays in VMEM
    instead of round-tripping ~1 GB of HBM at the BigGAN-128 render shapes
    (measured 12% of the render; PERFORMANCE.md). Softmax in f32."""
    from warpedganspace_tpu.ops.attn_pallas import sa_attention_fusable

    b, h, w, c = x.shape
    theta = nn.conv2d(p["theta"], x)                       # (B, H, W, C/8)
    phi = nn.max_pool(nn.conv2d(p["phi"], x), 2, 2)        # (B, H/2, W/2, C/8)
    g = nn.max_pool(nn.conv2d(p["g"], x), 2, 2)            # (B, H/2, W/2, C/2)

    theta = theta.reshape(b, h * w, c // 8)
    phi = phi.reshape(b, (h * w) // 4, c // 8)
    g = g.reshape(b, (h * w) // 4, c // 2)

    o = sa_attention_fusable(theta, phi, g).reshape(b, h, w, c // 2)
    o = nn.conv2d(p["o"], o)
    return p["gamma"] * o + x


def _gblock(p: dict, x, cond):
    """Generator residual block (layers.py:372-405); always upsamples here.

    TPU formulation (exact, measured on v5e — PERFORMANCE.md):
    - [2x nearest-up -> conv1] runs as ONE lhs-dilated conv with the merged
      4x4 kernel (ops/s2d.py::nearest_up_conv_merged_kernel): 2.25x fewer
      dense MACs, no 4x intermediate; 1.07-1.71x per block.
    - the 1x1 shortcut commutes with nearest-up, so it runs at the LOW
      resolution (4x fewer MACs) and upsamples its output (bit-identical).
    Both sit in the training grad path too (XLA differentiates the dilated
    conv natively)."""
    from warpedganspace_tpu.ops import s2d

    h = jax.nn.relu(_ccbn(p["bn1"], x, cond))
    h = s2d.nearest_up_conv_merged_apply(
        h, s2d.nearest_up_conv_merged_kernel(p["conv1"]["w"]))
    if "b" in p["conv1"]:  # converters keep bias optional (convert/biggan.py)
        h = h + p["conv1"]["b"]
    h = jax.nn.relu(_ccbn(p["bn2"], h, cond))
    h = nn.conv2d(p["conv2"], h, padding=1)
    x = nn.upsample_nearest(nn.conv2d(p["conv_sc"], x, padding=0), 2)
    return h + x


@dataclasses.dataclass(frozen=True)
class BigGANGenerator:
    resolution: int = 128
    ch: int = 96
    dim_z: int = 120
    shared_dim: int = 128
    n_classes: int = 1000
    bottom_width: int = 4
    target_classes: tuple[int, ...] = (239,)
    attention: str = "64"  # G_attn spec, e.g. "32_64"

    @classmethod
    def from_config(cls, config: dict | None = None, target_classes=(239,)) -> "BigGANGenerator":
        """Build from a BigGAN generator_config.json dict (reference
        models/gan_load.py:84-98 reads the shipped config; a copy ships in
        configs/biggan_generator_config.json). imsize/nclass per dataset follow
        reference models/BigGAN/utils.py."""
        import json
        import os.path as osp

        if config is None:
            path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "configs", "biggan_generator_config.json")
            with open(path) as f:
                config = json.load(f)
        imsize = IMSIZE_DICT[config["dataset"]]
        return cls(
            resolution=imsize,
            ch=config["G_ch"],
            dim_z=config["dim_z"],
            shared_dim=config["shared_dim"],
            n_classes=NCLASS_DICT[config["dataset"]],
            target_classes=tuple(int(c) for c in target_classes),
            attention=str(config.get("G_attn", "64")),
        )

    @property
    def arch(self) -> dict:
        return biggan_arch(self.ch, self.resolution, self.attention)

    @property
    def num_slots(self) -> int:
        return len(self.arch["in_channels"]) + 1

    @property
    def z_chunk_size(self) -> int:
        return self.dim_z // self.num_slots

    @property
    def dim_z_effective(self) -> int:
        """The reference SHRINKS dim_z to z_chunk_size * num_slots when the
        hierarchical split is not exact (BigGAN.py:102-111) — e.g. 120 -> 119
        at 256^2 (7 slots). ``apply`` accepts z of either length (trailing
        elements are unused, exactly like the reference's narrow())."""
        return self.z_chunk_size * self.num_slots

    # -------------------------------------------------------------------- init
    def init(self, key: jax.Array) -> dict:
        arch = self.arch
        keys = iter(jax.random.split(key, 128))
        cond_dim = self.shared_dim + self.z_chunk_size

        def lin(i, o, bias=True):
            p = {"w": 0.02 * jax.random.normal(next(keys), (i, o))}
            if bias:
                p["b"] = jnp.zeros((o,))
            return p

        def conv(i, o, k, bias=True):
            p = {"w": 0.02 * jax.random.normal(next(keys), (k, k, i, o))}
            if bias:
                p["b"] = jnp.zeros((o,))
            return p

        def ccbn_init(c):
            return {
                "gain": lin(cond_dim, c, bias=False),
                "bias": lin(cond_dim, c, bias=False),
                "mean": jnp.zeros((c,)),
                "var": jnp.ones((c,)),
            }

        params = {
            "shared_embed": 0.02 * jax.random.normal(next(keys), (self.n_classes, self.shared_dim)),
            "linear": lin(self.z_chunk_size, arch["in_channels"][0] * self.bottom_width**2),
            "blocks": [],
            "out_bn": nn.batch_norm_init(arch["out_channels"][-1]),
            "out_conv": conv(arch["out_channels"][-1], 3, 3),
        }
        for i, (cin, cout) in enumerate(zip(arch["in_channels"], arch["out_channels"])):
            block = {
                "bn1": ccbn_init(cin),
                "conv1": conv(cin, cout, 3),
                "bn2": ccbn_init(cout),
                "conv2": conv(cout, cout, 3),
                "conv_sc": conv(cin, cout, 1),
            }
            if arch["attention"][i]:
                block["attention"] = {
                    "theta": conv(cout, cout // 8, 1, bias=False),
                    "phi": conv(cout, cout // 8, 1, bias=False),
                    "g": conv(cout, cout // 2, 1, bias=False),
                    "o": conv(cout // 2, cout, 1, bias=False),
                    "gamma": jnp.zeros(()),
                }
            params["blocks"].append(block)
        return params

    # ----------------------------------------------------------------- classes
    def mixed_classes(self, z: jax.Array, y=None) -> jax.Array:
        """Per-sample target class (see class docstring for the determinism
        deviation vs BigGANWrapper.mixed_classes)."""
        if y is not None:
            return y
        classes = jnp.asarray(self.target_classes, dtype=jnp.int32)
        if len(self.target_classes) == 1:
            return jnp.broadcast_to(classes, (z.shape[0],))
        salt = jnp.abs(jnp.sum(jax.lax.bitcast_convert_type(z[:, 0], jnp.int32)))
        key = jax.random.fold_in(jax.random.key(0), salt)
        return classes[jax.random.randint(key, (z.shape[0],), 0, len(self.target_classes))]

    # ------------------------------------------------------------------- apply
    def apply(self, params: dict, z: jax.Array, shift=None, y=None):
        """G(z + shift, shared(y)) -> (B, 128, 128, 3) in tanh range
        (BigGANWrapper.forward, gan_load.py:79-81; Generator.forward,
        BigGAN.py:222-243)."""
        y = self.mixed_classes(z, y)
        if shift is not None:
            z = z + shift
        y_embed = jnp.take(params["shared_embed"], y, axis=0)  # (B, shared_dim)

        # Hierarchical z: num_slots chunks of dim_z // num_slots
        # (6 chunks of 20 at the shipped 128^2 config).
        chunks = [
            z[:, i * self.z_chunk_size : (i + 1) * self.z_chunk_size]
            for i in range(self.num_slots)
        ]
        z0, zs = chunks[0], chunks[1:]
        conds = [jnp.concatenate([y_embed, zc], axis=1) for zc in zs]

        h = nn.linear(params["linear"], z0)
        c0 = self.arch["in_channels"][0]
        # Torch reshape (B, C, 4, 4) C-order -> NHWC.
        h = h.reshape(z.shape[0], c0, self.bottom_width, self.bottom_width)
        h = h.transpose(0, 2, 3, 1)

        for i, block in enumerate(params["blocks"]):
            h = _gblock(block, h, conds[i])
            if "attention" in block:
                h = _attention(block["attention"], h)

        h = nn.batch_norm(params["out_bn"], h, train=False)
        h = jax.nn.relu(h)
        h = nn.conv2d(params["out_conv"], h, padding=1)
        return jnp.tanh(h)


# =========================================================================== #
#  Discriminator + G_D pair (reference BigGAN.py:248-445 — unused by the      #
#  WarpedGANSpace pipeline but part of the model family surface).             #
# =========================================================================== #


def biggan_d_arch(ch: int = 96, resolution: int = 128, attention: str = "64") -> dict:
    """Discriminator architecture tables, all reference resolutions
    (reference BigGAN.py:247-279). ``attention`` is the D_attn spec."""
    tables = {
        256: {
            "in_channels": [3] + [ch * m for m in [1, 2, 4, 8, 8, 16]],
            "out_channels": [ch * m for m in [1, 2, 4, 8, 8, 16, 16]],
            "downsample": [True] * 6 + [False],
            "resolution": [128, 64, 32, 16, 8, 4, 4],
        },
        128: {
            "in_channels": [3] + [ch * m for m in [1, 2, 4, 8, 16]],
            "out_channels": [ch * m for m in [1, 2, 4, 8, 16, 16]],
            "downsample": [True] * 5 + [False],
            "resolution": [64, 32, 16, 8, 4, 4],
        },
        64: {
            "in_channels": [3] + [ch * m for m in [1, 2, 4, 8]],
            "out_channels": [ch * m for m in [1, 2, 4, 8, 16]],
            "downsample": [True] * 4 + [False],
            "resolution": [32, 16, 8, 4, 4],
        },
        32: {
            "in_channels": [3] + [ch * m for m in [4, 4, 4]],
            "out_channels": [ch * m for m in [4, 4, 4, 4]],
            "downsample": [True, True, False, False],
            "resolution": [16, 16, 16, 16],
        },
    }
    arch = tables[resolution]
    attn_res = {int(a) for a in str(attention).split("_")}
    arch["attention"] = [r in attn_res for r in arch["resolution"]]
    return arch


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1), padding="VALID",
    ) / 4.0


def _dblock(p: dict, x, preactivation: bool, downsample: bool, wide: bool = True):
    """Discriminator residual block (layers.py:408-455)."""
    h = jax.nn.relu(x) if preactivation else x
    h = nn.conv2d(p["conv1"], h, padding=1)
    h = nn.conv2d(p["conv2"], jax.nn.relu(h), padding=1)
    if downsample:
        h = _avg_pool2(h)
    sc = x
    if "conv_sc" in p:
        if preactivation:
            sc = nn.conv2d(p["conv_sc"], sc, padding=0)
            if downsample:
                sc = _avg_pool2(sc)
        else:
            if downsample:
                sc = _avg_pool2(sc)
            sc = nn.conv2d(p["conv_sc"], sc, padding=0)
    elif downsample:
        sc = _avg_pool2(sc)
    return h + sc


@dataclasses.dataclass(frozen=True)
class BigGANDiscriminator:
    resolution: int = 128
    ch: int = 96
    n_classes: int = 1000
    attention: str = "64"  # D_attn spec, e.g. "32_64"

    @property
    def arch(self) -> dict:
        return biggan_d_arch(self.ch, self.resolution, self.attention)

    def init(self, key: jax.Array) -> dict:
        arch = self.arch
        keys = iter(jax.random.split(key, 64))

        def conv(i, o, k):
            return {
                "w": 0.02 * jax.random.normal(next(keys), (k, k, i, o)),
                "b": jnp.zeros((o,)),
            }

        params = {"blocks": [], "linear": {
            "w": 0.02 * jax.random.normal(next(keys), (arch["out_channels"][-1], 1)),
            "b": jnp.zeros((1,)),
        }, "embed": 0.02 * jax.random.normal(
            next(keys), (self.n_classes, arch["out_channels"][-1]))}
        for i, (cin, cout) in enumerate(zip(arch["in_channels"], arch["out_channels"])):
            block = {"conv1": conv(cin, cout, 3), "conv2": conv(cout, cout, 3)}
            if cin != cout or arch["downsample"][i]:
                block["conv_sc"] = conv(cin, cout, 1)
            if arch["attention"][i]:
                block["attention"] = {
                    "theta": {"w": 0.02 * jax.random.normal(next(keys), (1, 1, cout, cout // 8))},
                    "phi": {"w": 0.02 * jax.random.normal(next(keys), (1, 1, cout, cout // 8))},
                    "g": {"w": 0.02 * jax.random.normal(next(keys), (1, 1, cout, cout // 2))},
                    "o": {"w": 0.02 * jax.random.normal(next(keys), (1, 1, cout // 2, cout))},
                    "gamma": jnp.zeros(()),
                }
            params["blocks"].append(block)
        return params

    def apply(self, params: dict, x: jax.Array, y: jax.Array) -> jax.Array:
        """(B, H, W, 3), (B,) class ids -> (B, 1) projection-D logits
        (reference BigGAN.py:386-399)."""
        arch = self.arch
        h = x
        for i, block in enumerate(params["blocks"]):
            h = _dblock(block, h, preactivation=(i > 0), downsample=arch["downsample"][i])
            if "attention" in block:
                h = _attention(block["attention"], h)
        h = jnp.sum(jax.nn.relu(h), axis=(1, 2))  # global sum pool, (B, C)
        out = nn.linear(params["linear"], h)
        embed = jnp.take(params["embed"], y, axis=0)  # (B, C)
        return out + jnp.sum(embed * h, axis=1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class BigGAN_GD:
    """Functional G_D pair (reference BigGAN.py:404-445): runs G then scores
    fake (and optionally real) batches with the projection discriminator."""

    G: "BigGANGenerator"
    D: "BigGANDiscriminator"

    def apply(self, g_params, d_params, z, gy, x=None, dy=None, split_D: bool = False):
        g_z = self.G.apply(g_params, z, y=gy)
        if split_D:
            d_fake = self.D.apply(d_params, g_z, gy)
            if x is not None:
                return d_fake, self.D.apply(d_params, x, dy)
            return d_fake
        if x is not None:
            d_input = jnp.concatenate([g_z, x], axis=0)
            d_class = jnp.concatenate([gy, dy], axis=0)
            d_out = self.D.apply(d_params, d_input, d_class)
            return d_out[: z.shape[0]], d_out[z.shape[0]:]
        return self.D.apply(d_params, g_z, gy)
