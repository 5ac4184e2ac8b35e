"""SNGAN ResNet generator (MNIST 32x32 / AnimeFaces 64x64).

Behavioral parity with reference ``models/SNGAN/sn_gen_resnet.py``:
dense z -> (C0 * 16) reshaped to a 4x4 seed, a chain of residual upsampling
blocks (BN -> ReLU -> 2x nearest-up -> conv3x3 -> BN -> ReLU -> conv3x3, with an
upsample[+conv] bypass, :24-57), and an output head BN -> ReLU -> conv3x3 ->
tanh (:99-108). Configs (:9-12): ``sn_resnet32`` channels [256]*4 and
``sn_resnet64`` channels [1024, 512, 256, 128, 64]; dim_z = 128.

Inference-mode only (the generator is frozen; reference trainer.py:144 sets
G.eval()), so BatchNorm always uses the stored running statistics. Activations
are NHWC; the seed reshape preserves the reference's C-order semantics.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from warpedganspace_tpu.nn import core as nn

SNGAN_CONFIGS = {
    "SNGAN_MNIST": {
        "channels": (256, 256, 256, 256),
        "seed_dim": 4,
        "img_size": 32,
        "image_channels": 1,
        "dim_z": 128,
    },
    "SNGAN_AnimeFaces": {
        "channels": (1024, 512, 256, 128, 64),
        "seed_dim": 4,
        "img_size": 64,
        "image_channels": 3,
        "dim_z": 128,
    },
}


@dataclasses.dataclass(frozen=True)
class SNGANGenerator:
    channels: tuple[int, ...]
    seed_dim: int = 4
    img_size: int = 32
    image_channels: int = 1
    dim_z: int = 128

    @classmethod
    def from_gan_type(cls, gan_type: str) -> "SNGANGenerator":
        return cls(**SNGAN_CONFIGS[gan_type])

    # -------------------------------------------------------------------- init
    def init(self, key: jax.Array) -> dict:
        """Random init (xavier-uniform convs, as reference :30-32,86-95); mostly
        used for tests — real use loads converted pretrained weights."""
        ch = self.channels
        n_blocks = len(ch) - 1
        keys = jax.random.split(key, 3 * n_blocks + 4)
        params = {
            "dense": {
                "w": nn.xavier_uniform(keys[0], (self.dim_z, ch[0] * self.seed_dim**2)),
                "b": jnp.zeros((ch[0] * self.seed_dim**2,)),
            },
            "blocks": [],
            "out_bn": nn.batch_norm_init(ch[-1]),
            "out_conv": {
                "w": nn.xavier_uniform(keys[1], (3, 3, ch[-1], self.image_channels)),
                "b": jnp.zeros((self.image_channels,)),
            },
        }
        import math

        for i in range(n_blocks):
            k1, k2, k3 = keys[2 + 3 * i : 5 + 3 * i]
            block = {
                "bn1": nn.batch_norm_init(ch[i]),
                "conv1": {
                    "w": nn.xavier_uniform(k1, (3, 3, ch[i], ch[i + 1]), gain=math.sqrt(2)),
                    "b": jnp.zeros((ch[i + 1],)),
                },
                "bn2": nn.batch_norm_init(ch[i + 1]),
                "conv2": {
                    "w": nn.xavier_uniform(k2, (3, 3, ch[i + 1], ch[i + 1]), gain=math.sqrt(2)),
                    "b": jnp.zeros((ch[i + 1],)),
                },
            }
            if ch[i] != ch[i + 1]:
                block["bypass_conv"] = {
                    "w": nn.xavier_uniform(k3, (3, 3, ch[i], ch[i + 1])),
                    "b": jnp.zeros((ch[i + 1],)),
                }
            params["blocks"].append(block)
        return params

    # ------------------------------------------------------------------- apply
    def apply(self, params: dict, z: jax.Array, shift: jax.Array | None = None):
        """G(z + shift) -> (B, H, W, C) images in tanh range.

        Parity: SNGANWrapper.forward (models/gan_load.py:21-28) + the Sequential
        stack built by make_resnet_generator (sn_gen_resnet.py:86-112).
        """
        if shift is not None:
            z = z + shift
        b = z.shape[0]
        s, c0 = self.seed_dim, self.channels[0]
        x = nn.linear(params["dense"], z)
        # Torch reshapes to (B, C0, 4, 4) in C-order; transpose into NHWC.
        x = x.reshape(b, c0, s, s).transpose(0, 2, 3, 1)
        for i, block in enumerate(params["blocks"]):
            x = self._res_block(block, x)
        x = nn.batch_norm(params["out_bn"], x, train=False)
        x = jax.nn.relu(x)
        x = nn.conv2d(params["out_conv"], x, padding=1)
        return jnp.tanh(x)

    @staticmethod
    def _res_block(p: dict, x: jax.Array) -> jax.Array:
        """[2x nearest-up -> conv3x3] pairs run as ONE lhs-dilated conv with
        the merged 4x4 kernel (ops/s2d.py::nearest_up_conv_merged_kernel —
        exact, 2.25x fewer dense MACs, no 4x intermediate; the BigGAN GBlock
        restructuring, PERFORMANCE.md)."""
        from warpedganspace_tpu.ops import s2d

        h = nn.batch_norm(p["bn1"], x, train=False)
        h = jax.nn.relu(h)
        h = s2d.nearest_up_conv_merged_apply(
            h, s2d.nearest_up_conv_merged_kernel(p["conv1"]["w"]))
        if "b" in p["conv1"]:  # bias stays optional, as in nn.conv2d
            h = h + p["conv1"]["b"]
        h = nn.batch_norm(p["bn2"], h, train=False)
        h = jax.nn.relu(h)
        h = nn.conv2d(p["conv2"], h, padding=1)
        if "bypass_conv" in p:
            bypass = s2d.nearest_up_conv_merged_apply(
                x, s2d.nearest_up_conv_merged_kernel(p["bypass_conv"]["w"]))
            if "b" in p["bypass_conv"]:
                bypass = bypass + p["bypass_conv"]["b"]
        else:
            bypass = nn.upsample_nearest(x, 2)
        return h + bypass
