"""StyleGAN2 torch checkpoint -> JAX pytree converter.

Maps the reference ``models/StyleGAN2/model.py`` Generator state dict (the
``g_ema`` payload of stylegan2-ffhq checkpoints, loaded strict=False at
gan_load.py:186) into :class:`StyleGAN2Generator` params.

Equalized-lr runtime scales are folded into the stored weights here (valid for
a frozen generator; see models/stylegan2.py docstring):

- EqualLinear (model.py:110-131): w_eff = w^T * (lr_mul/sqrt(in)),
  b_eff = b * lr_mul.
- ModulatedConv2d (:177-179): w_eff = w * (1/sqrt(in*k^2)), layout
  (1,out,in,kh,kw) -> HWIO.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def _arr(x):
    return np.asarray(x, dtype=np.float32)


def _eq_linear(sd, prefix, lr_mul=1.0):
    w = _arr(sd[prefix + ".weight"])  # (out, in)
    in_dim = w.shape[1]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    return {
        "w": jnp.asarray(w.T * scale),
        "b": jnp.asarray(_arr(sd[prefix + ".bias"]) * lr_mul),
    }


def _mod_conv(sd, prefix):
    w = _arr(sd[prefix + ".conv.weight"])[0]  # (out, in, kh, kw)
    out_ch, in_ch, kh, kw = w.shape
    scale = 1.0 / math.sqrt(in_ch * kh * kw)
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)) * scale),  # HWIO
        "mod": _eq_linear(sd, prefix + ".conv.modulation"),
    }


def _styled_conv(sd, prefix):
    p = _mod_conv(sd, prefix)
    p["noise_weight"] = jnp.asarray(_arr(sd[prefix + ".noise.weight"]).reshape(()))
    p["act_bias"] = jnp.asarray(_arr(sd[prefix + ".activate.bias"]))
    return p


def _to_rgb(sd, prefix):
    p = _mod_conv(sd, prefix)
    p["bias"] = jnp.asarray(_arr(sd[prefix + ".bias"]).reshape(3))
    return p


def stylegan2_params_from_state_dict(sd: dict, resolution: int) -> dict:
    log_size = int(math.log2(resolution))
    num_layers = (log_size - 2) * 2 + 1
    n_mlp = 0
    while f"style.{n_mlp + 1}.weight" in sd:
        n_mlp += 1

    params = {
        "mapping": [
            _eq_linear(sd, f"style.{i + 1}", lr_mul=0.01) for i in range(n_mlp)
        ],
        # (1, 512, 4, 4) -> (1, 4, 4, 512)
        "const_input": jnp.asarray(np.transpose(_arr(sd["input.input"]), (0, 2, 3, 1))),
        "conv1": _styled_conv(sd, "conv1"),
        "to_rgb1": _to_rgb(sd, "to_rgb1"),
        "convs": [],
        "to_rgbs": [],
        "noises": [],
    }
    n_blocks = log_size - 2
    for j in range(n_blocks):
        params["convs"].append(_styled_conv(sd, f"convs.{2 * j}"))
        params["convs"].append(_styled_conv(sd, f"convs.{2 * j + 1}"))
        params["to_rgbs"].append(_to_rgb(sd, f"to_rgbs.{j}"))
    for i in range(num_layers):
        noise = _arr(sd[f"noises.noise_{i}"])  # (1, 1, H, W)
        params["noises"].append(jnp.asarray(np.transpose(noise, (0, 2, 3, 1))))
    return params


def _eq_conv(sd, prefix, bias_key=None):
    """EqualConv2d (model.py:86-107): fold scale = 1/sqrt(in*k^2)."""
    w = _arr(sd[prefix + ".weight"])  # (out, in, kh, kw)
    out_ch, in_ch, kh, kw = w.shape
    scale = 1.0 / math.sqrt(in_ch * kh * kw)
    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)) * scale)}
    if bias_key is not None and bias_key in sd:
        p["act_bias"] = jnp.asarray(_arr(sd[bias_key]))
    return p


def stylegan2_discriminator_params_from_state_dict(sd: dict, resolution: int) -> dict:
    """Reference Discriminator (model.py:453-503) -> params for
    :class:`warpedganspace_tpu.models.stylegan2.StyleGAN2Discriminator`."""
    log_size = int(math.log2(resolution))
    params = {
        "conv_in": _eq_conv(sd, "convs.0.0", bias_key="convs.0.1.bias"),
        "blocks": [],
    }
    for j in range(1, log_size - 2 + 1):
        pre = f"convs.{j}"
        params["blocks"].append(
            {
                "conv1": _eq_conv(sd, pre + ".conv1.0", bias_key=pre + ".conv1.1.bias"),
                "conv2": _eq_conv(sd, pre + ".conv2.1", bias_key=pre + ".conv2.2.bias"),
                "skip": _eq_conv(sd, pre + ".skip.1"),
            }
        )
    params["final_conv"] = _eq_conv(sd, "final_conv.0", bias_key="final_conv.1.bias")
    params["final_linear1"] = _eq_linear(sd, "final_linear.0")
    params["final_linear2"] = _eq_linear(sd, "final_linear.1")
    return params
