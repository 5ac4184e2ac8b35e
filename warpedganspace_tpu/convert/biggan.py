"""BigGAN torch checkpoint (G_ema.pth) -> JAX pytree converter.

Spectral normalization is folded here: the reference divides every SN weight by
a singular-value estimate obtained from ONE power-iteration step off the stored
``u0`` buffer, without updating it at eval (layers.py:85-95 with
update=False given G.eval(); num_svs=num_itrs=1 per generator_config.json).
We reproduce that step in numpy — v = normalize(u W), u' = normalize(v W^T),
sigma = ||v W^T|| — and store W/sigma.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SN_EPS = 1e-6  # generator_config.json SN_eps


def _normalize(x, eps):
    return x / max(np.linalg.norm(x), eps)


def _sn_sigma(w_mat: np.ndarray, u: np.ndarray) -> float:
    """One power-iteration step from the stored u (layers.py:25-47)."""
    v = _normalize(u @ w_mat, SN_EPS)
    uw = v @ w_mat.T
    u2 = _normalize(uw, SN_EPS)
    return float(np.dot(uw.ravel(), u2.ravel()))


def _sn_conv(sd, prefix, bias=True):
    w = np.asarray(sd[prefix + ".weight"], dtype=np.float32)  # OIHW
    u = np.asarray(sd[prefix + ".u0"], dtype=np.float32).reshape(1, -1)
    sigma = _sn_sigma(w.reshape(w.shape[0], -1), u)
    p = {"w": jnp.asarray(np.transpose(w / sigma, (2, 3, 1, 0)))}
    if bias and prefix + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[prefix + ".bias"], dtype=np.float32))
    return p


def _sn_linear(sd, prefix, bias=True):
    w = np.asarray(sd[prefix + ".weight"], dtype=np.float32)  # (out, in)
    u = np.asarray(sd[prefix + ".u0"], dtype=np.float32).reshape(1, -1)
    sigma = _sn_sigma(w, u)
    p = {"w": jnp.asarray((w / sigma).T)}
    if bias and prefix + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[prefix + ".bias"], dtype=np.float32))
    return p


def _arr(sd, key):
    return jnp.asarray(np.asarray(sd[key], dtype=np.float32))


def _ccbn(sd, prefix):
    return {
        "gain": _sn_linear(sd, prefix + ".gain", bias=False),
        "bias": _sn_linear(sd, prefix + ".bias", bias=False),
        "mean": _arr(sd, prefix + ".stored_mean"),
        "var": _arr(sd, prefix + ".stored_var"),
    }


def biggan_params_from_state_dict(sd: dict) -> dict:
    params = {
        "shared_embed": _arr(sd, "shared.weight"),
        "linear": _sn_linear(sd, "linear"),
        "blocks": [],
        "out_bn": {
            "scale": _arr(sd, "output_layer.0.gain"),
            "bias": _arr(sd, "output_layer.0.bias"),
            "mean": _arr(sd, "output_layer.0.stored_mean"),
            "var": _arr(sd, "output_layer.0.stored_var"),
        },
        "out_conv": _sn_conv(sd, "output_layer.2"),
    }
    i = 0
    while f"blocks.{i}.0.conv1.weight" in sd:
        pre = f"blocks.{i}.0."
        block = {
            "bn1": _ccbn(sd, pre + "bn1"),
            "conv1": _sn_conv(sd, pre + "conv1"),
            "bn2": _ccbn(sd, pre + "bn2"),
            "conv2": _sn_conv(sd, pre + "conv2"),
            "conv_sc": _sn_conv(sd, pre + "conv_sc"),
        }
        if f"blocks.{i}.1.theta.weight" in sd:
            apre = f"blocks.{i}.1."
            block["attention"] = {
                "theta": _sn_conv(sd, apre + "theta", bias=False),
                "phi": _sn_conv(sd, apre + "phi", bias=False),
                "g": _sn_conv(sd, apre + "g", bias=False),
                "o": _sn_conv(sd, apre + "o", bias=False),
                "gamma": jnp.asarray(np.asarray(sd[apre + "gamma"], dtype=np.float32).reshape(())),
            }
        params["blocks"].append(block)
        i += 1
    return params


def _sn_embed(sd, prefix):
    """SNEmbedding (layers.py:121-135): num_outputs = num_embeddings, so the
    power iteration runs on the (num_embeddings, dim) matrix directly."""
    w = np.asarray(sd[prefix + ".weight"], dtype=np.float32)
    u = np.asarray(sd[prefix + ".u0"], dtype=np.float32).reshape(1, -1)
    sigma = _sn_sigma(w, u)
    return jnp.asarray(w / sigma)


def biggan_d_params_from_state_dict(sd: dict) -> dict:
    """Reference Discriminator (BigGAN.py:281-399) -> params for
    :class:`warpedganspace_tpu.models.biggan.BigGANDiscriminator`."""
    params = {
        "blocks": [],
        "linear": _sn_linear(sd, "linear"),
        "embed": _sn_embed(sd, "embed"),
    }
    i = 0
    while f"blocks.{i}.0.conv1.weight" in sd:
        pre = f"blocks.{i}.0."
        block = {
            "conv1": _sn_conv(sd, pre + "conv1"),
            "conv2": _sn_conv(sd, pre + "conv2"),
        }
        if pre + "conv_sc.weight" in sd:
            block["conv_sc"] = _sn_conv(sd, pre + "conv_sc")
        if f"blocks.{i}.1.theta.weight" in sd:
            apre = f"blocks.{i}.1."
            block["attention"] = {
                "theta": _sn_conv(sd, apre + "theta", bias=False),
                "phi": _sn_conv(sd, apre + "phi", bias=False),
                "g": _sn_conv(sd, apre + "g", bias=False),
                "o": _sn_conv(sd, apre + "o", bias=False),
                "gamma": jnp.asarray(np.asarray(sd[apre + "gamma"], dtype=np.float32).reshape(())),
            }
        params["blocks"].append(block)
        i += 1
    return params
