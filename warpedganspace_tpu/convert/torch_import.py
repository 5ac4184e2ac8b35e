"""PyTorch checkpoint -> JAX pytree converters (and back, for R/S interop).

This is the rebuild's analog of the reference's TF->PyTorch converter
(models/StyleGAN2/convert_weight.py) — load-bearing for bit-faithful output
(SURVEY §5 checkpoint/resume). Conventions:

- torch Linear weight (out, in)  -> ours (in, out)   [transpose]
- torch Conv2d weight OIHW       -> ours HWIO        [transpose (2, 3, 1, 0)]
- BatchNorm {weight, bias, running_mean, running_var}
                                 -> {scale, bias, mean, var}

All inputs are plain dicts of numpy arrays (as produced by
``warpedganspace_tpu.utils.io.load_pt``); outputs are jnp arrays.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _lin_w(w):
    return jnp.asarray(np.asarray(w).T, dtype=jnp.float32)


def _conv_w(w):
    return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)), dtype=jnp.float32)


def _arr(x):
    return jnp.asarray(np.asarray(x), dtype=jnp.float32)


def _bn(sd, prefix):
    return {
        "scale": _arr(sd[prefix + ".weight"]),
        "bias": _arr(sd[prefix + ".bias"]),
        "mean": _arr(sd[prefix + ".running_mean"]),
        "var": _arr(sd[prefix + ".running_var"]),
    }


def _bn_export(p):
    return {
        "weight": np.asarray(p["scale"]),
        "bias": np.asarray(p["bias"]),
        "running_mean": np.asarray(p["mean"]),
        "running_var": np.asarray(p["var"]),
        "num_batches_tracked": np.asarray(0, dtype=np.int64),
    }


def _conv_entry(sd, prefix, bias=True):
    p = {"w": _conv_w(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        p["b"] = _arr(sd[prefix + ".bias"])
    return p


def _lin_entry(sd, prefix, bias=True):
    p = {"w": _lin_w(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        p["b"] = _arr(sd[prefix + ".bias"])
    return p


# ------------------------------------------------------------------------ SNGAN


def sngan_params_from_state_dict(sd: dict, channels: tuple[int, ...]) -> dict:
    """Convert a reference SNGAN GenWrapper state dict (keys ``model.N...``,
    models/SNGAN/sn_gen_resnet.py:86-112) into :class:`SNGANGenerator` params.

    Sequential layout: [0]=dense, [1]=Reshape, [2..2+B-1]=ResBlocks,
    [2+B]=BN, [2+B+1]=ReLU, [2+B+2]=conv, [2+B+3]=Tanh. Within a ResBlock, the
    inner Sequential is [0]=BN1, [3]=conv1, [4]=BN2, [6]=conv2 and the bypass
    conv (when present) is ``bypass.1``.
    """
    n_blocks = len(channels) - 1
    params = {
        "dense": _lin_entry(sd, "model.0"),
        "blocks": [],
        "out_bn": _bn(sd, f"model.{2 + n_blocks}"),
        "out_conv": _conv_entry(sd, f"model.{2 + n_blocks + 2}"),
    }
    for i in range(n_blocks):
        pre = f"model.{2 + i}"
        block = {
            "bn1": _bn(sd, pre + ".model.0"),
            "conv1": _conv_entry(sd, pre + ".conv1"),
            "bn2": _bn(sd, pre + ".model.4"),
            "conv2": _conv_entry(sd, pre + ".conv2"),
        }
        if channels[i] != channels[i + 1]:
            block["bypass_conv"] = _conv_entry(sd, pre + ".bypass.1")
        params["blocks"].append(block)
    return params


# ----------------------------------------------------------------------- ProgGAN


def proggan_params_from_state_dict(sd: dict) -> dict:
    """Convert a reference ProgGAN Generator state dict
    (models/ProgGAN/model.py:65-95) into :class:`ProgGANGenerator` params.

    Blocks live at ``features.N`` with {conv.weight, wscale.scale, wscale.b};
    the output head at ``output.{conv,wscale}``.
    """
    params = {"blocks": [], "out": None}
    i = 0
    while f"features.{i}.conv.weight" in sd:
        params["blocks"].append(
            {
                "conv": {"w": _conv_w(sd[f"features.{i}.conv.weight"])},
                "wscale_scale": _arr(sd[f"features.{i}.wscale.scale"]),
                "wscale_bias": _arr(sd[f"features.{i}.wscale.b"]),
            }
        )
        i += 1
    params["out"] = {
        "conv": {"w": _conv_w(sd["output.conv.weight"])},
        "wscale_scale": _arr(sd["output.wscale.scale"]),
        "wscale_bias": _arr(sd["output.wscale.b"]),
    }
    return params


# ------------------------------------------------------------- Reconstructor (R)


def lenet_reconstructor_from_state_dict(sd: dict) -> dict:
    """Reference LeNet R (lib/reconstructor.py:18-49): feature_extractor
    Sequential [0]=conv1 [1]=bn1 [4]=conv2 [5]=bn2 [8]=conv3 [9]=bn3; heads
    path_indices / shift_magnitudes Sequential [0]=fc1 [1]=bn [3]=fc2."""
    return {
        "conv1": _conv_entry(sd, "feature_extractor.0"),
        "bn1": _bn(sd, "feature_extractor.1"),
        "conv2": _conv_entry(sd, "feature_extractor.4"),
        "bn2": _bn(sd, "feature_extractor.5"),
        "conv3": _conv_entry(sd, "feature_extractor.8"),
        "bn3": _bn(sd, "feature_extractor.9"),
        "cls_fc1": _lin_entry(sd, "path_indices.0"),
        "cls_bn": _bn(sd, "path_indices.1"),
        "cls_fc2": _lin_entry(sd, "path_indices.3"),
        "reg_fc1": _lin_entry(sd, "shift_magnitudes.0"),
        "reg_bn": _bn(sd, "shift_magnitudes.1"),
        "reg_fc2": _lin_entry(sd, "shift_magnitudes.3"),
    }


def lenet_reconstructor_to_state_dict(params: dict) -> dict:
    """Export LeNet R params as a reference-named torch state dict."""
    out = {}

    def put_conv(prefix, p):
        out[prefix + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        if "b" in p:
            out[prefix + ".bias"] = np.asarray(p["b"])

    def put_lin(prefix, p):
        out[prefix + ".weight"] = np.asarray(p["w"]).T
        if "b" in p:
            out[prefix + ".bias"] = np.asarray(p["b"])

    def put_bn(prefix, p):
        for k, v in _bn_export(p).items():
            out[prefix + "." + k] = v

    put_conv("feature_extractor.0", params["conv1"])
    put_bn("feature_extractor.1", params["bn1"])
    put_conv("feature_extractor.4", params["conv2"])
    put_bn("feature_extractor.5", params["bn2"])
    put_conv("feature_extractor.8", params["conv3"])
    put_bn("feature_extractor.9", params["bn3"])
    put_lin("path_indices.0", params["cls_fc1"])
    put_bn("path_indices.1", params["cls_bn"])
    put_lin("path_indices.3", params["cls_fc2"])
    put_lin("shift_magnitudes.0", params["reg_fc1"])
    put_bn("shift_magnitudes.1", params["reg_bn"])
    put_lin("shift_magnitudes.3", params["reg_fc2"])
    return out


_RESNET18_BLOCKS = (2, 2, 2, 2)


def resnet_reconstructor_from_state_dict(sd: dict) -> dict:
    """Reference ResNet R (lib/reconstructor.py:52-69): a torchvision resnet18
    under ``features_extractor.`` with a 6-channel conv1, plus bare Linear heads
    ``path_indices`` / ``shift_magnitudes``."""
    fe = "features_extractor."
    params = {
        "conv1": {"w": _conv_w(sd[fe + "conv1.weight"])},
        "bn1": _bn(sd, fe + "bn1"),
        "cls_fc": _lin_entry(sd, "path_indices"),
        "reg_fc": _lin_entry(sd, "shift_magnitudes"),
    }
    for li, n_blocks in enumerate(_RESNET18_BLOCKS, start=1):
        blocks = []
        for bi in range(n_blocks):
            pre = f"{fe}layer{li}.{bi}."
            bp = {
                "conv1": {"w": _conv_w(sd[pre + "conv1.weight"])},
                "bn1": _bn(sd, pre + "bn1"),
                "conv2": {"w": _conv_w(sd[pre + "conv2.weight"])},
                "bn2": _bn(sd, pre + "bn2"),
            }
            if pre + "downsample.0.weight" in sd:
                bp["downsample"] = {
                    "conv": {"w": _conv_w(sd[pre + "downsample.0.weight"])},
                    "bn": _bn(sd, pre + "downsample.1"),
                }
            blocks.append(bp)
        params[f"layer{li}"] = blocks
    return params


def resnet_reconstructor_to_state_dict(params: dict) -> dict:
    """Export ResNet R params as a reference-named torch state dict (including
    the torchvision fc head keys so reference-side strict loads succeed is NOT
    attempted — the reference itself never re-loads the torchvision fc)."""
    out = {}
    fe = "features_extractor."

    def put_conv(prefix, p):
        out[prefix + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        if "b" in p:
            out[prefix + ".bias"] = np.asarray(p["b"])

    def put_lin(prefix, p):
        out[prefix + ".weight"] = np.asarray(p["w"]).T
        if "b" in p:
            out[prefix + ".bias"] = np.asarray(p["b"])

    def put_bn(prefix, p):
        for k, v in _bn_export(p).items():
            out[prefix + "." + k] = v

    put_conv(fe + "conv1", params["conv1"])
    put_bn(fe + "bn1", params["bn1"])
    for li, n_blocks in enumerate(_RESNET18_BLOCKS, start=1):
        for bi in range(n_blocks):
            pre = f"{fe}layer{li}.{bi}."
            bp = params[f"layer{li}"][bi]
            put_conv(pre + "conv1", bp["conv1"])
            put_bn(pre + "bn1", bp["bn1"])
            put_conv(pre + "conv2", bp["conv2"])
            put_bn(pre + "bn2", bp["bn2"])
            if "downsample" in bp:
                put_conv(pre + "downsample.0", bp["downsample"]["conv"])
                put_bn(pre + "downsample.1", bp["downsample"]["bn"])
    put_lin("path_indices", params["cls_fc"])
    put_lin("shift_magnitudes", params["reg_fc"])
    return out
