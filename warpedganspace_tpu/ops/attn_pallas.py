"""Pallas TPU kernel: fused SA-GAN spatial attention (BigGAN's non-local block).

The jnp formulation (reference models/BigGAN/layers.py:141-166) materializes
the (B, N, M) attention matrix in HBM twice — softmax(theta @ phi^T) is
written out and read back by the value matmul. At BigGAN-128's shapes
(N=4096 queries, M=1024 keys, B=64) that is ~1 GB of f32 round-trip per
batch, ~2.6 ms of the measured 3.3 ms attention cost (12% of the whole
render). The keys/values for one sample are tiny (M x (dk+dv) <= 0.25 MB),
so no online-softmax machinery is needed: one grid step loads a query block
plus the sample's full phi/g into VMEM, and logits -> softmax -> value matmul
all happen on-chip. Softmax runs in f32 regardless of storage dtype.

Used by ``models/biggan.py::_attention``; falls back to the jnp path off-TPU
or for unaligned shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QUERY_BLOCK = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(theta_ref, phi_ref, g_ref, out_ref):
    """One grid step: a query block of one sample against all its keys.

    Blocks: theta (1, NB, dk), phi (1, M, dk), g (1, M, dv), out (1, NB, dv).
    """
    th = theta_ref[0]
    ph = phi_ref[0]
    g = g_ref[0]
    s = jax.lax.dot_general(
        th, ph, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                   # (NB, M) logits, f32
    s = s - jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s)
    beta = e / jnp.sum(e, axis=1, keepdims=True)        # stays in VMEM
    out_ref[0] = jax.lax.dot_general(
        beta.astype(g.dtype), g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _jnp_attention(theta, phi, g):
    """jnp twin (f32 softmax, matching the kernel) — backward-pass reference."""
    s = jnp.einsum("bnc,bmc->bnm", theta, phi,
                   preferred_element_type=jnp.float32)
    beta = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", beta.astype(g.dtype), g,
                      preferred_element_type=jnp.float32).astype(theta.dtype)


def _kernel_fits(theta, g) -> bool:
    b, n, dk = theta.shape
    m, dv = g.shape[1], g.shape[2]
    # One sample's keys+values and a query block must sit in VMEM comfortably.
    return (m % 128 == 0 and n % 8 == 0
            and m * (_round_up(dk, 128) + _round_up(dv, 128)) * 4 < (4 << 20))


def _pallas_attention(theta, phi, g):
    b, n, dk = theta.shape
    _, m, dv = g.shape
    nb = min(_QUERY_BLOCK, n)
    if n % nb != 0:
        nb = n  # small N: single block
    dk_p, dv_p = _round_up(dk, 128), _round_up(dv, 128)
    theta_p = jnp.pad(theta, ((0, 0), (0, 0), (0, dk_p - dk)))
    phi_p = jnp.pad(phi, ((0, 0), (0, 0), (0, dk_p - dk)))
    g_p = jnp.pad(g, ((0, 0), (0, 0), (0, dv_p - dv)))

    out = pl.pallas_call(
        _attn_kernel,
        grid=(b, n // nb),
        in_specs=[
            pl.BlockSpec((1, nb, dk_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dk_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dv_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nb, dv_p), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, dv_p), theta.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(theta_p, phi_p, g_p)
    return out[..., :dv]


@jax.custom_vjp
def _sa_attention_kernel_op(theta, phi, g):
    return _pallas_attention(theta, phi, g)


def _sa_fwd(theta, phi, g):
    return _pallas_attention(theta, phi, g), (theta, phi, g)


def _sa_bwd(res, ct):
    # Backward falls back to the jnp twin's VJP (same pattern as the warp
    # kernel): training re-materializes the attention matrix in the backward
    # only, which the reference does in BOTH directions.
    theta, phi, g = res
    _, vjp = jax.vjp(_jnp_attention, theta, phi, g)
    return vjp(ct)


_sa_attention_kernel_op.defvjp(_sa_fwd, _sa_bwd)


def sa_attention_fusable(theta: jax.Array, phi: jax.Array, g: jax.Array):
    """softmax(theta @ phi^T) @ g without materializing the attention matrix.

    theta (B, N, dk), phi (B, M, dk), g (B, M, dv) -> (B, N, dv) in
    theta.dtype; softmax in f32. dk/dv are zero-padded to the 128 lane width
    (harmless: zero columns don't change dot products; output padding is
    sliced off). Falls back to the jnp formulation when the shapes don't fit
    the kernel (the fallback shares the f32-softmax semantics)."""
    if not _kernel_fits(theta, g):
        return _jnp_attention(theta, phi, g)
    return _sa_attention_kernel_op(theta, phi, g)
