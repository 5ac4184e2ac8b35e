"""Pallas TPU kernel: fused RBF warp gradient with on-the-fly support-set gather.

The north-star native op (BASELINE.json): evaluates the L2-normalized
grad f_k(z) for a batch of (z, set-index) rows in ONE VMEM pass per row —
distance computation, exp, weighted reduction and normalization fused, with the
selected support set DMA'd from HBM directly into VMEM via scalar-prefetch
block indexing (no (B, 2N, d) gather ever materializes in HBM, unlike a
jnp.take-based formulation whose gathered tensor costs B*2N*d*4 bytes).

Replaces the role of the reference's one-hot matmul selection + elementwise
chain (lib/support_sets.py:83-101). A jnp reference path lives in
:mod:`warpedganspace_tpu.ops.rbf` for correctness diffing and autodiff.

Shape constraints: the lane dimension wants multiples of 128 and the sublane
multiples of 8 — the public wrapper pads d -> 128k (zero-padding preserves
distances) and 2N -> 8k (padded RBFs get alpha=0 => zero weight).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _warp_kernel(idx_ref, sv_ref, a_ref, g_ref, z_ref, out_ref, f_ref):
    """One grid step = one batch row; sv/a/g blocks were DMA'd for set idx[i].
    Emits both the normalized gradient and the warp value f(z) in one pass
    (the shared distance/exp work is computed once).

    Shapes carry singleton dims so every BlockSpec satisfies the TPU tiling
    rule (block dims divisible by (8, 128) or equal to the array dims):
    sv (1, 2N, d), a/g (1, 2N, 1), z/out (1, 1, d), f (1, 1, 1)."""
    # Everything stays >= 2-D: Mosaic's vector layouts mis-lower 1-D
    # reductions/stores.
    z = z_ref[0]                          # (1, d)
    sv = sv_ref[0]                        # (2N, d)
    a = a_ref[0]                          # (2N, 1)
    g = g_ref[0]                          # (2N, 1)

    diff = z - sv                         # (2N, d) — lives in VMEM only
    d2 = jnp.sum(diff * diff, axis=1, keepdims=True)  # (2N, 1)
    e = jnp.exp(-g * d2)                  # (2N, 1)
    w = a * g * e                         # (2N, 1)
    grad = jnp.dot(
        (-2.0 * w).T, diff, preferred_element_type=jnp.float32
    )                                     # (1, d) on the MXU
    n2 = jnp.sum(grad * grad, axis=1, keepdims=True)  # (1, 1)
    out_ref[0] = grad * jax.lax.rsqrt(n2 + 1e-30)
    # f(z) = sum_j alpha_j exp(-gamma_j d2_j).
    f_ref[0] = jnp.sum(a * e, axis=0, keepdims=True)  # (1, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_value_and_grad_pallas(support_sets, alphas, gammas, z, idx, interpret: bool = False):
    """Fused f(z) AND normalized grad f_idx(z) in one VMEM pass.

    Args:
        support_sets: (K, 2N, d) float32.
        alphas, gammas: (K, 2N) float32.
        z: (B, d) float32. idx: (B,) int32.
        interpret: run in the Pallas interpreter (for CPU tests).

    Returns (f (B,), grad (B, d)); numerically matches
    :func:`warpedganspace_tpu.ops.rbf.warp_value_and_grad`.
    """
    k, n2, d = support_sets.shape
    b = z.shape[0]
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n2, 8)

    if d_pad != d:
        support_sets = jnp.pad(support_sets, ((0, 0), (0, 0), (0, d_pad - d)))
        z = jnp.pad(z, ((0, 0), (0, d_pad - d)))
    if n_pad != n2:
        support_sets = jnp.pad(support_sets, ((0, 0), (0, n_pad - n2), (0, 0)))
        alphas = jnp.pad(alphas, ((0, 0), (0, n_pad - n2)))  # alpha=0 => no-op RBF
        gammas = jnp.pad(gammas, ((0, 0), (0, n_pad - n2)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d_pad), lambda i, idx_ref: (idx_ref[i], 0, 0)),
            pl.BlockSpec((1, n_pad, 1), lambda i, idx_ref: (idx_ref[i], 0, 0)),
            pl.BlockSpec((1, n_pad, 1), lambda i, idx_ref: (idx_ref[i], 0, 0)),
            pl.BlockSpec((1, 1, d_pad), lambda i, idx_ref: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, d_pad), lambda i, idx_ref: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i, idx_ref: (i, 0, 0)),
        ),
    )
    out, f = pl.pallas_call(
        _warp_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(
        idx.astype(jnp.int32),
        support_sets,
        alphas[:, :, None],
        gammas[:, :, None],
        z[:, None, :],
    )
    return f[:, 0, 0], out[:, 0, :d]


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_grad_pallas(support_sets, alphas, gammas, z, idx, interpret: bool = False):
    """Fused, normalized grad f_idx(z) (see :func:`warp_value_and_grad_pallas`)."""
    _, grad = warp_value_and_grad_pallas(
        support_sets, alphas, gammas, z, idx, interpret=interpret
    )
    return grad
