"""RBF warping-function ops: f(z) and its gradient field.

The warping function for support set k with 2N support vectors sv_j, RBF weights
alpha_j and widths gamma_j is

    f_k(z)      = sum_j alpha_j * exp(-gamma_j * ||z - sv_j||^2)
    grad f_k(z) = -2 * sum_j alpha_j * gamma_j * exp(-gamma_j * ||z - sv_j||^2) * (z - sv_j)

and the *path direction* at z is the L2-normalized gradient.

Behavioral parity: reference ``lib/support_sets.py:83-101`` (forward computes the
normalized gradient; the reference selects the per-sample support set by a one-hot
matmul over a (K, 2N*d) parameter matrix).  TPU-first design differences:

- The per-sample support set is selected by an integer gather (``jnp.take``)
  instead of a dense one-hot matmul: for K=200, D=512, d=512 the one-hot matmul
  moves a 200 x 524288 matrix through the MXU per step; the gather moves only the
  B selected rows through HBM.  Gradients w.r.t. the parameters become a
  scatter-add, which XLA handles natively.
- Distances are computed via the expanded form ||z||^2 - 2 z.sv + ||sv||^2 so the
  dominant cost is a single (B,d) x (B,d,2N) batched matmul on the MXU, rather
  than materializing the (B, 2N, d) difference tensor for the exponent. The
  difference tensor is still needed for the gradient accumulation, which is a
  second batched matmul: grad = -2 * (w @ (z - SV)) = -2*(sum_j w_j) * z
  + 2 * w @ SV.  This keeps everything MXU-shaped.

A fused Pallas kernel (:mod:`warpedganspace_tpu.ops.rbf_pallas`) implements the
same computation in one VMEM pass for inference-heavy traversal workloads.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_set(params_leaf: jax.Array, idx: jax.Array) -> jax.Array:
    """Select per-sample rows of a (K, ...) parameter by integer index (B,)."""
    return jnp.take(params_leaf, idx, axis=0)


def _rbf_terms(support_sets, alphas, gammas, z, idx):
    """Common RBF pieces.

    Args:
        support_sets: (K, 2N, d) support vectors.
        alphas:       (K, 2N) RBF weights.
        gammas:       (K, 2N) RBF widths (already exponentiated if learned).
        z:            (B, d) query points.
        idx:          (B,) int32 support-set index per sample.

    Returns:
        sv:  (B, 2N, d) selected support vectors
        w:   (B, 2N)   alpha_j * gamma_j * exp(-gamma_j * ||z - sv_j||^2)
        e:   (B, 2N)   exp(-gamma_j * ||z - sv_j||^2)
        a:   (B, 2N)   selected alphas
    """
    sv = _gather_set(support_sets, idx)          # (B, 2N, d)
    a = _gather_set(alphas, idx)                 # (B, 2N)
    g = _gather_set(gammas, idx)                 # (B, 2N)
    # ||z - sv||^2 = ||z||^2 - 2 z.sv + ||sv||^2  (MXU-friendly)
    z_sq = jnp.sum(z * z, axis=-1, keepdims=True)            # (B, 1)
    sv_sq = jnp.sum(sv * sv, axis=-1)                        # (B, 2N)
    cross = jnp.einsum("bd,bnd->bn", z, sv)                  # (B, 2N)
    d_sq = z_sq - 2.0 * cross + sv_sq                        # (B, 2N)
    e = jnp.exp(-g * d_sq)                                   # (B, 2N)
    w = a * g * e                                            # (B, 2N)
    return sv, w, e, a


@functools.partial(jax.jit, static_argnames=("normalize",))
def warp_grad(support_sets, alphas, gammas, z, idx, normalize: bool = True):
    """Gradient field of the selected warping functions at z.

    Equivalent to the reference ``SupportSets.forward`` (lib/support_sets.py:83-101)
    with ``idx`` in place of the one-hot ``support_sets_mask``.

    Returns (B, d): -2 * sum_j w_j (z - sv_j), L2-normalized per row when
    ``normalize`` (the reference always normalizes).
    """
    sv, w, _, _ = _rbf_terms(support_sets, alphas, gammas, z, idx)
    # -2 * sum_j w_j (z - sv_j)  =  -2 * (sum_j w_j) z + 2 * w @ sv
    w_sum = jnp.sum(w, axis=-1, keepdims=True)               # (B, 1)
    grad = -2.0 * w_sum * z + 2.0 * jnp.einsum("bn,bnd->bd", w, sv)
    if normalize:
        grad = grad / jnp.linalg.norm(grad, axis=-1, keepdims=True)
    return grad


@jax.jit
def warp_value(support_sets, alphas, gammas, z, idx):
    """f(z) = sum_j alpha_j exp(-gamma_j ||z - sv_j||^2), shape (B,)."""
    _, _, e, a = _rbf_terms(support_sets, alphas, gammas, z, idx)
    return jnp.sum(a * e, axis=-1)


@functools.partial(jax.jit, static_argnames=("normalize",))
def warp_grad_all_sets(support_sets, alphas, gammas, z, normalize: bool = True):
    """Gradient field of EVERY warping function at every point — the traversal
    formulation (each of N latent codes is advanced along all K paths, so all
    sets are used and no gather is needed; everything is K-batched matmuls).

    Args:
        z: (N, K, d) — per-code, per-set query points.

    Returns (N, K, d) directions (L2-normalized when ``normalize``).
    """
    sv, a = support_sets, alphas                                   # (K, 2N, d), (K, 2N)
    z_sq = jnp.sum(z * z, axis=-1)[..., None]                      # (N, K, 1)
    sv_sq = jnp.sum(sv * sv, axis=-1)                              # (K, 2N)
    cross = jnp.einsum("nkd,kmd->nkm", z, sv)                      # (N, K, 2N)
    d_sq = z_sq - 2.0 * cross + sv_sq[None]
    w = a[None] * gammas[None] * jnp.exp(-gammas[None] * d_sq)     # (N, K, 2N)
    w_sum = jnp.sum(w, axis=-1, keepdims=True)                     # (N, K, 1)
    grad = -2.0 * w_sum * z + 2.0 * jnp.einsum("nkm,kmd->nkd", w, sv)
    if normalize:
        grad = grad / jnp.linalg.norm(grad, axis=-1, keepdims=True)
    return grad


@functools.partial(jax.jit, static_argnames=("normalize",))
def warp_value_and_grad(support_sets, alphas, gammas, z, idx, normalize: bool = True):
    """Fused f(z) and grad f(z) — one distance/exp evaluation for both."""
    sv, w, e, a = _rbf_terms(support_sets, alphas, gammas, z, idx)
    f = jnp.sum(a * e, axis=-1)
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    grad = -2.0 * w_sum * z + 2.0 * jnp.einsum("bn,bnd->bd", w, sv)
    if normalize:
        grad = grad / jnp.linalg.norm(grad, axis=-1, keepdims=True)
    return f, grad
