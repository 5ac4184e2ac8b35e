"""Pallas TPU kernel: all-sets RBF warp directions in ONE HBM pass over the sets.

The north-star op (BASELINE.json "grad-f warp evals/sec"): the traversal hot
loop advances every latent code along every path, direction_k(z) =
L2-normalize(grad f_k(z)), for all K sets at once (reference forward:
lib/support_sets.py:83-101; traversal loop: traverse_latent_space.py:333-463).

The jnp formulation (ops/rbf.py warp_grad_all_sets) lowers to two separate
K-batched matmuls — XLA reads the (K, 2N, d) support-set tensor from HBM twice
(cross-distance pass + gradient-accumulation pass). At production scale
(K=200, 2N=1024, d=512 -> 420 MB f32) the op is HBM-bandwidth-bound, so this
kernel fuses the whole chain — distances, exp, RBF weighting, gradient
accumulation, normalization — into one grid step per (set, row-block): SV_k is
DMA'd into VMEM once and feeds BOTH MXU passes from on-chip memory, halving
HBM traffic. Row-blocks iterate in the minor grid dimension, so Mosaic keeps
the SV_k block resident across them (index_map is row-block-invariant).

Layout: the kernel is native to z in (K, N, d) — set-major — so each grid
step's z block is a contiguous (1, NB, d) slab. The traversal engine runs its
scan in this layout; ``warp_grad_all_sets_fused`` is the (N, K, d) drop-in.

Alignment: lane dims (d and the 2N axis of alphas/gammas) must be multiples of
128 and sublane dims (2N of sv, NB of z) multiples of 8. ``prepare_warp_sets``
zero-pads once — OUTSIDE any scan, so the (K, 2N, d) pad is never re-executed
per traversal step. Padded support vectors get alpha*gamma = 0 => zero weight;
padded z rows normalize garbage that is sliced off.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warpedganspace_tpu.ops import rbf

_ROW_BLOCK = 256  # z rows per grid step; bounds VMEM temps to (256, 2N)
_SET_BLOCK = 4    # sets per grid step. Measured at the traversal pattern
                  # (K=200, 32 codes, bf16 sets, v5e): kb=1/2/4 -> 0.471 /
                  # 0.483 / 0.463 ms — grid-step overhead is NOT the limiter;
                  # the kernel already streams sv at ~450 GB/s, ABOVE what a
                  # plain XLA 210 MB reduce achieves on this chip (217-350
                  # GB/s), i.e. at the practical HBM ceiling. kb=4 kept for
                  # the marginal win; the bf16 sv block (4 MB, double-
                  # buffered) fits VMEM (~16 MB) comfortably.


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@dataclasses.dataclass(frozen=True)
class WarpSets:
    """Support-set parameters pre-padded/pre-packed for the fused kernel.

    Build once per traversal (``prepare_warp_sets``) so the padding copies sit
    outside the scan. ``d`` is the true latent dim (pre-padding).
    """

    sv: jax.Array       # (K, 2N_pad, d_pad) f32 or bf16
    g_row: jax.Array    # (K, 1, 2N_pad)  gamma_j      (singleton sublane: the
    ag_row: jax.Array   # (K, 1, 2N_pad)  alpha*gamma   TPU block tiling rule)
    svsq_row: jax.Array  # (K, 1, 2N_pad) ||sv_j||^2, always f32 (exact even
    #                     when sv is stored bf16)
    d: int

    def tree_flatten(self):
        return (self.sv, self.g_row, self.ag_row, self.svsq_row), self.d

    @classmethod
    def tree_unflatten(cls, d, leaves):
        return cls(*leaves, d=d)


jax.tree_util.register_pytree_node(
    WarpSets, WarpSets.tree_flatten, WarpSets.tree_unflatten
)


def prepare_warp_sets(support_sets, alphas, gammas, dtype=None) -> WarpSets:
    """Pad/pack (K, 2N, d) params for the kernel. Call OUTSIDE the scan.

    ``dtype=jnp.bfloat16`` stores the support vectors in bf16 — halves the
    kernel's HBM traffic (it is HBM-bound) for ~1e-3-level direction error;
    ||sv||^2 is precomputed here in f32 either way, so only the cross/gradient
    matmul inputs are rounded.
    """
    k, n2, d = support_sets.shape
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n2, 128)  # lane dim of g/ag AND sublane of sv -> lcm 128
    sv = jnp.pad(support_sets, ((0, 0), (0, n_pad - n2), (0, d_pad - d)))
    svsq = jnp.sum(sv * sv, axis=-1)                          # (K, 2N_pad) f32
    if dtype is not None:
        sv = sv.astype(dtype)
    ag = jnp.pad(alphas * gammas, ((0, 0), (0, n_pad - n2)))  # 0 => no-op RBF
    g = jnp.pad(gammas, ((0, 0), (0, n_pad - n2)))
    return WarpSets(sv=sv, g_row=g[:, None, :], ag_row=ag[:, None, :],
                    svsq_row=svsq[:, None, :], d=d)


def _warp_kernel(sv_ref, g_ref, ag_ref, svsq_ref, z_ref, out_ref):
    """One grid step: directions of a KB-set block at one row-block of z.

    Blocks: sv (KB, 2N, d), g/ag/svsq (KB, 1, 2N), z/out (KB, NB, d). Both
    matmuls are KB-batched on the MXU (native bf16 throughput when sv is
    stored bf16); everything between them stays in VMEM/registers.
    """
    sv = sv_ref[...]                     # (KB, 2N, d) f32 or bf16
    g = g_ref[...]                       # (KB, 1, 2N)
    ag = ag_ref[...]                     # (KB, 1, 2N)
    svsq = svsq_ref[...]                 # (KB, 1, 2N) f32 (exact)
    z = z_ref[...]                       # (KB, NB, d) f32
    zc = z.astype(sv.dtype)

    zsq = jnp.sum(z * z, axis=2, keepdims=True)            # (KB, NB, 1)
    cross = jax.lax.dot_general(
        zc, sv, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                    # (KB, NB, 2N) — MXU pass 1
    d2 = zsq - 2.0 * cross + svsq
    w = ag * jnp.exp(-g * d2)            # (KB, NB, 2N) — VPU, f32
    wsum = jnp.sum(w, axis=2, keepdims=True)               # (KB, NB, 1)
    grad = -2.0 * wsum * z + 2.0 * jax.lax.dot_general(
        w.astype(sv.dtype), sv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                    # (KB, NB, d) — MXU pass 2, same block
    n2 = jnp.sum(grad * grad, axis=2, keepdims=True)
    out_ref[...] = grad * jax.lax.rsqrt(n2)


def _fused_impl(ws: WarpSets, z_kn: jax.Array, set_block: int | None = None) -> jax.Array:
    """Raw kernel launch. z_kn (K, N, d_true) -> (K, N, d_true) directions."""
    k, n, d = z_kn.shape
    d_pad = ws.sv.shape[2]
    n2 = ws.sv.shape[1]
    nb = min(_ROW_BLOCK, _round_up(n, 8))
    n_pad = _round_up(n, nb)
    # Set-block size: bounded by K and by VMEM — Mosaic double-buffers the
    # block across grid steps, so the sv footprint is kb * 2N * d * itemsize
    # * 2; cap the single-buffer block at ~4 MB (8 MB pipelined) to leave
    # room for the z/out blocks in ~16 MB of VMEM.
    kb = set_block if set_block is not None else _SET_BLOCK
    kb = max(1, min(kb, k, (4 << 20) // max(1, n2 * d_pad * ws.sv.dtype.itemsize)))
    k_pad = _round_up(k, kb)
    z = jnp.pad(z_kn, ((0, k_pad - k), (0, n_pad - n), (0, d_pad - d)))
    sv, g_row, ag_row, svsq_row = ws.sv, ws.g_row, ws.ag_row, ws.svsq_row
    if k_pad != k:
        # Padded sets have alpha*gamma = 0 -> zero gradient -> rsqrt(0) rows;
        # they are sliced off below, matching the padded-z-row convention.
        sv = jnp.pad(sv, ((0, k_pad - k), (0, 0), (0, 0)))
        g_row = jnp.pad(g_row, ((0, k_pad - k), (0, 0), (0, 0)))
        ag_row = jnp.pad(ag_row, ((0, k_pad - k), (0, 0), (0, 0)))
        svsq_row = jnp.pad(svsq_row, ((0, k_pad - k), (0, 0), (0, 0)))

    grid = (k_pad // kb, n_pad // nb)  # row-blocks minor => sv block resident
    out = pl.pallas_call(
        _warp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kb, n2, d_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, 1, n2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, 1, n2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, 1, n2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, nb, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (kb, nb, d_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad, n_pad, d_pad), jnp.float32),
        interpret=_interpret(),
    )(sv, g_row, ag_row, svsq_row, z)
    return out[:k, :n, :d]


def _jnp_kn(ws: WarpSets, z_kn: jax.Array) -> jax.Array:
    """jnp twin of the kernel on the packed layout (backward-pass reference)."""
    sv, g, ag = ws.sv.astype(jnp.float32), ws.g_row, ws.ag_row    # g/ag (K, 1, 2N)
    z = jnp.pad(z_kn, ((0, 0), (0, 0), (0, sv.shape[2] - z_kn.shape[2])))
    zsq = jnp.sum(z * z, axis=-1, keepdims=True)                  # (K, N, 1)
    svsq = ws.svsq_row[:, 0, :]                                   # (K, 2N) exact
    cross = jnp.einsum("knd,kmd->knm", z, sv)
    d2 = zsq - 2.0 * cross + svsq[:, None, :]
    w = ag * jnp.exp(-g * d2)                                     # (K, N, 2N)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    grad = -2.0 * wsum * z + 2.0 * jnp.einsum("knm,kmd->knd", w, sv)
    grad = grad * jax.lax.rsqrt(jnp.sum(grad * grad, axis=-1, keepdims=True))
    return grad[..., : z_kn.shape[2]]


@jax.custom_vjp
def warp_grad_all_sets_kn(ws: WarpSets, z_kn: jax.Array) -> jax.Array:
    """Fused directions, set-major: z (K, N, d) -> (K, N, d).

    Forward runs the Pallas kernel (one HBM pass over the sets); the backward
    — only exercised if someone differentiates a traversal — falls back to the
    jnp twin's VJP (training differentiates ops/rbf.warp_grad instead, where
    XLA's shared-residual autodiff is the measured winner; PERFORMANCE.md).
    """
    return _fused_impl(ws, z_kn)


def _kn_fwd(ws, z_kn):
    return _fused_impl(ws, z_kn), (ws, z_kn)


def _kn_bwd(res, ct):
    ws, z_kn = res
    _, vjp = jax.vjp(_jnp_kn, ws, z_kn)
    return vjp(ct)


warp_grad_all_sets_kn.defvjp(_kn_fwd, _kn_bwd)


@functools.partial(jax.jit)
def warp_grad_all_sets_fused(support_sets, alphas, gammas, z):
    """Drop-in for :func:`warpedganspace_tpu.ops.rbf.warp_grad_all_sets`:
    z (N, K, d) -> (N, K, d). Pads + packs per call — inside a scan, use
    ``prepare_warp_sets`` once + ``warp_grad_all_sets_kn`` per step instead.
    """
    ws = prepare_warp_sets(support_sets, alphas, gammas)
    out = warp_grad_all_sets_kn(ws, jnp.transpose(z, (1, 0, 2)))
    return jnp.transpose(out, (1, 0, 2))
