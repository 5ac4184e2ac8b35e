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

from warpedganspace_tpu.ops.rbf_pallas import _interpret, _round_up

_QUERY_BLOCK = 512
# Backward holds 4 (NB, M) f32 intermediates in VMEM; halve the block.
_QUERY_BLOCK_BWD = 256


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
    # Both directions must sit in VMEM comfortably. The binding constraint is
    # the BACKWARD's working set: four (NB, M) f32 intermediates
    # (logits/beta/dbeta/ds) plus the resident keys/values and the f32
    # dphi/dg accumulator blocks. At BigGAN's largest kernel shape
    # (M=1024, dk_p=dv_p=128, NB=256) that is ~7 MB; the bound below admits
    # M<=1024 at 128-lane padded depths and routes anything larger (e.g. a
    # hypothetical G_attn="128" at 256²+, M=4096) to the jnp path.
    bwd_intermediates = 4 * _QUERY_BLOCK_BWD * m * 4
    kv_and_acc = m * (_round_up(dk, 128) + _round_up(dv, 128)) * (2 + 4)
    # n must tile into the fixed query blocks (both directions degrade to
    # nb = n otherwise, which would blow the VMEM estimate above for large
    # block-unaligned n) — a single small block is the only other safe case.
    n_tiles = n % _QUERY_BLOCK == 0 or n <= _QUERY_BLOCK_BWD
    return (m % 128 == 0 and n % 8 == 0 and n_tiles
            and bwd_intermediates + kv_and_acc < (8 << 20))


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
        interpret=_interpret(),
    )(theta_p, phi_p, g_p)
    return out[..., :dv]


def _attn_bwd_kernel(theta_ref, phi_ref, g_ref, ct_ref,
                     dtheta_ref, dphi_ref, dg_ref):
    """Fused backward: grid (b, n//NB) with j innermost. phi/g/dphi/dg block
    indices depend only on b, so they stay VMEM-resident across the inner j
    sweep; dphi/dg accumulate in f32 across query blocks. beta is recomputed
    on-chip (the forward saved nothing), so the (NB, M) attention matrix and
    its softmax-VJP intermediates never touch HBM — the jnp VJP round-trips
    three (B, N, M) f32 tensors (beta recompute, dbeta, ds). Measured 2.28x
    (2.78 vs 6.35 ms) at the BigGAN-128 bs=32 train shape."""
    j = pl.program_id(1)
    th = theta_ref[0]                                    # (NB, dk)
    ph = phi_ref[0]                                      # (M, dk)
    g = g_ref[0]                                         # (M, dv)
    ct = ct_ref[0]                                       # (NB, dv)

    s = jax.lax.dot_general(th, ph, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)      # (NB, M)
    s = s - jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s)
    beta = e / jnp.sum(e, axis=1, keepdims=True)                     # f32

    dbeta = jax.lax.dot_general(ct, g, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (NB, M)
    r = jnp.sum(dbeta * beta, axis=1, keepdims=True)
    ds = beta * (dbeta - r)                              # softmax VJP, f32

    dtheta_ref[0] = jax.lax.dot_general(
        ds.astype(ph.dtype), ph, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtheta_ref.dtype)

    dphi_blk = jax.lax.dot_general(
        ds.astype(th.dtype), th, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                          # (M, dk)
    dg_blk = jax.lax.dot_general(
        beta.astype(ct.dtype), ct, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                          # (M, dv)

    @pl.when(j == 0)
    def _init():
        dphi_ref[0] = dphi_blk
        dg_ref[0] = dg_blk

    @pl.when(j != 0)
    def _acc():
        dphi_ref[0] += dphi_blk
        dg_ref[0] += dg_blk


def _pallas_attention_bwd(theta, phi, g, ct):
    b, n, dk = theta.shape
    _, m, dv = g.shape
    nb = min(_QUERY_BLOCK_BWD, n)
    if n % nb != 0:
        nb = n
    dk_p, dv_p = _round_up(dk, 128), _round_up(dv, 128)
    theta_p = jnp.pad(theta, ((0, 0), (0, 0), (0, dk_p - dk)))
    phi_p = jnp.pad(phi, ((0, 0), (0, 0), (0, dk_p - dk)))
    g_p = jnp.pad(g, ((0, 0), (0, 0), (0, dv_p - dv)))
    ct_p = jnp.pad(ct, ((0, 0), (0, 0), (0, dv_p - dv)))

    dtheta, dphi, dg = pl.pallas_call(
        _attn_bwd_kernel,
        grid=(b, n // nb),
        in_specs=[
            pl.BlockSpec((1, nb, dk_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dk_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dv_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, dv_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nb, dk_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dk_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dv_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, dk_p), theta.dtype),
            # dphi/dg accumulate across query blocks — keep f32 until the end.
            jax.ShapeDtypeStruct((b, m, dk_p), jnp.float32),
            jax.ShapeDtypeStruct((b, m, dv_p), jnp.float32),
        ],
        interpret=_interpret(),
    )(theta_p, phi_p, g_p, ct_p)
    return (dtheta[..., :dk],
            dphi[..., :dk].astype(phi.dtype),
            dg[..., :dv].astype(g.dtype))


# ---------------------------------------------------------------------------
# GSPMD partitioning. A bare pallas_call has no SPMD rule: under a sharded jit
# (the --multi-device train step shards the batch axis) XLA would all-gather
# theta/phi/g and run the FULL global batch replicated on every device —
# erasing data parallelism (the same constraint the shard_map'd traversal
# kernel documents, traverse/engine.py:104-112). custom_partitioning declares
# the op batch-parallel: each device runs the kernel on its own batch shard,
# no collectives. Attention is per-sample, so this is exact.

def _batch_partitioned(fn, rule: str):
    """Wrap ``fn`` so GSPMD/shardy partitions it along the leading batch dim
    (factor ``b`` in ``rule``); all other dims are forced replicated."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    wrapped = custom_partitioning(fn)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) > 0 else None

    def _shard(mesh, b):
        return lambda x: NamedSharding(
            mesh, PartitionSpec(*((b,) + (None,) * (len(x.shape) - 1))))

    def infer(mesh, arg_shapes, result_shape):
        return jax.tree.map(_shard(mesh, _batch_axis(arg_shapes)), result_shape)

    def partition(mesh, arg_shapes, result_shape):
        shard = _shard(mesh, _batch_axis(arg_shapes))
        arg_shardings = tuple(shard(a) for a in arg_shapes)
        result_shardings = jax.tree.map(shard, result_shape)
        return mesh, fn, result_shardings, arg_shardings

    wrapped.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return wrapped


_pallas_attention_spmd = _batch_partitioned(
    _pallas_attention, "b n k, b m k, b m v -> b n v")
_pallas_attention_bwd_spmd = _batch_partitioned(
    _pallas_attention_bwd, "b n k, b m k, b m v, b n v -> b n k, b m k, b m v")


@jax.custom_vjp
def _sa_attention_kernel_op(theta, phi, g):
    return _pallas_attention_spmd(theta, phi, g)


def _sa_fwd(theta, phi, g):
    return _pallas_attention_spmd(theta, phi, g), (theta, phi, g)


def _sa_bwd(res, ct):
    # Only reached when the forward routed to the kernel, so the shapes fit.
    theta, phi, g = res
    return _pallas_attention_bwd_spmd(theta, phi, g, ct)


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
