"""Batched latent path traversal.

The reference traverses sequentially: a triple Python loop over latent codes x
K paths x steps, each step a single-sample support-sets forward
(traverse_latent_space.py:333-463). The traversal *is* inherently sequential in
t (z_{t+1} = z_t + eps * dir(z_t)), but everything else is data-parallel — so
here the step recursion is a ``lax.scan`` and the (codes x paths x direction)
product is one big batch dimension flowing through the RBF warp. One compiled
program replaces ~codes*K*2*steps Python-level forwards.

Warp backend: on TPU the scan body runs the fused Pallas kernel
(ops/rbf_pallas.py — one HBM pass over the (K, 2N, d) sets per step, measured
2.4-2.5x over the jnp two-matmul formulation at the production shapes); the
support-set tensors are padded/packed ONCE outside the scan. Elsewhere (or
with ``use_pallas=False``) the jnp all-sets formulation is used. Both scans
(+eps and -eps) are fused into one — the row axis carries both directions,
doubling the MXU row utilization of each kernel step.

Index/order semantics replicate the reference exactly:

- positive direction appends, negative direction *prepends*, so the stored
  sequence is [farthest-negative ... center ... farthest-positive] with the
  unshifted code in the middle (:378-438);
- the stored shift at position t is the shift that *produced* the stored code
  at position t, and rendering evaluates G(code_t + shift_t) — i.e. rendered
  frame t is one step ahead of stored code t, a reference quirk preserved for
  output parity (:399-406 vs :456-462);
- ``shift_leap`` keeps every leap-th step of each direction (:393-397).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from warpedganspace_tpu.models.support_sets import SupportSets
from warpedganspace_tpu.ops import rbf
from warpedganspace_tpu.ops.rbf_pallas import prepare_warp_sets, warp_grad_all_sets_kn


@functools.partial(
    jax.jit,
    static_argnames=("S", "shift_steps", "shift_leap", "num_paths", "mesh", "use_pallas"),
)
def traverse_paths(
    S: SupportSets,
    s_params: dict,
    latents: jax.Array,
    eps: float,
    shift_steps: int,
    shift_leap: int = 1,
    num_paths: int | None = None,
    mesh=None,
    use_pallas: bool | None = None,
):
    """Integrate all K paths for all latent codes in one compiled program.

    Args:
        S:           support-sets config.
        s_params:    support-sets parameters.
        latents:     (N, d) starting latent codes (z, or w when traversing the
                     W-space — the caller maps z -> w first).
        eps:         per-step magnitude.
        shift_steps: steps per direction (total stored = 2*floor(steps/leap)+1).
        shift_leap:  store every leap-th step.
        num_paths:   number of paths (defaults to S.num_support_sets).
        use_pallas:  warp backend; None = auto (fused Pallas kernel on TPU).

    Returns:
        codes:  (N, K, T, d) stored latent codes per path.
        shifts: (N, K, T, d) the shift that produced each stored code
                (zeros at the center position).
    """
    k = S.num_support_sets if num_paths is None else num_paths
    n, d = latents.shape
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"

    # (codes x paths x {+eps, -eps}) grid: rows [0, n) advance by +eps and rows
    # [n, 2n) by -eps in the SAME scan — one warp launch serves both.
    z0 = jnp.broadcast_to(latents[:, None, :], (n, k, d))        # (N, K, d)
    z00 = jnp.concatenate([z0, z0], axis=0)                      # (2N, K, d)
    signed_eps = jnp.concatenate(
        [jnp.full((n, 1, 1), eps, jnp.float32), jnp.full((n, 1, 1), -eps, jnp.float32)]
    )

    if use_pallas:
        # Set-major layout (K, rows, d): each kernel grid step reads a
        # contiguous row slab; pack/pad the sets ONCE, outside the scan.
        # On TPU the sets are stored bf16: the MXU's default-precision f32
        # matmul already rounds operands to bf16, so the outputs are
        # bit-identical (measured) while HBM traffic — the kernel's bound —
        # halves (0.50 vs 0.77 ms at the production shapes). ||sv||^2 stays
        # exact f32 (precomputed in prepare_warp_sets).
        sv_dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else None
        ws = prepare_warp_sets(
            s_params["support_sets"][:k], s_params["alphas"][:k],
            S.gammas(s_params)[:k], dtype=sv_dtype,
        )
        zt = jnp.transpose(z00, (1, 0, 2))                       # (K, 2N, d)
        se = jnp.transpose(signed_eps, (1, 0, 2))                # (1, 2N, 1)
        dir_fn = lambda z: warp_grad_all_sets_kn(ws, z)          # noqa: E731
        if mesh is not None and k % mesh.size == 0:
            # pallas_call has no GSPMD partitioning rule — shard_map it over
            # the path axis instead: each device holds its K/devices slice of
            # BOTH the sets and the z rows (the kernel pairs z[k] with sv[k]
            # by grid index, so they must be sliced together); no collectives
            # in the body.
            from jax.sharding import NamedSharding, PartitionSpec as P

            dir_fn = jax.shard_map(
                lambda ws_, z: warp_grad_all_sets_kn(ws_, z),
                mesh=mesh,
                in_specs=(P("data"), P("data", None, None)),
                out_specs=P("data", None, None),
                check_vma=False,
            )
            dir_fn = functools.partial(dir_fn, ws)
            zt = jax.lax.with_sharding_constraint(
                zt, NamedSharding(mesh, P("data", None, None))
            )
    else:
        zt, se = z00, signed_eps
        # Slice the per-set arrays to the first k paths, mirroring the Pallas
        # branch's [:k] — otherwise num_paths < K mismatches the einsum's set
        # axis (S.gammas broadcasts with the STATIC K, so slice its result).
        sv_k = s_params["support_sets"][:k]
        al_k = s_params["alphas"][:k]
        ga_k = S.gammas(s_params)[:k]
        dir_fn = lambda z: rbf.warp_grad_all_sets(sv_k, al_k, ga_k, z)  # noqa: E731
        if mesh is not None:
            # Shard the path axis over the data-parallel mesh (the path axis
            # because K (64-200) is always >= the device count, unlike N).
            from jax.sharding import NamedSharding, PartitionSpec as P

            zt = jax.lax.with_sharding_constraint(
                zt, NamedSharding(mesh, P(None, "data", None))
            )

    def body(z, _):
        shift = se * dir_fn(z)
        z_next = z + shift
        return z_next, (z_next, shift)

    _, (codes_t, shifts_t) = jax.lax.scan(body, zt, None, length=shift_steps)

    if use_pallas:  # back to row-major (T, 2N, K, d)
        codes_t = jnp.transpose(codes_t, (0, 2, 1, 3))
        shifts_t = jnp.transpose(shifts_t, (0, 2, 1, 3))

    # Keep every leap-th step (reference stores when cnt == shift_leap).
    sel = jnp.arange(shift_leap - 1, shift_steps, shift_leap)
    pos_codes, pos_shifts = codes_t[sel, :n], shifts_t[sel, :n]
    neg_codes, neg_shifts = codes_t[sel, n:], shifts_t[sel, n:]

    # Negative direction prepends -> farthest first.
    neg_codes, neg_shifts = neg_codes[::-1], neg_shifts[::-1]

    center_code = z0[None]
    center_shift = jnp.zeros_like(z0)[None]

    codes = jnp.concatenate([neg_codes, center_code, pos_codes], axis=0)   # (T, N, K, d)
    shifts = jnp.concatenate([neg_shifts, center_shift, pos_shifts], axis=0)

    codes = codes.transpose(1, 2, 0, 3)    # (N, K, T, d)
    shifts = shifts.transpose(1, 2, 0, 3)
    return codes, shifts


# jit caches are keyed on the function OBJECT — a fresh closure per call would
# re-trace (and re-compile) the full generator every invocation, and the
# traversal CLI calls iter_rendered_u8 once per latent code. Cache the jitted
# renderer per (generator apply_fn, flags); the stored apply_fn reference also
# pins its id() so a recycled id can never alias a different generator.
_RENDER_U8_CACHE: dict = {}


def _render_u8_fn(G, latent_is_w: bool):
    from warpedganspace_tpu.ops import s2d as s2d_ops

    default_layout = "s2d" if getattr(G, "supports_s2d_out", False) else "nhwc"
    s2d_out = getattr(G, "render_layout", default_layout) == "s2d"
    key = (id(G.apply_fn), s2d_out, bool(latent_is_w))
    hit = _RENDER_U8_CACHE.get(key)
    if hit is not None and hit[0] is G.apply_fn:
        return hit[1]

    kwargs = {"latent_is_w": True} if latent_is_w else {}
    if s2d_out:
        kwargs["out_layout"] = "s2d"
    apply_fn = G.apply_fn

    @jax.jit
    def render_u8(g_params, c, s):
        img = apply_fn(g_params, c, s, **kwargs).astype(jnp.float32)
        lo = jnp.min(img, axis=(1, 2, 3), keepdims=True)
        hi = jnp.max(img, axis=(1, 2, 3), keepdims=True)
        x = (img - lo) / jnp.maximum(hi - lo, 1e-12)
        u8 = (255.0 * x).astype(jnp.uint8)
        return s2d_ops.from_s2d(u8) if s2d_out else u8

    _RENDER_U8_CACHE[key] = (apply_fn, render_u8)
    return render_u8


def iter_rendered_u8(G, g_params, codes, shifts, batch_size: int,
                     latent_is_w: bool = False, dtype=None):
    """Yield (start, uint8 ndarray chunk) over a flat sequence of (code, shift)
    rows — the traversal CLI's render stream.

    Improvements over per-path ``render_codes`` calls (reference loop
    traverse_latent_space.py:441-479): rows from DIFFERENT paths share device
    batches (no underfilled tails per path — one dispatch chain per code
    instead of K), and the adaptive uint8 conversion (images.tensor2image
    semantics, per-image min/max) runs ON DEVICE, so host transfers move 1
    byte/px instead of 4. Chunks pad to a full batch => one compiled shape.

    With an S2D-tail generator the un-S2D layout change runs AFTER the uint8
    quantization (min/max and the per-pixel affine are permutation-invariant,
    so the stream is bit-identical) — the transpose, which runs far off the
    copy roofline on thin-channel tensors, then moves 1-byte pixels instead
    of 2-4.
    """
    import numpy as np

    render_u8 = _render_u8_fn(G, latent_is_w)

    t = codes.shape[0]
    if dtype is not None:
        codes = codes.astype(dtype)
        shifts = shifts.astype(dtype)
    prev = None  # one chunk of device->host latency hidden behind the next render
    for start in range(0, t, batch_size):
        chunk_codes = codes[start : start + batch_size]
        chunk_shifts = shifts[start : start + batch_size]
        pad = batch_size - chunk_codes.shape[0]
        if pad:
            chunk_codes = jnp.pad(chunk_codes, ((0, pad), (0, 0)))
            chunk_shifts = jnp.pad(chunk_shifts, ((0, pad), (0, 0)))
        out = render_u8(g_params, chunk_codes, chunk_shifts)
        if prev is not None:
            p_start, p_out, p_pad = prev
            img = np.asarray(p_out)
            yield p_start, (img[:-p_pad] if p_pad else img)
        prev = (start, out, pad)
    if prev is not None:
        p_start, p_out, p_pad = prev
        img = np.asarray(p_out)
        yield p_start, (img[:-p_pad] if p_pad else img)


def render_codes(G, g_params, codes, shifts, batch_size: int, latent_is_w: bool = False):
    """Generate images for a flat sequence of (code, shift) rows in batches.

    Replicates the reference's G(z=codes_batch, shift=shifts_batch) rendering
    (traverse_latent_space.py:441-463). Returns a numpy array (T, H, W, C).
    Rows are padded to a full batch so every chunk reuses one compiled program
    shape (no per-tail recompiles).
    """
    import numpy as np

    t = codes.shape[0]
    outs = []
    kwargs = {"latent_is_w": True} if latent_is_w else {}
    for start in range(0, t, batch_size):
        chunk_codes = codes[start : start + batch_size]
        chunk_shifts = shifts[start : start + batch_size]
        pad = batch_size - chunk_codes.shape[0]
        if pad:
            chunk_codes = jnp.pad(chunk_codes, ((0, pad), (0, 0)))
            chunk_shifts = jnp.pad(chunk_shifts, ((0, pad), (0, 0)))
        img = G.apply(g_params, chunk_codes, chunk_shifts, **kwargs)
        img = np.asarray(img)
        if pad:
            img = img[:-pad]
        outs.append(img)
    return np.concatenate(outs, axis=0)
