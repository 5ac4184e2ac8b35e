"""Batched latent path traversal.

The reference traverses sequentially: a triple Python loop over latent codes x
K paths x steps, each step a single-sample support-sets forward
(traverse_latent_space.py:333-463). The traversal *is* inherently sequential in
t (z_{t+1} = z_t + eps * dir(z_t)), but everything else is data-parallel — so
here the step recursion is a ``lax.scan`` and the (codes x paths) product is one
big batch dimension flowing through the fused RBF warp kernel. One compiled
program replaces ~codes*K*2*steps Python-level forwards.

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


@functools.partial(
    jax.jit,
    static_argnames=("S", "shift_steps", "shift_leap", "num_paths", "mesh"),
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

    Returns:
        codes:  (N, K, T, d) stored latent codes per path.
        shifts: (N, K, T, d) the shift that produced each stored code
                (zeros at the center position).
    """
    k = S.num_support_sets if num_paths is None else num_paths
    n, d = latents.shape

    # (codes x paths) grid: every code advances along every path, so the warp
    # uses the gather-free all-sets formulation (K-batched matmuls).
    z0 = jnp.broadcast_to(latents[:, None, :], (n, k, d))   # (N, K, d)
    if mesh is not None:
        # Shard the path axis over the data-parallel mesh (support-set params
        # replicate; each device integrates its slice of the K paths). The
        # path axis is used because K (64-200) is always >= the device count,
        # unlike the pool size N.
        from jax.sharding import NamedSharding, PartitionSpec

        z0 = jax.lax.with_sharding_constraint(
            z0, NamedSharding(mesh, PartitionSpec(None, "data", None))
        )

    def make_scan(signed_eps):
        def body(z, _):
            direction = S.direction_all_sets(s_params, z)
            shift = signed_eps * direction
            z_next = z + shift
            return z_next, (z_next, shift)

        return body

    _, (pos_codes, pos_shifts) = jax.lax.scan(
        make_scan(eps), z0, None, length=shift_steps
    )
    _, (neg_codes, neg_shifts) = jax.lax.scan(
        make_scan(-eps), z0, None, length=shift_steps
    )

    # Keep every leap-th step (reference stores when cnt == shift_leap).
    sel = jnp.arange(shift_leap - 1, shift_steps, shift_leap)
    pos_codes, pos_shifts = pos_codes[sel], pos_shifts[sel]
    neg_codes, neg_shifts = neg_codes[sel], neg_shifts[sel]

    # Negative direction prepends -> farthest first.
    neg_codes, neg_shifts = neg_codes[::-1], neg_shifts[::-1]

    center_code = z0[None]
    center_shift = jnp.zeros_like(z0)[None]

    codes = jnp.concatenate([neg_codes, center_code, pos_codes], axis=0)   # (T, N, K, d)
    shifts = jnp.concatenate([neg_shifts, center_shift, pos_shifts], axis=0)

    codes = codes.transpose(1, 2, 0, 3)    # (N, K, T, d)
    shifts = shifts.transpose(1, 2, 0, 3)
    return codes, shifts


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
