"""Support sets: K learnable RBF warping functions over the GAN latent space.

Behavioral parity with reference ``lib/support_sets.py``:

- Parameters (reference :35-79): ``support_sets`` (K, 2N, d) — N dipoles = 2N
  antipodal support vectors per set; ``alphas`` (K, 2N) initialized to the
  alternating pattern [+1, -1, +1, -1, ...]; ``loggamma`` (K, 1) initialized to
  log(gamma) with gamma defaulting to 1/d.
- Init (reference :39-50): for set k, draw N i.i.d. Gaussian vectors, interleave
  each with its antipode, then rescale every row to radius r_k, where r_k spans
  [1.0, 4.0) linearly over the K sets.
- Forward (reference :83-101): returns the L2-normalized gradient field of the
  selected warping function (see :mod:`warpedganspace_tpu.ops.rbf`).

TPU-first differences: parameters keep their natural (K, 2N, d) shape (flattened
only at the torch-interop boundary); set selection is an integer gather, not a
one-hot matmul; gammas are always computed as exp(loggamma) (identical to the
constant-gamma branch when loggamma is untrained, since loggamma is initialized
to log(gamma)); trainability of alphas/gammas is expressed as an optax gradient
mask rather than ``requires_grad`` flags.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from warpedganspace_tpu.ops import rbf


@dataclasses.dataclass(frozen=True)
class SupportSets:
    """Static configuration for the K RBF warping functions.

    Attributes:
        num_support_sets:    K — number of warping functions (paths).
        num_support_dipoles: N — dipoles per set (2N support vectors).
        support_vectors_dim: d — latent dimensionality.
        learn_alphas:        train RBF alphas (default: frozen at +/-1).
        learn_gammas:        train RBF gammas (via loggamma).
        gamma:               initial RBF gamma; defaults to 1/d.
    """

    num_support_sets: int
    num_support_dipoles: int
    support_vectors_dim: int
    learn_alphas: bool = False
    learn_gammas: bool = False
    gamma: float | None = None

    r_min: float = 1.0
    r_max: float = 4.0

    @property
    def gamma_init(self) -> float:
        return 1.0 / self.support_vectors_dim if self.gamma is None else self.gamma

    @property
    def radii(self) -> jax.Array:
        k = self.num_support_sets
        return self.r_min + (self.r_max - self.r_min) / k * jnp.arange(k, dtype=jnp.float32)

    # ------------------------------------------------------------------ params
    def init(self, key: jax.Array) -> dict:
        """Initialize the parameter pytree (reference lib/support_sets.py:39-79)."""
        k, n, d = self.num_support_sets, self.num_support_dipoles, self.support_vectors_dim
        sv = jax.random.normal(key, (k, n, d), dtype=jnp.float32)
        # Interleave each dipole with its antipode: [sv_0, -sv_0, sv_1, -sv_1, ...]
        sv = jnp.stack([sv, -sv], axis=2).reshape(k, 2 * n, d)
        # Rescale each support vector to the per-set radius r_k in [1, 4).
        norms = jnp.linalg.norm(sv, axis=-1, keepdims=True)
        sv = self.radii[:, None, None] * sv / norms

        alphas = jnp.tile(jnp.array([1.0, -1.0], dtype=jnp.float32), n)
        alphas = jnp.broadcast_to(alphas, (k, 2 * n))

        loggamma = jnp.full((k, 1), jnp.log(self.gamma_init), dtype=jnp.float32)
        return {
            "support_sets": sv,
            "alphas": alphas,
            "loggamma": loggamma,
        }

    def trainable_mask(self, params: dict) -> dict:
        """Pytree of bools marking which leaves receive gradient updates.

        The reference freezes ALPHAS / LOGGAMMA via requires_grad
        (lib/support_sets.py:63-79); here the same policy is an optax mask.
        """
        del params
        return {
            "support_sets": True,
            "alphas": bool(self.learn_alphas),
            "loggamma": bool(self.learn_gammas),
        }

    # ----------------------------------------------------------------- forward
    def gammas(self, params: dict) -> jax.Array:
        """Per-RBF gamma, shape (K, 2N) — exp(loggamma) broadcast over the set."""
        k, n = self.num_support_sets, self.num_support_dipoles
        return jnp.broadcast_to(jnp.exp(params["loggamma"]), (k, 2 * n))

    def direction(self, params: dict, z: jax.Array, idx: jax.Array) -> jax.Array:
        """L2-normalized grad f_idx(z) — the path direction (reference forward).

        Args:
            params: parameter pytree from :meth:`init`.
            z:      (B, d) latent codes.
            idx:    (B,) int support-set index per sample (replaces the
                    reference's one-hot mask).

        Returns:
            (B, d) unit-norm shift directions.
        """
        return rbf.warp_grad(
            params["support_sets"], params["alphas"], self.gammas(params), z, idx
        )

    def direction_all_sets(self, params: dict, z: jax.Array) -> jax.Array:
        """Directions of ALL K warping functions at per-set points z (N, K, d).

        The traversal formulation — every set is used for every code, so set
        selection becomes K-batched matmuls with no gather
        (ops/rbf.warp_grad_all_sets).
        """
        return rbf.warp_grad_all_sets(
            params["support_sets"], params["alphas"], self.gammas(params), z
        )

    def direction_all_sets_fused(self, params: dict, z: jax.Array) -> jax.Array:
        """Pallas TPU kernel variant of :meth:`direction_all_sets` — the whole
        distance/exp/weight/gradient/normalize chain in one HBM pass over the
        support sets (the traversal hot path; 2.4-2.5x the jnp formulation at
        K=200, 2N=1024, d=512 on v5e). Inside a scan, prefer
        ``ops.rbf_pallas.prepare_warp_sets`` + ``warp_grad_all_sets_kn`` so the
        set packing happens once (how traverse/engine.py wires it)."""
        from warpedganspace_tpu.ops.rbf_pallas import warp_grad_all_sets_fused

        return warp_grad_all_sets_fused(
            params["support_sets"], params["alphas"], self.gammas(params), z
        )

    def value(self, params: dict, z: jax.Array, idx: jax.Array) -> jax.Array:
        """f_idx(z), shape (B,)."""
        return rbf.warp_value(
            params["support_sets"], params["alphas"], self.gammas(params), z, idx
        )

    def value_and_direction(self, params: dict, z, idx):
        """Fused (f(z), normalized grad f(z))."""
        return rbf.warp_value_and_grad(
            params["support_sets"], params["alphas"], self.gammas(params), z, idx
        )

    # ----------------------------------------------------- torch interop (.pt)
    def to_torch_state_dict(self, params: dict) -> dict:
        """Export params as a reference-compatible torch-style state dict.

        Key/shape contract matches reference ``SupportSets.state_dict()``:
        SUPPORT_SETS (K, 2N*d), ALPHAS (K, 2N), LOGGAMMA (K, 1).
        Values are numpy arrays (callers torch.save them via the io helpers).
        """
        import numpy as np

        k = self.num_support_sets
        return {
            "SUPPORT_SETS": np.asarray(params["support_sets"]).reshape(k, -1),
            "ALPHAS": np.asarray(params["alphas"]),
            "LOGGAMMA": np.asarray(params["loggamma"]),
        }

    def from_torch_state_dict(self, state_dict: dict) -> dict:
        """Import a reference ``SupportSets`` state dict into a param pytree."""
        k, n, d = self.num_support_sets, self.num_support_dipoles, self.support_vectors_dim
        sv = jnp.asarray(state_dict["SUPPORT_SETS"], dtype=jnp.float32).reshape(k, 2 * n, d)
        return {
            "support_sets": sv,
            "alphas": jnp.asarray(state_dict["ALPHAS"], dtype=jnp.float32),
            "loggamma": jnp.asarray(state_dict["LOGGAMMA"], dtype=jnp.float32),
        }
