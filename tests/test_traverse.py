"""Traversal engine tests: scan-based engine vs direct python-loop replication
of the reference algorithm (traverse_latent_space.py:361-463)."""
import numpy as np

import jax
import jax.numpy as jnp

from warpedganspace_tpu.models.support_sets import SupportSets
from warpedganspace_tpu.traverse import traverse_paths


def _reference_loop(S, params, z0, eps, steps, leap=1):
    """Python-loop oracle: positive appends, negative prepends, shift stored
    with the code it produced, center = unshifted."""
    K = S.num_support_sets
    all_codes, all_shifts = [], []
    for dim in range(K):
        codes = [np.asarray(z0)]
        shifts = [np.zeros_like(np.asarray(z0))]
        z = jnp.asarray(z0)
        cnt = 0
        for _ in range(steps):
            cnt += 1
            s = eps * S.direction(params, z[None], jnp.array([dim]))[0]
            z = z + s
            if cnt == leap:
                codes.append(np.asarray(z))
                shifts.append(np.asarray(s))
                cnt = 0
        z = jnp.asarray(z0)
        cnt = 0
        for _ in range(steps):
            cnt += 1
            s = -eps * S.direction(params, z[None], jnp.array([dim]))[0]
            z = z + s
            if cnt == leap:
                codes = [np.asarray(z)] + codes
                shifts = [np.asarray(s)] + shifts
                cnt = 0
        all_codes.append(np.stack(codes))
        all_shifts.append(np.stack(shifts))
    return np.stack(all_codes), np.stack(all_shifts)


def test_traverse_matches_reference_loop():
    S = SupportSets(num_support_sets=3, num_support_dipoles=4, support_vectors_dim=16)
    params = S.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 16))

    codes, shifts = traverse_paths(S, params, z, eps=0.2, shift_steps=5)
    assert codes.shape == (2, 3, 11, 16)
    for i in range(2):
        ref_codes, ref_shifts = _reference_loop(S, params, z[i], 0.2, 5)
        np.testing.assert_allclose(np.asarray(codes[i]), ref_codes, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(shifts[i]), ref_shifts, rtol=1e-4, atol=1e-5)


def test_traverse_shift_leap():
    S = SupportSets(num_support_sets=2, num_support_dipoles=2, support_vectors_dim=8)
    params = S.init(jax.random.key(2))
    z = jax.random.normal(jax.random.key(3), (1, 8))
    codes, shifts = traverse_paths(S, params, z, eps=0.1, shift_steps=6, shift_leap=2)
    # floor(6/2)=3 per direction + center.
    assert codes.shape == (1, 2, 7, 8)
    ref_codes, ref_shifts = _reference_loop(S, params, z[0], 0.1, 6, leap=2)
    np.testing.assert_allclose(np.asarray(codes[0]), ref_codes, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(shifts[0]), ref_shifts, rtol=1e-4, atol=1e-5)


def test_center_is_unshifted():
    S = SupportSets(num_support_sets=2, num_support_dipoles=2, support_vectors_dim=8)
    params = S.init(jax.random.key(4))
    z = jax.random.normal(jax.random.key(5), (3, 8))
    codes, shifts = traverse_paths(S, params, z, eps=0.15, shift_steps=4)
    center = codes.shape[2] // 2
    for k in range(2):
        np.testing.assert_allclose(np.asarray(codes[:, k, center]), np.asarray(z), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(shifts[:, k, center]), 0.0)


def test_traverse_pallas_backend_matches_jnp():
    """The fused Pallas warp backend (interpreted on CPU) integrates the same
    paths as the jnp all-sets formulation."""
    S = SupportSets(num_support_sets=3, num_support_dipoles=4, support_vectors_dim=16,
                    learn_gammas=True)
    params = S.init(jax.random.key(8))
    z = jax.random.normal(jax.random.key(9), (2, 16))

    cj, sj = traverse_paths(S, params, z, eps=0.2, shift_steps=5, use_pallas=False)
    cp, sp = traverse_paths(S, params, z, eps=0.2, shift_steps=5, use_pallas=True)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cj), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sj), rtol=1e-4, atol=1e-5)


def test_traverse_pallas_multi_device_matches_single():
    """shard_map'd Pallas warp over the 8-device mesh == unsharded Pallas."""
    from warpedganspace_tpu.parallel import make_mesh

    S = SupportSets(num_support_sets=8, num_support_dipoles=3, support_vectors_dim=16)
    params = S.init(jax.random.key(10))
    z = jax.random.normal(jax.random.key(11), (3, 16))

    c1, s1 = traverse_paths(S, params, z, eps=0.2, shift_steps=4, use_pallas=True)
    mesh = make_mesh()
    c2, s2 = traverse_paths(S, params, z, eps=0.2, shift_steps=4, mesh=mesh,
                            use_pallas=True)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-6)


def test_traverse_multi_device_matches_single():
    """Mesh-sharded traversal (paths over 8 devices) == unsharded."""
    from warpedganspace_tpu.parallel import make_mesh

    S = SupportSets(num_support_sets=8, num_support_dipoles=3, support_vectors_dim=16)
    params = S.init(jax.random.key(6))
    z = jax.random.normal(jax.random.key(7), (3, 16))

    c1, s1 = traverse_paths(S, params, z, eps=0.2, shift_steps=4)
    mesh = make_mesh()
    c2, s2 = traverse_paths(S, params, z, eps=0.2, shift_steps=4, mesh=mesh)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-6)


def test_iter_rendered_u8_s2d_out_bit_identical():
    """The u8 stream with the S2D-out reorder (quantize, THEN un-S2D) is
    bit-identical to the plain NHWC path — min/max and the per-pixel affine
    commute with the pixel permutation."""
    import dataclasses

    import numpy as np

    from warpedganspace_tpu.models.api import GeneratorBundle
    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator
    from warpedganspace_tpu.traverse.engine import iter_rendered_u8

    gen = StyleGAN2Generator(resolution=256, n_mlp=2, channel_multiplier=1,
                             shift_in_w_space=True)
    params = gen.init(jax.random.key(0))
    G = GeneratorBundle(name="StyleGAN2", dim_z=512, resolution=256,
                        out_channels=3, params=params, apply_fn=gen.apply,
                        get_w_fn=gen.get_w, shift_in_w_space=True,
                        supports_s2d_out=True)
    codes = jax.random.normal(jax.random.key(1), (3, 512))
    shifts = 0.1 * jax.random.normal(jax.random.key(2), (3, 512))

    def collect(bundle):
        chunks = [img for _, img in iter_rendered_u8(
            bundle, bundle.params, codes, shifts, batch_size=2, latent_is_w=True)]
        return np.concatenate(chunks, axis=0)

    a = collect(G)
    b = collect(dataclasses.replace(G, supports_s2d_out=False))
    assert a.shape == (3, 256, 256, 3)
    np.testing.assert_array_equal(a, b)


def test_traverse_num_paths_subset_jnp_backend():
    """num_paths < K must work on the jnp backend too (parameter leaves are
    sliced to the first k sets, matching the Pallas branch)."""
    from warpedganspace_tpu.models.support_sets import SupportSets
    from warpedganspace_tpu.traverse import traverse_paths

    S = SupportSets(num_support_sets=4, num_support_dipoles=2, support_vectors_dim=8)
    params = S.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (3, 8))
    codes, shifts = traverse_paths(S, params, z, eps=0.2, shift_steps=3,
                                   num_paths=2, use_pallas=False)
    assert codes.shape == (3, 2, 7, 8)
    full_codes, _ = traverse_paths(S, params, z, eps=0.2, shift_steps=3,
                                   use_pallas=False)
    np.testing.assert_allclose(codes, full_codes[:, :2], rtol=1e-6)


def test_render_u8_fn_is_cached():
    """The jitted u8 renderer is reused across calls (one compile per
    generator/flag combination, not one per latent code)."""
    from warpedganspace_tpu.models.api import GeneratorBundle
    from warpedganspace_tpu.models.sngan import SNGANGenerator
    from warpedganspace_tpu.traverse.engine import _render_u8_fn

    gen = SNGANGenerator.from_gan_type("SNGAN_MNIST")
    G = GeneratorBundle(name="SNGAN_MNIST", dim_z=gen.dim_z, resolution=32,
                        out_channels=1, params=gen.init(jax.random.key(0)),
                        apply_fn=gen.apply)
    assert _render_u8_fn(G, False) is _render_u8_fn(G, False)
    assert _render_u8_fn(G, False) is not _render_u8_fn(G, True)


def test_collate_gifs_empty_tree(tmp_path):
    from warpedganspace_tpu.traverse.gifs import collate_traversal_gifs

    collate_traversal_gifs(str(tmp_path), num_paths=2)  # must not raise
