#!/usr/bin/env python
"""On-hardware validation of both Pallas kernels against their jnp twins.

The pytest suite runs the kernels in interpret mode on the virtual CPU mesh,
which validates logic but not Mosaic compilation or real-MXU numerics. This
script runs the REAL kernels on the local TPU chip and checks them against
the jnp formulations at production shapes, with tolerances sized for the
MXU's bf16 operand rounding (both paths round f32 operands to bf16 on TPU,
but in different orders). Run from the repo root:

    PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/check_kernels_tpu.py

Exits nonzero on any mismatch. Covers:
- fused RBF warp kernel (`ops/rbf_pallas.py`) at the traversal pattern
- fused SA attention fwd + bwd (`ops/attn_pallas.py`) at BigGAN-128 shapes
- fused ProgGAN tail (`ops/proggan_tail_pallas.py`) at the real 1024^2 chain
- fused StyleGAN2 tail (`ops/sg2_tail_pallas.py`, experimental) at 1024^2
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")


def fail(msg):
    print(f"FAIL: {msg}")
    sys.exit(1)


def check(name, got, want, rtol, atol):
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    # Guard against a vacuous pass (e.g. both paths returning zeros): the
    # reference side must be finite with real spread before the diff means
    # anything. (On TPU the warp kernel can match jnp BIT-EXACTLY — both
    # paths round matmul operands to bf16 on the MXU — so a 0.0 max error
    # alone does not distinguish "identical arithmetic" from "degenerate".)
    if not np.all(np.isfinite(want)) or not np.all(np.isfinite(got)):
        fail(f"{name}: non-finite values")
    if np.std(want) == 0.0:
        fail(f"{name}: degenerate reference output (zero spread)")
    err = np.max(np.abs(got - want))
    denom = np.maximum(np.abs(want), atol / max(rtol, 1e-30))
    rel = np.max(np.abs(got - want) / denom)
    ok = np.allclose(got, want, rtol=rtol, atol=atol)
    print(f"  {name}: max abs err {err:.3e}, max rel {rel:.3e} -> "
          f"{'ok' if ok else 'MISMATCH'}")
    if not ok:
        fail(name)


def main():
    platform = jax.devices()[0].platform
    print(f"device: {jax.devices()[0]} (platform={platform})")
    if platform != "tpu":
        fail("this script must run on a TPU chip (kernels would run "
             "in interpret mode otherwise)")

    # ---- fused RBF warp kernel at the traversal pattern ------------------
    from warpedganspace_tpu.models.support_sets import SupportSets
    from warpedganspace_tpu.ops.rbf_pallas import (
        _jnp_kn,
        prepare_warp_sets,
        warp_grad_all_sets_kn,
    )

    # Realistic parameters (radius-normalized antipodal dipoles, reference
    # init): with unstructured random dipoles the RBF gradient nearly cancels
    # and the normalized direction amplifies storage rounding into O(1) error
    # — not a kernel bug, just an adversarial regime training never visits.
    K, N, D, B = 200, 256, 512, 32
    S = SupportSets(num_support_sets=K, num_support_dipoles=N,
                    support_vectors_dim=D, learn_gammas=True)
    s_params = S.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(2), (K, B, D))

    ws = prepare_warp_sets(s_params["support_sets"], s_params["alphas"],
                           S.gammas(s_params), dtype=jnp.bfloat16)
    ws32 = prepare_warp_sets(s_params["support_sets"], s_params["alphas"],
                             S.gammas(s_params), dtype=jnp.float32)
    got = jax.jit(warp_grad_all_sets_kn)(ws, z)
    want = jax.jit(_jnp_kn)(ws32, z)
    print("warp kernel (bf16 sets) vs jnp all-sets:")
    # Normalized direction vectors in [-1, 1]; bf16 storage bounds abs error.
    check("warp ∇f directions", got, want, rtol=0.0, atol=2e-2)

    got32 = jax.jit(warp_grad_all_sets_kn)(ws32, z)
    print("warp kernel (f32 sets) vs jnp all-sets:")
    check("warp ∇f directions (f32)", got32, want, rtol=0.0, atol=5e-3)

    # ---- fused SA attention fwd + bwd at BigGAN-128 shapes ---------------
    from warpedganspace_tpu.ops.attn_pallas import (
        _jnp_attention,
        _kernel_fits,
        sa_attention_fusable,
    )

    b, n, m, dk, dv = 32, 4096, 1024, 24, 96
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    theta = jax.random.normal(k1, (b, n, dk))
    phi = jax.random.normal(k2, (b, m, dk))
    g = jax.random.normal(k3, (b, m, dv))
    assert _kernel_fits(theta, g), "BigGAN-128 shape must route to the kernel"

    print("attention kernel vs jnp (f32 inputs, MXU-rounded both paths):")
    got = jax.jit(sa_attention_fusable)(theta, phi, g)
    want = jax.jit(_jnp_attention)(theta, phi, g)
    check("attention fwd", got, want, rtol=1e-2, atol=1e-2)

    # Backward: apply the SAME cotangent to both paths' VJPs. (Comparing
    # grad-of-loss instead would push each path's own forward output through
    # the softmax VJP — the forward's MXU rounding then amplifies through the
    # near-one-hot beta and the comparison measures conditioning, not the
    # kernel.)
    ct = jax.random.normal(jax.random.key(7), (b, n, dv))

    def vjp_k(t, p, gg):
        _, f = jax.vjp(sa_attention_fusable, t, p, gg)
        return f(ct)

    def vjp_j(t, p, gg):
        _, f = jax.vjp(_jnp_attention, t, p, gg)
        return f(ct)

    gk = jax.jit(vjp_k)(theta, phi, g)
    gj = jax.jit(vjp_j)(theta, phi, g)
    for name, a, bb in zip(("dtheta", "dphi", "dg"), gk, gj):
        check(f"attention bwd {name}", a, bb, rtol=3e-2, atol=1e-1)

    # ---- fused ProgGAN tail at the real 1024^2 chain ----------------------
    from warpedganspace_tpu.models.api import cast_params_bf16
    from warpedganspace_tpu.models.proggan import ProgGANGenerator

    gen_pl = ProgGANGenerator(tail_layout="pallas")
    gen_s2d = ProgGANGenerator(tail_layout="s2d")
    p = jax.jit(lambda k: gen_pl.init(k))(jax.random.key(3))
    p16 = cast_params_bf16(p)
    z = jax.random.normal(jax.random.key(4), (4, 512))

    print("ProgGAN fused tail (bf16) vs s2d composition (f32):")
    ref = jax.jit(lambda p, z: gen_s2d.apply(p, z))(p, z)
    got = jax.jit(lambda p, z: gen_pl.apply(p, z))(p16, z.astype(jnp.bfloat16))
    # Whole-model bf16 render vs f32: PSNR-style gate (>40 dB on the output
    # dynamic range), the same bar the bf16 s2d path passes (~52 dB measured).
    ref_np, got_np = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    if not np.all(np.isfinite(got_np)):
        fail("proggan tail: non-finite output")
    mse = float(np.mean((ref_np - got_np) ** 2))
    rng = float(ref_np.max() - ref_np.min())
    psnr = 10.0 * np.log10(rng * rng / max(mse, 1e-30))
    print(f"  proggan tail PSNR vs f32-s2d: {psnr:.1f} dB "
          f"-> {'ok' if psnr > 40.0 else 'MISMATCH'}")
    if psnr <= 40.0:
        fail("proggan tail PSNR below 40 dB")

    # ---- fused StyleGAN2 tail (experimental path) at 1024^2 ---------------
    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator

    gen_pl = StyleGAN2Generator(resolution=1024, tail_layout="pallas")
    gen_fx = StyleGAN2Generator(resolution=1024, tail_layout="foldx")
    p = jax.jit(lambda k: gen_pl.init(k))(jax.random.key(5))
    p16 = cast_params_bf16(p)
    z = jax.random.normal(jax.random.key(6), (4, 512))

    print("StyleGAN2 fused tail (bf16) vs fold-x composition (f32):")
    ref = jax.jit(lambda p, z: gen_fx.apply(p, z))(p, z)
    got = jax.jit(lambda p, z: gen_pl.apply(p, z))(p16, z.astype(jnp.bfloat16))
    ref_np, got_np = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    if not np.all(np.isfinite(got_np)):
        fail("stylegan2 tail: non-finite output")
    mse = float(np.mean((ref_np - got_np) ** 2))
    rng = float(ref_np.max() - ref_np.min())
    psnr = 10.0 * np.log10(rng * rng / max(mse, 1e-30))
    print(f"  stylegan2 tail PSNR vs f32-foldx: {psnr:.1f} dB "
          f"-> {'ok' if psnr > 40.0 else 'MISMATCH'}")
    if psnr <= 40.0:
        fail("stylegan2 tail PSNR below 40 dB")

    print("ALL KERNEL CHECKS PASSED on", jax.devices()[0])


if __name__ == "__main__":
    main()
