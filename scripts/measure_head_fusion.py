#!/usr/bin/env python
"""bs=12 occupancy experiment: fuse the two G forwards' low-res heads (r3).

The flagship train step runs TWO StyleGAN2 forwards per iteration (G(z) and
G(z, shift)) at the reference bs=12, where the low-resolution blocks underfill
the chip (render MFU 79% at B=96 vs ~43% at B=12 — PERFORMANCE.md). NOTES.md's
round-2 attempt fused the ENTIRE pair into one 2B forward and lost (227 vs
209 ms): the backward then differentiates the whole 2B batch. This experiment
fuses only the head (blocks up to ``stop_res``) at 2B and splits for the
expensive high-res tail, with ``stop_gradient`` on the unshifted half — exact,
because convs are batch-diagonal so the unshifted half's true gradient
contribution is structurally zero, and it keeps the unshifted TAIL backward
out of the graph entirely (the unfused step's DCE property).

Measures loss fwd+bwd at the production flags (bf16 G/R, S2D pair handoff)
for the unfused baseline and stop_res in {32, 64, 128}.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import optax

from warpedganspace_tpu.core.sampling import sample_batch_directives
from warpedganspace_tpu.models.api import cast_params_bf16
from warpedganspace_tpu.models.reconstructor import Reconstructor
from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator
from warpedganspace_tpu.models.support_sets import SupportSets

T0 = time.perf_counter()
B = 12
K = 200


def log(m):
    print(f"[+{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def main():
    gen = StyleGAN2Generator(resolution=1024, shift_in_w_space=True)
    g_params = cast_params_bf16(jax.jit(gen.init)(jax.random.key(0)))
    S = SupportSets(num_support_sets=K, num_support_dipoles=512,
                    support_vectors_dim=512, learn_gammas=True)
    R = Reconstructor("ResNet", dim=K, channels=3)
    s_params = jax.jit(S.init)(jax.random.key(1))
    r_params = jax.jit(R.init)(jax.random.key(2))
    jax.block_until_ready((g_params, s_params, r_params))
    log("params ready")

    key = jax.random.fold_in(jax.random.key(7), 1)
    z, idx, mags = sample_batch_directives(key, B, 512, K, 0.1, 0.2, 0.7)

    def shift_of(s_params, z_g):
        latent = gen.get_w(g_params, z_g).astype(jnp.float32)
        direction = S.direction(s_params, latent, idx)
        return (mags[:, None] * direction).astype(jnp.bfloat16)

    def r_loss(r_params, img, img_shifted):
        logits, mag_hat, _ = R.apply_pair_s2d(
            r_params, img, img_shifted, train=True, dtype=jnp.bfloat16)
        cls = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, idx))
        reg = jnp.mean(jnp.abs(mag_hat - mags))
        return cls + 0.25 * reg

    def loss_std(s_params, r_params):
        z_g = z.astype(jnp.bfloat16)
        img = gen.apply(g_params, z_g, out_layout="s2d")
        img_shifted = gen.apply(g_params, z_g, shift_of(s_params, z_g),
                                out_layout="s2d")
        return r_loss(r_params, img, img_shifted)

    def make_loss_fused(stop_res):
        def loss(s_params, r_params):
            z_g = z.astype(jnp.bfloat16)
            shift = shift_of(s_params, z_g)
            z2 = jnp.concatenate([z_g, z_g])
            shift2 = jnp.concatenate([jnp.zeros_like(shift), shift])
            out, skip, latent = gen.apply_head(g_params, z2, shift2,
                                               stop_res=stop_res)
            head_a = tuple(jax.lax.stop_gradient(t[:B]) for t in (out, skip, latent))
            head_b = (out[B:], skip[B:], latent[B:])
            img = gen.apply_tail(g_params, head_a, stop_res=stop_res,
                                 out_layout="s2d")
            img_shifted = gen.apply_tail(g_params, head_b, stop_res=stop_res,
                                         out_layout="s2d")
            return r_loss(r_params, img, img_shifted)
        return loss

    def sync(x):
        return float(jnp.sum(x))

    def timed(loss_fn, label):
        vg = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
        (v, grads) = vg(s_params, r_params)
        sync(v)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            reps = 10
            for _ in range(reps):
                v, grads = vg(s_params, r_params)
            sync(v)
            best = min(best, (time.perf_counter() - t0) / reps)
        log(f"{label}: {best * 1e3:6.1f} ms fwd+bwd (loss {float(v):.4f})")
        return best

    base = timed(loss_std, "unfused (2 applies)     ")
    for stop_res in (32, 64, 128):
        t = timed(make_loss_fused(stop_res), f"head-fused stop_res={stop_res:<4}")
        log(f"  -> {100 * (base - t) / base:+.1f}% vs unfused")


if __name__ == "__main__":
    main()
