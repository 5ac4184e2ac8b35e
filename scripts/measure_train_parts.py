#!/usr/bin/env python
"""Train-step part attribution at the production flag sets.

Where does a production train step's time go?  Times, on the real chip:
(a) the full step, (b) one frozen G forward (the un-shifted image — autodiff
already leaves it backward-free: it does not depend on the trained params),
(c) the shifted G forward *with* backward w.r.t. the shift (the only G
backward the step contains), (d) the reconstructor pair fwd+bwd, (e) the
warp fwd+bwd (whose support-set gradient is a dense scatter into the full
(K, 2D, dim) tensor — dense-update Adam semantics match the reference).
The sum over-counts shared fusion wins, so parts are an upper bound on
their share.

Run from the repo root: ``python scripts/measure_train_parts.py [proggan]
[biggan]``.  Measured numbers live in PERFORMANCE.md ("train-step part
attribution").
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from warpedganspace_tpu.models.api import GeneratorBundle, cast_params_bf16  # noqa: E402
from warpedganspace_tpu.models.biggan import BigGANGenerator  # noqa: E402
from warpedganspace_tpu.models.proggan import ProgGANGenerator  # noqa: E402
from warpedganspace_tpu.models.reconstructor import Reconstructor  # noqa: E402
from warpedganspace_tpu.models.support_sets import SupportSets  # noqa: E402
from warpedganspace_tpu.train import TrainStepConfig, init_train_state, make_train_step  # noqa: E402

T0 = time.perf_counter()


def log(m):
    print(f"[parts +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timed(fn, args, reps=10, rounds=3):
    sync(fn(*args))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(*args)
        sync(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def attribute(name, gen, G, S, R, cfg, g_kwargs):
    key = jax.random.key(0)
    bs = cfg.batch_size
    g_params = cast_params_bf16(G.params)
    state = jax.jit(lambda k: init_train_state(k, G, S, R, cfg))(key)
    step = make_train_step(G, S, R, cfg, donate=False)
    log(f"compiling {name} full step...")
    t_full = timed(step, (state, G.params, key, 1))
    log(f"{name} full step: {t_full*1e3:.1f} ms -> {1/t_full:.2f} steps/s")

    z = jax.random.normal(key, (bs, G.dim_z), jnp.bfloat16)
    shift = jax.random.normal(jax.random.key(1), (bs, G.dim_z), jnp.bfloat16) * 0.15

    fwd = jax.jit(lambda p, z: gen.apply(p, z, **g_kwargs))
    log("compiling G fwd...")
    t_fwd = timed(fwd, (g_params, z))
    log(f"G fwd (bf16, bs{bs}): {t_fwd*1e3:.1f} ms")

    def shifted_loss(sh, p, z):
        img = gen.apply(p, z, sh, **g_kwargs)
        return jnp.sum(img.astype(jnp.float32))

    fwdbwd = jax.jit(jax.grad(shifted_loss))
    log("compiling G fwd+bwd (wrt shift)...")
    t_fb = timed(fwdbwd, (shift, g_params, z))
    log(f"G fwd+bwd wrt shift: {t_fb*1e3:.1f} ms")

    img = fwd(g_params, z)
    pair_s2d = cfg.pair_layout == "s2d"

    def r_loss(rp, a, b):
        apply_r = R.apply_pair_s2d if pair_s2d else R.apply
        logits, mag_hat, _ = apply_r(rp, a, b, train=True, dtype=jnp.bfloat16)
        return jnp.sum(logits.astype(jnp.float32)) + jnp.sum(mag_hat.astype(jnp.float32))

    r_fb = jax.jit(jax.grad(r_loss))
    log("compiling R pair fwd+bwd...")
    t_r = timed(r_fb, (state["r_params"], img, img))
    log(f"R pair fwd+bwd (bf16, bs{bs}): {t_r*1e3:.1f} ms")

    idx = jnp.zeros((bs,), jnp.int32)
    warp = jax.jit(jax.grad(lambda sp, lat: jnp.sum(S.direction(sp, lat, idx))))
    lat = jax.random.normal(key, (bs, G.dim_z), jnp.float32)
    log("compiling warp fwd+bwd...")
    t_w = timed(warp, (state["s_params"], lat))
    log(f"warp fwd+bwd: {t_w*1e3:.1f} ms")

    parts = t_fwd + t_fb + t_r + t_w
    log(f"{name}: sum of parts {parts*1e3:.1f} ms vs full {t_full*1e3:.1f} ms "
        f"(Adam/sampling/overlap {100*(t_full-parts)/t_full:+.1f}%)")


key = jax.random.key(0)
which = set(sys.argv[1:]) or {"proggan"}

if "proggan" in which:
    gen = ProgGANGenerator(remat=False)
    G = GeneratorBundle(name="ProgGAN", dim_z=512, resolution=1024, out_channels=3,
                        params=jax.jit(gen.init)(key), apply_fn=gen.apply,
                        supports_s2d_out=True)
    S = SupportSets(num_support_sets=200, num_support_dipoles=512,
                    support_vectors_dim=512, learn_gammas=True)
    R = Reconstructor("ResNet", dim=200, channels=3)
    cfg = TrainStepConfig(batch_size=8, num_support_sets=200,
                          min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                          generator_dtype="bfloat16", reconstructor_dtype="bfloat16",
                          pair_layout="s2d")
    attribute("ProgGAN-1024 bs8", gen, G, S, R, cfg, {"out_layout": "s2d"})

if "biggan" in which:
    gen = BigGANGenerator.from_config(target_classes=(239,))
    G = GeneratorBundle(name="BigGAN", dim_z=gen.dim_z, resolution=128,
                        out_channels=3, params=jax.jit(gen.init)(key),
                        apply_fn=gen.apply)
    S = SupportSets(num_support_sets=120, num_support_dipoles=256,
                    support_vectors_dim=gen.dim_z, learn_gammas=True)
    R = Reconstructor("ResNet", dim=120, channels=3)
    cfg = TrainStepConfig(batch_size=32, num_support_sets=120,
                          min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                          generator_dtype="bfloat16", reconstructor_dtype="bfloat16")
    attribute("BigGAN-239 bs32", gen, G, S, R, cfg, {})

if "sngan" in which:
    # VERDICT r3 item 5: is the tiny 32²/64² step dispatch/latency-bound?
    # Attribute the parts, then A/B the k-step lax.scan chunking (exact
    # sample stream; make_train_step_scan) against the single-step program.
    from warpedganspace_tpu.models.sngan import SNGANGenerator
    from warpedganspace_tpu.train import make_train_step_scan

    for gan_type, channels, bs, rec, eps in (
            ("SNGAN_MNIST", 1, 128, "LeNet", (0.15, 0.25)),
            ("SNGAN_AnimeFaces", 3, 128, "LeNet", (0.25, 0.35))):
        gen = SNGANGenerator.from_gan_type(gan_type)
        G = GeneratorBundle(name=gan_type, dim_z=gen.dim_z,
                            resolution=gen.img_size, out_channels=channels,
                            params=jax.jit(gen.init)(key), apply_fn=gen.apply)
        S = SupportSets(num_support_sets=64, num_support_dipoles=128,
                        support_vectors_dim=gen.dim_z, learn_gammas=True)
        R = Reconstructor(rec, dim=64, channels=channels)
        cfg = TrainStepConfig(batch_size=bs, num_support_sets=64,
                              min_shift_magnitude=eps[0], max_shift_magnitude=eps[1],
                              generator_dtype="bfloat16")
        attribute(f"{gan_type} bs{bs}", gen, G, S, R, cfg, {})
        state = jax.jit(lambda k: init_train_state(k, G, S, R, cfg))(key)
        for k_chunk in (4, 8, 16):
            stepk = make_train_step_scan(G, S, R, cfg, k=k_chunk, donate=False)
            log(f"compiling {gan_type} scan k={k_chunk}...")
            t = timed(stepk, (state, G.params, key, 1), reps=5)
            log(f"{gan_type} scan k={k_chunk}: {t*1e3:.1f} ms/chunk -> "
                f"{k_chunk/t:.2f} steps/s")
