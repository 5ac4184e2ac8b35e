#!/usr/bin/env python
"""Headline benchmark: StyleGAN2-FFHQ 1024^2 latent-path traversal throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

The workload is the BASELINE.json north-star: batched path traversal
z <- z + eps * grad f(z) through the warped-path engine, rendering frames with
the StyleGAN2 1024^2 synthesis network (W-space). ``value`` is rendered
images/sec/chip on the local accelerator.

``vs_baseline``: ratio against the reference PyTorch implementation executing
the same workload on this host (the only hardware the reference can run on
here; the reference publishes no numbers — BASELINE.md). The reference-side
measurement is cached in BENCH_BASELINE.json after the first (slow) run.

Sub-metrics (warp-field evals/sec, train steps/sec) are written to
bench_details.json for inspection.
"""
from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time
import warnings

# A FutureWarning from jax means a future release breaks this path (e.g. the
# f32-into-bf16 scatter promotion caught in round 1) — fail the bench instead.
# jax deprecations often carry stacklevel>=2, attributing the warning to the
# CALLING module, so match our own modules too (not torch/PIL, which are only
# used for the baseline measurement and IO).
warnings.filterwarnings(
    "error", category=FutureWarning,
    # __main__ covers bench.py run as a script (the documented entry point);
    # bench covers it imported (e.g. under pytest).
    module=r"(jax|warpedganspace_tpu)(\..*)?$|bench$|__main__$",
)

BASELINE_CACHE = osp.join(osp.dirname(osp.abspath(__file__)), "BENCH_BASELINE.json")

BATCH = 96         # bf16 render batch (throughput plateau on v5e:
                   # 316/352/376/411/422/435/432 img/s at B=16/24/32/48/64/96/128)
F32_BATCH = 16     # the f32 render OOMs a 16GB chip past ~B=24 (4x activations)
RENDER_ITERS = 24  # deep pipelining amortizes the axon tunnel's dispatch gaps
WARMUP = 2

# --- device-health probe -----------------------------------------------------
# BENCH_r02 recorded a uniform ~20-25x collapse of every device-side metric
# (render 425 -> 17.5 img/s) while host-side metrics (JPEG ms/frame, tunnel
# MB/s) and the pallas/jnp RATIO were unchanged — a degraded/contended chip,
# not a code regression. The bench now defends itself: a known-FLOPs probe
# runs at start/middle/end; if the best probe lands below DEGRADED_FRACTION
# of the healthy-device reference, the run is marked ``degraded`` in the
# headline JSON and bench_details so its numbers are not mistaken for a code
# regression.
#
# Methodology (round 5, scripts/calibrate_mfu.py): SLOPE of two chain lengths
# of 8192^3 bf16 matmuls, (t_128 - t_8) / 120 — the differencing removes the
# fixed per-dispatch cost (~25 ms through the axon tunnel) that the round-3
# fixed-chain probe buried in its 74 ms program, underselling the chip at
# "116 TFLOP/s" while the MFU table reported conv graphs at 153 TFLOP/s. The
# slope probe reads the pure device rate: 178.5-185.4 over 4 trials, and a
# hand-counted plain 3x3 conv sustains 172.8 — so 153 TFLOP/s render MFU and
# ~179 effective peak (91% of the 197 nominal) are mutually consistent.
EXPECTED_PROBE_TFLOPS = 179.0   # slope-method healthy v5e via axon
                                # (2026-08-20, 4 trials: 178.5-185.4)
DEGRADED_FRACTION = 0.5
PROBE_CHAINS = (8, 128)         # chain lengths differenced for the slope


def _probe_tflops(log=None, chain=None):
    """Known-FLOPs device probe: slope-method 8k^3 bf16 matmul TFLOP/s
    (fixed dispatch overhead differenced out; best-of-2 per chain length).
    ``chain`` (n -> best wall seconds for an n-matmul program) is injectable
    so the degraded-device early exit is unit-testable without a device."""
    if chain is None:
        import jax
        import jax.numpy as jnp

        x = jnp.ones((8192, 8192), jnp.bfloat16)

        def chain(n):
            f = jax.jit(lambda a: jnp.sum(
                jax.lax.fori_loop(0, n, lambda i, c: (c @ x) * 1e-4, a)))
            float(f(x))  # compile + warm (persistent cache makes this cheap)
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                float(f(x))
                best = min(best, time.perf_counter() - t0)
            return best

    n1, n2 = PROBE_CHAINS
    t1 = chain(n1)
    # Early exit on a degraded device: chain(8) alone reads ~65% of the slope
    # value on a healthy chip (the ~25 ms dispatch intercept is still in its
    # denominator), so a rough rate already below the degraded threshold
    # cannot recover — skip the 16x longer chain(128), which on a
    # BENCH_r02-class 20x-degraded chip would burn ~minutes across the three
    # probe invocations. The returned rough value is only used to flag
    # ``degraded``; it is not a calibration number.
    rough = 2 * n1 * 8192**3 / t1 / 1e12
    if rough < DEGRADED_FRACTION * EXPECTED_PROBE_TFLOPS:
        if log:
            log(f"device probe: ~{rough:.1f} TFLOP/s from chain({n1}) alone "
                f"— below the degraded threshold "
                f"({DEGRADED_FRACTION:.0%} of {EXPECTED_PROBE_TFLOPS:.0f}); "
                f"skipping the long chain")
        return rough
    slope = (chain(n2) - t1) / (n2 - n1)
    tflops = 2 * 8192**3 / slope / 1e12
    if log:
        log(f"device probe: {tflops:.1f} TFLOP/s bf16 slope-method "
            f"(healthy reference {EXPECTED_PROBE_TFLOPS:.0f})")
    return tflops


def _measure_rounds(measure_once, rounds=3, budget_s=150.0):
    """Run ``measure_once`` (returns a rate) up to ``rounds`` times; stop early
    past ``budget_s`` so a degraded device doesn't triple an already-slow run.
    Returns (best, spread, n) where spread = (best - worst) / best."""
    vals = []
    t0 = time.perf_counter()
    for _ in range(rounds):
        vals.append(measure_once())
        if time.perf_counter() - t0 > budget_s:
            break
    best = max(vals)
    spread = (best - min(vals)) / best if best > 0 else 0.0
    return best, spread, len(vals)


def _measure_tpu():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the 1024^2 synthesis compile is paid once.
    jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator
    from warpedganspace_tpu.models.support_sets import SupportSets

    def log(msg):
        print(f"[bench +{time.perf_counter() - _t_start:7.1f}s] {msg}", file=sys.stderr, flush=True)

    _t_start = time.perf_counter()
    # The render measures the INFERENCE configuration: the fold-x tail on TPU
    # (the production render layout build_stylegan2 auto-selects; +9% over
    # s2d at 1024^2/B=96). The flagship TRAIN step below keeps its own
    # s2d-tail generator (the production training flags).
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    gen = StyleGAN2Generator(resolution=1024, shift_in_w_space=True,
                             tail_layout="foldx" if on_tpu else "s2d")
    # Jit the inits: eager init dispatches hundreds of tiny ops, which is
    # pathological over a remote-tunnel backend.
    params = jax.jit(gen.init)(jax.random.key(0))
    S = SupportSets(num_support_sets=200, num_support_dipoles=512,
                    support_vectors_dim=512, learn_gammas=True)
    s_params = jax.jit(S.init)(jax.random.key(1))
    jax.block_until_ready(params)
    log("params initialized")

    # The probe (and its healthy reference) is only meaningful on a TPU;
    # elsewhere it would burn minutes of matmul for a discarded value.
    is_tpu = jax.devices()[0].platform in ("tpu", "axon")
    probes = [_probe_tflops(log)] if is_tpu else [0.0]

    # --- traversal render throughput (the headline) ------------------------
    @jax.jit
    def render(params, w, shift):
        return gen.apply(params, w, shift, latent_is_w=True)

    w = jax.random.normal(jax.random.key(2), (F32_BATCH, 512))
    shift = 0.1 * jax.random.normal(jax.random.key(3), (F32_BATCH, 512))
    log("compiling render...")
    for _ in range(WARMUP):
        jax.block_until_ready(render(params, w, shift))
    log("render warmup done")
    # NOTE: on the experimental axon platform block_until_ready can return
    # before execution completes; a device_get of a reduction is the reliable
    # completion barrier, so every timed region ends with one.
    def sync(x):
        return float(jnp.sum(x))

    sync(render(params, w, shift))
    f32_iters = RENDER_ITERS * (BATCH // F32_BATCH)

    def _render_f32_once():
        t0 = time.perf_counter()
        for _ in range(f32_iters):
            out = render(params, w, shift)
        sync(out)
        return F32_BATCH * f32_iters / (time.perf_counter() - t0)

    images_per_sec, f32_spread, n = _measure_rounds(_render_f32_once)
    log(f"render f32 (B={F32_BATCH}): {images_per_sec:.2f} img/s "
        f"(best of {n}, spread {f32_spread:.1%})")

    # --- bf16 render: accepted as the headline only if it holds the >40dB
    # fidelity gate vs the f32 render (BASELINE.md). ------------------------
    import numpy as np

    from warpedganspace_tpu.models.api import cast_params_bf16

    params_bf16 = cast_params_bf16(params)

    @jax.jit
    def render_bf16(params, w, shift):
        img = gen.apply(params, w.astype(jnp.bfloat16), shift.astype(jnp.bfloat16),
                        latent_is_w=True)
        return img.astype(jnp.float32)

    try:
        # PSNR computed ON DEVICE at the f32 batch size: pulling f32 frames
        # through the 13-16 MB/s axon tunnel costs seconds/frame; two scalars
        # cost nothing.
        @jax.jit
        def psnr_stats(params, params_bf16, w, shift):
            a = render(params, w, shift)
            b = render_bf16(params_bf16, w, shift)
            return jnp.max(a) - jnp.min(a), jnp.mean((a - b) ** 2)

        peak, mse = (float(x) for x in psnr_stats(params, params_bf16, w, shift))
        bf16_psnr = 10 * np.log10(peak**2 / mse)
        log(f"bf16 PSNR vs f32: {bf16_psnr:.1f} dB")
        wb = jax.random.normal(jax.random.key(2), (BATCH, 512))
        shiftb = 0.1 * jax.random.normal(jax.random.key(3), (BATCH, 512))
        sync(render_bf16(params_bf16, wb, shiftb))

        def _render_bf16_once():
            t0 = time.perf_counter()
            for _ in range(RENDER_ITERS):
                out = render_bf16(params_bf16, wb, shiftb)
            sync(out)
            return BATCH * RENDER_ITERS / (time.perf_counter() - t0)

        bf16_images_per_sec, bf16_spread, n = _measure_rounds(_render_bf16_once)
        log(f"render bf16 (B={BATCH}): {bf16_images_per_sec:.2f} img/s "
            f"(best of {n}, spread {bf16_spread:.1%})")
    except Exception as e:
        log(f"bf16 render failed: {e}")
        bf16_images_per_sec, bf16_psnr, bf16_spread = 0.0, 0.0, 0.0

    if is_tpu:
        probes.append(_probe_tflops(log))

    f32_images_per_sec = images_per_sec
    if bf16_psnr > 40.0 and bf16_images_per_sec > images_per_sec:
        images_per_sec = bf16_images_per_sec

    # --- warp-field evals/sec at the traversal access pattern (32 codes x all
    # K=200 paths per step): jnp two-matmul formulation vs the fused Pallas
    # kernel (one HBM pass over the sets — the production traversal backend,
    # traverse/engine.py). 200 reps: the axon tunnel needs deep pipelining to
    # amortize dispatch. ------------------------------------------------------
    from warpedganspace_tpu.ops.rbf_pallas import (
        prepare_warp_sets, warp_grad_all_sets_kn)

    n_codes = 32
    zb = jax.random.normal(jax.random.key(4), (n_codes, 200, 512))
    zb_kn = jnp.transpose(zb, (1, 0, 2))

    @jax.jit
    def warp(s_params, zb):
        return S.direction_all_sets(s_params, zb)

    sync(warp(s_params, zb))
    log("warp warmup done")
    reps = 200

    def _warp_once():
        t0 = time.perf_counter()
        for _ in range(reps):
            o = warp(s_params, zb)
        sync(o)
        return n_codes * 200 * reps / (time.perf_counter() - t0)

    warp_evals_per_sec, warp_spread, n = _measure_rounds(_warp_once)
    log(f"warp jnp all-sets: {warp_evals_per_sec:.0f} evals/s "
        f"(best of {n}, spread {warp_spread:.1%})")

    # bf16 set storage = the production traversal configuration (bit-identical
    # to f32 storage on TPU — the default-precision MXU rounds f32 operands to
    # bf16 anyway — at half the HBM traffic; traverse/engine.py).
    ws = prepare_warp_sets(
        s_params["support_sets"], s_params["alphas"], S.gammas(s_params),
        dtype=jnp.bfloat16)
    # The kernel is ~0.35 ms/call — a bare Python dispatch loop measures the
    # HOST's ~2900 dispatches/s, not the device (round-3's 13.5M evals/s with
    # 25%+ spread was exactly that). Production (traverse/engine.py) runs the
    # kernel inside lax.scan with the shifted code as carry — measure that:
    # one XLA program chains CHAIN_STEPS kernel steps, so the host loop
    # disappears from the denominator (same fix as the round-4 SNGAN
    # dispatch-window analysis).
    CHAIN_STEPS = 32

    @jax.jit
    def pallas_chain(ws, z):
        def body(z, _):
            return z + 0.005 * warp_grad_all_sets_kn(ws, z), ()
        z, _ = jax.lax.scan(body, z, None, length=CHAIN_STEPS)
        return z

    try:
        sync(pallas_chain(ws, zb_kn))
        chain_reps = 40

        def _pallas_once():
            t0 = time.perf_counter()
            for _ in range(chain_reps):
                o = pallas_chain(ws, zb_kn)
            sync(o)
            return (n_codes * 200 * CHAIN_STEPS * chain_reps
                    / (time.perf_counter() - t0))

        pallas_evals_per_sec, pallas_spread, n = _measure_rounds(_pallas_once, rounds=5)
        log(f"warp pallas scan-chain (bf16 sets): {pallas_evals_per_sec:.0f} evals/s "
            f"({pallas_evals_per_sec / warp_evals_per_sec:.2f}x jnp, "
            f"best of {n}, spread {pallas_spread:.1%})")
    except Exception as e:
        log(f"pallas warp failed: {e}")
        pallas_evals_per_sec, pallas_spread = 0.0, 0.0

    # --- full train step/sec (SNGAN_MNIST reference config, bs=128) --------
    from warpedganspace_tpu.models.api import GeneratorBundle
    from warpedganspace_tpu.models.reconstructor import Reconstructor
    from warpedganspace_tpu.models.sngan import SNGANGenerator
    from warpedganspace_tpu.train import TrainStepConfig, init_train_state, make_train_step

    sg = SNGANGenerator.from_gan_type("SNGAN_MNIST")
    G = GeneratorBundle(name="SNGAN_MNIST", dim_z=128, resolution=32, out_channels=1,
                        params=jax.jit(sg.init)(jax.random.key(6)), apply_fn=sg.apply)
    S2 = SupportSets(num_support_sets=64, num_support_dipoles=128,
                     support_vectors_dim=128, learn_gammas=True)
    R = Reconstructor("LeNet", dim=64, channels=1)
    # The launcher's production flags (bf16-G; 143 steps/s with the round-3 merged up-convs).
    cfg = TrainStepConfig(batch_size=128, num_support_sets=64,
                          min_shift_magnitude=0.15, max_shift_magnitude=0.25,
                          generator_dtype="bfloat16")
    key = jax.random.key(7)
    state = jax.jit(lambda k: init_train_state(k, G, S2, R, cfg))(key)
    log("train state initialized")
    step = make_train_step(G, S2, R, cfg, donate=False)
    state, m = step(state, G.params, key, 1)
    sync(m["total_loss"])

    def _sngan_train_once():
        # 200 reps per window (~1.25 s): at ~6 ms/step the round-4 60-rep
        # window still charged the ~25 ms tunnel sync at ~7% per step
        # (calibrate_mfu.py intercept); host-timer/dispatch noise produced
        # the round-3 6.6% spread at 20 reps.
        nonlocal state
        reps = 200
        t0 = time.perf_counter()
        for it in range(2, 2 + reps):
            state, m = step(state, G.params, key, it)
        sync(m["total_loss"])
        return reps / (time.perf_counter() - t0)

    train_steps_per_sec, sngan_spread, n = _measure_rounds(_sngan_train_once, rounds=5)
    log(f"SNGAN-MNIST train single-dispatch (diagnostic — host-timing-"
        f"sensitive, see scan16 claim below): {train_steps_per_sec:.1f} steps/s "
        f"(best of {n}, spread {sngan_spread:.1%})")

    # The --steps-per-call 16 launcher path (k iterations per XLA program
    # via lax.scan; same sample stream). Round-4 analysis: same best-case
    # rate as single dispatch at a deep queue (~5.5 ms/iter device time);
    # measured here to prove the production scan path holds that rate.
    from warpedganspace_tpu.train import make_train_step_scan

    step16 = make_train_step_scan(G, S2, R, cfg, k=16, donate=False)
    state, mk = step16(state, G.params, key, 100)
    sync(mk["total_loss"])

    def _sngan_scan_once():
        nonlocal state
        reps = 25  # 25 x 16 = 400 iterations (~2.5 s) per window: the ~25 ms
        #            window sync costs <0.1 ms/iter (round-4's 64-iter window
        #            charged it at ~6%)
        t0 = time.perf_counter()
        for r in range(reps):
            state, mk = step16(state, G.params, key, 200 + 16 * r)
        sync(mk["total_loss"])
        return 16 * reps / (time.perf_counter() - t0)

    scan_steps_per_sec, scan_spread, n = _measure_rounds(_sngan_scan_once, rounds=5)
    # THE SNGAN claim of record: the launchers' --steps-per-call 16 path —
    # one Python dispatch per 16 iterations pins the deep-queue regime, so
    # its window timing is robust to host/tunnel contention (round-4
    # dispatch-window analysis; the single-dispatch row above is the
    # diagnostic that drifts with host state).
    log(f"SNGAN-MNIST train claim (--steps-per-call 16 launcher config): "
        f"{scan_steps_per_sec:.1f} steps/s "
        f"(best of {n}, spread {scan_spread:.1%})")

    # --- flagship train step (StyleGAN2-1024 W-space, bs=12, the production
    # launcher flags: bf16 G/R + S2D pair handoff, no remat — fits ~14 GB) --
    try:
        gen_t = StyleGAN2Generator(resolution=1024, shift_in_w_space=True)
        GT = GeneratorBundle(name="StyleGAN2", dim_z=512, resolution=1024,
                             out_channels=3, params=params, apply_fn=gen_t.apply,
                             get_w_fn=gen_t.get_w, shift_in_w_space=True,
                             supports_s2d_out=True)
        ST = SupportSets(num_support_sets=200, num_support_dipoles=512,
                         support_vectors_dim=512, learn_gammas=True)
        RT = Reconstructor("ResNet", dim=200, channels=3)
        cfgT = TrainStepConfig(batch_size=12, num_support_sets=200,
                               min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                               z_truncation=0.7, shift_in_w_space=True,
                               generator_dtype="bfloat16",
                               reconstructor_dtype="bfloat16",
                               pair_layout="s2d")
        stateT = jax.jit(lambda k: init_train_state(k, GT, ST, RT, cfgT))(key)
        stepT = make_train_step(GT, ST, RT, cfgT, donate=False)
        log("compiling flagship train step...")
        stateT, mT = stepT(stateT, GT.params, key, 1)
        sync(mT["total_loss"])
        repsT = 12  # ~2.7 s windows: the ~25 ms window sync costs <1%/step

        def _flagship_once():
            nonlocal stateT
            t0 = time.perf_counter()
            for it in range(2, 2 + repsT):
                stateT, mT = stepT(stateT, GT.params, key, it)
            sync(mT["total_loss"])
            return repsT / (time.perf_counter() - t0)

        flagship_steps_per_sec, flagship_spread, n = _measure_rounds(_flagship_once)
        log(f"StyleGAN2-1024 train (production flags): "
            f"{flagship_steps_per_sec:.2f} steps/s "
            f"(best of {n}, spread {flagship_spread:.1%})")
    except Exception as e:
        log(f"flagship train step failed: {e}")
        flagship_steps_per_sec, flagship_spread = 0.0, 0.0

    # --- ProgGAN-1024 render: the fused Pallas tail (round 3) --------------
    try:
        stateT = mT = None  # release the flagship step's HBM before ProgGAN
        from warpedganspace_tpu.models.proggan import ProgGANGenerator

        pg = ProgGANGenerator(tail_layout="pallas" if is_tpu else "s2d")
        pg_params = cast_params_bf16(jax.jit(lambda k: pg.init(k))(jax.random.key(8)))
        pgz = jax.random.normal(jax.random.key(9), (48, 512), jnp.bfloat16)
        pg_render = jax.jit(lambda p, z: pg.apply(p, z))
        log("compiling ProgGAN render (fused pallas tail)...")
        sync(pg_render(pg_params, pgz))

        def _proggan_once():
            # 50-rep windows (~2.8 s): one ~25 ms tunnel sync per window
            # (calibrate_mfu.py intercept) costs <1% per call; the round-4
            # 10-rep windows inflated this ~55 ms render by ~4.5%.
            reps = 50
            t0 = time.perf_counter()
            for _ in range(reps):
                o = pg_render(pg_params, pgz)
            sync(o)
            return 48 * reps / (time.perf_counter() - t0)

        proggan_ips, proggan_spread, n = _measure_rounds(_proggan_once)
        log(f"ProgGAN-1024 render (fused pallas tail, B=48): "
            f"{proggan_ips:.1f} img/s (best of {n}, spread {proggan_spread:.1%})")
    except Exception as e:
        log(f"proggan render failed: {e}")
        proggan_ips, proggan_spread = 0.0, 0.0

    if is_tpu:
        probes.append(_probe_tflops(log))
    probe_best = max(probes)
    degraded = bool(is_tpu and probe_best < DEGRADED_FRACTION * EXPECTED_PROBE_TFLOPS)
    if degraded:
        log(f"DEGRADED DEVICE: probe {probe_best:.1f} TFLOP/s < "
            f"{DEGRADED_FRACTION:.0%} of healthy {EXPECTED_PROBE_TFLOPS:.0f} — "
            "this run's numbers measure the environment, not the code")

    return {
        "stylegan2_1024_traversal_images_per_sec": images_per_sec,
        "stylegan2_1024_traversal_images_per_sec_f32": f32_images_per_sec,
        "stylegan2_1024_traversal_images_per_sec_bf16": bf16_images_per_sec,
        "bf16_psnr_vs_f32_db": bf16_psnr,
        "warp_grad_evals_per_sec_jnp": warp_evals_per_sec,
        "warp_grad_evals_per_sec_pallas": pallas_evals_per_sec,
        # Methodology changed in round 4: the kernel is timed inside a 32-step
        # lax.scan chain (the production traversal access pattern), not as
        # bare per-dispatch calls — r01-r03 values of this key measured the
        # host dispatch loop and are not directly comparable.
        "warp_grad_pallas_methodology": "scan_chain_32 (since r04; r01-r03 = bare dispatch loop)",
        # The claim of record = the stable scan16 launcher path; bs128
        # single-dispatch stays as a host-sensitivity diagnostic (round-4
        # window analysis: same ~5.5 ms/iter device time, wider host spread).
        "sngan_mnist_train_steps_per_sec": scan_steps_per_sec,
        "sngan_mnist_train_steps_per_sec_bs128": train_steps_per_sec,
        "sngan_mnist_train_steps_per_sec_scan16": scan_steps_per_sec,
        "stylegan2_1024_train_steps_per_sec_bs12": flagship_steps_per_sec,
        "proggan_1024_render_images_per_sec": proggan_ips,
        "spreads": {
            "render_f32": f32_spread,
            "render_bf16": bf16_spread,
            "warp_jnp": warp_spread,
            "warp_pallas": pallas_spread,
            "sngan_train": sngan_spread,
            "sngan_train_scan16": scan_spread,
            "flagship_train": flagship_spread,
            "proggan_render": proggan_spread,
        },
        "probe_tflops": probe_best,
        "probe_tflops_all": probes,
        # Round 5: slope method (fixed dispatch cost differenced out) — NOT
        # comparable to the r03/r04 fixed-chain probe values (~116).
        "probe_method": "slope(8,128)",
        "expected_tflops": EXPECTED_PROBE_TFLOPS if is_tpu else None,
        "degraded": degraded,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def _measure_cli_e2e(raw_render_rate):
    """End-to-end traverse CLI (warp integration + render + JPEGs on disk) at
    the reference StyleGAN2 shape: 1 code x K=8 paths x T=41 frames, 1024^2.

    Reports three rates so the bottleneck is attributable:
    - cli_e2e: the full CLI (reference-parity JPEG settings: quality 75,
      optimize+progressive — which cost ~110 ms/frame/core on the host);
    - cli_stream: the CLI's device-side pipeline (path-batched render +
      uint8-on-device conversion + device->host transfer), no JPEG;
    - jpeg_encode_ms: measured per-frame host encode cost.
    On this 1-CPU-core host the e2e rate IS the JPEG rate; the stream rate is
    what the TPU-side pipeline sustains (PERFORMANCE.md).
    """
    import shutil
    import tempfile
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    _t_cli = time.perf_counter()

    def log(msg):
        print(f"[bench-cli +{time.perf_counter() - _t_cli:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    import contextlib

    os.environ.setdefault("WGS_ALLOW_RANDOM_G", "1")
    tmp = tempfile.mkdtemp(prefix="wgs_bench_cli_")
    cwd = os.getcwd()
    os.chdir(tmp)
    # The CLI stages print progress to stdout; keep stdout clean for the
    # single-JSON-line driver contract.
    stack = contextlib.ExitStack()
    stack.enter_context(contextlib.redirect_stdout(sys.stderr))
    try:
        from warpedganspace_tpu.cli import sample_gan, traverse_latent_space
        from warpedganspace_tpu.models.gan_load import build_gan
        from warpedganspace_tpu.models.support_sets import SupportSets
        from warpedganspace_tpu.traverse.engine import iter_rendered_u8
        from warpedganspace_tpu.utils.io import save_pt

        sample_gan.main(["-g", "StyleGAN2", "--num-samples", "1",
                         "--pool", "bench", "--seed", "3"])
        K = 8
        exp = osp.join("experiments", "complete", "bench_exp")
        os.makedirs(osp.join(exp, "models"), exist_ok=True)
        S = SupportSets(num_support_sets=K, num_support_dipoles=512,
                        support_vectors_dim=512, learn_gammas=True)
        save_pt(S.to_torch_state_dict(S.init(jax.random.key(0))),
                osp.join(exp, "models", "support_sets.pt"))
        with open(osp.join(exp, "args.json"), "w") as f:
            json.dump({"gan_type": "StyleGAN2", "num_support_sets": K,
                       "num_support_dipoles": 512, "learn_alphas": False,
                       "learn_gammas": True, "gamma": None,
                       "shift_in_w_space": True, "stylegan2_resolution": 1024}, f)

        cli_args = ["--exp", exp, "--pool", "bench", "--shift-steps", "20",
                    "--eps", "0.2", "--dtype", "bfloat16", "--batch-size", "16"]
        n_frames = 1 * K * 41
        traverse_latent_space.main(cli_args)     # warm run (compiles)
        log("warm CLI run done")
        t0 = _time.perf_counter()
        traverse_latent_space.main(cli_args)
        cli_e2e = n_frames / (_time.perf_counter() - t0)
        log(f"cli e2e (JPEGs on disk): {cli_e2e:.1f} img/s")

        # Device-side stream rate over the same workload (no JPEG).
        G = build_gan(gan_type="StyleGAN2", stylegan2_resolution=1024,
                      shift_in_w_space=True)
        from warpedganspace_tpu.models.api import cast_params_bf16

        gp = cast_params_bf16(G.params)
        codes = jax.random.normal(jax.random.key(1), (n_frames, 512))
        shifts = 0.1 * jax.random.normal(jax.random.key(2), (n_frames, 512))
        for _ in iter_rendered_u8(G, gp, codes, shifts, batch_size=16,
                                  latent_is_w=True, dtype=jnp.bfloat16):
            pass                                  # warm
        t0 = _time.perf_counter()
        tot = 0
        for _, imgs in iter_rendered_u8(G, gp, codes, shifts, batch_size=16,
                                        latent_is_w=True, dtype=jnp.bfloat16):
            tot += imgs.shape[0]
        cli_stream = tot / (_time.perf_counter() - t0)
        log(f"cli stream (render + u8 device->host): {cli_stream:.1f} img/s "
            f"({100 * cli_stream / max(raw_render_rate, 1e-9):.0f}% of raw render)")

        # Device->host transfer bandwidth, to attribute the stream rate: on
        # the axon dev harness the tunnel moves ~13-16 MB/s (measured), so a
        # 3 MB uint8 1024^2 frame caps the stream at ~4-5 img/s REGARDLESS of
        # render speed; production hosts (local PCIe) move GB/s.
        xfer = jnp.zeros((16, 1024, 1024, 3), dtype=jnp.uint8) + 1
        float(jnp.sum(xfer[0, 0, 0]))
        t0 = _time.perf_counter()
        h = np.asarray(xfer)
        d2h_mbs = h.nbytes / 1e6 / (_time.perf_counter() - t0)
        log(f"device->host transfer: {d2h_mbs:.1f} MB/s "
            f"(ceiling {d2h_mbs / 3.15:.1f} uint8 img/s)")

        # Host JPEG encode cost (the e2e bound on a 1-core host).
        from PIL import Image

        frame = Image.fromarray(
            (np.random.rand(1024, 1024, 3) * 255).astype(np.uint8))
        t0 = _time.perf_counter()
        for _ in range(5):
            frame.save(osp.join(tmp, "enc.jpg"), "JPEG", quality=75,
                       optimize=True, progressive=True)
        jpeg_ms = (_time.perf_counter() - t0) / 5 * 1e3
        log(f"jpeg encode (q75 optimize+progressive): {jpeg_ms:.0f} ms/frame/core")
        return {
            "cli_e2e_images_per_sec": cli_e2e,
            "cli_stream_images_per_sec": cli_stream,
            "jpeg_encode_ms_per_frame_per_core": jpeg_ms,
            "device_to_host_mbytes_per_sec": d2h_mbs,
            "host_cpu_cores": os.cpu_count(),
        }
    finally:
        stack.close()
        os.chdir(cwd)
        shutil.rmtree(tmp, ignore_errors=True)


def _measure_attribute_stage():
    """Attribute-stage e2e throughput (K=8 paths x T=41 frames, 1024^2 JPEGs,
    all six predictors through evaluate_hash_dir — decode, SFD+NMS, device
    crops, predictor stream, eval_np writes). Uses the same synthetic-tree +
    random-weights recipe as scripts/measure_attribute_stage.py."""
    import shutil
    import tempfile

    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), "scripts"))
    from measure_attribute_stage import K, T, build_tree, random_predictors

    import numpy as np

    from warpedganspace_tpu.cli.traverse_attribute_space import evaluate_hash_dir

    tmp = tempfile.mkdtemp(prefix="wgs_bench_attr_")
    try:
        t_stage = time.perf_counter()

        def alog(msg):
            print(f"[bench-attr +{time.perf_counter() - t_stage:6.1f}s] {msg}",
                  file=sys.stderr, flush=True)

        h_dir = build_tree(tmp, np.random.RandomState(3))
        predictors = random_predictors()
        alog("tree + predictors built")
        evaluate_hash_dir(h_dir, predictors, gan_type="StyleGAN2")  # warm
        alog("warm eval done")
        vals = []
        # Budgeted reps: each rep is ~K*T/rate seconds (minutes on a 1-core
        # host) — stop once past 180 s so a contended host cannot push the
        # whole bench past the driver's window.
        t_budget = time.perf_counter()
        for _ in range(3):
            t0 = time.perf_counter()
            evaluate_hash_dir(h_dir, predictors, gan_type="StyleGAN2")
            vals.append(K * T / (time.perf_counter() - t0))
            alog(f"rep {len(vals)}: {vals[-1]:.2f} img/s")
            if time.perf_counter() - t_budget > 180.0:
                break
        best = max(vals)
        # A spread from one rep is meaningless — report it as None with the
        # budget reason instead of a fake 0.0 (VERDICT r4 weak item 5).
        spread = ((best - min(vals)) / best if best > 0 else 0.0) \
            if len(vals) >= 2 else None
        spread_txt = f"spread {spread:.1%}" if spread is not None else \
            "single rep — 180 s budget cap on this 1-core host, no spread"
        print(f"[bench-attr] attribute stage e2e (K={K}, T={T}) "
              f"(diagnostic — host-JPEG-decode-bound on this 1-core host; "
              f"stable claim = 2.48x device-pipeline A/B, round 3): "
              f"{best:.2f} img/s (best of {len(vals)}, {spread_txt})",
              file=sys.stderr, flush=True)
        return {
            "attribute_stage_images_per_sec": best,
            "attribute_stage_reps": len(vals),
            "attribute_stage_spread": spread,
            # The absolute rate is host-JPEG-decode bound on this 1-core dev
            # harness and swings with tunnel/host contention; the stable claim
            # is the device-pipeline speedup. That 2.48x (2.75 -> 6.83 img/s)
            # was a round-3 SAME-SESSION A/B (scripts/measure_attribute_stage
            # .py, PERFORMANCE.md "device pipeline") against the pre-pipeline
            # host-crop implementation, which has since been removed from the
            # tree — it cannot be re-measured in-session and is recorded here
            # as the round-3 provenance constant, not a fresh measurement.
            "attribute_stage_pipeline_speedup_r3": 2.48,
            "attribute_stage_note": "host-decode-bound; stable claim = 2.48x "
                                    "pipeline A/B (round-3 same-session, "
                                    "legacy path since removed)",
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _measure_reference_baseline():
    """Measure the reference PyTorch StyleGAN2 traversal render on this host.

    Uses the pure-torch op fallbacks (upfirdn2d_native semantics) since the
    CUDA extensions cannot build here; weights are random (same as our side).
    Cached in BENCH_BASELINE.json.
    """
    if osp.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)

    sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
    import torch
    from tests.test_stylegan2 import _install_op_stub  # pure-torch op semantics

    sys.path.insert(0, "/root/reference")
    _install_op_stub(torch)
    from models.StyleGAN2.model import Generator as RefStyleGAN2

    torch.manual_seed(0)
    G = RefStyleGAN2(1024, 512, 8).eval()
    w = torch.randn(1, 512)
    with torch.no_grad():
        G([w], input_is_latent=True, randomize_noise=False)  # warmup
        n = 2
        t0 = time.perf_counter()
        for _ in range(n):
            G([w], input_is_latent=True, randomize_noise=False)
        dt = time.perf_counter() - t0
    baseline = {
        "reference_images_per_sec": n / dt,
        "reference_device": "cpu (torch {} — reference cannot target TPU)".format(
            torch.__version__),
    }
    with open(BASELINE_CACHE, "w") as f:
        json.dump(baseline, f, indent=2)
    return baseline


def main():
    results = _measure_tpu()
    try:
        results.update(_measure_cli_e2e(
            results["stylegan2_1024_traversal_images_per_sec"]))
    except Exception as e:  # the CLI e2e sweep is best-effort
        results["cli_e2e_error"] = str(e)
    try:
        results.update(_measure_attribute_stage())
    except Exception as e:  # best-effort (needs torch + /root/reference)
        results["attribute_stage_error"] = str(e)
    try:
        baseline = _measure_reference_baseline()
        ref = baseline["reference_images_per_sec"]
    except Exception as e:  # baseline measurement is best-effort
        baseline = {"error": str(e)}
        ref = None

    value = results["stylegan2_1024_traversal_images_per_sec"]
    details = {**results, "baseline": baseline}
    with open(osp.join(osp.dirname(osp.abspath(__file__)), "bench_details.json"), "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": "stylegan2_1024_traversal_images_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "images/sec",
        "vs_baseline": round(value / ref, 3) if ref else None,
        "train_steps_per_sec": round(
            results.get("stylegan2_1024_train_steps_per_sec_bs12", 0.0), 3),
        "probe_tflops": round(results.get("probe_tflops", 0.0), 1),
        "expected_tflops": results.get("expected_tflops"),
        "degraded": results.get("degraded"),
    }))


if __name__ == "__main__":
    main()
