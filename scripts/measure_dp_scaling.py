#!/usr/bin/env python
"""Account the collective traffic of the data-parallel train step.

Single-chip throughput is measured on hardware (PERFORMANCE.md); what a pod
deployment adds is ONLY the cross-chip collectives XLA inserts for the
replicated-parameter gradient sync. This script makes that claim *measured*
rather than asserted: it compiles the REAL multi-device train step over an
8-device mesh (virtual CPU devices — the SPMD partitioner emits the same
collective schedule it would for 8 TPU chips on one ICI torus), walks the
optimized HLO, and sums the bytes of every collective op by kind.

Output: bytes per step per collective kind, the analytic expectation
(= one all-reduce over the trainable S+R gradients; the frozen generator
contributes nothing), and the predicted DP scaling efficiency on a v5e ICI
ring at the measured single-chip step times.

Run from the repo root (no TPU needed):
    python scripts/measure_dp_scaling.py [sg2|proggan|biggan|sngan ...]
"""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

from warpedganspace_tpu.models.api import GeneratorBundle  # noqa: E402
from warpedganspace_tpu.models.biggan import BigGANGenerator  # noqa: E402
from warpedganspace_tpu.models.proggan import ProgGANGenerator  # noqa: E402
from warpedganspace_tpu.models.reconstructor import Reconstructor  # noqa: E402
from warpedganspace_tpu.models.sngan import SNGANGenerator  # noqa: E402
from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator  # noqa: E402
from warpedganspace_tpu.models.support_sets import SupportSets  # noqa: E402
from warpedganspace_tpu.parallel import (  # noqa: E402
    audit_collectives, make_mesh, param_bytes)
from warpedganspace_tpu.train import (  # noqa: E402
    TrainStepConfig, init_train_state, make_train_step)

# One v5e chip drives its ICI ring at ~45 GB/s per direction per link
# (2 links per torus axis). A bidirectional-ring all-reduce of V bytes over
# N chips moves 2*V*(N-1)/N per chip; with both directions active the wall
# time is ~ V / 90e9 * 2 * (N-1)/N  (scaling-book recipe, DP over one axis).
ICI_GBPS_BIDIR = 90e9


def build(name):
    # step_ms constants mirror the measured single-chip rows of
    # `scripts/measure_mfu_zoo.py` (PERFORMANCE.md "MFU / roofline of
    # record") — update them together when the zoo table is re-measured.
    key = jax.random.key(0)
    if name == "sg2":
        gen = StyleGAN2Generator(resolution=1024, shift_in_w_space=True)
        G = GeneratorBundle(name="StyleGAN2", dim_z=512, resolution=1024,
                            out_channels=3, params=gen.init(key),
                            apply_fn=gen.apply, get_w_fn=gen.get_w,
                            shift_in_w_space=True, supports_s2d_out=True)
        S = SupportSets(num_support_sets=200, num_support_dipoles=512,
                        support_vectors_dim=512, learn_gammas=True)
        R = Reconstructor("ResNet", dim=200, channels=3)
        cfg = TrainStepConfig(batch_size=16, num_support_sets=200,
                              min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                              z_truncation=0.7, shift_in_w_space=True,
                              generator_dtype="bfloat16",
                              reconstructor_dtype="bfloat16", pair_layout="s2d")
        step_ms = 221.5  # measured bs16 plateau (PERFORMANCE.md round 4)
    elif name == "proggan":
        gen = ProgGANGenerator()
        G = GeneratorBundle(name="ProgGAN", dim_z=512, resolution=1024,
                            out_channels=3, params=gen.init(key),
                            apply_fn=gen.apply, supports_s2d_out=True)
        S = SupportSets(num_support_sets=200, num_support_dipoles=512,
                        support_vectors_dim=512, learn_gammas=True)
        R = Reconstructor("ResNet", dim=200, channels=3)
        cfg = TrainStepConfig(batch_size=16, num_support_sets=200,
                              min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                              generator_dtype="bfloat16",
                              reconstructor_dtype="bfloat16", pair_layout="s2d")
        step_ms = 117.8
    elif name == "biggan":
        gen = BigGANGenerator.from_config(target_classes=(239,))
        G = GeneratorBundle(name="BigGAN", dim_z=gen.dim_z, resolution=128,
                            out_channels=3, params=gen.init(key),
                            apply_fn=gen.apply)
        S = SupportSets(num_support_sets=120, num_support_dipoles=256,
                        support_vectors_dim=gen.dim_z, learn_gammas=True)
        R = Reconstructor("ResNet", dim=120, channels=3)
        cfg = TrainStepConfig(batch_size=32, num_support_sets=120,
                              min_shift_magnitude=0.1, max_shift_magnitude=0.2,
                              generator_dtype="bfloat16",
                              reconstructor_dtype="bfloat16")
        step_ms = 29.6
    elif name == "sngan":
        gen = SNGANGenerator.from_gan_type("SNGAN_MNIST")
        G = GeneratorBundle(name="SNGAN_MNIST", dim_z=gen.dim_z,
                            resolution=gen.img_size, out_channels=1,
                            params=gen.init(key), apply_fn=gen.apply)
        S = SupportSets(num_support_sets=64, num_support_dipoles=128,
                        support_vectors_dim=gen.dim_z, learn_gammas=True)
        R = Reconstructor("LeNet", dim=64, channels=1)
        cfg = TrainStepConfig(batch_size=128, num_support_sets=64,
                              min_shift_magnitude=0.15, max_shift_magnitude=0.25,
                              generator_dtype="bfloat16")
        step_ms = 6.2
    else:
        raise SystemExit(f"unknown row {name!r}")
    return G, S, R, cfg, step_ms


def main():
    rows = sys.argv[1:] or ["sg2", "biggan", "sngan"]
    mesh = make_mesh()  # all 8 virtual devices on the data axis
    n = mesh.devices.size
    key = jax.random.key(0)
    for name in rows:
        G, S, R, cfg, step_ms = build(name)
        state = jax.jit(lambda k, G=G, S=S, R=R, cfg=cfg:
                        init_train_state(k, G, S, R, cfg))(key)
        step = make_train_step(G, S, R, cfg, mesh=mesh, donate=False)  # jitted
        compiled = step.lower(state, G.params, key, 1).compile()
        audit = audit_collectives(compiled)
        grad_b = param_bytes(state["s_params"]) + param_bytes(state["r_params"])
        total_coll = sum(b for _, b in audit.values())
        # Ring all-reduce wall time on a v5e DP axis of n chips.
        ar_ms = total_coll / ICI_GBPS_BIDIR * 2 * (n - 1) / n * 1e3
        eff = step_ms / (step_ms + ar_ms)
        print(f"\n=== {name} (mesh: {n}-device data axis) ===")
        for kind, (cnt, b) in audit.items():
            print(f"  {kind:<20} x{cnt:<3} {b / 1e6:10.2f} MB/step")
        print(f"  trainable grads (S+R, f32): {grad_b / 1e6:.2f} MB "
              f"(frozen G: 0 — never synced)")
        print(f"  total collective traffic:   {total_coll / 1e6:.2f} MB/step")
        print(f"  predicted ring all-reduce @ {ICI_GBPS_BIDIR / 1e9:.0f} GB/s "
              f"bidir: {ar_ms:.2f} ms on top of {step_ms:.1f} ms step")
        print(f"  -> DP-{n} scaling efficiency ~ {100 * eff:.1f}% "
              f"(overlap not assumed; XLA typically hides part of this)")


if __name__ == "__main__":
    main()
