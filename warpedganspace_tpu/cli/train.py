"""WarpedGANSpace training CLI (TPU).

Flag surface and behavior parity with reference ``train.py``; device flags:
``--cuda/--no-cuda`` are accepted for drop-in script compatibility but ignored
(JAX picks the TPU/CPU backend), and ``--multi-device`` (new) shards the batch
over all visible devices via a data-parallel mesh.

Multi-host: launch one copy per host with COORDINATOR_ADDRESS /
NUM_PROCESSES / PROCESS_ID set (see parallel.mesh.initialize_distributed) and
pass --multi-device; the mesh then spans every process's devices over DCN and
only process 0 writes the experiment tree.
"""
from __future__ import annotations

import argparse

import jax

from warpedganspace_tpu.config import GAN_RESOLUTIONS, GAN_WEIGHTS, RECONSTRUCTOR_TYPES
from warpedganspace_tpu.models.gan_load import build_gan
from warpedganspace_tpu.models.reconstructor import Reconstructor
from warpedganspace_tpu.models.support_sets import SupportSets
from warpedganspace_tpu.parallel import initialize_distributed, is_coordinator, make_mesh
from warpedganspace_tpu.train import Trainer
from warpedganspace_tpu.utils.aux import create_exp_dir


def build_parser():
    parser = argparse.ArgumentParser(description="WarpedGANSpace training script (TPU-native)")

    # === Pre-trained GAN Generator (G) ===
    parser.add_argument("--gan-type", type=str, choices=list(GAN_WEIGHTS.keys()),
                        help="set GAN generator model type")
    parser.add_argument("--z-truncation", type=float,
                        help="set latent code sampling truncation parameter")
    parser.add_argument("--biggan-target-classes", nargs="+", type=int,
                        help="list of classes for conditional BigGAN")
    parser.add_argument("--stylegan2-resolution", type=int, default=1024, choices=(256, 1024),
                        help="StyleGAN2 image resolution")
    parser.add_argument("--shift-in-w-space", action="store_true",
                        help="search latent paths in StyleGAN2's W-space")

    # === Support Sets (S) ===
    parser.add_argument("-K", "--num-support-sets", type=int,
                        help="set number of support sets (warping functions)")
    parser.add_argument("-D", "--num-support-dipoles", type=int,
                        help="set number of support dipoles per support set")
    parser.add_argument("--learn-alphas", action="store_true", help="learn RBF alpha params")
    parser.add_argument("--learn-gammas", action="store_true", help="learn RBF gamma params")
    parser.add_argument("-g", "--gamma", type=float,
                        help="set RBF gamma param; when --learn-gammas is set, this will be "
                             "the initial value of gammas of all RBFs")
    parser.add_argument("--support-set-lr", type=float, default=1e-4, help="set learning rate")

    # === Reconstructor (R) ===
    parser.add_argument("--reconstructor-type", type=str, choices=RECONSTRUCTOR_TYPES,
                        default="ResNet", help="set reconstructor network type")
    parser.add_argument("--min-shift-magnitude", type=float, default=0.25,
                        help="set minimum shift magnitude")
    parser.add_argument("--max-shift-magnitude", type=float, default=0.45,
                        help="set shifts magnitude scale")
    parser.add_argument("--reconstructor-lr", type=float, default=1e-4,
                        help="set learning rate for reconstructor R optimization")

    # === Training ===
    parser.add_argument("--max-iter", type=int, default=100000,
                        help="set maximum number of training iterations")
    parser.add_argument("--batch-size", type=int, default=32, help="set batch size")
    parser.add_argument("--lambda-cls", type=float, default=1.00, help="classification loss weight")
    parser.add_argument("--lambda-reg", type=float, default=0.25, help="regression loss weight")
    parser.add_argument("--log-freq", default=10, type=int, help="set number iterations per log")
    parser.add_argument("--ckp-freq", default=1000, type=int,
                        help="set number iterations per checkpoint model saving")
    parser.add_argument("--tensorboard", action="store_true", help="use tensorboard")
    parser.add_argument("--checkpoint-backend", type=str, default="pt",
                        choices=("pt", "orbax"),
                        help="'pt' (default): reference-format checkpoint.pt + atomic "
                             "optimizer sidecar; 'orbax': TPU-native CheckpointManager "
                             "(atomic, pickle-free, sharded-array aware for multi-host "
                             "runs). Final support_sets.pt/reconstructor.pt exports are "
                             "written either way.")
    parser.add_argument("--no-tensorboard-server", action="store_true",
                        help="with --tensorboard: write scalars but do not launch the "
                             "in-process TensorBoard server (the reference always "
                             "launches one, lib/trainer.py:55-63)")
    parser.add_argument("--seed", type=int, default=0, help="RNG seed (new; JAX threaded keys)")
    parser.add_argument("--steps-per-call", type=int, default=1,
                        help="iterations per XLA dispatch (lax.scan chunking; "
                             "must divide --log-freq and --ckp-freq). For the "
                             "tiny fast configs (SNGAN, ~6 ms/step) this pins "
                             "the deep-dispatch-queue regime regardless of "
                             "host-loop speed — same best-case steps/s, "
                             "robust on slow/contended hosts (PERFORMANCE.md "
                             "round-4 SNGAN analysis); the 1024^2 configs "
                             "(>100 ms/step) gain nothing — leave at 1 there")

    # === Devices ===
    parser.add_argument("--cuda", dest="cuda", action="store_true",
                        help="accepted for reference-script compatibility (ignored)")
    parser.add_argument("--no-cuda", dest="cuda", action="store_false",
                        help="accepted for reference-script compatibility (ignored)")
    parser.add_argument("--multi-device", action="store_true",
                        help="shard the batch over all visible TPU devices (data parallel)")
    parser.add_argument("--remat", type=str, nargs="?", const="tail", default="off",
                        choices=("off", "tail", "full"),
                        help="rematerialize generator blocks in the backward pass "
                             "(reduces HBM pressure for 1024^2 training). Bare "
                             "--remat = 'tail': checkpoint only the <128-channel "
                             "high-res blocks; 'full' checkpoints every block. "
                             "With the production mixed-precision flags "
                             "(--g-dtype/--r-dtype bfloat16 --pair-layout s2d) "
                             "the 1024^2 reference configs fit a 16 GB chip "
                             "WITHOUT remat (~14 GB peak) and run ~20%% faster — "
                             "'off' is the measured best there; use 'tail' for "
                             "f32 training or larger batches")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of the training loop")
    parser.add_argument("--g-dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="generator compute dtype during training (the warp "
                             "and loss always run float32)")
    parser.add_argument("--r-dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="reconstructor compute dtype during training: "
                             "bfloat16 runs R's conv trunk in bf16 (float32 "
                             "master params, BN statistics and heads)")
    parser.add_argument("--pair-layout", type=str, default="auto",
                        choices=("auto", "nhwc", "s2d"),
                        help="G->R image handoff layout inside the train step: "
                             "'s2d' keeps the pair in the generator tail's "
                             "native space-to-depth layout (exact; skips two "
                             "layout transposes; StyleGAN2/ProgGAN generators "
                             "+ ResNet R). 'auto' (default) = s2d whenever "
                             "the G/R pair supports it")
    parser.set_defaults(cuda=True)
    return parser


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)

    # Multi-host bring-up (env-driven no-op otherwise, idempotent): must run
    # before the first jax.devices() so the global mesh spans all processes.
    initialize_distributed()
    coord = is_coordinator()

    # Validate required-in-practice flags BEFORE creating the experiment dir,
    # so a misconfigured launch doesn't litter experiments/wip/ with
    # 'None-...-KNone-DNone' directories carrying an invalid args.json.
    for flag, val in (("--gan-type", args.gan_type),
                      ("-K/--num-support-sets", args.num_support_sets),
                      ("-D/--num-support-dipoles", args.num_support_dipoles)):
        if val is None:
            parser.error(f"{flag} is required")
    # Same pre-dir rule for the cheap config checks the Trainer would reject
    # minutes later (after the GAN build): fail before any tree is written.
    k_chunk = int(args.steps_per_call or 1)
    if k_chunk > 1:
        if args.ckp_freq % k_chunk:
            parser.error(f"--steps-per-call {k_chunk} must divide --ckp-freq "
                         f"({args.ckp_freq})")
        if args.log_freq % k_chunk:
            parser.error(f"--steps-per-call {k_chunk} must divide --log-freq "
                         f"({args.log_freq})")
    if jax.process_count() > 1 and not args.multi_device:
        parser.error(
            "multi-process training requires --multi-device (the train step "
            "must span the global mesh; two unconnected single-device loops "
            "would race on the experiment tree)")

    # Create output dir and save current arguments (the args.json contract);
    # the contract files have exactly one writer under multi-process.
    exp_dir = create_exp_dir(args, write=coord)

    if coord:
        print("#. Build GAN generator model G and load with pre-trained weights...")
        print("  \\__GAN type: {}".format(args.gan_type))
        if args.gan_type == "StyleGAN2":
            print("  \\__Search for paths in {}-space".format("W" if args.shift_in_w_space else "Z"))
        if args.z_truncation:
            print("  \\__Input noise truncation: {}".format(args.z_truncation))
        print("  \\__Pre-trained weights: {}".format(
            GAN_WEIGHTS[args.gan_type]["weights"][args.stylegan2_resolution]
            if args.gan_type == "StyleGAN2"
            else GAN_WEIGHTS[args.gan_type]["weights"][GAN_RESOLUTIONS[args.gan_type]]))

    G = build_gan(
        gan_type=args.gan_type,
        target_classes=args.biggan_target_classes,
        stylegan2_resolution=args.stylegan2_resolution,
        shift_in_w_space=args.shift_in_w_space,
        remat={"off": False, "tail": "tail", "full": True}[args.remat],
        # Training differentiates through G and hands s2d-layout pairs to the
        # reconstructor: keep the autodiff-native s2d tails (the ProgGAN
        # Pallas tail and the StyleGAN2 fold-x tail are inference render
        # layouts).
        proggan_tail_layout="s2d",
        stylegan2_tail_layout="s2d",
    )

    if coord:
        print("#. Build Support Sets S...")
        print("  \\__Number of Support Sets    : {}".format(args.num_support_sets))
        print("  \\__Number of Support Dipoles : {}".format(args.num_support_dipoles))
        print("  \\__Support Vectors dim       : {}".format(G.dim_z))
        print("  \\__Learn RBF alphas          : {}".format(args.learn_alphas))
        print("  \\__Learn RBF gammas          : {}".format(args.learn_gammas))
        if not args.learn_gammas:
            print("  \\__RBF gamma                 : {}".format(
                1.0 / G.dim_z if args.gamma is None else args.gamma))

    S = SupportSets(
        num_support_sets=args.num_support_sets,
        num_support_dipoles=args.num_support_dipoles,
        support_vectors_dim=G.dim_z,
        learn_alphas=args.learn_alphas,
        learn_gammas=args.learn_gammas,
        gamma=1.0 / G.dim_z if args.gamma is None else args.gamma,
    )

    if coord:
        print("#. Build reconstructor model R...")
    R = Reconstructor(
        reconstructor_type=args.reconstructor_type,
        dim=args.num_support_sets,
        channels=1 if args.gan_type == "SNGAN_MNIST" else 3,
    )

    mesh = None
    if args.multi_device and len(jax.devices()) > 1:
        mesh = make_mesh()
        if coord:
            print("#. Data-parallel mesh over {} devices / {} processes".format(
                len(jax.devices()), jax.process_count()))

    if coord:
        print("#. Experiment: {}".format(exp_dir))
    trn = Trainer(params=args, exp_dir=exp_dir, mesh=mesh, seed=args.seed)
    trn.train(generator=G, support_sets=S, reconstructor=R, profile=args.profile)


if __name__ == "__main__":
    main()
