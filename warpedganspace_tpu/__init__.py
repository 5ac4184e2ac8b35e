"""warpedganspace_tpu — a TPU-native framework for warped GAN latent-space exploration.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of WarpedGANSpace
(ICCV 2021): discovering K non-linear interpretable paths in the latent space of
frozen pretrained GAN generators via learnable RBF warping functions, trained
contrastively against a reconstructor CNN.

Subsystems
----------
- :mod:`warpedganspace_tpu.ops`       — compute ops (fused RBF warp f/grad-f, upfirdn2d,
  fused bias+leaky-relu) with Pallas TPU kernels and XLA reference paths.
- :mod:`warpedganspace_tpu.nn`        — minimal functional NN layer library (pure
  functions over parameter pytrees; NHWC/HWIO layouts for TPU).
- :mod:`warpedganspace_tpu.models`    — generator zoo (SNGAN / ProgGAN / StyleGAN2 /
  BigGAN), support sets, reconstructors — all pure ``apply(params, ...)`` functions.
- :mod:`warpedganspace_tpu.convert`   — PyTorch ``state_dict`` (.pt) <-> JAX pytree
  converters for every model family.
- :mod:`warpedganspace_tpu.parallel`  — device-mesh construction and SPMD sharding
  (data parallelism over ICI via jax.sharding + shard_map).
- :mod:`warpedganspace_tpu.train`     — jit-compiled contrastive training loop,
  checkpoint/resume, stats logging.
- :mod:`warpedganspace_tpu.traverse`  — lax.scan-based batched latent path traversal
  plus image/GIF emission.
- :mod:`warpedganspace_tpu.evalzoo`   — attribute predictor zoo (SFD, ArcFace,
  FairFace, HopeNet, FANAU, CelebA-5).
- :mod:`warpedganspace_tpu.ranking`   — interpretable-path ranking by
  attribute-vs-step correlation.
- :mod:`warpedganspace_tpu.cli`       — command-line pipeline scripts with the same
  flag surface and experiments/ directory schema as the reference implementation.
"""

__version__ = "0.1.0"
