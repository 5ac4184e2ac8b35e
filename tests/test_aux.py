"""aux utilities: experiment-name encoding parity and misc helpers."""
import numpy as np

from warpedganspace_tpu.utils.aux import experiment_name, sec2dhms


def _args(**kw):
    base = dict(
        gan_type="SNGAN_MNIST",
        reconstructor_type="LeNet",
        num_support_sets=64,
        num_support_dipoles=128,
        learn_alphas=False,
        learn_gammas=False,
        min_shift_magnitude=0.15,
        max_shift_magnitude=0.25,
        stylegan2_resolution=1024,
        shift_in_w_space=False,
        biggan_target_classes=None,
    )
    base.update(kw)
    return base


def test_experiment_names_match_reference_configs():
    """The directory name IS the experiment identity consumed downstream
    (reference lib/aux.py:60-90); check the five published config names."""
    assert experiment_name(_args(learn_gammas=True)) == (
        "SNGAN_MNIST-LeNet-K64-D128-LearnGammas-eps0.15_0.25"
    )
    assert experiment_name(
        _args(gan_type="SNGAN_AnimeFaces", learn_gammas=True,
              min_shift_magnitude=0.25, max_shift_magnitude=0.35)
    ) == "SNGAN_AnimeFaces-LeNet-K64-D128-LearnGammas-eps0.25_0.35"
    assert experiment_name(
        _args(gan_type="BigGAN", biggan_target_classes=[239], reconstructor_type="ResNet",
              num_support_sets=120, num_support_dipoles=256, learn_gammas=True,
              min_shift_magnitude=0.1, max_shift_magnitude=0.2)
    ) == "BigGAN-239-ResNet-K120-D256-LearnGammas-eps0.1_0.2"
    assert experiment_name(
        _args(gan_type="ProgGAN", reconstructor_type="ResNet", num_support_sets=200,
              num_support_dipoles=512, learn_gammas=True,
              min_shift_magnitude=0.1, max_shift_magnitude=0.2)
    ) == "ProgGAN-ResNet-K200-D512-LearnGammas-eps0.1_0.2"
    assert experiment_name(
        _args(gan_type="StyleGAN2", shift_in_w_space=True, reconstructor_type="ResNet",
              num_support_sets=200, num_support_dipoles=512, learn_gammas=True,
              min_shift_magnitude=0.1, max_shift_magnitude=0.2)
    ) == "StyleGAN2-1024-W-ResNet-K200-D512-LearnGammas-eps0.1_0.2"
    # Z-space StyleGAN2 and learn-alphas variants.
    assert experiment_name(
        _args(gan_type="StyleGAN2", learn_alphas=True)
    ) == "StyleGAN2-1024-Z-LeNet-K64-D128-LearnAlphas-eps0.15_0.25"


def test_sec2dhms_format():
    assert sec2dhms(0) == "00 days, 00 hours, 00 minutes, and 00 seconds"
    assert sec2dhms(90061) == "01 days, 01 hours, 01 minutes, and 01 seconds"
