"""Reconstructor tests.

Note: the reference lib/reconstructor.py imports torchvision at module level and
torchvision is not in this image, so LeNet parity is checked against an inline
torch replica that uses the reference's documented architecture and state-dict
naming (lib/reconstructor.py:18-49); the ResNet-18 variant is checked
structurally (shapes, grads, parameter count).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpedganspace_tpu.convert import (
    lenet_reconstructor_from_state_dict,
    lenet_reconstructor_to_state_dict,
    resnet_reconstructor_from_state_dict,
    resnet_reconstructor_to_state_dict,
)
from warpedganspace_tpu.models.reconstructor import Reconstructor


def _torch_lenet(torch, dim, channels, width=2):
    """Inline torch LeNet with reference attribute naming (test oracle)."""
    nn = torch.nn

    class LeNetR(nn.Module):
        def __init__(self):
            super().__init__()
            self.feature_extractor = nn.Sequential(
                nn.Conv2d(channels * 2, 3 * width, 5),
                nn.BatchNorm2d(3 * width),
                nn.ReLU(),
                nn.MaxPool2d(2, 2),
                nn.Conv2d(3 * width, 8 * width, 5),
                nn.BatchNorm2d(8 * width),
                nn.ReLU(),
                nn.MaxPool2d(2, 2),
                nn.Conv2d(8 * width, 60 * width, 5),
                nn.BatchNorm2d(60 * width),
                nn.ReLU(),
            )
            self.path_indices = nn.Sequential(
                nn.Linear(60 * width, 42 * width),
                nn.BatchNorm1d(42 * width),
                nn.ReLU(),
                nn.Linear(42 * width, dim),
            )
            self.shift_magnitudes = nn.Sequential(
                nn.Linear(60 * width, 42 * width),
                nn.BatchNorm1d(42 * width),
                nn.ReLU(),
                nn.Linear(42 * width, 1),
            )

        def forward(self, x1, x2):
            f = self.feature_extractor(torch.cat([x1, x2], dim=1))
            f = f.mean(dim=[-1, -2]).view(x1.shape[0], -1)
            return self.path_indices(f), self.shift_magnitudes(f).squeeze()

    return LeNetR()


def test_lenet_parity_vs_torch():
    torch = pytest.importorskip("torch")
    K, C, B, H = 10, 1, 6, 32
    torch.manual_seed(0)
    ref = _torch_lenet(torch, K, C).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.5)

    r = Reconstructor("LeNet", dim=K, channels=C)
    params = lenet_reconstructor_from_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )

    rng = np.random.RandomState(0)
    x1 = rng.randn(B, C, H, H).astype(np.float32)
    x2 = rng.randn(B, C, H, H).astype(np.float32)
    with torch.no_grad():
        ref_logits, ref_mags = ref(torch.from_numpy(x1), torch.from_numpy(x2))

    logits, mags = r.apply(
        params,
        jnp.asarray(x1.transpose(0, 2, 3, 1)),
        jnp.asarray(x2.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mags), ref_mags.numpy(), rtol=1e-3, atol=1e-4)


def test_lenet_state_dict_roundtrip():
    r = Reconstructor("LeNet", dim=8, channels=3)
    params = r.init(jax.random.key(0))
    sd = lenet_reconstructor_to_state_dict(params)
    back = lenet_reconstructor_from_state_dict(sd)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(back)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        if a.dtype == jnp.float32:
            np.testing.assert_allclose(a, b, rtol=1e-6)


def test_lenet_train_mode_updates_bn_stats():
    r = Reconstructor("LeNet", dim=4, channels=1)
    params = r.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (8, 32, 32, 1)) + 2.0
    logits, mags, new_params = r.apply(params, x, x, train=True)
    assert logits.shape == (8, 4) and mags.shape == (8,)
    # Running mean must have moved toward the (shifted) batch mean.
    assert float(jnp.abs(new_params["bn1"]["mean"]).sum()) > float(
        jnp.abs(params["bn1"]["mean"]).sum()
    )
    # Weights must be untouched by the stat refresh.
    np.testing.assert_allclose(new_params["conv1"]["w"], params["conv1"]["w"])


def test_resnet18_structure_and_grads():
    r = Reconstructor("ResNet", dim=16, channels=3)
    params = r.init(jax.random.key(0))

    # Parameter count: torchvision resnet18 backbone conv/bn params with a
    # 6-channel conv1, no torchvision fc, plus the two heads.
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    # torchvision resnet18 minus its fc = 11,176,512 trainable params; the
    # 6-channel conv1 adds 7*7*3*64 = 9,408; BN running stats (leaves in our
    # pytree) add 2 * 4,800 total BN features = 9,600; heads add 512*16+16 and
    # 512*1+1.
    expected = 11_176_512 + 9_408 + 9_600 + (512 * 16 + 16) + (512 + 1)
    assert n_params == expected, (n_params, expected)

    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    logits, mags = r.apply(params, x, x, train=False)
    assert logits.shape == (2, 16) and mags.shape == (2,)

    def loss(p):
        lo, m = r.apply(p, x, x, train=False)
        return jnp.mean(lo**2) + jnp.mean(m**2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_resnet_state_dict_roundtrip():
    r = Reconstructor("ResNet", dim=5, channels=3)
    params = r.init(jax.random.key(2))
    sd = resnet_reconstructor_to_state_dict(params)
    back = resnet_reconstructor_from_state_dict(sd)
    l1 = jax.tree_util.tree_leaves(params)
    l2 = jax.tree_util.tree_leaves(back)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        if a.dtype == jnp.float32:
            np.testing.assert_allclose(a, b, rtol=1e-6)


def test_resnet_bf16_close_to_f32():
    """Mixed-precision apply (bf16 conv trunk) tracks the f32 forward; the
    params pytree and BN running stats stay float32."""
    r = Reconstructor("ResNet", dim=8, channels=3)
    params = r.init(jax.random.key(3))
    x1 = jax.random.normal(jax.random.key(4), (4, 64, 64, 3))
    x2 = x1 + 0.1 * jax.random.normal(jax.random.key(5), (4, 64, 64, 3))

    lo32, m32, new32 = r.apply(params, x1, x2, train=True)
    lo16, m16, new16 = r.apply(params, x1, x2, train=True, dtype=jnp.bfloat16)

    assert lo16.dtype == jnp.float32 and m16.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(new16):
        assert leaf.dtype == jnp.float32
    scale = float(jnp.abs(lo32).max())
    np.testing.assert_allclose(lo16, lo32, atol=0.05 * scale)
    np.testing.assert_allclose(
        new16["bn1"]["mean"], new32["bn1"]["mean"], rtol=0.05, atol=1e-3
    )

    # Gradients flow and come back float32.
    def loss(p):
        lo, m, _ = r.apply(p, x1, x2, train=True, dtype=jnp.bfloat16)
        return jnp.mean(lo**2) + jnp.mean(m**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)
    gnorm = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert np.isfinite(gnorm) and gnorm > 0


def test_resnet_pair_s2d_exact():
    """apply_pair_s2d on S2D-layout inputs == apply on NHWC inputs — exact
    modulo float reassociation (same params pytree; grads match too)."""
    from warpedganspace_tpu.ops import s2d as s2dops

    r = Reconstructor("ResNet", dim=8, channels=3)
    params = r.init(jax.random.key(6))
    x1 = jax.random.normal(jax.random.key(7), (2, 64, 64, 3))
    x2 = x1 + 0.1 * jax.random.normal(jax.random.key(8), (2, 64, 64, 3))
    s1, s2 = s2dops.to_s2d(x1), s2dops.to_s2d(x2)

    lo_a, m_a, new_a = r.apply(params, x1, x2, train=True)
    lo_b, m_b, new_b = r.apply_pair_s2d(params, s1, s2, train=True)
    np.testing.assert_allclose(lo_b, lo_a, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(m_b, m_a, rtol=1e-4, atol=1e-4)
    for la, lb in zip(jax.tree_util.tree_leaves(new_a), jax.tree_util.tree_leaves(new_b)):
        np.testing.assert_allclose(lb, la, rtol=1e-4, atol=1e-5)

    def loss(fn):
        def f(p):
            lo, m, _ = fn(p)
            return jnp.mean(lo**2) + jnp.mean(m**2)
        return f

    ga = jax.grad(loss(lambda p: r.apply(p, x1, x2, train=True)))(params)
    gb = jax.grad(loss(lambda p: r.apply_pair_s2d(p, s1, s2, train=True)))(params)
    for la, lb in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(lb, la, rtol=5e-3, atol=1e-5)

    # bf16 variant runs and returns f32 outputs/params.
    lo, m, new_p = r.apply_pair_s2d(params, s1, s2, train=True, dtype=jnp.bfloat16)
    assert lo.dtype == jnp.float32 and np.isfinite(float(lo.sum()))
    for leaf in jax.tree_util.tree_leaves(new_p):
        assert leaf.dtype == jnp.float32
