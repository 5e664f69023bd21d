"""Backbones, MIL, MM joint model: shapes, init, gradient flow.

Real backbones (EfficientNet/ConvNeXt) are exercised once each at tiny
resolution; trainer-path tests use the contract-identical ``test_cnn``
backbone (see tinynet.py) because full-CNN XLA compiles dominate wall-time
on the 1-vCPU test machine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrs_tpu.models.backbones.factory import MODEL_REGISTRY, create_model, feature_dim
from mmtrs_tpu.models.mil import MILNet, make_bags
from mmtrs_tpu.models.mm_joint import MMJointDualHead
from tests.synth import synth_images


def _init(model, *shapes):
    return model.init(
        jax.random.key(0), *(jnp.zeros(s, jnp.float32) for s in shapes), train=False
    )


def test_registry_covers_reference_names():
    for name in (
        "efficientnet_b0", "efficientnet_b3", "efficientnet_b4",
        "tf_efficientnet_b4_ns", "convnext_tiny", "convnextv2_base", "test_cnn",
    ):
        assert name in MODEL_REGISTRY


def test_efficientnet_b0_full_contract():
    """One compile of the real B0: logits shape, pooled features, param
    count, BatchNorm mutation, head-bias init."""
    m = create_model("efficientnet_b0", num_classes=2, dtype=jnp.float32,
                     head_bias_init=-1.5)
    v = _init(m, (2, 32, 32, 3))
    out = m.apply(v, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(
        np.asarray(v["params"]["classifier"]["bias"]), -1.5
    )
    n = sum(x.size for x in jax.tree.leaves(v["params"]))
    # reference EfficientNet-B0 ≈ 4.0M features + head
    assert 3.5e6 < n < 6.0e6, n

    x = jnp.asarray(synth_images(2, 32, seed=1).astype(np.float32))
    out2, mut = m.apply(v, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(1)})
    before = jax.tree.leaves(v["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    assert any(
        not np.array_equal(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )


def test_efficientnet_feature_dims():
    assert feature_dim("efficientnet_b0") == 1280
    assert feature_dim("efficientnet_b4") == 1792  # round_channels(1280·1.4)


def test_convnext_shapes():
    m = create_model("convnextv2_tiny", num_classes=1, dtype=jnp.float32)
    v = _init(m, (2, 32, 32, 3))
    out = m.apply(v, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 1)


def test_tinynet_contract():
    m = create_model("test_cnn", num_classes=0, dtype=jnp.float32)
    v = _init(m, (2, 32, 32, 3))
    f = m.apply(v, jnp.zeros((2, 32, 32, 3)), train=False)
    assert f.shape == (2, feature_dim("test_cnn"))


def test_mil_net_forward_and_bags():
    imgs = jnp.asarray(synth_images(3, 64, seed=2).astype(np.float32))
    keys = jax.random.split(jax.random.key(0), 3)
    bags = make_bags(imgs, keys, bag_size=4, out_size=32)
    assert bags.shape == (3, 4, 32, 32, 3)
    assert float(bags.min()) >= 0.0 and float(bags.max()) <= 255.0

    m = MILNet(model_name="test_cnn", attn_dim=16, dtype=jnp.float32)
    v = m.init(jax.random.key(0), jnp.zeros((2, 4, 32, 32, 3)), train=False)
    logit, attn = m.apply(v, bags[:2] / 255.0, train=False)
    assert logit.shape == (2,)
    assert attn.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


def test_mm_joint_forward_and_grads():
    m = MMJointDualHead(model_name="test_cnn", dtype=jnp.float32)
    v = m.init(
        jax.random.key(0), jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 9)), train=False
    )
    lc, lr = m.apply(v, jnp.ones((2, 32, 32, 3)), jnp.ones((2, 9)), train=False)
    assert lc.shape == (2,) and lr.shape == (2,)

    def loss(params):
        lc, lr = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            jnp.ones((2, 32, 32, 3)), jnp.ones((2, 9)), train=False,
        )
        return jnp.mean(lc**2) + jnp.mean(lr**2)

    g = jax.grad(loss)(v["params"])
    assert float(jnp.abs(jax.tree.leaves(g["tab_mlp"])[0]).max()) > 0
    gnorms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
    assert max(gnorms) > 0
