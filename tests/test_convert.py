"""Architectural parity: converted torch (HF) weights reproduce the torch
forward in our Flax backbones — proves the Flax re-implementations are
layer-exact and checkpoint conversion is mechanical."""

import os

# Both torch-CPU and XLA-CPU route f32 convs through oneDNN, whose algorithm
# choices drift ~1e-2 over deep nets. The parity tests therefore run BOTH
# sides in float64, where convolutions are exact-reference and a strict
# tolerance is meaningful. (On TPU vs torch-with-oneDNN-off the f32 forward
# matches to 0.0 — verified manually.)
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _to_f64(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float64), tree)


@pytest.mark.slow
def test_efficientnet_b0_matches_hf_forward():
    import jax.numpy as jnp
    from transformers import EfficientNetConfig, EfficientNetModel

    from mmtrs_tpu.models.backbones.convert import efficientnet_from_hf
    from mmtrs_tpu.models.backbones.efficientnet import EfficientNet

    torch.manual_seed(0)
    hf = EfficientNetModel(
        EfficientNetConfig(width_coefficient=1.0, depth_coefficient=1.0,
                           hidden_dim=1280,  # HF default is b7's 2560
                           image_size=64, drop_connect_rate=0.0)
    ).eval()

    hf = hf.double()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3))

    with torch.no_grad():
        out = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        # pooled output applies HF's pooler; compare pre-pool features
        # averaged ourselves for a pooling-free comparison
        want = out.last_hidden_state.mean(dim=(2, 3)).numpy()

    variables = _to_f64(efficientnet_from_hf(hf.state_dict(), "b0"))
    import jax

    with jax.enable_x64():
        model = EfficientNet(variant="b0", num_classes=0, drop_path_rate=0.0,
                             dtype=jnp.float64)
        got = np.asarray(
            model.apply(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
                jnp.asarray(x, jnp.float64), train=False,
            )
        )
    # residue ≈1e-5: the module intentionally casts pooled features to f32
    # (its public contract) + conv reassociation; wiring errors would be O(1)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_convnext_tiny_matches_hf_forward():
    import jax.numpy as jnp
    from transformers import ConvNextConfig, ConvNextModel

    from mmtrs_tpu.models.backbones.convert import convnext_from_hf
    from mmtrs_tpu.models.backbones.convnext import ConvNeXt

    torch.manual_seed(1)
    hf = ConvNextModel(
        ConvNextConfig(depths=[3, 3, 9, 3], hidden_sizes=[96, 192, 384, 768],
                       drop_path_rate=0.0)
    ).eval()

    hf = hf.double()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 64, 3))
    with torch.no_grad():
        out = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        # HF pooler = layernorm(mean-pool); identical to our head path
        want = out.pooler_output.numpy()

    variables = _to_f64(convnext_from_hf(hf.state_dict(), "tiny", v2=False))
    import jax

    with jax.enable_x64():
        model = ConvNeXt(variant="tiny", v2=False, num_classes=0,
                         drop_path_rate=0.0, dtype=jnp.float64)
        got = np.asarray(model.apply(variables, jnp.asarray(x, jnp.float64),
                                     train=False))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
