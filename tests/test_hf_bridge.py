"""`hf:` any-architecture tower via the host torch bridge
(models/hf_bridge.py) — closes the reference's wrap-anything surface
(hf_vision.py:1-111): an architecture with NO native TPU tower (here a
stock transformers ViTModel) loads from a local checkpoint dir, encodes
under jit through jax.pure_callback, and matches the torch forward's
hidden_states[-2][:, 1:] exactly."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from memory_augmented_vlm_tpu.models import encoders  # noqa: E402


@pytest.fixture(scope="module")
def vit_ckpt(tmp_path_factory):
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(0)
    cfg = ViTConfig(hidden_size=32, num_hidden_layers=3,
                    num_attention_heads=4, intermediate_size=64,
                    image_size=28, patch_size=14)
    model = ViTModel(cfg).eval()
    path = tmp_path_factory.mktemp("hf_bridge") / "tiny-vit"
    model.save_pretrained(str(path))
    return str(path), model


def test_unknown_arch_dispatches_to_bridge(vit_ckpt):
    path, _ = vit_ckpt
    tower = encoders.build_vision_tower(f"hf:{path}")
    assert tower.family == "hf_bridge"
    assert tower.hidden_size == 32
    assert tower.num_patches_per_side == 2
    assert tower.image_size == 28
    assert tower.init_params(jax.random.key(0), jnp.float32) == {}


def test_bridge_forward_matches_torch(vit_ckpt):
    path, model = vit_ckpt
    tower = encoders.build_vision_tower(f"hf:{path}")
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)

    with torch.no_grad():
        out = model(torch.asarray(pixels.transpose(0, 3, 1, 2)),
                    output_hidden_states=True)
    want = out.hidden_states[-2][:, 1:].numpy()  # select_layer -2, patch

    # under jit: pure_callback round-trips to the host torch module
    got = np.asarray(jax.jit(tower.forward)({}, jnp.asarray(pixels)))
    assert got.shape == (2, 4, 32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_native_families_still_dispatch_natively(vit_ckpt):
    # the bridge must not shadow the native fast paths
    assert encoders.build_vision_tower(
        "google/siglip-so400m-patch14-384").family == "siglip"
    assert encoders.build_vision_tower("hf:some/siglip-thing").family == "siglip"
