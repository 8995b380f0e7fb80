"""Real-checkpoint golden harness: pin + re-check per-stage goldens on the
synthetic HF-format checkpoint (the same command runs against real
OneVision/memory weights when available)."""

import json

from tests.test_builder_roundtrip import ckpt_dir  # fixture


def test_pin_and_check_goldens(ckpt_dir, tmp_path):
    from memory_augmented_vlm_tpu.tools import pin_goldens

    out = tmp_path / "goldens.json"
    rc = pin_goldens.main(["--model-path", ckpt_dir, "--num-frames", "8",
                           "--out", str(out)])
    assert rc == 0
    golden = json.loads(out.read_text())
    assert golden["visual_token_count"] == golden["expected_visual_token_count"]
    assert golden["tower_features"]["shape"][0] == 8
    # re-check against itself: deterministic, must pass
    rc = pin_goldens.main(["--model-path", ckpt_dir, "--num-frames", "8",
                           "--check", str(out)])
    assert rc == 0


def test_check_detects_drift(ckpt_dir, tmp_path):
    from memory_augmented_vlm_tpu.tools import pin_goldens

    golden = pin_goldens.compute_goldens(ckpt_dir, num_frames=8)
    tampered = json.loads(json.dumps(golden))
    tampered["pooled_tokens"]["mean"] += 1.0
    tampered["first_token"]["argmax"] += 1
    errs = pin_goldens.check_goldens(golden, tampered)
    assert any("pooled_tokens.mean" in e for e in errs)
    assert any("first_token.argmax" in e for e in errs)
