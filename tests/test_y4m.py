"""Y4M (YUV4MPEG2) video decode: a real container through the full
`load_video` path (codec-free), native C++ decoder vs the numpy fallback,
and the reference frame-sampling rules applied to an actual video file
(process_video_with_decord contract, llava/utils.py:26-52)."""

import numpy as np
import pytest

from memory_augmented_vlm_tpu.data import video


def _synthetic(f=8, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish content: block gradients survive 4:2:0 chroma subsampling
    base = rng.integers(40, 216, (f, h // 8, w // 8, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 8, axis=1), 8, axis=2)


def test_y4m_roundtrip_close(tmp_path):
    frames = _synthetic()
    path = str(tmp_path / "clip.y4m")
    video.write_y4m(path, frames, fps=30)
    got, fps = video.load_y4m(path)
    assert fps == 30.0
    assert got.shape == frames.shape
    err = np.abs(got.astype(int) - frames.astype(int))
    # limited-range YUV420 round trip: small quantization error on flat blocks
    assert err.mean() < 3.0, err.mean()
    assert np.percentile(err, 99) <= 12


def test_native_decoder_matches_numpy(tmp_path):
    from memory_augmented_vlm_tpu.data.native_loader import (
        decode_y4m_native,
        native_available,
    )

    if not native_available():
        pytest.skip("native loader not built")
    frames = _synthetic(f=5)
    path = str(tmp_path / "clip.y4m")
    video.write_y4m(path, frames, fps=24)
    native = decode_y4m_native(path)
    assert native is not None, "fl_decode_y4m symbol missing (stale .so?)"
    got_native, fps_native = native

    # numpy fallback path (bypass the native fast path)
    with open(path, "rb") as fh:
        data = fh.read()
    import unittest.mock as mock

    with mock.patch(
        "memory_augmented_vlm_tpu.data.native_loader.decode_y4m_native",
        return_value=None,
    ):
        got_numpy, fps_numpy = video.load_y4m(path)
    assert fps_native == fps_numpy == 24.0
    diff = np.abs(got_native.astype(int) - got_numpy.astype(int))
    assert diff.max() <= 1, diff.max()  # only float-rounding differences


def test_load_video_y4m_applies_sampling_rules(tmp_path):
    # 40 frames at 1 fps -> 40 s -> the >=32 s rule: n = (t-1)//32 = 1 -> 32
    frames = _synthetic(f=40)
    path = str(tmp_path / "long.y4m")
    video.write_y4m(path, frames, fps=1)
    sampled, video_time, time_str, num = video.load_video(path)
    assert num == 32 and sampled.shape[0] == 32
    assert abs(video_time - 40.0) < 1e-6
    assert time_str.startswith("0.00s,")

    # short clip (<32 s): 1 fps sampling keeps 1 frame/sec
    short = _synthetic(f=6)
    spath = str(tmp_path / "short.y4m")
    video.write_y4m(spath, short, fps=2)  # 3 s video
    sampled, video_time, _, num = video.load_video(spath)
    assert abs(video_time - 3.0) < 1e-6
    assert num == 3  # every 2nd frame at 2 fps
