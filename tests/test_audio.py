"""ImageBind audio host preprocessing (data/audio.py) — the numpy stand-in
for `imagebind.data.load_and_transform_audio_data` (reference
llava/model/multimodal_encoder/imagebind.py:9,44-48).

No torchaudio oracle exists offline; numerics are pinned by analytic
properties: Kaldi frame geometry, mel filterbank partition-of-unity and tone
peak placement, ConstantClipsPerVideoSampler timepoints, and the ImageBind
normalization constants.
"""

import numpy as np
import pytest

from memory_augmented_vlm_tpu.data import audio


def _tone(freq, duration_s=2.0, sr=16000, amp=0.1):
    t = np.arange(int(duration_s * sr)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def test_fbank_frame_geometry():
    # 2 s @ 16 kHz, 25 ms window / 10 ms shift, snip_edges:
    # 1 + (32000 - 400) // 160 = 198 frames
    fb = audio.kaldi_fbank(_tone(440))
    assert fb.shape == (198, 128)
    # shorter than one window -> zero frames
    assert audio.kaldi_fbank(np.zeros(399)).shape == (0, 128)


def test_mel_banks_cover_spectrum():
    banks = audio.mel_banks(128, 512, 16000.0)
    assert banks.shape == (128, 257)
    # interior fft bins (above 20 Hz, below the top filter) are covered by
    # adjacent triangles summing to ~1 on the mel scale
    colsum = banks.sum(axis=0)
    lo = int(300 / (16000 / 512))   # 300 Hz on
    hi = 250                        # below the last filter edge
    assert (colsum[lo:hi] > 0.5).all()
    # Nyquist column is zero (Kaldi covers only nfft/2 bins)
    assert colsum[-1] == 0.0


@pytest.mark.parametrize("freq", [300.0, 1000.0, 4000.0])
def test_tone_peaks_at_matching_mel_bin(freq):
    """A pure tone's log-mel peak must land on the filter whose center is
    nearest the tone frequency."""
    fb = audio.kaldi_fbank(_tone(freq))
    peak_bin = int(np.bincount(fb.argmax(axis=1)).argmax())
    # expected: filter index whose center mel is nearest mel(freq)
    mel_low, mel_high = audio.mel_scale(20.0), audio.mel_scale(8000.0)
    delta = (mel_high - mel_low) / (128 + 1)
    centers = mel_low + (np.arange(128) + 1) * delta
    expect = int(np.argmin(np.abs(centers - audio.mel_scale(freq))))
    assert abs(peak_bin - expect) <= 1


def test_melspec_pad_and_truncate():
    m = audio.waveform_to_melspec(_tone(440, duration_s=2.0))
    assert m.shape == (1, 128, 204)
    # 198 real frames, 6 zero-padded
    assert np.all(m[0, :, 198:] == 0.0)
    long = audio.waveform_to_melspec(_tone(440, duration_s=3.0))
    assert long.shape == (1, 128, 204)
    assert not np.all(long[0, :, 198:] == 0.0)


def test_clip_timepoints_match_constant_clips_sampler():
    # duration 10 s, 2 s clips, 3 per video: starts at 0, 4, 8
    tp = audio.clip_timepoints(10.0)
    assert tp == [(0.0, 2.0), (4.0, 6.0), (8.0, 10.0)]
    # shorter than one clip: all three clips start at 0
    tp = audio.clip_timepoints(1.0)
    assert tp == [(0.0, 2.0), (0.0, 2.0), (0.0, 2.0)]


def test_load_and_transform_shapes_and_normalization():
    wav = _tone(440, duration_s=6.0)
    out = audio.load_and_transform_audio([wav, (wav, 16000)])
    assert out.shape == (2, 3, 1, 128, 204)
    assert out.dtype == np.float32
    # same input via the two entry forms must agree exactly
    np.testing.assert_array_equal(out[0], out[1])
    # normalization applied: un-normalizing the padded region must recover
    # log(eps)-scale values, not zeros
    un = out[0, 0, 0] * audio.NORM_STD + audio.NORM_MEAN
    assert np.isfinite(un).all()


def test_resample_preserves_tone():
    wav48 = _tone(1000, duration_s=1.0, sr=48000)
    wav16 = audio.resample(wav48, 48000, 16000)
    assert abs(wav16.shape[0] - 16000) <= 1
    spec = np.abs(np.fft.rfft(wav16[:16000]))
    assert abs(int(spec.argmax()) - 1000) <= 2


def test_feeds_imagebind_audio_tower():
    """End-to-end: host prep -> (B, mel, T, 1) -> forward_audio embedding."""
    import jax
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.models import imagebind

    cfg = imagebind.ImageBindConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        audio_hidden_size=32, audio_num_layers=2, audio_num_heads=4,
        embed_dim=16)
    params = imagebind.init_params(cfg, jax.random.key(0))
    mel = audio.load_and_transform_audio([_tone(440, duration_s=4.0)])
    clips = mel[0]                                 # (3, 1, 128, 204)
    x = jnp.asarray(clips.transpose(0, 2, 3, 1))   # (3, 128, 204, 1)
    emb = imagebind.forward_audio(params, cfg, x)
    assert emb.shape == (3, 1, 16)
    assert np.isfinite(np.asarray(emb)).all()
