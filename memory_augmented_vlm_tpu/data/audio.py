"""Host-side audio preprocessing for the ImageBind audio tower.

The reference calls `imagebind.data.load_and_transform_audio_data`
(llava/model/multimodal_encoder/imagebind.py:9,44-48), which is
torchaudio-based host prep: clip sampling (pytorchvideo
ConstantClipsPerVideoSampler), Kaldi-compatible log-mel filterbanks
(torchaudio.compliance.kaldi.fbank with htk_compat=True, hanning window,
dither=0, 25 ms frames / 10 ms shift), padding/truncation to a fixed frame
count, and (x - mean) / std normalization with ImageBind's constants.

torchaudio is not available in this image, so the fbank is implemented in
numpy to the same algorithm (Kaldi semantics: DC removal, 0.97 preemphasis
with edge-replicated first sample, per-frame hanning window, zero-pad to the
next power of two for the FFT, triangular mel banks on the 1127*ln(1+f/700)
scale between 20 Hz and Nyquist, log with eps floor). tests/test_audio.py
pins the numerics three ways: analytic properties (tone peak placement,
frame geometry, clip timepoints), frozen golden vectors, and an
INDEPENDENTLY-CONSTRUCTED second implementation of the same Kaldi spec
(scipy window/fft + np.interp mel triangles, `_oracle_fbank`) that agrees
to 1e-6 — so a bug would have to be made twice, by different code, to pass.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import numpy as np

# ImageBind constants (imagebind/data.py::load_and_transform_audio_data)
SAMPLE_RATE = 16000
NUM_MEL_BINS = 128
TARGET_LENGTH = 204
CLIP_DURATION_S = 2.0
CLIPS_PER_VIDEO = 3
NORM_MEAN = -4.268
NORM_STD = 9.138

_EPS = float(np.finfo(np.float64).eps)


def _next_power_of_two(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def mel_scale(freq):
    """Kaldi mel scale: 1127 * ln(1 + f/700)."""
    return 1127.0 * np.log1p(np.asarray(freq, np.float64) / 700.0)


def mel_banks(num_bins: int, window_length_padded: int, sample_freq: float,
              low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi triangular mel filterbank, (num_bins, window_length_padded // 2 + 1).

    Mirrors torchaudio.compliance.kaldi.get_mel_banks: the filters cover the
    first nfft/2 bins; the Nyquist bin gets zero weight.
    """
    num_fft_bins = window_length_padded // 2
    if high_freq <= 0.0:
        high_freq = sample_freq / 2.0 + high_freq
    fft_bin_width = sample_freq / window_length_padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    centers = mel_low + np.arange(num_bins + 2, dtype=np.float64) * mel_delta
    left, center, right = centers[:-2], centers[1:-1], centers[2:]
    mel = mel_scale(fft_bin_width * np.arange(num_fft_bins))    # (F,)
    up = (mel[None, :] - left[:, None]) / (center - left)[:, None]
    down = (right[:, None] - mel[None, :]) / (right - center)[:, None]
    banks = np.maximum(0.0, np.minimum(up, down))
    return np.pad(banks, ((0, 0), (0, 1)))                      # zero Nyquist


def kaldi_fbank(
    waveform: np.ndarray,
    sample_rate: int = SAMPLE_RATE,
    num_mel_bins: int = NUM_MEL_BINS,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
) -> np.ndarray:
    """torchaudio.compliance.kaldi.fbank(htk_compat=True, use_energy=False,
    window_type="hanning", dither=0.0) in numpy.

    waveform: (num_samples,) float. Returns (num_frames, num_mel_bins)
    log-mel energies; zero frames if the waveform is shorter than a window.
    """
    waveform = np.asarray(waveform, np.float64).reshape(-1)
    window_size = int(sample_rate * frame_length_ms / 1000.0)
    window_shift = int(sample_rate * frame_shift_ms / 1000.0)
    n = waveform.shape[0]
    if n < window_size:
        return np.zeros((0, num_mel_bins), np.float32)
    m = 1 + (n - window_size) // window_shift                   # snip_edges
    idx = (np.arange(m)[:, None] * window_shift
           + np.arange(window_size)[None, :])
    frames = waveform[idx]                                      # (m, W)
    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis != 0.0:
        prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * prev
    # periodic=False hann window (torch.hann_window(window_size, False))
    window = 0.5 - 0.5 * np.cos(
        2.0 * np.pi * np.arange(window_size) / (window_size - 1))
    frames = frames * window[None, :]
    padded = _next_power_of_two(window_size)                    # 512 @ 16 kHz
    spectrum = np.abs(np.fft.rfft(frames, n=padded, axis=1)) ** 2
    banks = mel_banks(num_mel_bins, padded, float(sample_rate))
    mel_energies = spectrum @ banks.T                           # (m, bins)
    return np.log(np.maximum(mel_energies, _EPS)).astype(np.float32)


def waveform_to_melspec(waveform: np.ndarray,
                        sample_rate: int = SAMPLE_RATE,
                        num_mel_bins: int = NUM_MEL_BINS,
                        target_length: int = TARGET_LENGTH) -> np.ndarray:
    """ImageBind's waveform2melspec: mean-subtract, fbank, (mel, T) layout,
    right-pad with zeros / truncate to `target_length` frames.

    Returns (1, num_mel_bins, target_length) float32.
    """
    waveform = np.asarray(waveform, np.float64).reshape(-1)
    waveform = waveform - waveform.mean()
    fb = kaldi_fbank(waveform, sample_rate, num_mel_bins).T     # (mel, T)
    t = fb.shape[1]
    if t < target_length:
        fb = np.pad(fb, ((0, 0), (0, target_length - t)))
    elif t > target_length:
        fb = fb[:, :target_length]
    return fb[None].astype(np.float32)


def clip_timepoints(duration_s: float,
                    clip_duration: float = CLIP_DURATION_S,
                    clips_per_video: int = CLIPS_PER_VIDEO
                    ) -> List[Tuple[float, float]]:
    """pytorchvideo ConstantClipsPerVideoSampler: starts spaced uniformly
    over [0, max(duration - clip, 0)], always `clips_per_video` clips."""
    max_start = max(duration_s - clip_duration, 0.0)
    step = max_start / max(clips_per_video - 1, 1)
    return [(i * step, i * step + clip_duration)
            for i in range(clips_per_video)]


def resample(waveform: np.ndarray, orig_sr: int,
             new_sr: int = SAMPLE_RATE) -> np.ndarray:
    """Polyphase resampling (scipy) — the role of torchaudio.functional
    .resample (windowed-sinc); numerically close, not bit-identical."""
    if orig_sr == new_sr:
        return np.asarray(waveform, np.float64)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(int(orig_sr), int(new_sr))
    return resample_poly(np.asarray(waveform, np.float64),
                         new_sr // g, orig_sr // g)


def _read_audio(item) -> Tuple[np.ndarray, int]:
    """Accept a .wav path, a .npy path (16 kHz float waveform), a raw
    array (assumed 16 kHz), or an (array, sample_rate) tuple."""
    if isinstance(item, tuple):
        arr, sr = item
        return np.asarray(arr, np.float64), int(sr)
    if isinstance(item, str):
        if item.endswith(".npy"):
            return np.load(item).astype(np.float64), SAMPLE_RATE
        from scipy.io import wavfile

        sr, data = wavfile.read(item)
        if np.issubdtype(data.dtype, np.integer):
            info = np.iinfo(data.dtype)
            data = data.astype(np.float64) / max(abs(info.min), info.max)
        else:
            data = np.asarray(data, np.float64)
        if data.ndim == 2:
            data = data.mean(axis=1)
        return data, int(sr)
    return np.asarray(item, np.float64), SAMPLE_RATE


def load_and_transform_audio(
    audios: Sequence[Union[str, np.ndarray, Tuple[np.ndarray, int]]],
    num_mel_bins: int = NUM_MEL_BINS,
    target_length: int = TARGET_LENGTH,
    sample_rate: int = SAMPLE_RATE,
    clip_duration: float = CLIP_DURATION_S,
    clips_per_video: int = CLIPS_PER_VIDEO,
    mean: float = NORM_MEAN,
    std: float = NORM_STD,
) -> np.ndarray:
    """`load_and_transform_audio_data` parity: per input, sample
    `clips_per_video` 2 s clips, mel-transform each, normalize.

    Returns (N, clips_per_video, 1, num_mel_bins, target_length) float32 —
    flatten the first two dims to feed `models.imagebind.forward_audio`
    ((B, mel, T, 1) after a transpose) and average/keep clips as the caller
    requires (the reference feeds all clips and lets the tower embed each).
    """
    out = []
    for item in audios:
        waveform, sr = _read_audio(item)
        if waveform.ndim == 2:
            waveform = waveform.mean(axis=0)
        if sr != sample_rate:
            waveform = resample(waveform, sr, sample_rate)
        duration = waveform.shape[0] / sample_rate
        clips = []
        for start, end in clip_timepoints(duration, clip_duration,
                                          clips_per_video):
            clip = waveform[int(start * sample_rate): int(end * sample_rate)]
            mel = waveform_to_melspec(clip, sample_rate, num_mel_bins,
                                      target_length)
            clips.append((mel - mean) / std)
        out.append(np.stack(clips, axis=0))
    return np.stack(out, axis=0).astype(np.float32)
