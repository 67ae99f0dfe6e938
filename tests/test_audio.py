"""Audio front-end golden tests.

The oracle for `log_mel_spectrogram` is an independent torch implementation of
the published Whisper front-end formula (centered Hann STFT, drop last frame,
mel project, log10/clip/scale — whisperx/audio.py:112-159 semantics), built
here in the test from torch primitives. The mel filterbank is checked against
the reference's precomputed librosa asset when it is present on disk.
"""

import os

import numpy as np
import pytest

from whisperx_tpu.audio import (
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    load_audio,
    log_mel_spectrogram,
    mel_filters,
    pad_or_trim,
    write_wav,
)

REF_MEL_ASSET = "/root/reference/whisperx/assets/mel_filters.npz"


def _torch_oracle_logmel(audio: np.ndarray, n_mels: int) -> np.ndarray:
    import torch

    x = torch.from_numpy(audio)
    window = torch.hann_window(N_FFT)
    stft = torch.stft(x, N_FFT, HOP_LENGTH, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(mel_filters(n_mels))
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.numpy()


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_filters_match_reference_asset(n_mels):
    if not os.path.exists(REF_MEL_ASSET):
        pytest.skip("reference asset not available")
    with np.load(REF_MEL_ASSET) as f:
        ref = f[f"mel_{n_mels}"]
    ours = mel_filters(n_mels)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-8)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_torch_oracle(rng, n_mels):
    audio = (rng.standard_normal(N_SAMPLES) * 0.1).astype(np.float32)
    # Add a tone so the spectrum has structure.
    t = np.arange(N_SAMPLES) / SAMPLE_RATE
    audio += 0.5 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    ours = np.asarray(log_mel_spectrogram(audio, n_mels=n_mels))
    oracle = _torch_oracle_logmel(audio, n_mels)
    assert ours.shape == (n_mels, N_FRAMES)
    np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=1e-4)


def test_log_mel_batched_matches_single(rng):
    batch = (rng.standard_normal((3, N_SAMPLES)) * 0.1).astype(np.float32)
    batch[1] *= 20.0  # different dynamic range per sample
    batched = np.asarray(log_mel_spectrogram(batch, n_mels=80))
    for i in range(3):
        single = np.asarray(log_mel_spectrogram(batch[i], n_mels=80))
        np.testing.assert_allclose(batched[i], single, atol=1e-5)


def test_log_mel_padding(rng):
    audio = (rng.standard_normal(SAMPLE_RATE) * 0.1).astype(np.float32)
    out = np.asarray(log_mel_spectrogram(audio, n_mels=80, padding=SAMPLE_RATE))
    assert out.shape == (80, 2 * SAMPLE_RATE // HOP_LENGTH)


def test_pad_or_trim():
    x = np.ones(1000, np.float32)
    assert pad_or_trim(x).shape == (N_SAMPLES,)
    assert pad_or_trim(x, 500).shape == (500,)
    padded = pad_or_trim(x, 2000)
    assert padded[1500] == 0.0 and padded[500] == 1.0
    x2 = np.ones((2, 1000), np.float32)
    assert pad_or_trim(x2, 1200).shape == (2, 1200)


def test_wav_roundtrip(tmp_path, rng):
    audio = np.clip(rng.standard_normal(8000) * 0.3, -0.99, 0.99).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, audio, SAMPLE_RATE)
    loaded = load_audio(path)
    assert loaded.dtype == np.float32
    np.testing.assert_allclose(loaded, audio, atol=1e-3)


def test_wav_resample(tmp_path):
    sr_in = 44100
    t = np.arange(sr_in) / sr_in
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    path = str(tmp_path / "hi.wav")
    write_wav(path, tone, sr_in)
    out = load_audio(path)  # resampled to 16 kHz
    assert abs(len(out) - SAMPLE_RATE) <= 2
    # Dominant frequency preserved.
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * SAMPLE_RATE / len(out)
    assert abs(peak_hz - 440.0) < 2.0


def test_load_audio_stereo_downmix(tmp_path, rng):
    import struct

    sr = 16000
    left = (rng.standard_normal(1000) * 0.2).astype(np.float32)
    right = (rng.standard_normal(1000) * 0.2).astype(np.float32)
    inter = np.empty(2000, np.float32)
    inter[0::2], inter[1::2] = left, right
    pcm = np.clip(inter * 32767.0, -32768, 32767).astype("<i2")
    body = pcm.tobytes()
    path = tmp_path / "st.wav"
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16))
        f.write(b"data" + struct.pack("<I", len(body)) + body)
    out = load_audio(str(path))
    np.testing.assert_allclose(out, (left + right) / 2, atol=1e-3)


def test_log_mel_int16_input_matches_f32():
    """Integer waveforms convert to float32/32768 on device: bit-exact for
    s16le-grid audio (the reference's own decode contract, audio.py:44-61)."""
    import jax.numpy as jnp

    from whisperx_tpu.audio.io import pcm16
    from whisperx_tpu.audio.mel import log_mel_spectrogram

    rng = np.random.default_rng(0)
    # int16-grid audio: pcm16 round-trips exactly.
    ints = rng.integers(-32768, 32768, (2, 480000)).astype(np.int16)
    f32 = ints.astype(np.float32) / 32768.0
    assert np.array_equal(pcm16(f32), ints)

    mel_f = np.asarray(log_mel_spectrogram(jnp.asarray(f32)))
    mel_i = np.asarray(log_mel_spectrogram(jnp.asarray(ints)))
    np.testing.assert_array_equal(mel_i, mel_f)
