"""Log-mel front-end, computed on-device as two MXU matmuls.

Numerically equivalent to the reference front-end (whisperx/audio.py:112-159):
centered reflect-padded Hann STFT (N_FFT=400, HOP=160), power spectrum with
the final frame dropped, Slaney-normalized mel projection, ``log10`` with a
1e-10 floor, dynamic-range clip to ``max - 8`` and affine scale ``(x+4)/4``.

TPU-first design notes:
- The STFT is *not* an FFT here. For N_FFT=400 the whole framed transform is
  one strided convolution against a dense windowed real-DFT basis
  (402 filters × 400 taps, stride 160) — a single MXU op that XLA fuses with
  the squared-magnitude and mel projection (201→n_mels); a radix FFT of
  length 400 would be a scalar-heavy VPU op, and explicit gather-based
  framing compiles poorly.
- Everything is shaped (batch, ...) with the dynamic-range max taken
  *per sample* (the reference computes mel per 30 s chunk, so its global max
  is per-chunk; batching must preserve that).
- The mel filterbank is computed from the standard Slaney formula rather than
  shipped as an asset; a golden test checks parity with the reference's
  precomputed librosa matrices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .constants import HOP_LENGTH, N_FFT, N_FREQS, SAMPLE_RATE


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney-style (librosa default, htk=False) Hz→mel."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freq >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    return np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


@functools.lru_cache(maxsize=None)
def mel_filters(n_mels: int, sr: int = SAMPLE_RATE, n_fft: int = N_FFT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2+1).

    Matches ``librosa.filters.mel(sr=16000, n_fft=400, n_mels=n_mels)`` — the
    matrices the reference ships as ``assets/mel_filters.npz``
    (whisperx/audio.py:94-109) — to float32 precision.
    """
    fmax = sr / 2.0
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(fmax), n_mels + 2))

    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: each filter integrates to ~constant energy.
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int = N_FFT) -> np.ndarray:
    """Windowed real-DFT basis, shape (n_fft, 2*n_freqs): [cos | -sin] columns.

    ``frames @ basis`` yields interleaved (real, imag) halves of the one-sided
    DFT of Hann-windowed frames. The periodic Hann window (torch default) is
    folded into the basis so framing needs no separate multiply.
    """
    n = np.arange(n_fft, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))  # periodic Hann
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)  # (n_fft, 2*n_freqs)
    return (basis * window[:, None]).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_mels", "padding"))
def log_mel_spectrogram(audio: jax.Array, n_mels: int = 80, padding: int = 0) -> jax.Array:
    """Compute Whisper log-mel features on device.

    Args:
      audio: waveform, shape (n_samples,) or (batch, n_samples). float32 in
        [-1, 1], or int16 PCM — integer inputs are converted to float32/32768
        on device (the relay upload is then half the bytes; audio decoded via
        the s16le contract round-trips exactly). The sample count must be a
        static multiple of HOP_LENGTH (pad on host with `pad_or_trim`; the
        standard path always feeds exactly 30 s = 480000).
      n_mels: 80 (most models) or 128 (large-v3).
      padding: zero samples appended before the STFT (reference parity knob).

    Returns:
      (n_mels, n_frames) or (batch, n_mels, n_frames) float32, where
      n_frames = (n_samples + padding) // HOP_LENGTH.
    """
    squeeze = audio.ndim == 1
    x = audio[None, :] if squeeze else audio
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32) / 32768.0
    else:
        x = x.astype(jnp.float32)
    if padding > 0:
        x = jnp.pad(x, ((0, 0), (0, padding)))

    n_samples = x.shape[1]
    n_frames = n_samples // HOP_LENGTH  # the final (n_frames+1)th frame is dropped
    half = N_FFT // 2
    # torch.stft(center=True) uses reflect padding of n_fft//2 on both ends.
    x = jnp.pad(x, ((0, 0), (half, half)), mode="reflect")

    # Framed windowed DFT as one strided conv: (B, 1, T) * (2*n_freqs, 1, n_fft).
    basis = jnp.asarray(_dft_basis())  # (n_fft, 2*n_freqs)
    kernels = basis.T[:, None, :]  # (out=2*n_freqs, in=1, width=n_fft)
    spec = jax.lax.conv_general_dilated(
        x[:, None, :],
        kernels,
        window_strides=(HOP_LENGTH,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )[:, :, :n_frames]  # (batch, 2*n_freqs, n_frames)
    power = spec[:, :N_FREQS, :] ** 2 + spec[:, N_FREQS:, :] ** 2

    filters = jnp.asarray(mel_filters(n_mels))  # (n_mels, n_freqs)
    mel = jnp.einsum(
        "bft,mf->bmt", power, filters, preferred_element_type=jnp.float32
    )  # (batch, n_mels, n_frames)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # Per-sample dynamic range clip (the reference computes mel per chunk, so
    # its tensor-global max is a per-chunk max; keep that under batching).
    max_per_sample = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_per_sample - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec[0] if squeeze else log_spec
