"""On-device VAD segmentation network (PyanNet-style) in Flax.

TPU-native replacement for the pyannote segmentation model the reference
downloads and runs through torch (whisperx/vad.py:18-59,238). Architecture
mirrors the public PyanNet recipe so the pinned checkpoint can be converted:

  waveform → InstanceNorm → SincNet (sinc band-pass conv s10 → |·| → maxpool3
  → InstanceNorm → leaky-ReLU; two plain conv blocks) → 4-layer BiLSTM(128)
  → 2×Linear(128)+leaky-ReLU → Linear(num_classes) → sigmoid.

Design notes:
- The sinc filterbank is *constructed on device* from (low_hz, band_hz)
  parameters each call — it's 80×251 floats, negligible — so converted
  checkpoints keep their exact parameterization.
- The LSTM is a `lax.scan` over time per direction. Recurrence is inherently
  sequential; at 59 fps over ≤293-frame windows this is tiny, and all windows
  of a long file run as one batch, which is where the parallelism lives.
- Conv arithmetic gives one output frame per 270 samples (16.875 ms) with a
  991-sample receptive field; `frame_centers` exposes the timestamp grid the
  binarizer consumes.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Conv stack geometry (matches the PyanNet SincNet recipe).
SINC_FILTERS = 80
SINC_KERNEL = 251
SINC_STRIDE = 10
FRAME_STEP = 270  # samples between output frames (10*3*3*3)
FRAME_SIZE = 991  # receptive field in samples


def num_frames(n_samples: int) -> int:
    t = (n_samples - SINC_KERNEL) // SINC_STRIDE + 1
    t = t // 3
    t = t - 4
    t = t // 3
    t = t - 4
    return t // 3


def frame_centers(n_samples: int, sample_rate: int = 16000) -> np.ndarray:
    """Center time (s) of each output frame's receptive field."""
    n = num_frames(n_samples)
    return ((np.arange(n) * FRAME_STEP) + FRAME_SIZE / 2) / sample_rate


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over time (affine)."""

    channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (B, T, C)
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


def _mel_init_low_hz(key, shape, dtype=jnp.float32):
    """Mel-spaced initial low cutoff frequencies (standard SincNet init)."""
    n = shape[0]
    low_hz, high_hz = 30.0, 16000 / 2 - 130.0
    mel = np.linspace(2595 * np.log10(1 + low_hz / 700), 2595 * np.log10(1 + high_hz / 700), n + 1)
    hz = 700 * (10 ** (mel / 2595) - 1)
    return jnp.asarray(hz[:-1].reshape(shape), dtype)


def _mel_init_band_hz(key, shape, dtype=jnp.float32):
    n = shape[0]
    low_hz, high_hz = 30.0, 16000 / 2 - 130.0
    mel = np.linspace(2595 * np.log10(1 + low_hz / 700), 2595 * np.log10(1 + high_hz / 700), n + 1)
    hz = 700 * (10 ** (mel / 2595) - 1)
    return jnp.asarray(np.diff(hz).reshape(shape), dtype)


class SincConv(nn.Module):
    """Learnable band-pass filterbank (SincNet); filters built on device."""

    filters: int = SINC_FILTERS
    kernel: int = SINC_KERNEL
    stride: int = SINC_STRIDE
    sample_rate: int = 16000
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (B, T, 1) -> (B, T', filters)
        low_hz = self.param("low_hz", _mel_init_low_hz, (self.filters, 1), jnp.float32)
        band_hz = self.param("band_hz", _mel_init_band_hz, (self.filters, 1), jnp.float32)

        low = self.min_low_hz + jnp.abs(low_hz)
        high = jnp.clip(
            low + self.min_band_hz + jnp.abs(band_hz), self.min_low_hz, self.sample_rate / 2
        )
        band = (high - low)[:, 0]

        half = (self.kernel - 1) // 2
        n = jnp.arange(-half, 0, dtype=jnp.float32)[None, :]  # left half
        n_2pi = 2 * jnp.pi * n / self.sample_rate
        # Hamming window over the left half.
        window = 0.54 - 0.46 * jnp.cos(
            2 * jnp.pi * jnp.arange(half, dtype=jnp.float32) / self.kernel
        )[None, :]

        f_low = low * n_2pi  # (filters, half)
        f_high = high * n_2pi
        bp_left = ((jnp.sin(f_high) - jnp.sin(f_low)) / (n_2pi / 2)) * window
        bp_center = 2 * band[:, None]
        filters = jnp.concatenate([bp_left, bp_center, bp_left[:, ::-1]], axis=1)
        filters = filters / (2 * band[:, None])  # (filters, kernel)

        kernels = filters.T[:, None, :].transpose(2, 1, 0)  # (kernel, 1, filters)
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            filters[:, None, :].transpose(2, 1, 0),
            window_strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NTC", "TIO", "NTC"),
        )


def _max_pool_time(x: Array, k: int) -> Array:
    """(B, T, C) max pool over time, stride k, VALID."""
    T = (x.shape[1] // k) * k
    x = x[:, :T].reshape(x.shape[0], T // k, k, x.shape[2])
    return jnp.max(x, axis=2)


class LSTMLayer(nn.Module):
    """Single-direction LSTM via lax.scan (PyTorch gate order i,f,g,o)."""

    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (B, T, D) -> (B, T, H)
        B, T, D = x.shape
        H = self.hidden
        w_ih = self.param("w_ih", nn.initializers.lecun_normal(), (4 * H, D), jnp.float32)
        w_hh = self.param("w_hh", nn.initializers.lecun_normal(), (4 * H, H), jnp.float32)
        b_ih = self.param("b_ih", nn.initializers.zeros, (4 * H,), jnp.float32)
        b_hh = self.param("b_hh", nn.initializers.zeros, (4 * H,), jnp.float32)

        # Hoist the input projection out of the scan: one big MXU matmul.
        x_proj = jnp.einsum("btd,gd->btg", x, w_ih, preferred_element_type=jnp.float32) + b_ih

        def step(carry, xt):
            h, c = carry
            gates = xt + h @ w_hh.T + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((B, H), jnp.float32)
        xs = x_proj.transpose(1, 0, 2)  # (T, B, 4H)
        _, hs = jax.lax.scan(step, (h0, h0), xs, reverse=self.reverse)
        return hs.transpose(1, 0, 2)


class BiLSTM(nn.Module):
    hidden: int
    layers: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.layers):
            fwd = LSTMLayer(self.hidden, name=f"fwd_{i}")(x)
            bwd = LSTMLayer(self.hidden, reverse=True, name=f"bwd_{i}")(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return x


class PyanNetVAD(nn.Module):
    """Full segmentation net: waveform (B, T) → frame scores (B, T', C)."""

    num_classes: int = 3
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_units: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, audio: Array) -> Array:
        x = audio[:, :, None].astype(jnp.float32)  # (B, T, 1)
        x = InstanceNorm(1, name="wav_norm")(x)

        x = SincConv(name="sinc")(x)
        x = jnp.abs(x)
        x = _max_pool_time(x, 3)
        x = InstanceNorm(SINC_FILTERS, name="norm_0")(x)
        x = nn.leaky_relu(x)

        for i, ch in enumerate([60, 60]):
            x = nn.Conv(ch, kernel_size=(5,), padding="VALID", name=f"conv_{i + 1}")(x)
            x = _max_pool_time(x, 3)
            x = InstanceNorm(ch, name=f"norm_{i + 1}")(x)
            x = nn.leaky_relu(x)

        x = BiLSTM(self.lstm_hidden, self.lstm_layers, name="lstm")(x)
        for i, units in enumerate(self.linear_units):
            x = nn.leaky_relu(nn.Dense(units, name=f"linear_{i}")(x))
        x = nn.Dense(self.num_classes, name="classifier")(x)
        return jax.nn.sigmoid(x)


def init_vad_params(seed: int = 0, num_classes: int = 3):
    model = PyanNetVAD(num_classes=num_classes)
    audio = jnp.zeros((1, 16000), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), audio)["params"]
    return model, params
