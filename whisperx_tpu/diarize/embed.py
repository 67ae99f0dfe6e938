"""Speaker-embedding extraction, on device.

TPU-native replacement for the embedding stage of pyannote's
speaker-diarization-3.1 (whisperx/diarize.py:19,28 runs it opaquely in
torch). Two backends:

- ``ResNet34Embedding``: the WeSpeaker r34 speaker network (conv stem, 4
  residual stages [3,4,6,3] over an 80-mel fbank "image", temporal
  statistics pooling, linear projection) in Flax — the architecture behind
  the checkpoint pyannote 3.1 ships; a converter in models/convert.py-style
  mapping loads it when present.
- ``MelStatsEmbedding``: weight-free fallback (log-mel moment statistics +
  delta features), enough to separate distinct speakers offline and to keep
  the full pipeline runnable with zero checkpoints.

Embeddings for all windows of a file are computed as one batched jit call.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..audio.constants import SAMPLE_RATE


def _window_logmel(wavs: jax.Array, n_mels: int = 80) -> jax.Array:
    """(B, T) waveforms → (B, frames, n_mels) log-mel features."""
    from ..audio.mel import log_mel_spectrogram

    mel = log_mel_spectrogram(wavs, n_mels=n_mels)  # (B, n_mels, frames)
    return mel.transpose(0, 2, 1)


class ResBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride), padding=1, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9)(y)
        if self.stride != 1 or x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride), use_bias=False, name="downsample_conv")(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9, name="downsample_bn")(x)
        return nn.relu(x + y)


class ResNet34Embedding(nn.Module):
    """WeSpeaker-style r34: fbank image → 256-d speaker embedding."""

    embed_dim: int = 256
    base_channels: int = 32
    stage_blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        # feats: (B, T, F=80) → image (B, T, F, 1)
        x = feats[..., None]
        x = nn.Conv(self.base_channels, (3, 3), padding=1, use_bias=False, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9, name="stem_bn")(x)
        x = nn.relu(x)
        ch = self.base_channels
        for s, blocks in enumerate(self.stage_blocks):
            for b in range(blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                x = ResBlock(ch, stride=stride, name=f"stage{s}_block{b}")(x)
            ch *= 2
        # x: (B, T', F', C) → flatten freq into channels, stats-pool over time
        B, T, F, C = x.shape
        x = x.transpose(0, 1, 3, 2).reshape(B, T, C * F)
        mean = jnp.mean(x, axis=1)
        std = jnp.sqrt(jnp.clip(jnp.var(x, axis=1), 1e-7, None))
        stats = jnp.concatenate([mean, std], axis=-1)
        return nn.Dense(self.embed_dim, name="embedding")(stats)


from ..utils import bucket_rows as _bucket_rows


class NeuralSpeakerEmbedding:
    """Batched window → embedding inference wrapper.

    The jitted forward is built once (per instance) and window batches are
    padded to a row granule — otherwise every distinct window count would be
    a fresh compile signature (minutes each on a remote TPU relay).
    """

    def __init__(self, model: nn.Module, variables, n_mels: int = 80):
        self.model = model
        self.variables = variables  # {"params": ..., "batch_stats": ...}
        self.n_mels = n_mels

        def fwd(variables, wavs):
            feats = _window_logmel(wavs, self.n_mels)
            emb = self.model.apply(variables, feats)
            return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        self._fwd = jax.jit(fwd)

    def __call__(self, windows: np.ndarray) -> np.ndarray:  # (B, T) -> (B, D)
        B = windows.shape[0]
        padded = np.zeros((_bucket_rows(B), windows.shape[1]), windows.dtype)
        padded[:B] = windows
        return np.asarray(self._fwd(self.variables, jnp.asarray(padded)))[:B]


def _melstats_fwd(wavs):
    feats = _window_logmel(wavs)  # (B, T, 80)
    mean = jnp.mean(feats, axis=1)
    std = jnp.std(feats, axis=1)
    delta = feats[:, 1:] - feats[:, :-1]
    dmean = jnp.mean(jnp.abs(delta), axis=1)
    # Spectral centroid-ish summary per frame bank.
    emb = jnp.concatenate([mean, std, dmean], axis=-1)
    emb = emb - jnp.mean(emb, axis=-1, keepdims=True)
    return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)


_melstats_fwd_jit = jax.jit(_melstats_fwd)


class MelStatsEmbedding:
    """Weight-free embedding: log-mel moments + deltas, L2-normalized."""

    def __call__(self, windows: np.ndarray) -> np.ndarray:
        B = windows.shape[0]
        padded = np.zeros((_bucket_rows(B), windows.shape[1]), windows.dtype)
        padded[:B] = windows
        return np.asarray(_melstats_fwd_jit(jnp.asarray(padded)))[:B]


def init_resnet34_params(seed: int = 0, embed_dim: int = 256):
    """Random-init r34 variables (tests/benchmarks without weights)."""
    model = ResNet34Embedding(embed_dim=embed_dim)
    feats = jax.ShapeDtypeStruct((1, 150, 80), jnp.float32)
    shapes = jax.eval_shape(lambda f: model.init(jax.random.PRNGKey(0), f), feats)
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    out = []
    for kp, sd in leaves:
        name = str(kp[-1].key) if hasattr(kp[-1], "key") else str(kp[-1])
        if name in ("scale", "var"):
            arr = np.ones(sd.shape, np.float32)
        elif name in ("bias", "mean"):
            arr = np.zeros(sd.shape, np.float32)
        else:
            arr = (rng.standard_normal(sd.shape) * 0.05).astype(np.float32)
        out.append(jnp.asarray(arr))
    variables = jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(shapes), out)
    return model, variables
