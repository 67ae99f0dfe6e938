"""Pallas fused log-mel vs. the XLA reference implementation.

Runs in interpreter mode on CPU (same numerics path as the compiled TPU
kernel modulo float assoc); the TPU-compiled variant is exercised by
benchmarks on hardware.
"""

import numpy as np
import pytest

from whisperx_tpu.audio import N_SAMPLES, log_mel_spectrogram
from whisperx_tpu.ops.pallas_mel import log_mel_pallas


@pytest.mark.parametrize("n_mels", [80, 128])
def test_pallas_mel_matches_xla(rng, n_mels):
    import jax.numpy as jnp

    audio = (rng.standard_normal((2, N_SAMPLES)) * 0.2).astype(np.float32)
    t = np.arange(N_SAMPLES) / 16000
    audio[0] += 0.4 * np.sin(2 * np.pi * 330 * t).astype(np.float32)

    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio), n_mels=n_mels))
    got = np.asarray(log_mel_pallas(jnp.asarray(audio), n_mels=n_mels, interpret=True))
    assert got.shape == ref.shape == (2, n_mels, 3000)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_pallas_mel_single_row(rng):
    import jax.numpy as jnp

    audio = (rng.standard_normal(N_SAMPLES) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio), n_mels=80))
    got = np.asarray(log_mel_pallas(jnp.asarray(audio), n_mels=80, interpret=True))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)
