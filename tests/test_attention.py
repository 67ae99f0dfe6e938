"""Parity tests for the fused (flash) self-attention wrapper.

The Pallas kernel runs in interpret mode on CPU; outputs must match the
naive XLA path (the exact math the models used before) to bf16 tolerance,
including sequence-length padding and key-validity masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisperx_tpu.ops.attention import _naive, fused_self_attention


def _mk(B, T, H, Dh, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, H, Dh)) * 0.3, dtype)
    k = jnp.asarray(rng.standard_normal((B, T, H, Dh)) * 0.3, dtype)
    v = jnp.asarray(rng.standard_normal((B, T, H, Dh)) * 0.5, dtype)
    return q, k, v


@pytest.mark.parametrize("T", [512, 200])  # exact block multiple + padded tail
def test_flash_matches_naive(T):
    q, k, v = _mk(1, T, 2, 128)
    want = _naive(q, k, v, None, -1e9)
    got = fused_self_attention(q, k, v, impl="flash", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3)


def test_flash_matches_naive_pad_mask():
    T = 256
    q, k, v = _mk(1, T, 2, 128, seed=1)
    pad_mask = jnp.asarray(np.arange(T) < 190)[None, :]
    want = _naive(q, k, v, pad_mask, -1e9)
    got = fused_self_attention(q, k, v, pad_mask, impl="flash", interpret=True)
    # Only rows that downstream consumers read (all rows here — the naive
    # path lets every query attend the valid keys) must match.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3)


def test_auto_resolves_xla_on_cpu():
    from whisperx_tpu.ops.attention import resolve_attn_impl

    assert jax.default_backend() == "cpu"
    assert resolve_attn_impl("auto") == "xla"
    q, k, v = _mk(2, 64, 2, 16, seed=2)
    want = _naive(q, k, v, None, -1e9)
    got = fused_self_attention(q, k, v)  # auto → xla on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
