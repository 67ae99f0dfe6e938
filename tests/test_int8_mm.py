"""Parity for the Pallas int8 weight-matmul kernel (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from whisperx_tpu.ops.pallas_int8_mm import int8_matmul


def test_int8_matmul_matches_xla_math():
    rng = np.random.default_rng(0)
    M, K, N = 40, 256, 640
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.02, (N,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((N,)) * 0.1, jnp.float32)

    want = (
        jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32)) * scale + bias
    )
    got = int8_matmul(x, w, scale, bias, out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.5, rtol=0.02
    )


def test_dense_pallas_path_matches(monkeypatch):
    """Quantized Dense via the kernel equals the XLA int8 path."""
    import jax

    from whisperx_tpu.models.whisper import Dense

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 5, 128)) * 0.5, jnp.float32)
    m = Dense(256, dtype=jnp.float32, quantized=True)
    params = {
        "kernel": jnp.asarray(rng.integers(-127, 128, (128, 256)), jnp.int8),
        "kernel_scale": jnp.asarray(rng.uniform(0.005, 0.01, (256,)), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((256,)) * 0.1, jnp.float32),
    }
    monkeypatch.delenv("WHISPERX_INT8_MM", raising=False)
    want = m.apply({"params": params}, x)
    monkeypatch.setenv("WHISPERX_INT8_MM", "pallas")
    got = m.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05, rtol=0.01)
