"""Checkpoint round-trip and train-step tests."""

import numpy as np
import pytest


def test_params_roundtrip(tmp_path):
    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params
    from whisperx_tpu.utils.checkpoint import load_params, save_params

    _, params = init_whisper_params(TEST_CONFIG, seed=0)
    path = str(tmp_path / "ckpt.safetensors")
    save_params(params, path)
    loaded = load_params(path)

    import jax

    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_forward_after_roundtrip(tmp_path):
    import jax.numpy as jnp

    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params
    from whisperx_tpu.utils.checkpoint import load_params, save_params

    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    mel = jnp.zeros((1, 80, 3000), jnp.float32)
    tokens = jnp.zeros((1, 4), jnp.int32)
    ref = model.apply({"params": params}, mel, tokens)
    path = str(tmp_path / "w.safetensors")
    save_params(params, path)
    got = model.apply({"params": load_params(path)}, mel, tokens)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_train_step_reduces_loss():
    import jax
    import jax.numpy as jnp

    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params
    from whisperx_tpu.train import make_optimizer, make_train_step

    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    optimizer = make_optimizer(lr=1e-3)
    opt_state = optimizer.init(params)
    train_step = jax.jit(make_train_step(model, optimizer))

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.3)
    tokens = jnp.asarray(rng.integers(0, 1000, (2, 10)).astype(np.int32))
    mask = jnp.ones((2, 10), jnp.float32)

    losses = []
    for _ in range(5):
        params, opt_state, loss = train_step(params, opt_state, mel, tokens, mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert np.isfinite(losses).all()


def test_quantized_params_checkpoint_roundtrip(tmp_path):
    """int8 + fp32-scale trees survive the safetensors roundtrip unchanged."""
    import jax.numpy as jnp
    import numpy as np

    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params, quantize_params
    from whisperx_tpu.utils.checkpoint import load_params, save_params

    _, params = init_whisper_params(TEST_CONFIG, seed=0)
    qparams = quantize_params(params)
    path = str(tmp_path / "q.safetensors")
    save_params(qparams, path)
    loaded = load_params(path)
    k0 = qparams["decoder"]["layers_0"]["attn"]["query"]
    l0 = loaded["decoder"]["layers_0"]["attn"]["query"]
    assert l0["kernel"].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(k0["kernel"]), np.asarray(l0["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(k0["kernel_scale"]), np.asarray(l0["kernel_scale"])
    )
