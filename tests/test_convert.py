"""Checkpoint-converter parity: HF torch forward == converted JAX forward.

Uses tiny *random-initialized* HF models (transformers is installed; no
network) as oracles: convert their state dicts through models/convert.py and
require logits to match. This validates every weight mapping, transpose, and
normalization epsilon without any downloaded checkpoint.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_whisper_conversion_parity():
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    from whisperx_tpu.models.configs import WhisperConfig
    from whisperx_tpu.models.convert import convert_whisper
    from whisperx_tpu.models.whisper import Whisper

    hf_cfg = HFWhisperConfig(
        vocab_size=1000,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        decoder_ffn_dim=256,
        encoder_ffn_dim=256,
        max_source_positions=32,
        max_target_positions=48,
        pad_token_id=0,
        bos_token_id=0,
        eos_token_id=1,
        decoder_start_token_id=2,
    )
    torch.manual_seed(0)
    hf_model = WhisperForConditionalGeneration(hf_cfg).eval()

    cfg = WhisperConfig(
        name="test",
        n_mels=80,
        n_vocab=1000,
        n_audio_ctx=32,
        n_audio_state=64,
        n_audio_head=2,
        n_audio_layer=2,
        n_text_ctx=48,
        n_text_state=64,
        n_text_head=2,
        n_text_layer=2,
    )
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_whisper(sd, cfg)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 64)).astype(np.float32)
    tokens = rng.integers(0, 1000, (2, 7)).astype(np.int64)

    with torch.no_grad():
        hf_logits = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()

    import jax.numpy as jnp

    model = Whisper(cfg)
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(mel), jnp.asarray(tokens.astype(np.int32)))
    )
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=1e-4)


def test_wav2vec2_conversion_parity():
    from transformers import Wav2Vec2Config as HFW2VConfig
    from transformers import Wav2Vec2ForCTC as HFWav2Vec2ForCTC

    from whisperx_tpu.models.convert import convert_wav2vec2, wav2vec2_config_from_hf
    from whisperx_tpu.models.wav2vec2 import Wav2Vec2ForCTC

    hf_cfg = HFW2VConfig(
        vocab_size=32,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        conv_dim=[32, 32, 32],
        conv_kernel=[10, 3, 3],
        conv_stride=[5, 2, 2],
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
    )
    torch.manual_seed(0)
    hf_model = HFWav2Vec2ForCTC(hf_cfg).eval()

    cfg = wav2vec2_config_from_hf(hf_cfg.to_dict())
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_wav2vec2(sd, cfg)

    rng = np.random.default_rng(1)
    audio = (rng.standard_normal((2, 3200)) * 0.1).astype(np.float32)
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(audio)).logits.numpy()

    import jax.numpy as jnp

    model = Wav2Vec2ForCTC(cfg)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(audio)))
    assert ours.shape == hf_logits.shape
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=1e-4)


def test_wav2vec2_stable_layernorm_parity():
    from transformers import Wav2Vec2Config as HFW2VConfig
    from transformers import Wav2Vec2ForCTC as HFWav2Vec2ForCTC

    from whisperx_tpu.models.convert import convert_wav2vec2, wav2vec2_config_from_hf
    from whisperx_tpu.models.wav2vec2 import Wav2Vec2ForCTC

    hf_cfg = HFW2VConfig(
        vocab_size=40,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        conv_dim=[32, 32],
        conv_kernel=[10, 3],
        conv_stride=[5, 2],
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
    )
    torch.manual_seed(1)
    hf_model = HFWav2Vec2ForCTC(hf_cfg).eval()

    cfg = wav2vec2_config_from_hf(hf_cfg.to_dict())
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_wav2vec2(sd, cfg)

    rng = np.random.default_rng(2)
    audio = (rng.standard_normal((1, 3200)) * 0.1).astype(np.float32)
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(audio)).logits.numpy()

    import jax.numpy as jnp

    model = Wav2Vec2ForCTC(cfg)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(audio)))
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=1e-4)


def test_whisper_distil_style_conversion_parity():
    """Asymmetric encoder/decoder depths (distil-whisper shape) convert and
    match the torch forward — guards the converter against assuming
    n_audio_layer == n_text_layer."""
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    from whisperx_tpu.models.convert import convert_whisper, whisper_config_from_hf
    from whisperx_tpu.models.whisper import Whisper

    hf_cfg = HFWhisperConfig(
        vocab_size=1000,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=3,
        encoder_attention_heads=2,
        decoder_layers=1,
        decoder_attention_heads=2,
        decoder_ffn_dim=256,
        encoder_ffn_dim=256,
        max_source_positions=32,
        max_target_positions=48,
        pad_token_id=0,
        bos_token_id=0,
        eos_token_id=1,
        decoder_start_token_id=2,
    )
    torch.manual_seed(1)
    hf_model = WhisperForConditionalGeneration(hf_cfg).eval()

    cfg = whisper_config_from_hf(hf_cfg.to_dict())
    assert (cfg.n_audio_layer, cfg.n_text_layer) == (3, 1)
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_whisper(sd, cfg)

    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 80, 64)).astype(np.float32)
    tokens = rng.integers(0, 1000, (1, 5)).astype(np.int64)
    with torch.no_grad():
        hf_logits = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()

    import jax.numpy as jnp

    model = Whisper(cfg)
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(mel), jnp.asarray(tokens.astype(np.int32)))
    )
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=1e-4)
