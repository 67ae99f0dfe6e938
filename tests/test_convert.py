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


def test_pyannet_conversion_parity():
    """convert_pyannet vs a torch PyanNet replica (torch = oracle only).

    The torch side uses genuine torch modules (nn.Conv1d, nn.InstanceNorm1d,
    nn.LSTM with the pyannote state-dict layout) so the conversion mapping —
    conv transposes, LSTM gate packing per direction/layer, norm reshapes —
    is pinned against an independent implementation; the sinc filterbank
    construction follows the same published recipe on both sides.
    """
    import jax.numpy as jnp
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from whisperx_tpu.models.convert import convert_pyannet
    from whisperx_tpu.models.vad_net import PyanNetVAD, SINC_KERNEL, SINC_STRIDE

    n_filters, n_classes, lstm_layers = 80, 3, 2

    class SincFB(nn.Module):
        def __init__(self):
            super().__init__()
            # Same mel-spaced init recipe as the published SincNet.
            low, high = 30.0, 8000.0 - 130.0
            mel = np.linspace(
                2595 * np.log10(1 + low / 700), 2595 * np.log10(1 + high / 700), n_filters + 1
            )
            hz = 700 * (10 ** (mel / 2595) - 1)
            self.low_hz_ = nn.Parameter(torch.tensor(hz[:-1, None], dtype=torch.float32))
            self.band_hz_ = nn.Parameter(torch.tensor(np.diff(hz)[:, None], dtype=torch.float32))

        def filters(self):
            low = 50.0 + torch.abs(self.low_hz_)
            high = torch.clamp(low + 50.0 + torch.abs(self.band_hz_), 50.0, 8000.0)
            band = (high - low)[:, 0]
            half = (SINC_KERNEL - 1) // 2
            n = torch.arange(-half, 0, dtype=torch.float32)[None, :]
            n_2pi = 2 * torch.pi * n / 16000.0
            window = 0.54 - 0.46 * torch.cos(
                2 * torch.pi * torch.arange(half, dtype=torch.float32) / SINC_KERNEL
            )
            bp_left = ((torch.sin(high * n_2pi) - torch.sin(low * n_2pi)) / (n_2pi / 2)) * window
            bp_center = 2 * band[:, None]
            filt = torch.cat([bp_left, bp_center, bp_left.flip(-1)], dim=1)
            return (filt / (2 * band[:, None]))[:, None, :]  # (out, 1, k)

        def forward(self, x):
            return F.conv1d(x, self.filters(), stride=SINC_STRIDE)

    class TorchPyanNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.sincnet = nn.Module()
            self.sincnet.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
            self.sincnet.conv1d = nn.ModuleList(
                [SincFB(), nn.Conv1d(n_filters, 60, 5), nn.Conv1d(60, 60, 5)]
            )
            self.sincnet.norm1d = nn.ModuleList(
                [nn.InstanceNorm1d(c, affine=True) for c in (n_filters, 60, 60)]
            )
            self.lstm = nn.LSTM(
                60, 128, num_layers=lstm_layers, bidirectional=True, batch_first=True
            )
            self.linear = nn.ModuleList([nn.Linear(256, 128), nn.Linear(128, 128)])
            self.classifier = nn.Linear(128, n_classes)

        def forward(self, wav):  # (B, T)
            x = self.sincnet.wav_norm1d(wav[:, None, :])
            x = torch.abs(self.sincnet.conv1d[0](x))
            x = F.leaky_relu(self.sincnet.norm1d[0](F.max_pool1d(x, 3, 3)))
            for i in (1, 2):
                x = self.sincnet.conv1d[i](x)
                x = F.leaky_relu(self.sincnet.norm1d[i](F.max_pool1d(x, 3, 3)))
            x, _ = self.lstm(x.permute(0, 2, 1))
            for lin in self.linear:
                x = F.leaky_relu(lin(x))
            return torch.sigmoid(self.classifier(x))

    torch.manual_seed(11)
    net = TorchPyanNet().eval()
    # Perturb affine norms away from identity so their conversion is exercised.
    with torch.no_grad():
        for norm in [net.sincnet.wav_norm1d, *net.sincnet.norm1d]:
            norm.weight += 0.1 * torch.randn_like(norm.weight)
            norm.bias += 0.1 * torch.randn_like(norm.bias)

    wav = np.random.default_rng(5).standard_normal((2, 16000)).astype(np.float32) * 0.1
    with torch.no_grad():
        want = net(torch.from_numpy(wav)).numpy()

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params, num_classes = convert_pyannet(sd)
    assert num_classes == n_classes
    model = PyanNetVAD(num_classes=num_classes, lstm_layers=lstm_layers)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
