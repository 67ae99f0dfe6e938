"""Real-checkpoint validation chain (env-gated; VERDICT r2 item 7).

This build environment has no network and no model weights, so the gated
tests skip by default. The day real checkpoints land, ONE command validates
the whole conversion chain — pinned digest, converter, and torch-forward
parity on the actual weights:

    WHISPERX_SEGMENTATION_CKPT=/path/to/pytorch_model.bin \
    WHISPERX_WESPEAKER_CKPT=/path/to/wespeaker.bin \
    python -m pytest tests/test_real_checkpoints.py -v

- The segmentation digest is pinned (models/pinned.py — the reference's own
  URL-hash pin, whisperx/vad.py:18,46-49); a mismatch fails unless
  WHISPERX_CKPT_ALLOW_UNPINNED=1.
- The WeSpeaker digest has no offline-determinable pin; the first validation
  warns with the observed digest to record in models/pinned.py.
- Torch-forward parity rebuilds the architecture in plain torch modules,
  loads the REAL state dict into them, and requires the converted JAX
  forward to match.
- ``test_validation_chain_rehearsal`` runs the exact same chain against
  synthetic full-layout checkpoints offline, so the gated path is known-good
  before any real weights exist.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SEG_CKPT = os.environ.get("WHISPERX_SEGMENTATION_CKPT")
EMB_CKPT = os.environ.get("WHISPERX_WESPEAKER_CKPT")
ALLOW_UNPINNED = os.environ.get("WHISPERX_CKPT_ALLOW_UNPINNED") == "1"


def _strip_prefix(sd: dict, prefixes=("model.", "resnet.", "speaker_encoder.")) -> dict:
    for prefix in prefixes:
        if any(k.startswith(prefix) for k in sd):
            sd = {(k[len(prefix):] if k.startswith(prefix) else k): v for k, v in sd.items()}
    return sd


def _torch_pyannet_from_sd(sd: dict):
    """PyanNet in plain torch modules, hyperparams inferred from the state
    dict, weights loaded strict. Same architecture replica as
    tests/test_convert.py::test_pyannet_conversion_parity, sized from sd."""
    import torch.nn as nn
    import torch.nn.functional as F

    from whisperx_tpu.models.vad_net import SINC_KERNEL, SINC_STRIDE

    n_classes = sd["classifier.weight"].shape[0]
    lstm_layers = (
        max(
            int(k.split("_l")[-1].replace("_reverse", ""))
            for k in sd
            if k.startswith("lstm.weight_ih")
        )
        + 1
    )
    n_filters = sd["sincnet.norm1d.0.weight"].shape[0]
    conv_ch = [sd[f"sincnet.conv1d.{i}.weight"].shape[0] for i in (1, 2)]
    linear_dims = []
    i = 0
    while f"linear.{i}.weight" in sd:
        linear_dims.append(sd[f"linear.{i}.weight"].shape[0])
        i += 1
    lstm_hidden = sd["lstm.weight_hh_l0"].shape[1]

    class SincFB(nn.Module):
        def __init__(self):
            super().__init__()
            self.low_hz_ = nn.Parameter(torch.zeros(n_filters, 1))
            self.band_hz_ = nn.Parameter(torch.zeros(n_filters, 1))

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
            return (filt / (2 * band[:, None]))[:, None, :]

        def forward(self, x):
            return F.conv1d(x, self.filters(), stride=SINC_STRIDE)

    class TorchPyanNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.sincnet = nn.Module()
            self.sincnet.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
            self.sincnet.conv1d = nn.ModuleList(
                [SincFB(), nn.Conv1d(n_filters, conv_ch[0], 5), nn.Conv1d(conv_ch[0], conv_ch[1], 5)]
            )
            self.sincnet.norm1d = nn.ModuleList(
                [nn.InstanceNorm1d(c, affine=True) for c in (n_filters, *conv_ch)]
            )
            self.lstm = nn.LSTM(
                conv_ch[1], lstm_hidden, num_layers=lstm_layers,
                bidirectional=True, batch_first=True,
            )
            dims = [2 * lstm_hidden] + linear_dims
            self.linear = nn.ModuleList(
                [nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])]
            )
            self.classifier = nn.Linear(linear_dims[-1], n_classes)

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

    net = TorchPyanNet()
    # Real pyannote names the sinc params under a `filterbank.` submodule.
    renamed = {
        k.replace("conv1d.0.filterbank.", "conv1d.0."): v for k, v in sd.items()
    }
    net.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in renamed.items()})
    return net.eval()


# ---------------------------------------------------------------------------
# The validation chains (shared by the env-gated tests and the rehearsal)
# ---------------------------------------------------------------------------


def _run_segmentation_chain(path: str, *, strict: bool):
    from whisperx_tpu.models.convert import load_pyannet_vad, load_state_dict
    from whisperx_tpu.models.pinned import verify_pinned

    verify_pinned("pyannote-segmentation", path, strict=strict)

    model, params = load_pyannet_vad(path)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)

    import jax.numpy as jnp

    got = np.asarray(model.apply({"params": params}, jnp.asarray(wav)))
    assert got.shape[0] == 2 and got.shape[2] == model.num_classes
    assert np.all((got >= 0) & (got <= 1))

    sd = _strip_prefix(load_state_dict(path))
    net = _torch_pyannet_from_sd(sd)
    with torch.no_grad():
        want = net(torch.from_numpy(wav)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    return model, params


def _run_wespeaker_chain(path: str, *, strict: bool):
    from whisperx_tpu.models.convert import load_state_dict, load_wespeaker_resnet34
    from whisperx_tpu.models.pinned import verify_pinned

    # No offline pin exists — warns with the observed digest to record.
    verify_pinned("wespeaker-voxceleb-resnet34-LM", path, strict=strict)

    model, variables, n_mels = load_wespeaker_resnet34(path)

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 150, n_mels)).astype(np.float32)
    got = np.asarray(model.apply(variables, feats))
    assert got.shape == (2, model.embed_dim)

    # Torch replica loaded with the checkpoint's weights (same module layout
    # the random-weight parity test uses, sized from the checkpoint).
    from tests.test_diarize import _torch_wespeaker

    sd = _strip_prefix(load_state_dict(path))
    base = sd["conv1.weight"].shape[0]
    blocks = tuple(
        len({k.split(".")[1] for k in sd if k.startswith(f"layer{s}.")})
        for s in range(1, 5)
    )
    embed = sd["seg_1.weight"].shape[0]
    net = _torch_wespeaker(feat_dim=n_mels, base=base, blocks=blocks, embed=embed)
    net.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    net.eval()
    with torch.no_grad():
        want = net(torch.from_numpy(feats)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    return model, variables


# ---------------------------------------------------------------------------
# Env-gated: run against REAL checkpoints when present
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not SEG_CKPT, reason="set WHISPERX_SEGMENTATION_CKPT to validate")
def test_real_segmentation_checkpoint_chain():
    _run_segmentation_chain(SEG_CKPT, strict=not ALLOW_UNPINNED)


@pytest.mark.skipif(not EMB_CKPT, reason="set WHISPERX_WESPEAKER_CKPT to validate")
def test_real_wespeaker_checkpoint_chain():
    _run_wespeaker_chain(EMB_CKPT, strict=not ALLOW_UNPINNED)


# ---------------------------------------------------------------------------
# Offline rehearsal: the same chain over synthetic full-layout checkpoints,
# so the gated path is known-good before any real weights exist.
# ---------------------------------------------------------------------------


def write_synthetic_pyannet_ckpt(path, seed: int = 3):
    """Synthetic pyannote-style segmentation checkpoint (real key layout:
    Lightning "state_dict" + "model." prefix + filterbank submodule)."""
    rng = np.random.default_rng(seed)

    def t(*shape, scale=0.1):
        return torch.from_numpy((rng.standard_normal(shape) * scale).astype(np.float32))

    sd = {}
    sd["sincnet.wav_norm1d.weight"] = t(1) + 1.0
    sd["sincnet.wav_norm1d.bias"] = t(1)
    low, high = 30.0, 8000.0 - 130.0
    mel = np.linspace(
        2595 * np.log10(1 + low / 700), 2595 * np.log10(1 + high / 700), 81
    )
    hz = 700 * (10 ** (mel / 2595) - 1)
    sd["sincnet.conv1d.0.filterbank.low_hz_"] = torch.from_numpy(
        hz[:-1, None].astype(np.float32)
    )
    sd["sincnet.conv1d.0.filterbank.band_hz_"] = torch.from_numpy(
        np.diff(hz)[:, None].astype(np.float32)
    )
    sd["sincnet.conv1d.1.weight"] = t(60, 80, 5)
    sd["sincnet.conv1d.1.bias"] = t(60)
    sd["sincnet.conv1d.2.weight"] = t(60, 60, 5)
    sd["sincnet.conv1d.2.bias"] = t(60)
    for i, c in enumerate((80, 60, 60)):
        sd[f"sincnet.norm1d.{i}.weight"] = t(c) + 1.0
        sd[f"sincnet.norm1d.{i}.bias"] = t(c)
    h, layers = 128, 2  # smaller LSTM than production: chain infers it
    for l in range(layers):
        d_in = 60 if l == 0 else 2 * h
        for suffix in ("", "_reverse"):
            sd[f"lstm.weight_ih_l{l}{suffix}"] = t(4 * h, d_in)
            sd[f"lstm.weight_hh_l{l}{suffix}"] = t(4 * h, h)
            sd[f"lstm.bias_ih_l{l}{suffix}"] = t(4 * h)
            sd[f"lstm.bias_hh_l{l}{suffix}"] = t(4 * h)
    sd["linear.0.weight"] = t(128, 2 * h)
    sd["linear.0.bias"] = t(128)
    sd["linear.1.weight"] = t(128, 128)
    sd["linear.1.bias"] = t(128)
    sd["classifier.weight"] = t(3, 128)
    sd["classifier.bias"] = t(3)
    torch.save({"state_dict": {f"model.{k}": v for k, v in sd.items()}}, path)
    return path


def test_validation_chain_rehearsal(tmp_path):
    seg_path = write_synthetic_pyannet_ckpt(tmp_path / "segmentation.bin")
    with pytest.warns(UserWarning, match="SHA256 mismatch"):
        _run_segmentation_chain(str(seg_path), strict=False)

    # Synthetic wespeaker checkpoint via the torch replica.
    from tests.test_diarize import _torch_wespeaker

    net = _torch_wespeaker(feat_dim=16, base=4, blocks=(1, 1, 1, 1), embed=8)
    emb_path = tmp_path / "embedding.bin"
    torch.save(
        {"state_dict": {f"resnet.{k}": v for k, v in net.state_dict().items()}},
        emb_path,
    )
    with pytest.warns(UserWarning, match="no pinned digest"):
        _run_wespeaker_chain(str(emb_path), strict=True)


def test_pinned_registry_and_verify_helper(tmp_path):
    """The registry + verify_pinned contract itself (runs offline)."""
    from whisperx_tpu.models.pinned import PINNED, file_sha256, verify_pinned

    # The segmentation pin is the reference's URL-hash (vad.py:18).
    assert PINNED["pyannote-segmentation"].startswith("0b5b3216")
    assert "wespeaker-voxceleb-resnet34-LM" in PINNED

    f = tmp_path / "w.bin"
    f.write_bytes(b"weights")
    digest = file_sha256(str(f))

    # Unpinned name → warn, return digest.
    with pytest.warns(UserWarning, match="no pinned digest"):
        assert verify_pinned("wespeaker-voxceleb-resnet34-LM", str(f)) == digest

    # Pinned mismatch → strict raises, non-strict warns.
    with pytest.raises(RuntimeError, match="SHA256 mismatch"):
        verify_pinned("pyannote-segmentation", str(f), strict=True)
    with pytest.warns(UserWarning, match="SHA256 mismatch"):
        verify_pinned("pyannote-segmentation", str(f), strict=False)


# ---------------------------------------------------------------------------
# One-command WER/F1 runbook rehearsal (VERDICT r3 item 5): write tiny
# random HF-format checkpoints to disk, then drive benchmarks/real_eval.py
# through the REAL loaders (resolve dir → verify digest → convert → pipeline
# → align → score) so real weights are a drop-in.
# ---------------------------------------------------------------------------


def _write_tiny_whisper_dir(dirpath) -> str:
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFWhisperConfig(
        vocab_size=51865,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        decoder_ffn_dim=256,
        encoder_ffn_dim=256,
        max_source_positions=1500,
        max_target_positions=64,
        pad_token_id=50257,
        bos_token_id=50257,
        eos_token_id=50257,
        decoder_start_token_id=50258,
    )
    torch.manual_seed(0)
    WhisperForConditionalGeneration(hf_cfg).eval().save_pretrained(str(dirpath))

    # Minimal byte-level BPE files (no merges): enough for WhisperTokenizer's
    # offline from_pretrained path.
    from tokenizers import pre_tokenizers

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    with open(os.path.join(dirpath, "vocab.json"), "w") as f:
        json.dump({c: i for i, c in enumerate(alphabet)}, f)
    with open(os.path.join(dirpath, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    return str(dirpath)


def _write_tiny_wav2vec2_dir(dirpath) -> str:
    from transformers import Wav2Vec2Config as HFW2VConfig
    from transformers import Wav2Vec2ForCTC as HFWav2Vec2ForCTC

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
    torch.manual_seed(1)
    HFWav2Vec2ForCTC(hf_cfg).eval().save_pretrained(str(dirpath))
    chars = ["<pad>", "|", "'"] + [chr(c) for c in range(ord("a"), ord("z") + 1)]
    with open(os.path.join(dirpath, "vocab.json"), "w") as f:
        json.dump({c: i for i, c in enumerate(chars)}, f)
    return str(dirpath)


import json
import os


def test_real_eval_runbook_rehearsal(tmp_path):
    """`python benchmarks/real_eval.py --model ... --manifest ...` end-to-end
    on synthetic checkpoints: loaders, pipeline, aligner, and the WER/F1
    report all run exactly as they will with real weights."""
    import numpy as np

    from benchmarks import real_eval
    from whisperx_tpu.audio.io import write_wav

    whisper_dir = _write_tiny_whisper_dir(tmp_path / "whisper-tiny-test")
    w2v2_dir = _write_tiny_wav2vec2_dir(tmp_path / "wav2vec2-test")

    sr = 16000
    t = np.arange(6 * sr) / sr
    tone = (0.3 * np.sin(2 * np.pi * 600 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(
        np.float32
    )
    manifest = tmp_path / "manifest.jsonl"
    rows = []
    for i in range(2):
        wav_path = tmp_path / f"clip{i}.wav"
        write_wav(str(wav_path), tone)
        rows.append(
            {
                "audio": str(wav_path),
                "text": "hello world this is a rehearsal clip",
                "words": [
                    {"word": "hello", "start": 0.4, "end": 0.8},
                    {"word": "world", "start": 0.9, "end": 1.3},
                ],
            }
        )
    with open(manifest, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")

    report = real_eval.main(
        [
            "--model", whisper_dir,
            "--align-model", w2v2_dir,
            "--manifest", str(manifest),
            "--language", "en",
            "--batch-size", "2",
            "--compute-type", "float32",
            "--out", str(tmp_path / "report.json"),
        ]
    )

    assert report["files"] == 2
    assert report["wer"] >= 0.0 and np.isfinite(report["wer"])
    assert len(report["per_file"]) == 2
    for row in report["per_file"]:
        assert "wer" in row and "realtime" in row
        assert "timestamp_f1" in row  # manifest carried gold words
    # BASELINE.md copy-paste block (VERDICT r4 item 8): the exact
    # reference-comparison fields, plus the per-stage telemetry split.
    bc = report["baseline_comparison"]
    assert bc["corpus_wer"] == report["wer"]
    assert bc["word_timestamp_f1_at_200ms"] == report["timestamp_f1"]  # tol=0.2 default
    assert bc["reference_realtime_claim"] == 70.0
    assert bc["realtime_factor"] == report["audio_seconds_per_second"]
    assert abs(bc["vs_reference_realtime"] - bc["realtime_factor"] / 70.0) < 1e-3
    assert "asr_decode" in report["stages"] and "align" in report["stages"]
    assert os.path.exists(tmp_path / "report.json")


def test_pinned_key_resolution():
    from whisperx_tpu.models.pinned import pinned_key_for

    assert pinned_key_for("openai/whisper-large-v2") == "whisper-large-v2"
    assert pinned_key_for("/ckpts/whisper-tiny.en") == "whisper-tiny.en"
    assert pinned_key_for("large-v3") == "whisper-large-v3"
    assert pinned_key_for("facebook/wav2vec2-base-960h") == "wav2vec2-base-960h"
    assert pinned_key_for("my-finetuned-model") is None


def test_load_model_auto_kv_resolution(tmp_path):
    """load_model pairs int8 weights with the int8 KV cache ('auto'), keeps
    model-dtype KV for full-precision weights, and honors an explicit
    override — the plumbing that puts the A/B'd flagship default on the
    production path (r5)."""
    from whisperx_tpu.pipeline.asr import load_model

    whisper_dir = _write_tiny_whisper_dir(tmp_path / "whisper-tiny-kv")

    p8 = load_model("tiny", language="en", compute_type="int8", checkpoint=whisper_dir)
    assert p8.kv_cache_dtype == "int8"
    pf = load_model("tiny", language="en", compute_type="float32", checkpoint=whisper_dir)
    assert pf.kv_cache_dtype == "model"
    pex = load_model(
        "tiny", language="en", compute_type="int8", checkpoint=whisper_dir,
        kv_cache_dtype="int4",
    )
    assert pex.kv_cache_dtype == "int4"
