"""Diarization tests: clustering, assignment tables, synthetic two-speaker audio."""

import numpy as np
import pandas as pd
import pytest

from whisperx_tpu.diarize import (
    DiarizationPipeline,
    assign_word_speakers,
    cluster_speakers,
)

SR = 16000


def test_cluster_fixed_num():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((10, 8)) * 0.05 + np.array([1.0] + [0.0] * 7)
    b = rng.standard_normal((10, 8)) * 0.05 + np.array([0.0, 1.0] + [0.0] * 6)
    emb = np.concatenate([a, b])
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = cluster_speakers(emb, num_speakers=2)
    assert set(labels[:10]) != set(labels[10:])
    assert len(set(labels.tolist())) == 2


def test_cluster_max_speakers_clamp():
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((12, 6))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = cluster_speakers(emb, max_speakers=3, threshold=0.01)
    assert len(set(labels.tolist())) <= 3


def test_assign_word_speakers_by_intersection():
    diarize_df = pd.DataFrame(
        {
            "start": [0.0, 5.0],
            "end": [5.0, 10.0],
            "speaker": ["SPEAKER_00", "SPEAKER_01"],
        }
    )
    result = {
        "segments": [
            {
                "start": 1.0,
                "end": 4.0,
                "text": "hi",
                "words": [
                    {"word": "hi", "start": 1.0, "end": 2.0, "score": 0.9},
                    {"word": "there", "start": 6.0, "end": 7.0, "score": 0.9},
                ],
            },
            {"start": 6.0, "end": 9.0, "text": "yo", "words": []},
        ]
    }
    out = assign_word_speakers(diarize_df, result)
    assert out["segments"][0]["speaker"] == "SPEAKER_00"
    assert out["segments"][1]["speaker"] == "SPEAKER_01"
    words = out["segments"][0]["words"]
    assert words[0]["speaker"] == "SPEAKER_00"
    assert words[1]["speaker"] == "SPEAKER_01"


def test_assign_no_overlap_and_fill_nearest():
    diarize_df = pd.DataFrame({"start": [0.0], "end": [1.0], "speaker": ["SPEAKER_00"]})
    result = {"segments": [{"start": 5.0, "end": 6.0, "text": "x", "words": []}]}
    out = assign_word_speakers(diarize_df, result)
    assert "speaker" not in out["segments"][0]
    out2 = assign_word_speakers(diarize_df, result, fill_nearest=True)
    assert out2["segments"][0]["speaker"] == "SPEAKER_00"


def test_assign_straddling_word_max_sum():
    """A word overlapping two speakers goes to the larger summed overlap."""
    diarize_df = pd.DataFrame(
        {
            "start": [0.0, 2.0],
            "end": [2.0, 5.0],
            "speaker": ["SPEAKER_00", "SPEAKER_01"],
        }
    )
    result = {
        "segments": [
            {
                "start": 1.0,
                "end": 4.0,
                "text": "w",
                "words": [{"word": "w", "start": 1.5, "end": 4.0, "score": 1.0}],
            }
        ]
    }
    out = assign_word_speakers(diarize_df, result)
    # overlap: SPEAKER_00 gets 0.5s, SPEAKER_01 gets 2.0s
    assert out["segments"][0]["words"][0]["speaker"] == "SPEAKER_01"


def _two_speaker_audio():
    """Two synthetic 'speakers': AM tones with very different spectra."""
    t1 = np.arange(3 * SR) / SR
    sp1 = 0.5 * np.sin(2 * np.pi * 160 * t1) * (1 + 0.4 * np.sin(2 * np.pi * 4 * t1))
    sp1 += 0.2 * np.sin(2 * np.pi * 320 * t1)
    t2 = np.arange(3 * SR) / SR
    sp2 = 0.5 * np.sin(2 * np.pi * 1200 * t2) * (1 + 0.4 * np.sin(2 * np.pi * 5 * t2))
    sp2 += 0.2 * np.sin(2 * np.pi * 2400 * t2)
    silence = np.zeros(SR)
    return np.concatenate([sp1, silence, sp2]).astype(np.float32)


def test_diarization_pipeline_two_speakers():
    audio = _two_speaker_audio()
    pipeline = DiarizationPipeline()
    df = pipeline(audio, num_speakers=2)
    assert set(df.columns) >= {"segment", "label", "speaker", "start", "end"}
    assert df["speaker"].nunique() == 2
    # First speaker's region is in the first 3 seconds, second in the last 3.
    first = df.iloc[0]
    last = df.iloc[-1]
    assert first["start"] < 3.0
    assert last["end"] > 4.0
    assert first["speaker"] != last["speaker"]


def test_diarization_empty_audio():
    pipeline = DiarizationPipeline()
    df = pipeline(np.zeros(SR, np.float32))
    assert len(df) == 0


# ---------------------------------------------------------------------------
# WeSpeaker ResNet34 converter parity (torch = test oracle only)
# ---------------------------------------------------------------------------


def _torch_wespeaker(feat_dim=16, base=4, blocks=(1, 1, 1, 1), embed=8, seed=0):
    """Tiny torch model with the WeSpeaker ResNet34 layout/state-dict keys.

    Written from the architecture spec (conv3x3 stem, BasicBlock stages,
    temporal statistics pooling, seg_1 projection) to serve as the conversion
    oracle; running statistics are randomized so BN conversion is exercised.
    """
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Block(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            if stride != 1 or cin != cout:
                self.shortcut = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
                )
            else:
                self.shortcut = nn.Sequential()

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return F.relu(out + self.shortcut(x))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(1, base, 3, 1, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(base)
            cin, ch = base, base
            for s, n in enumerate(blocks):
                layer = []
                for b in range(n):
                    stride = 2 if (s > 0 and b == 0) else 1
                    layer.append(Block(cin, ch, stride))
                    cin = ch
                setattr(self, f"layer{s + 1}", nn.Sequential(*layer))
                ch *= 2
            self.seg_1 = None  # sized lazily after a probe forward

        def features(self, x):  # x: (B, T, F)
            x = x.permute(0, 2, 1).unsqueeze(1)  # (B, 1, F, T)
            out = F.relu(self.bn1(self.conv1(x)))
            for s in range(len(blocks)):
                out = getattr(self, f"layer{s + 1}")(out)
            B, C, Fr, T = out.shape
            flat = out.reshape(B, C * Fr, T)
            mean = flat.mean(dim=-1)
            std = torch.sqrt(torch.var(flat, dim=-1) + 1e-7)
            return torch.cat([mean, std], dim=1)

        def forward(self, x):
            return self.seg_1(self.features(x))

    torch.manual_seed(seed)
    net = Net()
    with torch.no_grad():
        stats = net.features(torch.zeros(1, 27, feat_dim))
    net.seg_1 = nn.Linear(stats.shape[1], embed)
    # Randomize BN running stats (fresh modules have mean=0/var=1).
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for mod in net.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=g) * 0.2)
                mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=g) + 0.5)
    net.eval()
    return net


def test_wespeaker_converter_torch_parity():
    import torch

    from whisperx_tpu.diarize.embed import ResNet34Embedding
    from whisperx_tpu.models.convert import convert_wespeaker_resnet34

    net = _torch_wespeaker()
    feats = np.random.default_rng(2).standard_normal((2, 27, 16)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(feats)).numpy()

    # pyannote wraps the network as `resnet.` — exercise the prefix strip.
    sd = {f"resnet.{k}": v.numpy() for k, v in net.state_dict().items()}
    variables, kwargs = convert_wespeaker_resnet34(sd)
    assert kwargs == {
        "embed_dim": 8,
        "base_channels": 4,
        "stage_blocks": (1, 1, 1, 1),
        "two_emb_layer": False,
    }
    model = ResNet34Embedding(**kwargs)
    got = np.asarray(model.apply(variables, feats))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_wespeaker_checkpoint_load_path(tmp_path):
    """torch.save → DiarizationPipeline(checkpoint=...) end to end."""
    import torch

    from whisperx_tpu.diarize.pipeline import DiarizationPipeline

    net = _torch_wespeaker()
    ckpt = tmp_path / "embedding.bin"
    torch.save({"state_dict": {f"resnet.{k}": v for k, v in net.state_dict().items()}}, ckpt)

    pipeline = DiarizationPipeline(checkpoint=str(ckpt))
    audio = _two_speaker_audio()
    df = pipeline(audio, num_speakers=2)
    assert set(df.columns) >= {"segment", "label", "speaker", "start", "end"}
    assert df["speaker"].nunique() == 2


# ---------------------------------------------------------------------------
# kaldi fbank front end (numpy transcription of the kaldi recipe as oracle)
# ---------------------------------------------------------------------------


def _kaldi_fbank_oracle(wav, n_mels=80):
    """Direct per-frame kaldi fbank (hamming, snip_edges, CMN) in numpy."""
    x = wav.astype(np.float64) * 32768.0
    frame_len, shift, nfft = 400, 160, 512
    num_frames = 1 + (len(x) - frame_len) // shift
    win = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(frame_len) / (frame_len - 1))

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    # Triangular banks over fft bins (Nyquist excluded), scalar formulas.
    lo, hi = mel(20.0), mel(8000.0)
    delta = (hi - lo) / (n_mels + 1)
    banks = np.zeros((n_mels, nfft // 2 + 1))
    for b in range(n_mels):
        l, c, r = lo + b * delta, lo + (b + 1) * delta, lo + (b + 2) * delta
        for k in range(nfft // 2):
            m = mel(k * 16000.0 / nfft)
            if l < m < r:
                banks[b, k] = (m - l) / (c - l) if m <= c else (r - m) / (r - c)

    feats = np.zeros((num_frames, n_mels))
    for f in range(num_frames):
        frame = x[f * shift : f * shift + frame_len].copy()
        frame -= frame.mean()
        frame[1:] -= 0.97 * frame[:-1]
        frame[0] -= 0.97 * frame[0]
        spec = np.abs(np.fft.rfft(frame * win, n=nfft)) ** 2
        feats[f] = np.log(np.maximum(spec @ banks.T, 1.1920928955078125e-07))
    return feats - feats.mean(axis=0, keepdims=True)


def test_kaldi_fbank_matches_oracle():
    from whisperx_tpu.audio.fbank import kaldi_fbank

    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    got = np.asarray(kaldi_fbank(wav[None], num_mel_bins=24))[0]
    want = _kaldi_fbank_oracle(wav, n_mels=24)
    assert got.shape == want.shape == (98, 24)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# DER metric
# ---------------------------------------------------------------------------


def test_der_perfect_and_components():
    from benchmarks.eval import der

    ref = [(0.0, 10.0, "A"), (10.0, 20.0, "B")]
    assert der(ref, ref)["der"] == 0.0

    # Half of B's time is attributed to A's cluster → confusion 5s / 20s.
    hyp = [(0.0, 10.0, "x"), (10.0, 15.0, "y"), (15.0, 20.0, "x")]
    out = der(ref, hyp)
    assert out["confusion"] == pytest.approx(5.0)
    assert out["der"] == pytest.approx(0.25)

    # Pure miss and false alarm.
    out = der(ref, [(0.0, 10.0, "x")])
    assert out["miss"] == pytest.approx(10.0)
    assert out["der"] == pytest.approx(0.5)
    out = der(ref, ref + [(20.0, 25.0, "C")])
    assert out["false_alarm"] == pytest.approx(5.0)
    assert out["der"] == pytest.approx(0.25)


def test_der_overlap_and_collar():
    from benchmarks.eval import der

    # Overlapping reference speech: total = 15s of attributed time.
    ref = [(0.0, 10.0, "A"), (5.0, 10.0, "B")]
    hyp = [(0.0, 10.0, "x")]  # misses one of the two overlapped speakers
    out = der(ref, hyp)
    assert out["total_speech"] == pytest.approx(15.0)
    assert out["miss"] == pytest.approx(5.0)

    # A small boundary error is forgiven by the collar.
    ref = [(0.0, 10.0, "A")]
    hyp = [(0.1, 10.0, "x")]
    assert der(ref, hyp, collar=0.25)["der"] == 0.0
    assert der(ref, hyp)["der"] > 0.0


# ---------------------------------------------------------------------------
# ≥3-speaker synthetic session (AMI-style structure)
# ---------------------------------------------------------------------------


def _three_speaker_session():
    """Three spectrally-distinct 'speakers', interleaved turns with pauses."""
    rng = np.random.default_rng(7)

    def speaker(f0, dur):
        t = np.arange(int(dur * SR)) / SR
        x = 0.5 * np.sin(2 * np.pi * f0 * t) * (1 + 0.4 * np.sin(2 * np.pi * 3.7 * t))
        x += 0.25 * np.sin(2 * np.pi * 2 * f0 * t) + 0.1 * np.sin(2 * np.pi * 3 * f0 * t)
        return (x + 0.01 * rng.standard_normal(len(t))).astype(np.float32)

    freqs = {"A": 140.0, "B": 520.0, "C": 1700.0}
    plan = [("A", 2.5), ("B", 2.0), ("A", 1.5), ("C", 2.5), ("B", 1.5), ("C", 2.0)]
    gap = np.zeros(int(0.8 * SR), np.float32)
    audio, turns, t = [], [], 0.0
    for spk, dur in plan:
        audio += [speaker(freqs[spk], dur), gap]
        turns.append((t, t + dur, spk))
        t += dur + 0.8
    return np.concatenate(audio), turns


def test_diarization_three_speakers_der():
    from benchmarks.eval import der, turns_from_dataframe

    audio, ref_turns = _three_speaker_session()
    pipeline = DiarizationPipeline()
    df = pipeline(audio, num_speakers=3)
    assert df["speaker"].nunique() == 3
    out = der(ref_turns, turns_from_dataframe(df), collar=0.25)
    assert out["der"] < 0.3, out
