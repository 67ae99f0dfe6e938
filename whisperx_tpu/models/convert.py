"""Checkpoint converters: released torch/HF weights → this framework's trees.

Replaces the loaders the reference gets from faster-whisper / transformers /
pyannote (whisperx/asr.py:288, alignment.py:76-92, vad.py:51): weights are
read directly from local checkpoint files (safetensors or torch pickles — no
network) and transposed into the Flax parameter layout of
``models/whisper.py``, ``models/wav2vec2.py`` and ``models/vad_net.py``.

Conventions: torch ``nn.Linear.weight`` is (out, in) → Flax Dense kernel
(in, out) = weight.T; torch conv1d weight (out, in, k) → Flax Conv kernel
(k, in, out); LayerNorm weight/bias → scale/bias.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Optional

import numpy as np

from .configs import (
    WAV2VEC2_BASE,
    WAV2VEC2_LARGE,
    Wav2Vec2Config,
    WhisperConfig,
    get_whisper_config,
)


# ---------------------------------------------------------------------------
# checkpoint file plumbing
# ---------------------------------------------------------------------------

def resolve_checkpoint_dir(name_or_path: str, cache_dir: Optional[str] = None) -> str:
    """Resolve a local dir, or an HF hub id through the local HF cache."""
    if os.path.isdir(name_or_path):
        return name_or_path
    hub_root = cache_dir or os.path.join(
        os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface")), "hub"
    )
    cache_name = "models--" + name_or_path.replace("/", "--")
    snaps = sorted(glob.glob(os.path.join(hub_root, cache_name, "snapshots", "*")))
    if snaps:
        return snaps[-1]
    raise FileNotFoundError(
        f"Checkpoint {name_or_path!r} not found locally (searched {hub_root}). "
        "This framework loads weights offline: pass a local directory or "
        "pre-populate the HF cache."
    )


def primary_weights_file(path: str) -> Optional[str]:
    """The weights file load_state_dict would read first (digest target)."""
    if not os.path.isdir(path):
        return path
    for pattern in ("*.safetensors", "pytorch_model*.bin", "*.ckpt", "*.bin"):
        files = [
            f
            for f in sorted(glob.glob(os.path.join(path, pattern)))
            if "index" not in os.path.basename(f)
        ]
        if files:
            return files[0]
    return None


def maybe_verify_checkpoint(resolved_dir: str, name_or_path: str) -> None:
    """Integrity-check the primary weights file against the pinned registry
    (models/pinned.py — extends the reference's SHA256 pin on its VAD
    checkpoint, whisperx/vad.py:46-49, to every converter input).

    Runs whenever the checkpoint family has a pinned digest, or for
    unpinned families when WHISPERX_VERIFY_CKPT=1 (hashing multi-GB weights
    costs seconds, so trust-on-first-validation entries skip by default; a
    mismatch downgrades to a warning with WHISPERX_CKPT_ALLOW_UNPINNED=1).
    """
    from .pinned import PINNED, pinned_key_for, verify_pinned

    key = pinned_key_for(name_or_path) or pinned_key_for(resolved_dir)
    if key is None:
        return
    if PINNED.get(key) is None and os.environ.get("WHISPERX_VERIFY_CKPT") != "1":
        return
    weights = primary_weights_file(resolved_dir)
    if weights:
        verify_pinned(
            key, weights, strict=os.environ.get("WHISPERX_CKPT_ALLOW_UNPINNED") != "1"
        )


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a state dict from a checkpoint dir or file (safetensors/torch)."""
    if os.path.isdir(path):
        st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        if st_files:
            from safetensors.numpy import load_file

            out: dict[str, np.ndarray] = {}
            for f in st_files:
                if "index" in os.path.basename(f):
                    continue
                out.update(load_file(f))
            return out
        bins = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin"))) or sorted(
            glob.glob(os.path.join(path, "*.ckpt"))
        ) or sorted(glob.glob(os.path.join(path, "*.bin")))
        if not bins:
            raise FileNotFoundError(f"no weight files in {path}")
        path = bins[0]

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)

    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}


def _linear(sd, prefix):
    p = {"kernel": sd[prefix + ".weight"].T.astype(np.float32)}
    if prefix + ".bias" in sd:
        p["bias"] = sd[prefix + ".bias"].astype(np.float32)
    return p


def _layernorm(sd, prefix):
    return {
        "scale": sd[prefix + ".weight"].astype(np.float32),
        "bias": sd[prefix + ".bias"].astype(np.float32),
    }


def _conv1d(sd, prefix, with_bias=True):
    p = {"kernel": sd[prefix + ".weight"].transpose(2, 1, 0).astype(np.float32)}
    if with_bias and prefix + ".bias" in sd:
        p["bias"] = sd[prefix + ".bias"].astype(np.float32)
    return p


# ---------------------------------------------------------------------------
# Whisper
# ---------------------------------------------------------------------------

def _whisper_attention(sd, prefix):
    out = {
        "query": _linear(sd, prefix + ".q_proj"),
        "key": {"kernel": sd[prefix + ".k_proj.weight"].T.astype(np.float32)},
        "value": _linear(sd, prefix + ".v_proj"),
        "out": _linear(sd, prefix + ".out_proj"),
    }
    return out


def convert_whisper(sd: dict, config: WhisperConfig) -> dict:
    """HF WhisperForConditionalGeneration state dict → Flax param tree."""
    # Strip optional prefixes ("model." for the composite HF model).
    sd = { (k[len("model."):] if k.startswith("model.") else k): v for k, v in sd.items() }

    enc: dict[str, Any] = {
        "conv1": _conv1d(sd, "encoder.conv1"),
        "conv2": _conv1d(sd, "encoder.conv2"),
        "positional_embedding": sd["encoder.embed_positions.weight"].astype(np.float32),
        "ln_post": _layernorm(sd, "encoder.layer_norm"),
    }
    for i in range(config.n_audio_layer):
        p = f"encoder.layers.{i}"
        enc[f"layers_{i}"] = {
            "attn": _whisper_attention(sd, p + ".self_attn"),
            "attn_ln": _layernorm(sd, p + ".self_attn_layer_norm"),
            "mlp": {"fc1": _linear(sd, p + ".fc1"), "fc2": _linear(sd, p + ".fc2")},
            "mlp_ln": _layernorm(sd, p + ".final_layer_norm"),
        }

    dec: dict[str, Any] = {
        "token_embedding": sd["decoder.embed_tokens.weight"].astype(np.float32),
        "positional_embedding": sd["decoder.embed_positions.weight"].astype(np.float32),
        "ln": _layernorm(sd, "decoder.layer_norm"),
    }
    for i in range(config.n_text_layer):
        p = f"decoder.layers.{i}"
        dec[f"layers_{i}"] = {
            "attn": _whisper_attention(sd, p + ".self_attn"),
            "attn_ln": _layernorm(sd, p + ".self_attn_layer_norm"),
            "cross_attn": _whisper_attention(sd, p + ".encoder_attn"),
            "cross_attn_ln": _layernorm(sd, p + ".encoder_attn_layer_norm"),
            "mlp": {"fc1": _linear(sd, p + ".fc1"), "fc2": _linear(sd, p + ".fc2")},
            "mlp_ln": _layernorm(sd, p + ".final_layer_norm"),
        }
    return {"encoder": enc, "decoder": dec}


def whisper_config_from_hf(cfg: dict) -> WhisperConfig:
    return WhisperConfig(
        name=cfg.get("_name_or_path", "custom"),
        n_mels=cfg["num_mel_bins"],
        n_vocab=cfg["vocab_size"],
        n_audio_ctx=cfg["max_source_positions"],
        n_audio_state=cfg["d_model"],
        n_audio_head=cfg["encoder_attention_heads"],
        n_audio_layer=cfg["encoder_layers"],
        n_text_ctx=cfg["max_target_positions"],
        n_text_state=cfg["d_model"],
        n_text_head=cfg["decoder_attention_heads"],
        n_text_layer=cfg["decoder_layers"],
        num_languages=100 if cfg["vocab_size"] == 51866 else 99,
    )


def load_whisper(name_or_path: str, dtype=None, cache_dir: Optional[str] = None):
    """Local HF Whisper checkpoint → (Whisper module, params, config)."""
    import jax.numpy as jnp

    from .whisper import Whisper

    path = resolve_checkpoint_dir(name_or_path, cache_dir)
    maybe_verify_checkpoint(path, name_or_path)
    with open(os.path.join(path, "config.json")) as f:
        config = whisper_config_from_hf(json.load(f))
    sd = load_state_dict(path)
    params = convert_whisper(sd, config)
    dt = dtype or jnp.float32
    if dt != jnp.float32:
        import jax

        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dt), params)
    return Whisper(config, dtype=dt or jnp.float32), params, config


# ---------------------------------------------------------------------------
# wav2vec2
# ---------------------------------------------------------------------------

def _weight_norm_conv(sd: dict, prefix: str) -> np.ndarray:
    """Materialize a torch weight-normed conv1d weight (dim=2 convention)."""
    for g_name, v_name in (
        (prefix + ".weight_g", prefix + ".weight_v"),
        (prefix + ".parametrizations.weight.original0", prefix + ".parametrizations.weight.original1"),
    ):
        if g_name in sd:
            g, v = sd[g_name], sd[v_name]
            norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
            return g * v / np.maximum(norm, 1e-12)
    return sd[prefix + ".weight"]


def convert_wav2vec2(sd: dict, config: Wav2Vec2Config) -> dict:
    sd = {
        (k[len("wav2vec2."):] if k.startswith("wav2vec2.") else k): v for k, v in sd.items()
    }
    fe: dict[str, Any] = {}
    for i in range(len(config.conv_layers)):
        fe[f"conv_{i}"] = _conv1d(sd, f"feature_extractor.conv_layers.{i}.conv")
        ln_key = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if ln_key in sd:
            fe[f"norm_{i}"] = _layernorm(sd, f"feature_extractor.conv_layers.{i}.layer_norm")

    params: dict[str, Any] = {
        "feature_extractor": fe,
        "feat_layer_norm": _layernorm(sd, "feature_projection.layer_norm"),
        "feat_projection": _linear(sd, "feature_projection.projection"),
        "pos_conv_embed": {
            "conv": {
                "kernel": _weight_norm_conv(sd, "encoder.pos_conv_embed.conv")
                .transpose(2, 1, 0)
                .astype(np.float32),
                "bias": sd["encoder.pos_conv_embed.conv.bias"].astype(np.float32),
            }
        },
        "encoder_layer_norm": _layernorm(sd, "encoder.layer_norm"),
        "lm_head": _linear(sd, "lm_head"),
    }
    for i in range(config.num_layers):
        p = f"encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "attention": {
                "q_proj": _linear(sd, p + ".attention.q_proj"),
                "k_proj": _linear(sd, p + ".attention.k_proj"),
                "v_proj": _linear(sd, p + ".attention.v_proj"),
                "out_proj": _linear(sd, p + ".attention.out_proj"),
            },
            "layer_norm": _layernorm(sd, p + ".layer_norm"),
            "feed_forward": {
                "intermediate": _linear(sd, p + ".feed_forward.intermediate_dense"),
                "output": _linear(sd, p + ".feed_forward.output_dense"),
            },
            "final_layer_norm": _layernorm(sd, p + ".final_layer_norm"),
        }
    return params


def wav2vec2_config_from_hf(cfg: dict) -> Wav2Vec2Config:
    return Wav2Vec2Config(
        name=cfg.get("_name_or_path", "custom"),
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        intermediate_size=cfg["intermediate_size"],
        conv_layers=tuple(
            zip(cfg["conv_dim"], cfg["conv_kernel"], cfg["conv_stride"])
        ),
        conv_bias=cfg.get("conv_bias", False),
        do_stable_layer_norm=cfg.get("do_stable_layer_norm", False),
        feat_extract_norm=cfg.get("feat_extract_norm", "group"),
        num_conv_pos_embeddings=cfg.get("num_conv_pos_embeddings", 128),
        num_conv_pos_embedding_groups=cfg.get("num_conv_pos_embedding_groups", 16),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
    )


def load_wav2vec2(name_or_path: str, cache_dir: Optional[str] = None, dtype=None):
    """Local HF wav2vec2-CTC checkpoint → (module, params, char dictionary).

    ``dtype`` is the compute dtype; default bf16 on TPU (the emission head
    casts back to fp32 before log-softmax), fp32 elsewhere. Params stay fp32.
    """
    import jax
    import jax.numpy as jnp

    from .wav2vec2 import Wav2Vec2ForCTC

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    path = resolve_checkpoint_dir(name_or_path, cache_dir)
    maybe_verify_checkpoint(path, name_or_path)
    with open(os.path.join(path, "config.json")) as f:
        config = wav2vec2_config_from_hf(json.load(f))
    sd = load_state_dict(path)
    params = convert_wav2vec2(sd, config)

    vocab_file = os.path.join(path, "vocab.json")
    with open(vocab_file) as f:
        dictionary = json.load(f)
    return Wav2Vec2ForCTC(config, dtype=dtype), params, dictionary


# ---------------------------------------------------------------------------
# pyannote segmentation (VAD)
# ---------------------------------------------------------------------------

def _lstm_layer(sd, l: int, reverse: bool) -> dict:
    sfx = f"l{l}" + ("_reverse" if reverse else "")
    return {
        "w_ih": sd[f"lstm.weight_ih_{sfx}"].astype(np.float32),
        "w_hh": sd[f"lstm.weight_hh_{sfx}"].astype(np.float32),
        "b_ih": sd[f"lstm.bias_ih_{sfx}"].astype(np.float32),
        "b_hh": sd[f"lstm.bias_hh_{sfx}"].astype(np.float32),
    }


def convert_pyannet(sd: dict) -> tuple[dict, int]:
    """pyannote PyanNet checkpoint → (Flax param tree, num_classes)."""
    sd = {(k[len("model."):] if k.startswith("model.") else k): v for k, v in sd.items()}

    def sinc_param(name):
        for key in (f"sincnet.conv1d.0.filterbank.{name}", f"sincnet.conv1d.0.{name}"):
            if key in sd:
                return sd[key].astype(np.float32)
        raise KeyError(name)

    num_classes = sd["classifier.weight"].shape[0]
    lstm_layers = max(int(k.split("_l")[-1].replace("_reverse", "")) for k in sd if k.startswith("lstm.weight_ih")) + 1

    params: dict[str, Any] = {
        "wav_norm": {
            "scale": sd["sincnet.wav_norm1d.weight"].reshape(-1).astype(np.float32),
            "bias": sd["sincnet.wav_norm1d.bias"].reshape(-1).astype(np.float32),
        },
        "sinc": {"low_hz": sinc_param("low_hz_"), "band_hz": sinc_param("band_hz_")},
        "conv_1": _conv1d(sd, "sincnet.conv1d.1"),
        "conv_2": _conv1d(sd, "sincnet.conv1d.2"),
        "classifier": _linear(sd, "classifier"),
        "lstm": {},
    }
    for i in range(3):
        params[f"norm_{i}"] = {
            "scale": sd[f"sincnet.norm1d.{i}.weight"].reshape(-1).astype(np.float32),
            "bias": sd[f"sincnet.norm1d.{i}.bias"].reshape(-1).astype(np.float32),
        }
    for l in range(lstm_layers):
        params["lstm"][f"fwd_{l}"] = _lstm_layer(sd, l, False)
        params["lstm"][f"bwd_{l}"] = _lstm_layer(sd, l, True)
    for i in range(2):
        params[f"linear_{i}"] = _linear(sd, f"linear.{i}")
    return params, num_classes


def load_pyannet_vad(path: str):
    """Pinned segmentation checkpoint (vad.py:18) → (PyanNetVAD, params)."""
    from .vad_net import PyanNetVAD

    sd = load_state_dict(path)
    params, num_classes = convert_pyannet(sd)
    lstm_layers = len(params["lstm"]) // 2
    model = PyanNetVAD(num_classes=num_classes, lstm_layers=lstm_layers)
    return model, params


# ---------------------------------------------------------------------------
# WeSpeaker ResNet34 speaker embedding (diarization)
# ---------------------------------------------------------------------------

def _conv2d(sd, prefix):
    """torch conv2d weight (out, in, kh, kw) → Flax kernel (kh, kw, in, out)."""
    return {"kernel": sd[prefix + ".weight"].transpose(2, 3, 1, 0).astype(np.float32)}


def _batchnorm(sd, prefix):
    """torch BN → (params {scale,bias}, batch_stats {mean,var})."""
    return (
        {
            "scale": sd[prefix + ".weight"].astype(np.float32),
            "bias": sd[prefix + ".bias"].astype(np.float32),
        },
        {
            "mean": sd[prefix + ".running_mean"].astype(np.float32),
            "var": sd[prefix + ".running_var"].astype(np.float32),
        },
    )


def convert_wespeaker_resnet34(sd: dict) -> tuple[dict, dict]:
    """WeSpeaker ResNet34 state dict → (Flax variables, model kwargs).

    Accepts the pyannote wrapper layout (``resnet.``-prefixed — the
    ``wespeaker-voxceleb-resnet34-LM`` checkpoint behind the reference's
    pyannote/speaker-diarization-3.1, whisperx/diarize.py:19) or a bare
    wespeaker export. The residual projection may be named ``shortcut`` or
    ``downsample``. Returns kwargs (embed_dim/stage_blocks/two_emb_layer)
    inferred from the checkpoint so ``ResNet34Embedding`` matches exactly.
    """
    for prefix in ("model.", "resnet.", "speaker_encoder."):
        if any(k.startswith(prefix) for k in sd):
            sd = {
                (k[len(prefix):] if k.startswith(prefix) else k): v for k, v in sd.items()
            }

    params: dict[str, Any] = {"conv1": _conv2d(sd, "conv1")}
    stats: dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _batchnorm(sd, "bn1")

    stage_blocks = []
    for stage in range(1, 5):
        n_blocks = len(
            {k.split(".")[1] for k in sd if k.startswith(f"layer{stage}.")}
        )
        stage_blocks.append(n_blocks)
        for b in range(n_blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            block_p: dict[str, Any] = {"conv1": _conv2d(sd, src + ".conv1")}
            block_s: dict[str, Any] = {}
            block_p["bn1"], block_s["bn1"] = _batchnorm(sd, src + ".bn1")
            block_p["conv2"] = _conv2d(sd, src + ".conv2")
            block_p["bn2"], block_s["bn2"] = _batchnorm(sd, src + ".bn2")
            for proj in ("shortcut", "downsample"):
                if src + f".{proj}.0.weight" in sd:
                    block_p["shortcut_conv"] = _conv2d(sd, src + f".{proj}.0")
                    block_p["shortcut_bn"], block_s["shortcut_bn"] = _batchnorm(
                        sd, src + f".{proj}.1"
                    )
                    break
            params[dst] = block_p
            stats[dst] = block_s

    params["seg_1"] = _linear(sd, "seg_1")
    kwargs = {
        "embed_dim": int(sd["seg_1.weight"].shape[0]),
        "base_channels": int(sd["conv1.weight"].shape[0]),
        "stage_blocks": tuple(stage_blocks),
        "two_emb_layer": "seg_2.weight" in sd,
    }
    if kwargs["two_emb_layer"]:
        params["seg_bn_1"], stats["seg_bn_1"] = _batchnorm(sd, "seg_bn_1")
        params["seg_2"] = _linear(sd, "seg_2")
    return {"params": params, "batch_stats": stats}, kwargs


def load_wespeaker_resnet34(path: str):
    """Speaker-embedding checkpoint → (ResNet34Embedding, variables, n_mels).

    ``n_mels`` (the fbank dim the net was trained on — 80 for the pyannote
    3.1 checkpoint) is recovered from seg_1's input width: it equals
    2 · C_final · ceil(n_mels / 2^n_downsamples).
    """
    from ..diarize.embed import ResNet34Embedding

    sd = load_state_dict(path)
    variables, kwargs = convert_wespeaker_resnet34(sd)
    c_final = kwargs["base_channels"] * 2 ** (len(kwargs["stage_blocks"]) - 1)
    seg_in = variables["params"]["seg_1"]["kernel"].shape[0]
    n_mels = (seg_in // (2 * c_final)) * 2 ** (len(kwargs["stage_blocks"]) - 1)
    return ResNet34Embedding(**kwargs), variables, n_mels
