"""wav2vec2 CTC model in Flax — the forced-alignment emission network.

Replaces the torch/torchaudio wav2vec2 forward the reference calls per
segment (whisperx/alignment.py:226-233) with a jit'd, *batched* JAX model:
the reference aligns segment-by-segment (its own TODO at alignment.py:215);
here segments are bucketed and run as batches with length masks, so the conv
front-end and transformer ride the MXU at full tilt.

Architecture parity targets the HF ``Wav2Vec2ForCTC`` graph ("group"-norm
base and "layer"-norm large variants, conv positional embeddings, post-LN or
stable-pre-LN encoder) so released checkpoints convert 1:1.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .configs import Wav2Vec2Config

Array = jax.Array
NEG_MASK = -1e9


def _conv_impl(pref: str) -> str:
    """Resolve the feature-extractor conv impl ("auto" → native conv).

    A/B'd on chip (benchmarks/AB_RESULTS.json conv-impl-*): the framed-matmul
    path timed 78.7 ms vs the native lowering's 72.8 ms for the batch-8x30s
    conv stack — within relay noise, no win — so "auto" stays on XLA's conv
    and the matmul path remains an opt-in probe. WHISPERX_CONV_IMPL=
    conv|matmul|s2d overrides (read at trace time, like the other decode
    knobs); "s2d" is the phase-decomposed stacked-matmul variant."""
    import os

    env = os.environ.get("WHISPERX_CONV_IMPL", "")
    if env in ("conv", "matmul", "s2d"):
        return env
    if pref != "auto":
        return pref
    return "conv"


class StridedConv1D(nn.Module):
    """VALID-padding strided 1-D conv with an MXU-friendly framed-matmul path.

    The param tree is identical to ``flax.linen.Conv`` (kernel (k, Cin, Cout),
    bias (Cout,)) so the HF checkpoint converter and existing checkpoints are
    untouched. ``impl``:

    - "conv": ``lax.conv_general_dilated`` — XLA's native lowering.
    - "matmul": frame the input into (B, T', k, Cin) windows via k strided
      slices and contract with the kernel in ONE ``dot_general`` — every
      layer becomes a plain matmul the MXU tiles well (but materializes a
      k-times-larger frames array).
    - "s2d": space-to-depth phase decomposition — split the input into its
      s stride phases ``x[r::s]`` and accumulate ``ceil(k/s)`` stacked
      matmuls ``concat_r(x[q*s+r::s]) @ concat_r(W[q*s+r])``. Identical
      FLOPs to the conv, plain (T', s*Cin)x(s*Cin, Cout) MXU matmuls, and
      no k-fold frames blowup: for the stack's k<=2s geometries at most
      ~1.5x the input is re-read. The k==s layers (kernel 2, stride 2)
      reduce to ONE reshape + matmul.
    - "auto": the native conv (the on-chip A/B found conv and matmul equal
      within relay noise — see ``_conv_impl``).
    """

    features: int
    kernel: int
    stride: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (B, T, Cin) -> (B, T', Cout)
        k, s = self.kernel, self.stride
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, cin, self.features), jnp.float32
        )
        x = x.astype(self.dtype)
        w = kernel.astype(self.dtype)
        impl = _conv_impl(self.impl)
        if impl == "conv":
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(s,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        elif impl == "s2d":
            t_out = (x.shape[1] - k) // s + 1
            # y[t] = sum_j W[j] x[t*s+j]; with j = q*s + r the j-th tap is
            # phase r of the input shifted by q frames, so the conv is
            # ceil(k/s) stacked matmuls over the phase-split input.
            y = None
            for q in range(-(-k // s)):
                rs = [r for r in range(s) if q * s + r < k]
                cols = [
                    jax.lax.slice_in_dim(
                        x, q * s + r, q * s + r + (t_out - 1) * s + 1, stride=s, axis=1
                    )
                    for r in rs
                ]
                xq = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=-1)
                wq = w[q * s : q * s + len(rs)].reshape(len(rs) * cin, self.features)
                yq = jax.lax.dot_general(xq, wq, (((2,), (0,)), ((), ())))
                y = yq if y is None else y + yq
        else:
            t_out = (x.shape[1] - k) // s + 1
            # frames[b, t, j, c] = x[b, t*s + j, c]: the j-th strided slice is
            # the j-th in-window column of every output frame.
            cols = [
                jax.lax.slice_in_dim(x, j, j + (t_out - 1) * s + 1, stride=s, axis=1)
                for j in range(k)
            ]
            frames = jnp.stack(cols, axis=2)  # (B, T', k, Cin)
            y = jax.lax.dot_general(frames, w, (((2, 3), (0, 1)), ((), ())))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ConvFeatureExtractor(nn.Module):
    """Strided 1-D conv stack: raw 16 kHz audio → 512-d frames @ 50 Hz."""

    config: Wav2Vec2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: Array) -> Array:  # (B, T) -> (B, T', C)
        cfg = self.config
        x = audio[:, :, None].astype(self.dtype)  # (B, T, 1)
        for i, (dim, kernel, stride) in enumerate(cfg.conv_layers):
            x = StridedConv1D(
                dim,
                kernel,
                stride,
                use_bias=cfg.conv_bias,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            if cfg.feat_extract_norm == "group" and i == 0:
                # Base models: a single GroupNorm(512 groups == per-channel
                # instance norm) after the first conv.
                x = nn.GroupNorm(num_groups=dim, epsilon=1e-5, dtype=jnp.float32, name=f"norm_{i}")(x)
            elif cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name=f"norm_{i}")(x)
            x = nn.gelu(x.astype(self.dtype), approximate=False)
        return x


class ConvPositionalEmbedding(nn.Module):
    """Grouped conv positional encoding (kernel 128, groups 16) + GELU."""

    config: Wav2Vec2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (B, T, D)
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        h = nn.Conv(
            cfg.hidden_size,
            kernel_size=(k,),
            padding=k // 2,
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        if k % 2 == 0:  # even kernel: trim the extra right frame (HF parity)
            h = h[:, :-1, :]
        return nn.gelu(h, approximate=False)


class W2VAttention(nn.Module):
    config: Wav2Vec2Config
    dtype: Any = jnp.float32
    quantized: bool = False

    def setup(self):
        from .whisper import Dense

        d = self.config.hidden_size
        q = self.quantized
        self.q_proj = Dense(d, dtype=self.dtype, quantized=q)
        self.k_proj = Dense(d, dtype=self.dtype, quantized=q)
        self.v_proj = Dense(d, dtype=self.dtype, quantized=q)
        self.out_proj = Dense(d, dtype=self.dtype, quantized=q)

    def __call__(self, x: Array, pad_mask: Optional[Array]) -> Array:
        cfg = self.config
        B, T, D = x.shape
        H = cfg.num_heads
        Dh = D // H
        scale = Dh**-0.25

        def split(h):
            return h.reshape(B, T, H, Dh)

        q = split(self.q_proj(x)) * scale
        k = split(self.k_proj(x)) * scale
        v = split(self.v_proj(x))
        # Fused flash kernel on TPU (no (B,H,T,T) logits in HBM); naive XLA
        # on CPU. pad_mask keys are excluded in both paths identically.
        from ..ops.attention import fused_self_attention

        out = fused_self_attention(q, k, v, pad_mask, neg_mask=NEG_MASK)
        return self.out_proj(out.reshape(B, T, D))


class W2VFeedForward(nn.Module):
    config: Wav2Vec2Config
    dtype: Any = jnp.float32
    quantized: bool = False

    def setup(self):
        from .whisper import Dense

        q = self.quantized
        self.intermediate = Dense(self.config.intermediate_size, dtype=self.dtype, quantized=q)
        self.output = Dense(self.config.hidden_size, dtype=self.dtype, quantized=q)

    def __call__(self, x: Array) -> Array:
        return self.output(nn.gelu(self.intermediate(x), approximate=False))


class W2VEncoderLayer(nn.Module):
    config: Wav2Vec2Config
    dtype: Any = jnp.float32
    quantized: bool = False

    def setup(self):
        cfg = self.config
        self.attention = W2VAttention(cfg, dtype=self.dtype, quantized=self.quantized)
        self.layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)
        self.feed_forward = W2VFeedForward(cfg, dtype=self.dtype, quantized=self.quantized)
        self.final_layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)

    def __call__(self, x: Array, pad_mask: Optional[Array]) -> Array:
        if self.config.do_stable_layer_norm:  # pre-LN (large/xlsr)
            x = x + self.attention(self.layer_norm(x).astype(self.dtype), pad_mask)
            x = x + self.feed_forward(self.final_layer_norm(x).astype(self.dtype))
        else:  # post-LN (base)
            x = self.layer_norm(x + self.attention(x, pad_mask)).astype(self.dtype)
            x = self.final_layer_norm(x + self.feed_forward(x)).astype(self.dtype)
        return x


class Wav2Vec2ForCTC(nn.Module):
    """Full CTC model: conv features → projection → transformer → vocab logits."""

    config: Wav2Vec2Config
    dtype: Any = jnp.float32
    # int8 weight-only mode for the transformer encoder (the alignment-path
    # analogue of quantize_whisper). The lm_head emissions projection stays a
    # plain fp Dense: CTC trellis scores are log-softmax over its output and
    # keep full precision.
    quantized: bool = False

    def setup(self):
        from .whisper import Dense

        cfg = self.config
        self.feature_extractor = ConvFeatureExtractor(cfg, dtype=self.dtype)
        self.feat_layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)
        self.feat_projection = Dense(cfg.hidden_size, dtype=self.dtype, quantized=self.quantized)
        self.pos_conv_embed = ConvPositionalEmbedding(cfg, dtype=self.dtype)
        self.encoder_layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)
        self.layers = [
            W2VEncoderLayer(cfg, dtype=self.dtype, quantized=self.quantized, name=f"layers_{i}")
            for i in range(cfg.num_layers)
        ]
        self.lm_head = nn.Dense(cfg.vocab_size, dtype=self.dtype)

    def __call__(self, audio: Array, sample_lengths: Optional[Array] = None) -> Array:
        """(B, T) float32 in [-1,1] → (B, T//320 - ..., vocab) fp32 logits.

        ``sample_lengths`` masks padded samples in batched/bucketed mode; the
        returned logits at padded frames correspond to masked attention and a
        zeroed conv input, and callers also get ``frame_lengths`` via
        :meth:`feature_lengths`.
        """
        cfg = self.config
        if sample_lengths is not None:
            t_idx = jnp.arange(audio.shape[1])[None, :]
            audio = jnp.where(t_idx < sample_lengths[:, None], audio, 0.0)

        feats = self.feature_extractor(audio)  # (B, T', C)
        pad_mask = None
        if sample_lengths is not None:
            frame_len = self.feature_lengths(sample_lengths)
            pad_mask = jnp.arange(feats.shape[1])[None, :] < frame_len[:, None]

        x = self.feat_layer_norm(feats)
        x = self.feat_projection(x.astype(self.dtype))
        x = x + self.pos_conv_embed(x)
        if not cfg.do_stable_layer_norm:
            x = self.encoder_layer_norm(x).astype(self.dtype)
        for layer in self.layers:
            x = layer(x, pad_mask)
        if cfg.do_stable_layer_norm:
            x = self.encoder_layer_norm(x).astype(self.dtype)
        return self.lm_head(x).astype(jnp.float32)

    def feature_lengths(self, sample_lengths: Array) -> Array:
        """Conv-stack output length for given input sample counts."""
        n = sample_lengths
        for _, kernel, stride in self.config.conv_layers:
            n = (n - kernel) // stride + 1
        return n


def init_wav2vec2_params(config: Wav2Vec2Config, seed: int = 0, dtype=jnp.float32):
    model = Wav2Vec2ForCTC(config, dtype=dtype)
    audio = jnp.zeros((1, 4000), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), audio)["params"]
    return model, params


def quantize_wav2vec2(model: Wav2Vec2ForCTC, params):
    """(model, fp params) → (int8 weight-only model, quantized params).

    Alignment-path analogue of ``quantize_whisper``: every transformer Dense
    kernel becomes symmetric per-output-channel int8 (halving the weight HBM
    reads of the 1500-frame encoder forward); conv kernels (rank-3) and the
    ``lm_head`` emissions projection stay fp.
    """
    from .whisper import quantize_params

    qmodel = Wav2Vec2ForCTC(model.config, dtype=model.dtype, quantized=True)
    qparams = quantize_params(params, embedding_keys=())
    qparams["lm_head"] = params["lm_head"]  # emissions head stays fp
    return qmodel, qparams
