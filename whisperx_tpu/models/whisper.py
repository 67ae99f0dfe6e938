"""Whisper encoder-decoder in Flax, designed for jit'd batched decode on TPU.

Replaces the reference's CTranslate2 C++ engine (whisperx/asr.py:25-86) with
an XLA-native model. TPU-first choices:

- All shapes are static: the encoder always sees (B, n_mels, 3000); the
  decoder's KV cache is a fixed (B, n_text_ctx, ...) buffer addressed with a
  position index, so greedy/beam loops compile once.
- The KV cache is a *value* (pytree) threaded through ``decode_step``, not
  Flax mutable state — it can be a ``lax.while_loop`` carry and a pjit-sharded
  array like any other.
- Cross-attention K/V are precomputed once per segment (``compute_cross_kv``),
  so each decode step is pure MXU matmuls against resident buffers.
- Attention scale is split as ``d_k**-0.25`` on both q and k for bf16 range
  safety; softmax runs in fp32.
- Parameter names form a stable tree addressed by the partition rules in
  ``whisperx_tpu.parallel.partition`` (heads/MLP sharded on the "model" axis).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .configs import WhisperConfig

Array = jax.Array
Cache = Any  # nested dict of arrays


def quantize_kv(x: Array, bits: int = 8) -> tuple[Array, Array]:
    """Per-(token, head) symmetric int8/int4 quantization of K/V tensors.

    Returns (quantized values, fp32 scales with a trailing singleton dim).
    int8 halves the HBM traffic of cache reads and beam-reorder gathers —
    the dominant per-step cost of batched beam decode — at negligible
    accuracy cost; ``bits=4`` (packed s4) halves it again (experimental —
    per-(token, head) scales bound the error, real-weight WER unvalidated).
    """
    qmax = 7.0 if bits == 4 else 127.0
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = amax / qmax
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / jnp.maximum(scale, 1e-8)), -qmax, qmax)
    return q.astype(jnp.int4 if bits == 4 else jnp.int8), scale


def dequantize_kv(q: Array, scale: Array, dtype) -> Array:
    """Inverse of quantize_kv (checkpoint tooling; the attention path never
    materializes this — scales commute into the matmul epilogues instead)."""
    return q.astype(dtype) * scale.astype(dtype)


class FlatCrossKV(NamedTuple):
    """Cross-attention K/V in the fused-kernel layout.

    Values are stored flat (B, S, D) — lane-aligned on TPU, avoiding the
    tile padding of trailing (H, 64) dims — with per-(token, head) scales
    transposed to (B, H, S). Built by the engine when the Pallas decode
    cross-attention kernel is active (ops/pallas_cross_attn.py); plain
    tuples keep the XLA einsum path.
    """

    k: Array
    v: Array
    k_scale: Array
    v_scale: Array


def flat_cross_kv(k: Array, v: Array, kv_int8: bool) -> FlatCrossKV:
    """(B, S, H, Dh) K/V → FlatCrossKV (optionally int8-quantized)."""
    B, S, H, Dh = k.shape
    if kv_int8:
        qk, ks = quantize_kv(k)
        qv, vs = quantize_kv(v)
    else:
        qk, qv = k, v
        ks = vs = jnp.ones((B, S, H, 1), jnp.float32)
    t = lambda s: s[..., 0].transpose(0, 2, 1)  # (B,S,H,1) → (B,H,S)
    return FlatCrossKV(
        qk.reshape(B, S, H * Dh), qv.reshape(B, S, H * Dh), t(ks), t(vs)
    )


def _use_pallas_int8(x: Array, features: int) -> bool:
    """Route small-row int8 projections through the Pallas dequant-matmul
    kernel (ops/pallas_int8_mm).

    Default ON for single-device TPU decode — the on-chip A/B (large-v2
    beam-5, benchmarks/AB_RESULTS.json r2) measured 134.1x vs 130.3x for the
    XLA dequant path. Forced via WHISPERX_INT8_MM=pallas|xla. Falls back to
    XLA on CPU (interpret mode is for tests only) and under multi-device
    meshes (pjit cannot partition a bare pallas_call).
    """
    import os

    env = os.environ.get("WHISPERX_INT8_MM", "")
    if env == "xla":
        return False
    if env != "pallas":
        if jax.default_backend() != "tpu":
            return False
        try:
            mesh = jax.sharding.get_abstract_mesh()
            if mesh is not None and not mesh.empty and mesh.size > 1:
                return False
        except Exception:
            pass
    from ..ops.pallas_int8_mm import MAX_ROWS

    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return rows <= MAX_ROWS and features % 128 == 0 and x.shape[-1] % 128 == 0


class Dense(nn.Module):
    """nn.Dense-compatible projection with an optional int8 weight-only mode.

    The reference rides CTranslate2's int8 kernels (whisperx/asr.py:262
    ``compute_type``); the TPU equivalent is weight-only quantization: the
    kernel is stored int8 with a per-output-channel fp32 scale, halving the
    weight HBM reads that dominate per-step decode cost. The int8→bf16
    convert is fused into the matmul operand load by XLA, so the MXU still
    sees bf16 inputs and accuracy loss stays ~0.1% (per-channel symmetric).

    Parameter names match nn.Dense ("kernel"/"bias"); quantized trees add a
    "kernel_scale" leaf produced by :func:`quantize_params`.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    quantized: bool = False
    # Weight storage width when quantized: 8 (int8, default) or 4 (int4 —
    # EXPERIMENTAL: halves weight HBM reads again; v5e supports packed s4
    # storage. Use per-channel symmetric scales like int8; accuracy on real
    # weights unvalidated, keep opt-in).
    quant_bits: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        if self.quantized:
            qdt = jnp.int4 if self.quant_bits == 4 else jnp.int8
            kernel = self.param(
                "kernel", lambda key, s: jnp.zeros(s, qdt), (in_features, self.features)
            )
            scale = self.param(
                "kernel_scale", lambda key, s: jnp.ones(s, jnp.float32), (self.features,)
            )
            if self.quant_bits == 8 and _use_pallas_int8(x, self.features):
                from ..ops.pallas_int8_mm import int8_matmul

                lead = x.shape[:-1]
                rows = int(np.prod(lead)) if lead else 1
                bias = None
                if self.use_bias:
                    bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
                y = int8_matmul(
                    x.reshape(rows, in_features), kernel, scale, bias, out_dtype=self.dtype
                )
                return y.reshape(*lead, self.features)
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
            y = y * scale.astype(self.dtype)
        else:
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(), (in_features, self.features), jnp.float32
            )
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def quantize_params(
    params,
    *,
    embedding_keys: tuple[str, ...] = ("token_embedding",),
    scope: str = "all",
    bits: int = 8,
):
    """Host-side tree transform: fp kernels → (int kernel, kernel_scale).

    Every rank-2 "kernel" leaf (all Dense projections; conv kernels are
    rank-3 and stay fp) becomes symmetric per-output-channel int8 — or int4
    with ``bits=4`` (packed s4 storage halves weight HBM reads again;
    experimental, embeddings stay int8). Decoder token embeddings become
    per-row int8 (the logits matmul against the embedding table is one of
    the largest per-step weight reads). Use with a model constructed with
    ``quantized=True`` (and matching ``quant_bits``). ``scope``: "all" or a
    single top-level subtree name ("decoder"/"encoder") to quantize.
    """

    if scope != "all":
        return {
            name: (
                quantize_params(child, embedding_keys=embedding_keys, bits=bits)
                if name == scope
                else child
            )
            for name, child in params.items()
        }
    qmax = 7 if bits == 4 else 127

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if isinstance(child, dict):
                out[name] = walk(child)
                continue
            if name == "kernel" and getattr(child, "ndim", 0) == 2:
                arr = np.asarray(child, np.float32)
                amax = np.max(np.abs(arr), axis=0)
                scale = np.maximum(amax / qmax, 1e-12)
                q = jnp.asarray(np.clip(np.round(arr / scale), -qmax, qmax).astype(np.int8))
                out[name] = q.astype(jnp.int4) if bits == 4 else q
                out["kernel_scale"] = jnp.asarray(scale.astype(np.float32))
            elif name in embedding_keys and getattr(child, "ndim", 0) == 2:
                arr = np.asarray(child, np.float32)
                amax = np.max(np.abs(arr), axis=1, keepdims=True)
                scale = np.maximum(amax / 127.0, 1e-12)
                out[name] = jnp.asarray(
                    np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
                )
                out[name + "_scale"] = jnp.asarray(scale[:, 0].astype(np.float32))
            else:
                out[name] = child
        return out

    return walk(params)


def fuse_qkv_params(params):
    """Host-side tree transform: self-attention {query,key,value} → one qkv.

    Concatenates the three projections along the output dim (order q|k|v,
    matching MultiHeadAttention._project_qkv slicing); the key projection has
    no bias in Whisper, so its bias slot is zeros. Works on fp and int8
    (weight-only) trees — per-output-channel kernel_scale concatenates the
    same way. Cross-attention subtrees ("cross_attn") are left alone. Use
    with a model constructed with ``fused_qkv=True``.
    """

    def fuse(attn: dict) -> dict:
        q, k, v = attn["query"], attn["key"], attn["value"]
        # jnp (not np) concat: int4 kernels have no numpy equivalent dtype.
        cat = lambda name: jnp.concatenate(
            [jnp.asarray(q[name]), jnp.asarray(k[name]), jnp.asarray(v[name])], axis=-1
        )
        qkv = {"kernel": cat("kernel")}
        if "kernel_scale" in q:
            qkv["kernel_scale"] = cat("kernel_scale")
        kb = jnp.zeros_like(jnp.asarray(q["bias"]))
        qkv["bias"] = jnp.concatenate(
            [jnp.asarray(q["bias"]), kb, jnp.asarray(v["bias"])], axis=-1
        )
        out = {name: child for name, child in attn.items() if name not in ("query", "key", "value")}
        out["qkv"] = qkv
        return out

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if name == "attn" and isinstance(child, dict) and "query" in child:
                out[name] = fuse({k: walk(v) for k, v in child.items()})
            else:
                out[name] = walk(child)
        return out

    return walk(params)


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Sinusoidal position signal for the audio encoder (fixed, not learned)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


class MultiHeadAttention(nn.Module):
    """Attention with optional static KV cache and precomputed cross K/V."""

    d_model: int
    n_head: int
    dtype: Any = jnp.float32
    quantized: bool = False
    quant_bits: int = 8
    # Full self-attention (encoder) impl: "auto" → Pallas flash kernel on
    # TPU, naive XLA on CPU; force "xla" under tensor-parallel meshes (a bare
    # pallas_call cannot be auto-partitioned by pjit).
    attn_impl: str = "auto"
    # One (D, 3D) projection instead of three (D, D): a third of the matmul
    # dispatches on the per-token decode path. Param trees are rewritten by
    # fuse_qkv_params; cross-attention modules stay unfused (they project K/V
    # from the encoder states separately).
    fused_qkv: bool = False

    def setup(self):
        q = self.quantized
        qb = self.quant_bits
        if self.fused_qkv:
            self.qkv = Dense(3 * self.d_model, dtype=self.dtype, quantized=q, quant_bits=qb)
        else:
            self.query = Dense(self.d_model, dtype=self.dtype, quantized=q, quant_bits=qb)
            self.key = Dense(self.d_model, use_bias=False, dtype=self.dtype, quantized=q, quant_bits=qb)
            self.value = Dense(self.d_model, dtype=self.dtype, quantized=q, quant_bits=qb)
        self.out = Dense(self.d_model, dtype=self.dtype, quantized=q, quant_bits=qb)

    def _split(self, h: Array) -> Array:  # (B, T, D) -> (B, T, H, Dh)
        return h.reshape(h.shape[0], h.shape[1], self.n_head, self.d_model // self.n_head)

    def _project_qkv(self, x: Array) -> tuple:
        if self.fused_qkv:
            y = self.qkv(x)
            D = self.d_model
            return y[..., :D], y[..., D : 2 * D], y[..., 2 * D :]
        return self.query(x), self.key(x), self.value(x)

    def compute_kv(self, src: Array) -> tuple:
        """Project K/V once (cross-attention precompute)."""
        return self._split(self.key(src)), self._split(self.value(src))

    def __call__(
        self,
        x: Array,  # (B, T_q, D)
        *,
        mask: Optional[Array] = None,  # additive, broadcastable to (B,H,Tq,Tkv)
        cache: Optional[dict] = None,  # {"k","v"} per-layer (B, T_cache, H, Dh)
        cache_index: Optional[Array] = None,
        precomputed_kv: Optional[tuple] = None,
    ):
        head_dim = self.d_model // self.n_head
        scale = head_dim**-0.25

        # Fused-kernel cross attention: one Pallas program per layer per
        # step reads the flat (B, S, D) K/V once from HBM (see
        # ops/pallas_cross_attn.py). Beam queries fold into the G axis just
        # like the einsum path's beam grouping below.
        if isinstance(precomputed_kv, FlatCrossKV):
            from ..ops.pallas_cross_attn import cross_attention_decode

            fkv = precomputed_kv
            Bkv = fkv.k.shape[0]
            Tq = x.shape[1]
            group = x.shape[0] // Bkv
            # Full 1/sqrt(Dh) on q (exact in bf16: a power of two).
            q = self.query(x) * (head_dim**-0.5)
            q = q.reshape(Bkv, group * Tq, self.d_model).astype(jnp.bfloat16)
            out = cross_attention_decode(q, fkv.k, fkv.v, fkv.k_scale, fkv.v_scale)
            out = out.astype(self.dtype).reshape(x.shape[0], Tq, self.d_model)
            return self.out(out), None

        # K/V arrive either fp (k_scale/v_scale None) or int8 with per-(token,
        # head) scales. Scales COMMUTE with both attention contractions:
        #   (q · k_int8[t]) * ks[t]      == q · (k_int8[t]*ks[t])
        #   sum_t (w[t]*vs[t]) v_int8[t] == sum_t w[t] (v_int8[t]*vs[t])
        # so they are applied on the *small* side (logits / attention weights,
        # where XLA fuses them into the matmul epilogue) instead of
        # dequantizing the full cache — which would materialize a bf16 copy of
        # the dominant HBM traffic of every decode step.
        ks = vs = None
        if precomputed_kv is not None:
            q = self._split(self.query(x)) * scale
            if len(precomputed_kv) == 4:  # int8 cross KV: (k, k_scale, v, v_scale)
                k, ks, v, vs = precomputed_kv
            else:
                k, v = precomputed_kv
        else:
            qp, kp, vp = self._project_qkv(x)
            q = self._split(qp) * scale
            k, v = self._split(kp), self._split(vp)

        # Encoder path (full bidirectional self-attention, no cache): one
        # fused flash kernel instead of materializing (B,H,T,T) logits.
        if cache is None and precomputed_kv is None and mask is None and x.shape[1] > 1:
            from ..ops.attention import fused_self_attention

            out = fused_self_attention(q, k * scale, v, impl=self.attn_impl)
            return self.out(out.reshape(x.shape[0], x.shape[1], self.d_model)), None

        new_cache = None
        if cache is not None:
            # PER-LAYER cache buffers (B, T, H, Dh). Layout verdict from the
            # r4 on-chip probes: stacked all-layer slabs looked attractive
            # for the beam reorder but measured WORSE inside the decode loop
            # — forced reorder per step: per-layer axis-0 take 5.0 ms,
            # stacked (L,B,..) axis-1 16.5, stacked (B,L,..) axis-0 28.1,
            # one-hot matmul on stacked 50.2 (standalone gather_probe.py
            # rankings did not transfer into the scan context). Per-layer
            # rows (~164 KB) stream well and the 4*L small gathers pipeline
            # with the forward.
            at = (0, cache_index, 0, 0)
            if cache["k"].dtype in (jnp.int8, jnp.int4):
                # Quantized cache: int8/int4 values + per-(token, head) scales.
                kv_bits = 4 if cache["k"].dtype == jnp.int4 else 8
                qk, kss = quantize_kv(k, bits=kv_bits)
                qv, vss = quantize_kv(v, bits=kv_bits)
                k_buf = jax.lax.dynamic_update_slice(cache["k"], qk, at)
                v_buf = jax.lax.dynamic_update_slice(cache["v"], qv, at)
                ks_buf = jax.lax.dynamic_update_slice(cache["k_scale"], kss, at)
                vs_buf = jax.lax.dynamic_update_slice(cache["v_scale"], vss, at)
                new_cache = {"k": k_buf, "v": v_buf, "k_scale": ks_buf, "v_scale": vs_buf}
                k, ks = k_buf, ks_buf
                v, vs = v_buf, vs_buf
            else:
                # Scatter this step's K/V into the static ring buffer.
                k_buf = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), at)
                v_buf = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), at)
                new_cache = {"k": k_buf, "v": v_buf}
                k, v = k_buf, v_buf

        # Beam grouping: cross-attention K/V are shared by all beams of one
        # batch element, so they stay (B, S, H, Dh) while queries arrive as
        # (B*K, T, H, Dh). Folding K into the query-time axis avoids
        # replicating the (large) encoder KV per beam — a K-fold HBM saving.
        group = x.shape[0] // k.shape[0]
        Tq = x.shape[1]
        if group > 1:
            q = q.reshape(k.shape[0], group * Tq, self.n_head, head_dim)

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k.astype(q.dtype), preferred_element_type=jnp.float32
        )
        logits = logits * scale
        if ks is not None:
            # ks: (B, T, H, 1) → (B, H, 1, T) broadcast over queries.
            logits = logits * ks[..., 0].transpose(0, 2, 1)[:, :, None, :]
        if mask is not None:
            logits = logits + mask
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        if vs is not None:
            weights = weights * vs[..., 0].transpose(0, 2, 1)[:, :, None, :].astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v.astype(self.dtype))
        out = out.reshape(x.shape[0], Tq, self.d_model)
        return self.out(out), new_cache


class MLP(nn.Module):
    d_model: int
    dtype: Any = jnp.float32
    quantized: bool = False
    quant_bits: int = 8

    def setup(self):
        self.fc1 = Dense(4 * self.d_model, dtype=self.dtype, quantized=self.quantized, quant_bits=self.quant_bits)
        self.fc2 = Dense(self.d_model, dtype=self.dtype, quantized=self.quantized, quant_bits=self.quant_bits)

    def __call__(self, x: Array) -> Array:
        return self.fc2(nn.gelu(self.fc1(x), approximate=False))


class EncoderBlock(nn.Module):
    d_model: int
    n_head: int
    dtype: Any = jnp.float32
    quantized: bool = False
    quant_bits: int = 8
    attn_impl: str = "auto"
    fused_qkv: bool = False

    def setup(self):
        self.attn_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.attn = MultiHeadAttention(
            self.d_model, self.n_head, dtype=self.dtype, quantized=self.quantized,
            quant_bits=self.quant_bits, attn_impl=self.attn_impl, fused_qkv=self.fused_qkv,
        )
        self.mlp_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.mlp = MLP(self.d_model, dtype=self.dtype, quantized=self.quantized, quant_bits=self.quant_bits)

    def __call__(self, x: Array) -> Array:
        h, _ = self.attn(self.attn_ln(x).astype(self.dtype))
        x = x + h
        return x + self.mlp(self.mlp_ln(x).astype(self.dtype))


class AudioEncoder(nn.Module):
    config: WhisperConfig
    dtype: Any = jnp.float32
    quantized: bool = False
    quant_bits: int = 8
    attn_impl: str = "auto"
    fused_qkv: bool = False

    def setup(self):
        cfg = self.config
        self.conv1 = nn.Conv(cfg.n_audio_state, kernel_size=(3,), padding=1, dtype=self.dtype)
        self.conv2 = nn.Conv(
            cfg.n_audio_state, kernel_size=(3,), strides=(2,), padding=1, dtype=self.dtype
        )
        self.layers = [
            EncoderBlock(
                cfg.n_audio_state,
                cfg.n_audio_head,
                dtype=self.dtype,
                quantized=self.quantized,
                quant_bits=self.quant_bits,
                attn_impl=self.attn_impl,
                fused_qkv=self.fused_qkv,
                name=f"layers_{i}",
            )
            for i in range(cfg.n_audio_layer)
        ]
        self.ln_post = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        # Sinusoidal positions, held as a parameter (initialized to the fixed
        # formula) so checkpoint conversion is byte-exact.
        self.positional_embedding = self.param(
            "positional_embedding",
            lambda key, shape, dtype: jnp.asarray(sinusoids(*shape), dtype),
            (cfg.n_audio_ctx, cfg.n_audio_state),
            jnp.float32,
        )

    def __call__(self, mel: Array) -> Array:
        """(B, n_mels, 3000) log-mel → (B, 1500, D) audio states."""
        x = mel.astype(self.dtype).transpose(0, 2, 1)  # (B, T, n_mels): conv over time
        x = nn.gelu(self.conv1(x), approximate=False)
        x = nn.gelu(self.conv2(x), approximate=False)
        x = x + self.positional_embedding.astype(self.dtype)[None, : x.shape[1]]
        for block in self.layers:
            x = block(x)
        return self.ln_post(x).astype(self.dtype)


class DecoderBlock(nn.Module):
    d_model: int
    n_head: int
    dtype: Any = jnp.float32
    quantized: bool = False
    quant_bits: int = 8
    fused_qkv: bool = False

    def setup(self):
        self.attn_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.attn = MultiHeadAttention(
            self.d_model, self.n_head, dtype=self.dtype, quantized=self.quantized,
            quant_bits=self.quant_bits, fused_qkv=self.fused_qkv,
        )
        self.cross_attn_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.cross_attn = MultiHeadAttention(
            self.d_model, self.n_head, dtype=self.dtype, quantized=self.quantized,
            quant_bits=self.quant_bits,
        )
        self.mlp_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.mlp = MLP(self.d_model, dtype=self.dtype, quantized=self.quantized, quant_bits=self.quant_bits)

    def __call__(self, x, *, self_cache, cache_index, cross_kv, self_mask):
        h, new_self_cache = self.attn(
            self.attn_ln(x).astype(self.dtype),
            mask=self_mask,
            cache=self_cache,
            cache_index=cache_index,
        )
        x = x + h
        h, _ = self.cross_attn(
            self.cross_attn_ln(x).astype(self.dtype), precomputed_kv=cross_kv
        )
        x = x + h
        return x + self.mlp(self.mlp_ln(x).astype(self.dtype)), new_self_cache

    def compute_cross_kv(self, audio_states):
        return self.cross_attn.compute_kv(audio_states)


class TextDecoder(nn.Module):
    config: WhisperConfig
    dtype: Any = jnp.float32
    quantized: bool = False
    quant_bits: int = 8
    fused_qkv: bool = False

    def setup(self):
        cfg = self.config
        if self.quantized:
            # Per-row int8 embedding table: the tied logits projection is one
            # of the largest per-step weight reads (V×D), and per-row scales
            # commute with the "btd,vd->btv" contraction.
            self.token_embedding = self.param(
                "token_embedding",
                lambda key, s: jnp.zeros(s, jnp.int8),
                (cfg.n_vocab, cfg.n_text_state),
            )
            self.token_embedding_scale = self.param(
                "token_embedding_scale",
                lambda key, s: jnp.ones(s, jnp.float32),
                (cfg.n_vocab,),
            )
        else:
            self.token_embedding = self.param(
                "token_embedding",
                nn.initializers.normal(cfg.n_text_state**-0.5),
                (cfg.n_vocab, cfg.n_text_state),
                jnp.float32,
            )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.n_text_ctx, cfg.n_text_state),
            jnp.float32,
        )
        self.layers = [
            DecoderBlock(
                cfg.n_text_state,
                cfg.n_text_head,
                dtype=self.dtype,
                quantized=self.quantized,
                quant_bits=self.quant_bits,
                fused_qkv=self.fused_qkv,
                name=f"layers_{i}",
            )
            for i in range(cfg.n_text_layer)
        ]
        self.ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)

    def __call__(self, tokens: Array, cache: Cache, cache_index: Array):
        """Decode `tokens` (B, T) starting at absolute position `cache_index`.

        Works for both prompt ingestion (T = prompt length) and stepping
        (T = 1). Returns (logits (B, T, V) fp32, updated cache).
        """
        cfg = self.config
        T = tokens.shape[1]
        x = self.token_embedding.astype(self.dtype)[tokens]
        if self.quantized:
            x = x * self.token_embedding_scale[tokens][..., None].astype(self.dtype)
        x = x + jax.lax.dynamic_slice(
            self.positional_embedding.astype(self.dtype), (cache_index, 0), (T, cfg.n_text_state)
        )

        # Causal mask against the static cache: query at absolute position
        # cache_index + t sees cache slots [0, cache_index + t]. The cache may
        # be shorter than n_text_ctx (sized to prompt+max_new by the engine).
        cache_len = cache["self"][0]["k"].shape[1]
        q_pos = cache_index + jnp.arange(T)[:, None]
        k_pos = jnp.arange(cache_len)[None, :]
        self_mask = jnp.where(k_pos <= q_pos, 0.0, NEG_MASK).astype(jnp.float32)

        new_cache = {"self": [], "cross": cache["cross"]}
        for i, block in enumerate(self.layers):
            x, new_self = block(
                x,
                self_cache=cache["self"][i],
                cache_index=cache_index,
                cross_kv=cache["cross"][i],
                self_mask=self_mask,
            )
            new_cache["self"].append(new_self)

        x = self.ln(x)
        logits = jnp.einsum(
            "btd,vd->btv",
            x.astype(self.dtype),
            self.token_embedding.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.quantized:
            logits = logits * self.token_embedding_scale[None, None, :]
        return logits.astype(jnp.float32), new_cache

    def compute_cross_kv(self, audio_states: Array):
        return [block.compute_cross_kv(audio_states) for block in self.layers]


NEG_MASK = -1e9  # large-negative instead of -inf: keeps softmax NaN-free for
# all-masked rows (unwritten cache slots) in bf16/fp32 alike.


class Whisper(nn.Module):
    """Top-level module bundling encoder + decoder under one param tree."""

    config: WhisperConfig
    dtype: Any = jnp.float32
    # False | True (both stacks) | "decoder" (decode-path only: the decoder is
    # weight-HBM-bound per step, while the encoder is MXU compute-bound and
    # gains little from weight-only int8).
    quantized: Any = False
    # Encoder self-attention impl ("auto" | "flash" | "xla"); see
    # ops/attention.py. Set "xla" when the encoder is tensor-parallel.
    attn_impl: str = "auto"
    # Fused (D, 3D) QKV projections for all *self*-attention blocks; pair
    # with fuse_qkv_params. Keep False under tensor parallelism (the fused
    # output dim would shard across q/k/v regions).
    fused_qkv: bool = False
    # Quantized weight width: 8 or 4 (see Dense.quant_bits).
    quant_bits: int = 8

    def setup(self):
        q_enc = self.quantized is True or self.quantized == "encoder"
        q_dec = self.quantized is True or self.quantized == "decoder"
        self.encoder = AudioEncoder(
            self.config, dtype=self.dtype, quantized=q_enc, quant_bits=self.quant_bits,
            attn_impl=self.attn_impl, fused_qkv=self.fused_qkv,
        )
        self.decoder = TextDecoder(
            self.config, dtype=self.dtype, quantized=q_dec, quant_bits=self.quant_bits,
            fused_qkv=self.fused_qkv
        )

    def __call__(self, mel: Array, tokens: Array):
        """Teacher-forced forward pass (training / graft entry compile check)."""
        audio_states = self.encoder(mel)
        cache = self.empty_cache(tokens.shape[0])
        cache["cross"] = self.decoder.compute_cross_kv(audio_states)
        logits, _ = self.decoder(tokens, cache, jnp.int32(0))
        return logits

    def encode(self, mel: Array) -> Array:
        return self.encoder(mel)

    def decode_step(self, tokens: Array, cache: Cache, cache_index: Array):
        return self.decoder(tokens, cache, cache_index)

    def compute_cross_kv(self, audio_states: Array):
        return self.decoder.compute_cross_kv(audio_states)

    def empty_cache(self, batch: int, cache_dtype: Any = None, cache_len: int = 0) -> Cache:
        """Zeroed self-attention cache. ``cache_len`` trims the buffer below
        n_text_ctx (prompt+max_new); ``cache_dtype=jnp.int8`` adds per-token
        scale planes and halves cache HBM traffic.

        The "self" entry is a per-layer list of (B, T, H, Dh) buffer dicts —
        the layout the r4 on-chip probes crowned for in-loop beam reorders
        (see MultiHeadAttention.__call__). "cross" is a per-layer list
        (filled by the engine)."""
        cfg = self.config
        dt = cache_dtype or self.dtype
        head_dim = cfg.n_text_state // cfg.n_text_head
        L = cfg.n_text_layer
        shape = (batch, cache_len or cfg.n_text_ctx, cfg.n_text_head, head_dim)

        def one_layer():
            if dt in (jnp.int8, jnp.int4):
                sshape = shape[:-1] + (1,)
                return {
                    "k": jnp.zeros(shape, dt),
                    "v": jnp.zeros(shape, dt),
                    "k_scale": jnp.zeros(sshape, jnp.float32),
                    "v_scale": jnp.zeros(sshape, jnp.float32),
                }
            return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}

        return {"self": [one_layer() for _ in range(L)], "cross": [None] * L}


def random_params_like(shapes, seed: int = 0, scale: float = 0.02):
    """Materialize a parameter tree from eval_shape output on the host.

    Avoids compiling ``model.init`` (which traces the full forward — minutes
    for large models on a remote-compile backend). Name-aware: LayerNorm
    scales get ones, biases zeros, everything else small normals.
    """
    rng = np.random.default_rng(seed)
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    leaves = []
    for kp, sd in flat:
        name = str(kp[-1].key) if hasattr(kp[-1], "key") else str(kp[-1])
        if name == "scale" or name.endswith("_scale"):
            arr = np.ones(sd.shape, np.float32)
        elif name == "bias":
            arr = np.zeros(sd.shape, np.float32)
        else:
            arr = (rng.standard_normal(sd.shape) * scale).astype(np.float32)
        leaves.append(jnp.asarray(arr, dtype=sd.dtype))
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(shapes), leaves)


def whisper_param_shapes(config: WhisperConfig, dtype=jnp.float32):
    """Parameter ShapeDtypeStruct tree without any compilation."""
    model = Whisper(config, dtype=dtype)
    mel = jax.ShapeDtypeStruct((1, config.n_mels, 2 * config.n_audio_ctx), dtype)
    tokens = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    shapes = jax.eval_shape(
        lambda m, t: model.init(jax.random.PRNGKey(0), m, t), mel, tokens
    )["params"]
    return model, shapes


def init_whisper_params(config: WhisperConfig, seed: int = 0, dtype=jnp.float32):
    """Random-initialized parameter tree (tests / benchmarks without weights)."""
    model, shapes = whisper_param_shapes(config, dtype=dtype)
    return model, random_params_like(shapes, seed=seed)


def quantize_whisper(model: Whisper, params, scope: str = "all", bits: int = 8):
    """(model, fp params) → (int weight-only model, quantized params).

    TPU analogue of loading the reference's CT2 model with
    ``compute_type="int8"`` (whisperx/asr.py:262,288). ``scope="decoder"``
    quantizes only the decode path (encoder stays bf16 matmuls);
    ``bits=4`` stores Dense kernels as packed int4 (experimental).
    """
    flag = True if scope == "all" else scope
    qmodel = Whisper(
        model.config,
        dtype=model.dtype,
        quantized=flag,
        quant_bits=bits,
        attn_impl=model.attn_impl,
        fused_qkv=model.fused_qkv,
    )
    return qmodel, quantize_params(params, scope=scope, bits=bits)


def fuse_whisper_qkv(model: Whisper, params):
    """(model, params) → (fused-QKV model, fused params). Compose after
    quantize_whisper; keep unfused under tensor parallelism."""
    fmodel = Whisper(
        model.config,
        dtype=model.dtype,
        quantized=model.quantized,
        quant_bits=model.quant_bits,
        attn_impl=model.attn_impl,
        fused_qkv=True,
    )
    return fmodel, fuse_qkv_params(params)
