"""Fused (flash) self-attention for the fixed-length encoder stacks.

The Whisper audio encoder and wav2vec2 both run bidirectional self-attention
over ~1500-frame sequences. Left to XLA, the (B, H, T, T) logits tensor is
materialized to HBM per layer (softmax in fp32: ~1500*1500*4 bytes per
(batch, head) = ~9 MB, far beyond VMEM), so every encoder layer pays
O(B*H*T^2) HBM writes+reads — comparable to its matmul FLOP time. The
Pallas flash-attention kernel (online softmax, blockwise K/V streaming)
keeps the running max/denominator in VMEM and never materializes logits.

This wrapper adapts the stock TPU kernel
(jax.experimental.pallas.ops.tpu.flash_attention) to the models here:

- inputs in (B, T, H, Dh) layout with q/k pre-scaled by Dh**-0.25 each
  (bf16-range-safe convention used by both models), so ``sm_scale=1.0``;
- T is padded to a multiple of 512 (kernel block sizes must divide the
  sequence length); padded *keys* are excluded via segment ids, padded
  *query* rows are sliced off after the kernel;
- an optional (B, T) key-validity mask maps onto the kv segment ids
  (matching the additive NEG_MASK semantics of the naive path);
- "auto" resolves to the fused kernel on TPU and the naive XLA path on CPU
  (tests run the kernel in Pallas interpret mode for parity).

Reference behavior being accelerated: the torch SDPA inside pyannote/HF
wav2vec2 and CT2's encoder attention (whisperx/alignment.py:228,
whisperx/asr.py:77-86) — here it is one Pallas program instead of an
opaque backend.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

_BLOCK_MULTIPLE = 512


def resolve_attn_impl(impl: str = "auto") -> str:
    """'auto' → 'xla'. Env override: WHISPERX_ATTN=flash|xla.

    Measured on a v5e chip (benchmarks/decompose.py, large-v2 batch 8): the
    stock flash kernel more than doubled encoder time vs XLA's own fusion of
    the 1500-frame attention (264 ms → 540 ms for the full encoder) — XLA
    does not materialize the naive (B,H,T,T) logits here, and head_dim 64
    under-utilizes the kernel's 128-lane blocks. The fused path stays
    available for A/B via WHISPERX_ATTN=flash or impl="flash".
    """
    env = os.environ.get("WHISPERX_ATTN", "")
    if env in ("flash", "xla"):
        return env
    if impl != "auto":
        return impl
    if jax.default_backend() == "cpu":
        return "xla"
    try:  # under a multi-device mesh pjit cannot partition a bare pallas_call
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is not None and not mesh.empty and mesh.size > 1:
            return "xla"
    except Exception:
        pass
    return "xla"


def _naive(q, k, v, pad_mask, neg_mask: float):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if pad_mask is not None:
        logits = logits + jnp.where(pad_mask, 0.0, neg_mask)[:, None, None, :]
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def fused_self_attention(
    q: jax.Array,  # (B, T, H, Dh), pre-scaled
    k: jax.Array,  # (B, T, H, Dh), pre-scaled
    v: jax.Array,  # (B, T, H, Dh)
    pad_mask: Optional[jax.Array] = None,  # (B, T) bool/int, 1 = valid key
    *,
    impl: str = "auto",
    neg_mask: float = -1e9,
    interpret: bool = False,
) -> jax.Array:
    """Bidirectional self-attention, (B, T, H, Dh) → (B, T, H, Dh)."""
    impl = resolve_attn_impl(impl)
    if impl == "xla":
        return _naive(q, k, v, pad_mask, neg_mask)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    B, T, H, Dh = q.shape
    pad = (-T) % _BLOCK_MULTIPLE
    Tp = T + pad

    def to_bhtd(x):
        x = jnp.swapaxes(x, 1, 2)  # (B, H, T, Dh)
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else x

    qf, kf, vf = to_bhtd(q), to_bhtd(k), to_bhtd(v)

    # Segment ids: every query row sees exactly the valid keys (the naive
    # path's additive mask semantics). Padded tail keys get segment 0;
    # padded tail query rows also sit in segment 0 so they softmax over a
    # non-empty (padded) key set — NaN-free — and are sliced off below.
    valid = jnp.ones((B, T), jnp.int32) if pad_mask is None else pad_mask.astype(jnp.int32)
    seg = jnp.pad(valid, ((0, 0), (0, pad))) if pad else valid
    q_seg = jnp.pad(jnp.ones((B, T), jnp.int32), ((0, 0), (0, pad))) if pad else jnp.ones(
        (B, T), jnp.int32
    )
    segment_ids = fa.SegmentIds(q=q_seg, kv=seg)

    kernel = fa.flash_attention
    if interpret:  # CPU parity tests run the same kernel interpreted
        from jax.experimental.pallas import tpu as pltpu

        def kernel(*a, **kw):
            with pltpu.force_tpu_interpret_mode():
                return fa.flash_attention(*a, **kw)

    out = kernel(qf, kf, vf, segment_ids=segment_ids, causal=False, sm_scale=1.0)
    out = out[:, :, :T] if pad else out
    return jnp.swapaxes(out, 1, 2).astype(v.dtype)
