"""Fused Pallas cross-attention kernel for the beam-decode step.

Cross-attention dominates the per-token HBM traffic of batched beam decode:
every step re-reads the full encoder K/V (~31 MB int8 per layer for
large-v2 at batch 8). The XLA path spends several kernels per layer
(logits matmul, scale epilogues, fp32 softmax, weights matmul) and stores
K/V as (B, S, H, Dh=64) — whose trailing (20, 64) dims tile-pad badly on
TPU (int8 tiles are 32x128). This kernel instead:

- stores K/V **flat**: (B, S, D=H*Dh) int8 (lane-aligned, D % 128 == 0),
  with per-(token, head) scales transposed to (B, H, S) fp32;
- runs one program per batch element: K, V, and both scale planes are
  DMA'd to VMEM once and every head reads them from VMEM;
- processes heads in pairs (Dh=64, so two heads fill one 128-lane slice):
  queries for the pair are zero-padded into a (2G, 128) operand so a
  single transposed matmul yields both heads' logits without lane
  shuffles; int8 scales commute into the logits/weights epilogues exactly
  like the XLA path (models/whisper.py MultiHeadAttention);
- fp32 softmax over the (padded) key axis with an explicit length mask.

Replaces the reference's CT2 C++ cross-attention inside beam search
(whisperx/asr.py:53-62) with a single TPU program per layer per step.
Requires head_dim == 64 (true for every released Whisper size) and an even
head count; callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref, *, S: int, H: int, G: int):
    """One batch element. Shapes (leading block dim of 1 squeezed by refs):
    q (1, G, D) bf16, k/v (1, S, D) int8-or-bf16, ks/vs (1, H, S) fp32,
    out (1, G, D) fp32.
    """
    Dh = 64
    n_pairs = H // 2
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (2 * G, 128), 1)
    first_head_lane = lane_ids < Dh  # (2G, 128) selector for the merge

    for p in range(n_pairs):
        h0, h1 = 2 * p, 2 * p + 1
        kp = k_ref[0, :, p * 128 : (p + 1) * 128]  # (S, 128)
        vp = v_ref[0, :, p * 128 : (p + 1) * 128]

        q_pair = q_ref[0, :, p * 128 : (p + 1) * 128].astype(jnp.float32)  # (G,128)
        # (2G, 128): rows 0..G carry h0's 64 dims (upper lanes zeroed), rows
        # G..2G carry h1's (lower lanes zeroed) — one matmul, two heads.
        q_two = jnp.concatenate(
            [
                jnp.where(lane_ids[:G] < Dh, q_pair, 0.0),
                jnp.where(lane_ids[:G] >= Dh, q_pair, 0.0),
            ],
            axis=0,
        ).astype(jnp.bfloat16)

        logits = jax.lax.dot_general(
            q_two,
            kp.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),  # contract lanes; k transposed
            preferred_element_type=jnp.float32,
        )  # (2G, S)
        ks_two = jnp.concatenate(
            [
                jnp.broadcast_to(ks_ref[0, h0 : h0 + 1, :], (G, S)),
                jnp.broadcast_to(ks_ref[0, h1 : h1 + 1, :], (G, S)),
            ],
            axis=0,
        )
        logits = logits * ks_two

        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=1, keepdims=True)  # (2G, S) fp32

        vs_two = jnp.concatenate(
            [
                jnp.broadcast_to(vs_ref[0, h0 : h0 + 1, :], (G, S)),
                jnp.broadcast_to(vs_ref[0, h1 : h1 + 1, :], (G, S)),
            ],
            axis=0,
        )
        w = (w * vs_two).astype(jnp.bfloat16)

        o = jax.lax.dot_general(
            w,
            vp.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2G, 128): rows 0..G valid on lanes 0..64, rows G..2G on 64..128
        merged = jnp.where(first_head_lane[:G], o[:G], o[G:])  # (G, 128)
        out_ref[0, :, p * 128 : (p + 1) * 128] = merged


@functools.partial(jax.jit, static_argnames=("interpret",))
def cross_attention_decode(
    q: jax.Array,  # (B, G, D) bf16 — G query rows (beams) per batch element
    k: jax.Array,  # (B, S, D) int8 or bf16
    v: jax.Array,  # (B, S, D) int8 or bf16
    k_scale: jax.Array,  # (B, H, S) fp32 (ones when K is fp)
    v_scale: jax.Array,  # (B, H, S) fp32
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused decode-step cross attention; returns (B, G, D) fp32.

    q must already carry the full 1/sqrt(Dh) logit scaling (the caller's
    d**-0.25 on q is combined with k's d**-0.25 into q here).
    ``interpret=None`` resolves to True on CPU (tests) and False on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, G, D = q.shape
    S = k.shape[1]
    H = k_scale.shape[1]
    assert D % 128 == 0 and D // H == 64 and H % 2 == 0, (D, H)

    kern = functools.partial(_kernel, S=S, H=H, G=G)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, G, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, D), jnp.float32),
        interpret=interpret,
    )(q, k, v, k_scale, v_scale)
    return out
