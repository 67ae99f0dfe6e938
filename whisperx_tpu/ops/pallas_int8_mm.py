"""Pallas weight-only int8 matmul for the decode path.

The quantized Dense computes ``dot(x_bf16, convert(w_int8)) * scale``. If
XLA materializes the bf16 convert of a (K, N) weight instead of fusing it
into the dot's operand load, every decode step pays 3x the weight HBM
traffic (int8 read + bf16 write + bf16 read). This kernel performs the
dequant in VMEM: the int8 block is DMA'd once, converted in registers, and
fed to the MXU, with the per-output-channel scale (and bias) applied in the
fp32 epilogue.

Decode-step scoped: activations are small (M = batch*beams <= 64 rows), so
x stays fully resident and the grid tiles only the output dim. Gated by
WHISPERX_INT8_MM=pallas (off by default until measured faster than XLA on
the target chip).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max query rows the kernel accepts (beam decode: batch*beams; prompts are
# a few tokens * batch). Above this, callers use the XLA path.
MAX_ROWS = 256
_BN = 512  # output-channel block


def _kernel(x_ref, w_ref, s_ref, b_ref, out_ref):
    x = x_ref[:]  # (M, K) bf16
    w = w_ref[:]  # (K, BN) int8 → dequant in registers
    acc = jnp.dot(x, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    out = acc * s_ref[:].astype(jnp.float32)
    out_ref[:] = (out + b_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_matmul(
    x: jax.Array,  # (M, K) bf16/fp32, M <= MAX_ROWS
    w: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (N,) fp32 per-output-channel
    bias: Optional[jax.Array] = None,  # (N,) fp32
    *,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """y = (x @ dequant(w)) * scale + bias, dequantized in VMEM."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, K = x.shape
    Kw, N = w.shape
    assert K == Kw and M <= MAX_ROWS and N % 128 == 0, (x.shape, w.shape)
    bn = min(_BN, N)
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)

    out = pl.pallas_call(
        _kernel,
        grid=(pl.cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w, scale.reshape(1, N), bias.reshape(1, N))
    return out
