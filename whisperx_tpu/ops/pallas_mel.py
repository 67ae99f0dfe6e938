"""Fused log-mel front-end as a Pallas TPU kernel.

One kernel computes frames → windowed real-DFT → power → mel projection →
log10 for a tile of 128 frames, entirely in VMEM: the framed audio never
round-trips to HBM (the XLA conv formulation materializes a (B, 402, 3000)
intermediate). The final dynamic-range clip needs a per-sample global max, so
it stays outside as a cheap XLA reduction epilogue.

Key trick: with N_FFT=400 and HOP=160 both multiples of 80, the padded signal
reshaped to (n_blocks, 80) turns overlapping frames into *stride-2 row
slices*: frame i = rows [2i, 2i+5) of the block matrix. A tile of 128 frames
therefore needs one contiguous 260-row DMA and five strided slices — no
gather, no im2col.

Numerics match audio/mel.py (golden-tested); `log_mel_pallas` is shape- and
value-compatible with `log_mel_spectrogram`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.constants import HOP_LENGTH, N_FFT, N_FREQS
from ..audio.mel import _dft_basis, mel_filters

FRAME_TILE = 120  # frames per kernel instance (divides 3000; 8-aligned sublanes)
SUB = 80  # gcd-ish granule: N_FFT = 5*SUB, HOP = 2*SUB


def _kernel(tile_ref, basis_ref, filt_ref, out_ref):
    """One (batch, frame-tile) cell.

    tile_ref:  (1, 1, 2*FRAME_TILE + 4, SUB) audio blocks for this tile
    basis_ref: (N_FFT, 2*N_FREQS) windowed DFT basis  [cos | -sin]
    filt_ref:  (N_FREQS, n_mels) mel filterbank (transposed)
    out_ref:   (1, FRAME_TILE, n_mels) log10-mel tile
    """
    rows = tile_ref[0, 0]  # (2*FRAME_TILE+4, 80)
    # frame i (i in tile) = rows[2i : 2i+5] flattened: five stride-2 slices.
    parts = [rows[k : k + 2 * FRAME_TILE : 2, :] for k in range(5)]  # (FRAME_TILE, 80) each
    frames = jnp.concatenate(parts, axis=1)  # (FRAME_TILE, 400)

    spec = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32)  # (128, 402)
    power = spec[:, :N_FREQS] ** 2 + spec[:, N_FREQS:] ** 2  # (128, 201)
    mel = jnp.dot(power, filt_ref[:], preferred_element_type=jnp.float32)  # (128, n_mels)
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_pallas(audio: jax.Array, n_mels: int = 80, interpret: bool = False) -> jax.Array:
    """Pallas log-mel: (B, n_samples) → (B, n_mels, n_frames).

    n_samples must be a multiple of HOP_LENGTH; n_frames = n_samples // HOP.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = audio.ndim == 1
    x = audio[None, :] if squeeze else audio
    x = x.astype(jnp.float32)
    B, n_samples = x.shape
    n_frames = n_samples // HOP_LENGTH
    assert n_frames % FRAME_TILE == 0, f"n_frames={n_frames} must be a multiple of {FRAME_TILE}"

    half = N_FFT // 2
    x = jnp.pad(x, ((0, 0), (half, half)), mode="reflect")
    # Need (2*n_frames + 4) SUB-blocks of samples for the last frame's tail.
    need = (2 * n_frames + 4) * SUB
    if need > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    else:
        x = x[:, :need]
    blocks = x.reshape(B, 2 * n_frames + 4, SUB)

    # Tiles overlap by 4 block rows (the 240-sample frame tail crossing the
    # tile boundary); BlockSpec tiling is disjoint, so materialize the
    # overlapped view once in XLA (a ~1.6% copy of the audio, VMEM-friendly).
    n_tiles = n_frames // FRAME_TILE
    rows_main = 2 * FRAME_TILE  # 240 rows per tile
    tiles_main = blocks[:, : rows_main * n_tiles].reshape(B, n_tiles, rows_main, SUB)
    tail = jnp.concatenate(
        [tiles_main[:, 1:, :4], jnp.zeros((B, 1, 4, SUB), jnp.float32)], axis=1
    )
    last_tail = jax.lax.dynamic_slice_in_dim(blocks, rows_main * n_tiles, 4, axis=1)
    tail = tail.at[:, -1].set(last_tail)
    tiles = jnp.concatenate([tiles_main, tail], axis=2)  # (B, n_tiles, 244, 80)

    basis = jnp.asarray(_dft_basis())  # (400, 402)
    filt = jnp.asarray(mel_filters(n_mels)).T  # (201, n_mels)

    grid = (B, n_tiles)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_frames, n_mels), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, rows_main + 4, SUB), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((N_FFT, 2 * N_FREQS), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FREQS, n_mels), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAME_TILE, n_mels), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(tiles, basis, filt)

    log_spec = out.transpose(0, 2, 1)  # (B, n_mels, n_frames)
    max_per_sample = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_per_sample - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec[0] if squeeze else log_spec
