"""CTC max-plus trellis as a Pallas TPU kernel.

Alternative backend to the `lax.scan` formulation in ops/ctc.py: one kernel
instance per segment keeps the running trellis row in VMEM across the whole
time loop — the (T, N) token-emission block is DMA'd once and the only HBM
writes are the output rows. On the scan version, XLA already fuses well; this
kernel exists to pin the roofline (single pass over emissions) and as the
substrate for future fusion with the emission log-softmax.

Semantics identical to ops/ctc.py (same torchaudio-style recurrence and the
+inf column-0 tail) — cross-checked by tests in interpret mode and usable via
``ctc_trellis_batch(..., backend="pallas")``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _trellis_kernel(blank_ref, tok_ref, col0_ref, out_ref):
    """One segment: recurrence over T with the row resident in VMEM.

    blank_ref: (1, 1, T) blank log-probs
    tok_ref:   (1, T, N) per-token log-probs
    col0_ref:  (1, 1, T+1) precomputed column 0 (cumsum/+inf tail)
    out_ref:   (1, T+1, N+1) trellis

    The (1, 1, ·) shapes exist for the TPU lowering rule that a block's last
    two dims must divide (8, 128) or equal the array dims — a (1, T) block of
    a (B, T) array has second-to-last dim 1 vs 8; with the explicit singleton
    axis both trailing dims equal the array's.
    """
    T = blank_ref.shape[2]
    N = tok_ref.shape[2]

    row0 = jnp.concatenate(
        [col0_ref[0, :, 0:1], jnp.full((1, N), NEG_INF, jnp.float32)], axis=1
    )  # (1, N+1)
    out_ref[0, 0:1, :] = row0

    def body(t, row):
        stay = row[:, 1:] + blank_ref[0, 0, t]
        advance = row[:, :-1] + tok_ref[0, t, :][None, :]
        tail = jnp.maximum(stay, advance)
        new_row = jnp.concatenate([col0_ref[0, :, pl.ds(t + 1, 1)], tail], axis=1)
        out_ref[0, pl.ds(t + 1, 1), :] = new_row
        return new_row

    jax.lax.fori_loop(0, T, body, row0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ctc_trellis_pallas(
    log_probs: jax.Array,  # (B, T, V)
    tokens: jax.Array,  # (B, N)
    t_len: jax.Array,  # (B,)
    n_len: jax.Array,  # (B,)
    blank: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Pallas backend for the alignment trellis; same contract as
    ops.ctc.ctc_trellis_batch."""
    B, T, V = log_probs.shape
    N = tokens.shape[1]

    blank_em = log_probs[:, :, blank]
    tok_em = jnp.take_along_axis(log_probs, tokens[:, None, :], axis=2)

    csum = jnp.cumsum(blank_em, axis=1)
    rows = jnp.arange(1, T + 1)[None, :]
    col0_tail = jnp.where(rows > (t_len - n_len)[:, None], jnp.inf, csum)
    col0 = jnp.concatenate([jnp.zeros((B, 1)), col0_tail], axis=1)

    out = pl.pallas_call(
        _trellis_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T + 1, N + 1), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T + 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T + 1, N + 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        blank_em[:, None, :].astype(jnp.float32),
        tok_em.astype(jnp.float32),
        col0[:, None, :].astype(jnp.float32),
    )
    return out
