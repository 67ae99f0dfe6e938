"""CTC forced-alignment: batched max-plus trellis on device, host backtrack.

Semantics follow the published torchaudio forced-alignment recurrence the
reference uses (whisperx/alignment.py:359-421): trellis (T+1, N+1) with
``new[j] = max(prev[j] + blank_t, prev[j-1] + token_t[j])``, a cumsum-of-blank
first column whose last N rows are +inf (forcing full token consumption), and
a greedy stay/change backtrack from the argmax of the final column.

TPU-first differences from the reference:
- The reference runs a Python-over-torch loop per segment on CPU (its
  acknowledged hot spot, alignment.py:372-378). Here the time recurrence is a
  single ``lax.scan`` *vectorized over a batch of segments* with per-element
  true (T, N) lengths, so bucketed batches of segments align in one fused
  device program.
- Token emissions are pre-gathered once ((B, T, N) take-along) so the scan
  body is two adds and a max on the VPU — no per-step gathers.
- Backtrack is O(T) pointer chasing per segment — host numpy, negligible.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

INF = float("inf")


@functools.partial(jax.jit, static_argnames=("blank",))
def ctc_trellis_batch(
    log_probs: jax.Array,  # (B, T, V) log-softmax emissions
    tokens: jax.Array,  # (B, N) int32, padded with any valid id
    t_len: jax.Array,  # (B,) true frame counts
    n_len: jax.Array,  # (B,) true token counts
    blank: int = 0,
) -> jax.Array:
    """Compute (B, T+1, N+1) alignment trellises for a padded segment batch."""
    B, T, V = log_probs.shape
    N = tokens.shape[1]

    blank_em = log_probs[:, :, blank]  # (B, T)
    tok_em = jnp.take_along_axis(log_probs, tokens[:, None, :], axis=2)  # (B, T, N)

    # Column 0: row 0 is 0; rows 1..T are cumsum of blank, with the last
    # n_len rows set to +inf (the full-consumption forcing trick).
    csum = jnp.cumsum(blank_em, axis=1)  # (B, T)
    rows = jnp.arange(1, T + 1)[None, :]  # (1, T)
    col0_tail = jnp.where(rows > (t_len - n_len)[:, None], INF, csum)
    col0 = jnp.concatenate([jnp.zeros((B, 1)), col0_tail], axis=1)  # (B, T+1)

    row0 = jnp.concatenate([jnp.zeros((B, 1)), jnp.full((B, N), -INF)], axis=1)

    def step(prev_row, t):
        b = blank_em[:, t][:, None]  # (B, 1)
        stay = prev_row[:, 1:] + b  # (B, N)
        advance = prev_row[:, :-1] + tok_em[:, t, :]  # (B, N)
        new_tail = jnp.maximum(stay, advance)
        new_row = jnp.concatenate([col0[:, t + 1][:, None], new_tail], axis=1)
        return new_row, new_row

    _, rows_out = jax.lax.scan(step, row0, jnp.arange(T))
    # rows_out: (T, B, N+1) -> (B, T+1, N+1)
    trellis = jnp.concatenate([row0[:, None, :], rows_out.transpose(1, 0, 2)], axis=1)
    return trellis


@dataclass
class PathPoint:
    token_index: int
    time_index: int
    score: float  # frame-wise probability


@dataclass
class CharSpan:
    label: str
    start: int  # frame index (inclusive)
    end: int  # frame index (exclusive)
    score: float


def backtrack(
    trellis: np.ndarray,  # (T+1, N+1), true sizes (unpadded view)
    blank_em: np.ndarray,  # (T,) blank log-probs
    tok_em: np.ndarray,  # (T, N) per-token log-probs
) -> Optional[List[PathPoint]]:
    """Greedy stay/change walk from argmax of the last column.

    Returns None when the walk exhausts time before consuming all tokens —
    callers fall back to segment-level timestamps, the same degraded-output
    contract as the reference (whisperx/alignment.py:245-248).
    """
    T = trellis.shape[0] - 1
    N = trellis.shape[1] - 1
    j = N
    t_start = int(np.argmax(trellis[:, j]))

    path: List[PathPoint] = []
    for t in range(t_start, 0, -1):
        stayed = trellis[t - 1, j] + blank_em[t - 1]
        changed = trellis[t - 1, j - 1] + tok_em[t - 1, j - 1]
        prob = float(np.exp(tok_em[t - 1, j - 1] if changed > stayed else blank_em[t - 1]))
        path.append(PathPoint(j - 1, t - 1, prob))
        if changed > stayed:
            j -= 1
            if j == 0:
                break
    else:
        return None
    return path[::-1]


def merge_repeats(path: List[PathPoint], transcript: str) -> List[CharSpan]:
    """Collapse consecutive path points of the same token into char spans."""
    spans: List[CharSpan] = []
    i1 = 0
    while i1 < len(path):
        i2 = i1
        while i2 < len(path) and path[i1].token_index == path[i2].token_index:
            i2 += 1
        score = sum(p.score for p in path[i1:i2]) / (i2 - i1)
        spans.append(
            CharSpan(
                transcript[path[i1].token_index],
                path[i1].time_index,
                path[i2 - 1].time_index + 1,
                score,
            )
        )
        i1 = i2
    return spans


def merge_words(spans: List[CharSpan], separator: str = "|") -> List[CharSpan]:
    """Group char spans into word spans at separator chars (length-weighted score)."""
    words: List[CharSpan] = []
    i1, i2 = 0, 0
    while i1 < len(spans):
        if i2 >= len(spans) or spans[i2].label == separator:
            if i1 != i2:
                segs = spans[i1:i2]
                word = "".join(s.label for s in segs)
                total = sum(s.end - s.start for s in segs)
                score = sum(s.score * (s.end - s.start) for s in segs) / total
                words.append(CharSpan(word, segs[0].start, segs[-1].end, score))
            i1 = i2 + 1
            i2 = i1
        else:
            i2 += 1
    return words


def align_tokens_batch(
    log_probs: np.ndarray,  # (B, T, V) on host
    token_lists: List[List[int]],
    t_lens: List[int],
    blank: int = 0,
    backend: str = None,
):
    """Device trellis + host backtrack for a padded batch of segments.

    ``backend`` selects the trellis implementation: "scan" (lax.scan, any
    platform) or "pallas" (the VMEM-resident TPU kernel in ops/pallas_ctc).
    Defaults to $WHISPERX_CTC_BACKEND or "scan".
    Returns a list (one per segment) of path lists (or None on failure).
    """
    import os

    backend = backend or os.environ.get("WHISPERX_CTC_BACKEND", "scan")
    B, T, V = log_probs.shape
    N = max((len(t) for t in token_lists), default=1)
    tokens = np.zeros((B, N), np.int32)
    n_len = np.zeros((B,), np.int32)
    for i, tl in enumerate(token_lists):
        tokens[i, : len(tl)] = tl
        n_len[i] = len(tl)

    if backend == "pallas":
        from .pallas_ctc import ctc_trellis_pallas

        trellis_fn = functools.partial(
            ctc_trellis_pallas,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        trellis_fn = ctc_trellis_batch

    trellis = np.asarray(
        trellis_fn(
            jnp.asarray(log_probs), jnp.asarray(tokens), jnp.asarray(t_lens, dtype=jnp.int32),
            jnp.asarray(n_len), blank=blank,
        )
    )

    out = []
    for i, tl in enumerate(token_lists):
        Ti, Ni = int(t_lens[i]), len(tl)
        em_i = log_probs[i, :Ti]
        blank_em = em_i[:, blank]
        tok_em = em_i[:, tl]
        tr = trellis[i, : Ti + 1, : Ni + 1]
        out.append(backtrack(tr, blank_em, tok_em))
    return out
