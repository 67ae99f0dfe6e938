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


def _backtrack_one(trellis, blank_em, tok_em, t_start, n_len):
    """Device greedy stay/change walk for ONE (padded) segment.

    Scan over t = T..1 with carried token pointer j; identical decision rule
    to :func:`backtrack`. Returns per-step (token_index, prob, active) in
    descending-t order plus the final pointer (0 == success).
    """
    T = blank_em.shape[0]

    def step(j, xs):
        row_prev, b, tok_prev, t = xs  # trellis[t-1] (N+1,), scalars/(N,)
        active = (t <= t_start) & (j > 0)
        jm1 = jnp.maximum(j - 1, 0)
        stayed = row_prev[j] + b
        changed = row_prev[jm1] + tok_prev[jm1]
        take = changed > stayed
        prob = jnp.exp(jnp.where(take, tok_prev[jm1], b))
        new_j = jnp.where(active & take, jm1, j)
        return new_j, (jm1, prob, active)

    xs = (
        trellis[T - 1 :: -1],  # rows t-1 for t = T..1
        blank_em[::-1],
        tok_em[::-1],
        jnp.arange(T, 0, -1),
    )
    j_final, (tok_idx, probs, active) = jax.lax.scan(step, n_len, xs)
    return tok_idx, probs, active, j_final


@functools.partial(jax.jit, static_argnames=("blank", "backend"))
def ctc_align_batch_device(
    log_probs: jax.Array,  # (B, T, V)
    tokens: jax.Array,  # (B, N)
    t_len: jax.Array,  # (B,)
    n_len: jax.Array,  # (B,)
    blank: int = 0,
    backend: str = "scan",
):
    """Fused trellis + backtrack, entirely on device.

    The host-backtrack variant ships the full (B, T+1, N+1) trellis to the
    host (tens of MB per batch through a TPU relay) and walks it in Python;
    here the walk is a vmapped ``lax.scan`` and only (B, T) path arrays come
    back. Returns (token_idx, probs, active, success, t_start).
    """
    # "scan" is the only trellis implementation. A VMEM-resident Pallas
    # trellis kernel was built and A/B'd in r2 but failed Mosaic lowering at
    # production shapes (dynamic lane-dim indexing at T=1499) and the scan
    # trellis is ~0.7% of the end-to-end budget — deleted rather than shipped
    # broken (benchmarks/AB_RESULTS.json). Unknown backends are an error, not
    # a silent no-op (a knob that quietly does nothing is worse than one that
    # raises).
    if backend != "scan":
        raise ValueError(
            f"unknown CTC trellis backend {backend!r}: 'scan' is the only "
            "implementation (the r2 Pallas trellis was deleted)"
        )
    trellis = ctc_trellis_batch(log_probs, tokens, t_len, n_len, blank=blank)

    blank_em = log_probs[:, :, blank]
    tok_em = jnp.take_along_axis(log_probs, tokens[:, None, :], axis=2)

    B, T1, _ = trellis.shape
    # Start row: argmax over valid rows (t <= t_len) of the true final column.
    col = jnp.take_along_axis(trellis, n_len[:, None, None], axis=2)[..., 0]  # (B, T+1)
    rows = jnp.arange(T1)[None, :]
    col = jnp.where(rows <= t_len[:, None], col, -INF)
    t_start = jnp.argmax(col, axis=1).astype(jnp.int32)

    tok_idx, probs, active, j_final = jax.vmap(_backtrack_one)(
        trellis, blank_em, tok_em, t_start, n_len
    )
    success = j_final == 0
    return tok_idx, probs, active, success, t_start


def align_tokens_batch(
    log_probs: np.ndarray,  # (B, T, V) on host
    token_lists: List[List[int]],
    t_lens: List[int],
    blank: int = 0,
    backend: str = None,
    backtrack_impl: str = None,
):
    """Batched trellis + backtrack for a padded batch of segments.

    ``backend`` is accepted for API stability but "scan" (lax.scan, any
    platform) is the only trellis implementation — see the note in
    :func:`ctc_align_batch_device`. ``backtrack_impl`` is
    "device" (fused jit walk, default) or "host" (numpy reference walk,
    $WHISPERX_CTC_BACKTRACK). Returns a list (one per segment) of path lists
    (or None on failure).
    """
    import os

    backend = backend or os.environ.get("WHISPERX_CTC_BACKEND", "scan")
    backtrack_impl = backtrack_impl or os.environ.get("WHISPERX_CTC_BACKTRACK", "device")
    B, T, V = log_probs.shape
    # Bucket the token-count dim so segment batches reuse compile signatures.
    N_true = max((len(t) for t in token_lists), default=1)
    N = max(64, -(-N_true // 64) * 64) if backtrack_impl == "device" else N_true
    tokens = np.zeros((B, N), np.int32)
    n_len = np.zeros((B,), np.int32)
    for i, tl in enumerate(token_lists):
        tokens[i, : len(tl)] = tl
        n_len[i] = len(tl)

    if backtrack_impl == "device":
        tok_idx, probs, active, success, t_start = ctc_align_batch_device(
            jnp.asarray(log_probs),
            jnp.asarray(tokens),
            jnp.asarray(t_lens, dtype=jnp.int32),
            jnp.asarray(n_len),
            blank=blank,
            backend=backend,
        )
        tok_idx = np.asarray(tok_idx)
        probs = np.asarray(probs)
        active = np.asarray(active)
        success = np.asarray(success)
        times = T - 1 - np.arange(T)  # time_index at each scan position
        out = []
        for i in range(len(token_lists)):
            if not success[i]:
                out.append(None)
                continue
            ks = np.nonzero(active[i])[0]
            out.append(
                [
                    PathPoint(int(tok_idx[i, k]), int(times[k]), float(probs[i, k]))
                    for k in ks
                ][::-1]
            )
        return out

    trellis = np.asarray(
        ctc_trellis_batch(
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
