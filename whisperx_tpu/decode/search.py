"""Batched greedy and beam-search decoding, fully jit-compiled.

This replaces CTranslate2's dynamic C++ beam-search loop (the hottest path in
the reference, whisperx/asr.py:53-62) with fixed-shape XLA programs:

- One compile per (batch, prompt-length, beam) signature; the step loop is a
  ``lax.while_loop`` whose carry holds the token buffer, KV cache, beam
  scores, and finished-hypothesis buffers — all static shapes.
- Beam state lives as a flattened ``B*K`` leading axis so cache reindexing is
  one gather and the model's batched matmuls stay large for the MXU. Under a
  mesh, that axis is sharded on "data" and the gather stays local because
  beams of one batch element are co-located.
- The alive/finished bookkeeping follows the standard fixed-shape beam
  formulation: take top-2K candidates each step so EOT picks cannot starve
  the K alive lanes; finished hypotheses merge into a top-K buffer ranked by
  GNMT length-penalized score; ``patience`` scales how many finished
  candidates must accumulate before early exit (CT2 semantics).

Logit filters (token suppression, blank suppression at step 0) are baked into
a static mask at trace time — a (V,) add is one fused VPU op.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float(np.finfo(np.float32).min)


@dataclass(frozen=True)
class SearchOptions:
    """Static decode configuration (part of the jit cache key)."""

    beam_size: int = 5
    patience: float = 1.0
    length_penalty: float = 1.0
    max_new_tokens: int = 224
    temperature: float = 0.0
    suppress_tokens: tuple[int, ...] = ()
    suppress_blank: bool = True
    blank_tokens: tuple[int, ...] = ()  # token ids of " " (suppressed at step 0)
    eot: int = 50257
    # Tokens that may never be produced (timestamps in no-timestamp mode etc.)
    banned_tokens: tuple[int, ...] = ()
    # "model" keeps KV in the model compute dtype; "int8" quantizes the self
    # cache and cross K/V per (token, head) — halves the dominant HBM traffic
    # of beam decode at negligible accuracy cost.
    kv_cache_dtype: str = "model"
    # Cross-attention impl for decode: "auto" → XLA einsum with the
    # scale-commuting int8 epilogue. A/B'd against the fused Pallas kernel at
    # the flagship shape — XLA wins (r3 recorded runs: 138.47x vs 135.07x,
    # benchmarks/AB_RESULTS.json cross-attn-xla/cross-attn-pallas; the r2
    # paired runs agreed 3/3): XLA fuses the dequant epilogue and pipelines
    # weight streaming better than the per-layer kernel launches. The kernel
    # stays available via WHISPERX_CROSS_ATTN=pallas.
    cross_attn: str = "auto"
    # Candidate-selection impl for the per-step (B, K*V) top-2K: "exact" →
    # lax.top_k (full sort-based reduction); "approx" → lax.approx_max_k with
    # recall_target=1.0 — exact *values* (tie order among exactly-equal
    # scores is unspecified; tests compare sorted pairs) lowered to the
    # TPU-optimized PartialReduce op, substantially cheaper than top_k at
    # V≈52k. "auto" resolves via the WHISPERX_TOPK env var, else "exact".
    topk: str = "auto"


def _static_suppress_mask(n_vocab: int, opts: SearchOptions) -> np.ndarray:
    mask = np.zeros((n_vocab,), np.float32)
    for t in opts.suppress_tokens:
        if 0 <= t < n_vocab:
            mask[t] = NEG_INF
    for t in opts.banned_tokens:
        if 0 <= t < n_vocab:
            mask[t] = NEG_INF
    return mask


def _first_step_mask(n_vocab: int, opts: SearchOptions) -> np.ndarray:
    mask = np.zeros((n_vocab,), np.float32)
    if opts.suppress_blank:
        for t in (*opts.blank_tokens, opts.eot):
            if 0 <= t < n_vocab:
                mask[t] = NEG_INF
    return mask


def length_penalized(score, length, alpha: float):
    """GNMT length normalization: score / ((5+L)/6)^alpha (CT2 convention)."""
    return score / (((5.0 + length) / 6.0) ** alpha)


def _resolve_topk(opts: SearchOptions) -> Callable:
    """top-k implementation for the hot (B, K*V) candidate selection.

    An explicit ``opts.topk`` wins; the WHISPERX_TOPK env var only fills the
    "auto" case (read at trace time — the jit cache keys on static opts, so
    changing the env var after the first compile has no effect).
    """
    import os

    impl = opts.topk
    if impl == "auto":
        impl = os.environ.get("WHISPERX_TOPK", "")
        if not impl:
            # On-chip A/B winner (benchmarks/AB_RESULTS.json r2: 132.9x vs
            # 130.3x): approx_max_k lowers to the TPU PartialReduce op with
            # exact values at recall_target=1.0. CPU keeps the plain top_k.
            impl = "approx" if jax.default_backend() == "tpu" else "exact"
    if impl not in ("exact", "approx"):
        raise ValueError(f"unknown top-k impl {impl!r}: expected exact|approx|auto")
    if impl == "approx":
        return functools.partial(
            jax.lax.approx_max_k, recall_target=1.0, aggregate_to_topk=True
        )
    return jax.lax.top_k


def greedy_decode(
    step_fn: Callable,
    init_logits: jax.Array,  # (B, V) logits after the prompt
    init_cache,
    prompt_len: int,
    opts: SearchOptions,
    rng: Optional[jax.Array] = None,
):
    """Batched greedy/sampling decode.

    step_fn(tokens (B,1) int32, self_cache, pos int32) ->
    (logits (B,1,V), self_cache). ``init_cache`` holds only the per-step
    *mutable* state (the self-attention cache); loop-invariant cross K/V must
    be closed over by ``step_fn`` so they enter the while loop as constants,
    never as carried (copy-prone) state. Returns (tokens (B, max_new_tokens),
    sum_logprobs (B,), lengths (B,)). Token buffers are padded with EOT after
    finish.
    """
    B, V = init_logits.shape
    max_new = opts.max_new_tokens
    suppress = jnp.asarray(_static_suppress_mask(V, opts))
    first_mask = jnp.asarray(_first_step_mask(V, opts))
    sample = opts.temperature > 0
    if sample and rng is None:
        rng = jax.random.PRNGKey(0)

    def pick(logits, step, key):
        logits = logits + suppress
        logits = jnp.where(step == 0, logits + first_mask, logits)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        if sample:
            tok = jax.random.categorical(key, logits / opts.temperature, axis=-1)
        else:
            tok = jnp.argmax(logits, axis=-1)
        return tok.astype(jnp.int32), jnp.take_along_axis(logprobs, tok[:, None], axis=-1)[:, 0]

    def cond(state):
        step, _, _, finished, _, _, _ = state
        return (step < max_new) & ~jnp.all(finished)

    def body(state):
        step, logits, cache, finished, tokens, sum_lp, key = state
        key, sub = (jax.random.split(key) if sample else (key, key))
        tok, lp = pick(logits, step, sub)
        tok = jnp.where(finished, opts.eot, tok)
        sum_lp = sum_lp + jnp.where(finished, 0.0, lp)
        tokens = tokens.at[:, step].set(tok)
        now_finished = finished | (tok == opts.eot)
        new_logits, cache = step_fn(tok[:, None], cache, prompt_len + step)
        return step + 1, new_logits[:, -1], cache, now_finished, tokens, sum_lp, key

    key0 = rng if sample else jnp.zeros((2,), jnp.uint32)
    state = (
        jnp.int32(0),
        init_logits,
        init_cache,
        jnp.zeros((B,), bool),
        jnp.full((B, max_new), opts.eot, jnp.int32),
        jnp.zeros((B,), jnp.float32),
        key0,
    )
    _, _, _, _, tokens, sum_lp, _ = jax.lax.while_loop(cond, body, state)
    lengths = jnp.sum(tokens != opts.eot, axis=1) + 1  # +1 for the EOT itself
    return tokens, sum_lp, lengths


def _gather_cache(self_cache, flat_idx, valid_len=None):
    """Reorder the per-layer (B*K, T, H, Dh) self cache by beam indices.

    Per-layer axis-0 gathers are the measured in-loop winner (r4 probes:
    5.0 ms/step forced vs 16.5-50.2 for every stacked variant — standalone
    gather rankings did not survive the scan context; see
    models/whisper.py MultiHeadAttention.__call__ for the numbers).
    Cross-attention K/V stay at batch granularity (shared across beams — see
    MultiHeadAttention's beam grouping), live outside the loop carry as
    while-loop constants, and are never reindexed.

    ``valid_len`` (traced scalar): number of written cache rows
    (prompt + steps so far). When set, only the smallest static T-bucket
    covering it is gathered (``_gather_cache_prefix``) — rows beyond are
    still zero-initialized and identical across lanes, so skipping them is
    exact and saves the proportional share of the reorder's HBM traffic.
    """
    impl = _reorder_impl()
    if valid_len is not None and impl == "take" and _prefix_granule() > 0:
        return _gather_cache_prefix(self_cache, flat_idx, valid_len)
    if impl == "onehot":
        # Permutation as an MXU matmul: out = P @ flat where P is the 0/1
        # selection matrix (exactly one 1 per row), so the copy rides the
        # MXU's streaming datapath instead of the gather unit. Exact for
        # every dtype here: int8 accumulates in int32 (sums of one int8
        # term), floats sum one exact product.
        R = flat_idx.shape[0]
        p8 = jax.nn.one_hot(flat_idx, R, dtype=jnp.int8)
        pf = p8.astype(jnp.float32)

        def one(a):
            flat = a.reshape(a.shape[0], -1)
            if a.dtype == jnp.int8:
                y = jax.lax.dot(p8, flat, preferred_element_type=jnp.int32)
                y = y.astype(jnp.int8)
            elif a.dtype == jnp.float32:
                y = jax.lax.dot(pf, flat)
            else:  # bf16 cache: select via f32 (one exact product per row)
                y = jax.lax.dot(pf, flat.astype(jnp.float32)).astype(a.dtype)
            return y.reshape(a.shape)

        return jax.tree_util.tree_map(one, self_cache)
    return jax.tree_util.tree_map(lambda a: jnp.take(a, flat_idx, axis=0), self_cache)


def _prefix_granule() -> int:
    """T-bucket granule for the prefix-bounded cache reorder (trace-time env
    knob WHISPERX_REORDER_PREFIX; 0 = full-buffer gather, the DEFAULT).

    Measured a clear LOSER on chip despite moving ~40% fewer logical bytes:
    forced-reorder step probe 9.77 ms vs the plain gather's 5.05, end-to-end
    paired A/B 115.6x vs 150.6x decode-only (benchmarks/AB_RESULTS.json
    r5-step-probe + prefix-off records). The lax.switch branches return a
    dynamic_update_slice of the carried cache, and XLA materializes a full
    cache copy on top of the gather — the same carry-copy failure mode that
    killed the lax.cond identity bypass and the backptr history. Kept as an
    opt-in knob so the negative result stays reproducible."""
    import os

    v = os.environ.get("WHISPERX_REORDER_PREFIX", "0")
    return int(v)


def _gather_cache_prefix(self_cache, flat_idx, valid_len):
    """Gather only the written T-prefix of each cache leaf, bucketed.

    ``lax.switch`` picks the smallest static bucket covering ``valid_len``;
    each branch slices rows [0, S) on the T axis (axis 1 for k/v and their
    scale planes alike), gathers them by ``flat_idx``, and writes them back
    with dynamic_update_slice so the tail buffer is untouched.
    """
    leaves, treedef = jax.tree_util.tree_flatten(self_cache)
    T = leaves[0].shape[1]
    g = _prefix_granule()
    n_buckets = -(-T // g)
    if n_buckets <= 1:
        return jax.tree_util.tree_map(
            lambda a: jnp.take(a, flat_idx, axis=0), self_cache
        )

    def make_branch(S):
        def branch(cache):
            def one(a):
                prefix = jax.lax.slice_in_dim(a, 0, S, axis=1)
                prefix = jnp.take(prefix, flat_idx, axis=0)
                return jax.lax.dynamic_update_slice_in_dim(a, prefix, 0, axis=1)

            return jax.tree_util.tree_map(one, cache)

        return branch

    branches = [make_branch(min((i + 1) * g, T)) for i in range(n_buckets)]
    idx = jnp.clip((valid_len + g - 1) // g - 1, 0, n_buckets - 1)
    return jax.lax.switch(idx, branches, self_cache)


def _reorder_impl() -> str:
    """Beam cache-reorder impl: "take" (axis-0 gather) or "onehot" (MXU
    matmul against the 0/1 permutation matrix). Trace-time env knob
    WHISPERX_REORDER, A/B'd on chip (benchmarks/gather_probe.py)."""
    import os

    impl = os.environ.get("WHISPERX_REORDER", "take")
    if impl not in ("take", "onehot"):
        raise ValueError(f"unknown WHISPERX_REORDER={impl!r}: expected take|onehot")
    return impl


def _history_impl() -> str:
    """Beam token-history bookkeeping impl (trace-time env knob
    WHISPERX_BEAM_HISTORY):

    - "gather" — carry full (B, K, max_new) alive/finished token buffers and
      reorder them with take_along_axis every step (three history gathers +
      a 3K-wide concat per step).
    - "backptr" — carry only (max_new, B, K) token/parent tables written with
      one dynamic_update_slice each per step; the winning hypothesis is
      reconstructed once after the loop by a reverse lax.scan over the
      backpointers (the linked-parent-pointer scheme CT2's C++ loop uses,
      whisperx/asr.py:53-62).

    Default: "gather". The backptr impl removes per-step history gathers on
    paper but LOST the same-build paired A/B decisively on v5e — 127.0x vs
    148.8x decode-only (benchmarks/AB_RESULTS.json history-backptr /
    history-gather, reproduced twice): the traced-index dynamic_update_slice
    writes sit on the step's critical path, whereas XLA schedules the
    (B, K, max_new) history gathers alongside the cache reorder for free.
    Token buffers are tiny relative to the KV cache; the gathers were never
    the bottleneck.
    """
    import os

    impl = os.environ.get("WHISPERX_BEAM_HISTORY", "gather")
    if impl not in ("gather", "backptr"):
        raise ValueError(
            f"unknown WHISPERX_BEAM_HISTORY={impl!r}: expected gather|backptr"
        )
    return impl


def _reconstruct_path(tok_tab, par_tab, lane, end_step, eot: int):
    """Walk the backpointer tables to materialize one hypothesis per row.

    tok_tab/par_tab: (max_new, B, K) — token written by / parent lane of the
    alive lane at each step. ``lane`` (B,) is the lane index of the winning
    hypothesis *entering* step ``end_step`` (B,), i.e. the lane whose token
    occupies position end_step-1. Position end_step and beyond are filled
    with EOT. Returns (B, max_new) int32.
    """
    max_new, B, K = tok_tab.shape

    def back(carry, xs):
        lane = carry
        t, tok_t, par_t = xs
        emit = jnp.where(
            t >= end_step,
            jnp.full((B,), eot, jnp.int32),
            jnp.take_along_axis(tok_t, lane[:, None], axis=1)[:, 0],
        )
        prev = jnp.take_along_axis(par_t, lane[:, None], axis=1)[:, 0]
        lane = jnp.where(t >= end_step, lane, prev)
        return lane, emit

    ts = jnp.arange(max_new - 1, -1, -1)
    _, toks_rev = jax.lax.scan(
        back, lane, (ts, tok_tab[::-1], par_tab[::-1])
    )
    return toks_rev[::-1].T  # (B, max_new)


def _reorder_always() -> bool:
    """When true, skip the lax.cond identity-bypass and reorder every step.

    The cond's two branches cannot alias one output buffer, so XLA may
    insert a full cache copy even on the identity path — the unconditional
    version WINS on chip: 150.5x vs 148.7x decode-only, reproduced in two
    paired A/B rounds (benchmarks/AB_RESULTS.json reorder-nocond r4e + r5).
    Default unconditional since r5; WHISPERX_REORDER_COND=1 restores the
    conditional bypass (trace-time)."""
    import os

    return os.environ.get("WHISPERX_REORDER_COND", "0") == "0"


def beam_decode(
    step_fn: Callable,
    init_logits: jax.Array,  # (B, V) logits after the prompt (pre-expansion)
    expanded_cache,  # SELF cache with leading dim B*K (prompt replicated per beam)
    prompt_len: int,
    opts: SearchOptions,
):
    """Fixed-shape batched beam search.

    ``expanded_cache`` is the self-attention cache only; cross K/V are closed
    over by ``step_fn`` (see greedy_decode). Returns (tokens (B, max_new),
    sum_logprobs (B,), lengths (B,)) for the best hypothesis per batch
    element (finished preferred, ranked by the GNMT length-penalized
    cumulative logprob).
    """
    B, V = init_logits.shape
    K = opts.beam_size
    max_new = opts.max_new_tokens
    target_finished = max(K, int(round(K * opts.patience)))
    suppress = jnp.asarray(_static_suppress_mask(V, opts))
    first_mask = jnp.asarray(_first_step_mask(V, opts))
    topk = _resolve_topk(opts)
    backptr = _history_impl() == "backptr"

    # Alive state: (B, K). Beam 0 starts live, others at -inf so the first
    # expansion draws K distinct tokens from the single prompt distribution.
    alive_scores0 = jnp.tile(jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32), (B, 1))

    logprobs0 = jax.nn.log_softmax(init_logits + suppress + first_mask, axis=-1)
    logits0 = jnp.tile(logprobs0[:, None, :], (1, K, 1))  # (B, K, V)

    def cond(state):
        step, _, _, _, fin, fin_count, alive_scores, _ = state
        fin_scores = fin[0]
        can_continue = step < max_new
        # Early exit: enough finished and no alive beam can beat the worst
        # kept finished hypothesis even with a perfect (0 logprob) future.
        best_alive = length_penalized(jnp.max(alive_scores, axis=1), step + max_new, opts.length_penalty)
        worst_fin = jnp.min(fin_scores, axis=1)
        saturated = (fin_count >= target_finished) & (best_alive <= worst_fin)
        return can_continue & ~jnp.all(saturated)

    def body(state):
        (step, logprobs, cache, hist, fin, fin_count, alive_scores, _) = state
        # logprobs: (B, K, V) log-softmaxed + suppressed next-token dists.
        cand = alive_scores[:, :, None] + logprobs  # (B, K, V)
        flat = cand.reshape(B, K * V)
        top_scores, top_idx = topk(flat, 2 * K)  # (B, 2K)
        beam_idx = top_idx // V
        tok_idx = top_idx % V

        is_eot = tok_idx == opts.eot

        # --- finished merge: candidates ending in EOT → top-K finished ----
        eot_pen = length_penalized(top_scores, step + 1, opts.length_penalty)
        eot_pen = jnp.where(is_eot, eot_pen, NEG_INF)
        fin_count = fin_count + jnp.sum(is_eot, axis=1)

        # --- alive selection: best K non-EOT of the 2K candidates ----------
        alive_cand = jnp.where(is_eot, NEG_INF, top_scores)
        new_scores, pick = jax.lax.top_k(alive_cand, K)  # (B, K)
        new_beam = jnp.take_along_axis(beam_idx, pick, axis=1)
        new_tok = jnp.take_along_axis(tok_idx, pick, axis=1)

        if backptr:
            (tok_tab, par_tab) = hist
            (fin_scores, fin_step, fin_beam) = fin
            # Finished bookkeeping on scalars only: score + (end step, lane).
            all_fin_scores = jnp.concatenate([fin_scores, eot_pen], axis=1)  # (B, 3K)
            all_fin_step = jnp.concatenate(
                [fin_step, jnp.full((B, 2 * K), step, jnp.int32)], axis=1
            )
            all_fin_beam = jnp.concatenate([fin_beam, beam_idx], axis=1)
            fin_scores, keep_idx = jax.lax.top_k(all_fin_scores, K)
            fin_step = jnp.take_along_axis(all_fin_step, keep_idx, axis=1)
            fin_beam = jnp.take_along_axis(all_fin_beam, keep_idx, axis=1)
            fin = (fin_scores, fin_step, fin_beam)
            # History: one token + one parent write per step (35 KB each at
            # the flagship shape) instead of three (B, K, max_new) gathers.
            tok_tab = jax.lax.dynamic_update_index_in_dim(
                tok_tab, new_tok.astype(jnp.int32), step, axis=0
            )
            par_tab = jax.lax.dynamic_update_index_in_dim(
                par_tab, new_beam.astype(jnp.int32), step, axis=0
            )
            hist = (tok_tab, par_tab)
        else:
            (alive_toks, fin_toks) = hist
            fin_scores = fin[0]
            # Token history of each EOT candidate = alive_toks[beam] + EOT pad.
            cand_toks = jnp.take_along_axis(alive_toks, beam_idx[:, :, None], axis=1)  # (B,2K,L)
            cand_toks = cand_toks.at[:, :, step].set(opts.eot)
            all_fin_scores = jnp.concatenate([fin_scores, eot_pen], axis=1)  # (B, K+2K)
            all_fin_toks = jnp.concatenate([fin_toks, cand_toks], axis=1)
            keep_scores, keep_idx = jax.lax.top_k(all_fin_scores, K)
            fin_toks = jnp.take_along_axis(all_fin_toks, keep_idx[:, :, None], axis=1)
            fin_scores = keep_scores
            fin = (fin_scores,)

            new_toks = jnp.take_along_axis(alive_toks, new_beam[:, :, None], axis=1)
            new_toks = new_toks.at[:, :, step].set(new_tok)
            hist = (new_toks, fin_toks)

        flat_idx = (jnp.arange(B)[:, None] * K + new_beam).reshape(-1)
        valid_len = prompt_len + step  # written cache rows at reorder time
        if _reorder_always():
            cache = _gather_cache(cache, flat_idx, valid_len)
        else:
            # Skip the (large) cache reorder when every batch element kept
            # its beams in place — the common case once beams stabilize on
            # real speech. lax.cond executes one branch only, so the
            # identity path costs a predicate instead of a full cache copy
            # (unless XLA inserts a carry copy — see _reorder_always).
            is_identity = jnp.all(new_beam == jnp.arange(K)[None, :])
            cache = jax.lax.cond(
                is_identity,
                lambda c: c,
                lambda c: _gather_cache(c, flat_idx, valid_len),
                cache,
            )

        step_tokens = new_tok.reshape(B * K, 1).astype(jnp.int32)
        logits, cache = step_fn(step_tokens, cache, prompt_len + step)
        lp = jax.nn.log_softmax(logits[:, -1] + suppress, axis=-1).reshape(B, K, V)
        return (step + 1, lp, cache, hist, fin, fin_count, new_scores, new_tok)

    if backptr:
        hist0 = (
            jnp.zeros((max_new, B, K), jnp.int32),
            jnp.zeros((max_new, B, K), jnp.int32),
        )
        fin0 = (
            jnp.full((B, K), NEG_INF, jnp.float32),
            jnp.zeros((B, K), jnp.int32),
            jnp.zeros((B, K), jnp.int32),
        )
    else:
        hist0 = (
            jnp.full((B, K, max_new), opts.eot, jnp.int32),
            jnp.full((B, K, max_new), opts.eot, jnp.int32),
        )
        fin0 = (jnp.full((B, K), NEG_INF, jnp.float32),)
    state = (
        jnp.int32(0),
        logits0,
        expanded_cache,
        hist0,
        fin0,
        jnp.zeros((B,), jnp.int32),
        alive_scores0,
        jnp.zeros((B, K), jnp.int32),
    )
    (step, _, _, hist, fin, fin_count, alive_scores, _) = jax.lax.while_loop(
        cond, body, state
    )
    fin_scores = fin[0]

    # Prefer the best finished hypothesis; fall back to best alive (ran out of
    # steps without EOT — the reference's CT2 behaves the same way).
    have_finished = fin_count > 0
    alive_pen = length_penalized(alive_scores, step, opts.length_penalty)
    best_alive_idx = jnp.argmax(alive_pen, axis=1)
    best_alive_score = jnp.take_along_axis(alive_scores, best_alive_idx[:, None], axis=1)[:, 0]
    best_fin_score = fin_scores[:, 0]  # fin buffers are sorted by top_k

    if backptr:
        (tok_tab, par_tab) = hist
        (_, fin_step, fin_beam) = fin
        # One reconstruction walk for the winning hypothesis per row: lane
        # entering the end step, EOT at end_step, EOT-padded beyond.
        lane = jnp.where(have_finished, fin_beam[:, 0], best_alive_idx)
        end_step = jnp.where(have_finished, fin_step[:, 0], step)
        tokens = _reconstruct_path(tok_tab, par_tab, lane, end_step, opts.eot)
    else:
        (alive_toks, fin_toks) = hist
        best_alive_toks = jnp.take_along_axis(
            alive_toks, best_alive_idx[:, None, None], axis=1
        )[:, 0]
        best_fin_toks = fin_toks[:, 0]
        tokens = jnp.where(have_finished[:, None], best_fin_toks, best_alive_toks)
    # Recover the raw (unpenalized) cumulative logprob for finished rows:
    lengths = jnp.sum(tokens != opts.eot, axis=1) + 1
    raw_fin = best_fin_score * (((5.0 + lengths) / 6.0) ** opts.length_penalty)
    sum_lp = jnp.where(have_finished, raw_fin, best_alive_score)
    return tokens, sum_lp, lengths
