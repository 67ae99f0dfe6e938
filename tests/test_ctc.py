"""CTC trellis/backtrack vs. a brute-force reference DP (SURVEY §4 plan)."""

import numpy as np
import pytest

from whisperx_tpu.ops.ctc import (
    align_tokens_batch,
    backtrack,
    ctc_trellis_batch,
    merge_repeats,
    merge_words,
)


def brute_force_trellis(emission, tokens, blank=0):
    """Direct per-cell implementation of the published recurrence."""
    T, V = emission.shape
    N = len(tokens)
    trellis = np.zeros((T + 1, N + 1), np.float32)
    trellis[1:, 0] = np.cumsum(emission[:, blank])
    trellis[0, 1:] = -np.inf
    trellis[T - N + 1 :, 0] = np.inf
    for t in range(T):
        for j in range(1, N + 1):
            trellis[t + 1, j] = max(
                trellis[t, j] + emission[t, blank],
                trellis[t, j - 1] + emission[t, tokens[j - 1]],
            )
    return trellis


def _rand_emission(rng, T, V):
    logits = rng.standard_normal((T, V)).astype(np.float32)
    e = logits - np.log(np.sum(np.exp(logits), axis=-1, keepdims=True))
    return e


def test_trellis_matches_bruteforce(rng):
    T, V, N = 20, 8, 5
    em = _rand_emission(rng, T, V)
    tokens = rng.integers(1, V, N).tolist()
    import jax.numpy as jnp

    ours = np.asarray(
        ctc_trellis_batch(
            jnp.asarray(em[None]), jnp.asarray([tokens], dtype=jnp.int32),
            jnp.asarray([T], dtype=jnp.int32), jnp.asarray([N], dtype=jnp.int32),
        )
    )[0]
    ref = brute_force_trellis(em, tokens)
    # inf == inf, finite close
    finite = np.isfinite(ref)
    np.testing.assert_allclose(ours[finite], ref[finite], atol=1e-4)
    np.testing.assert_array_equal(np.isposinf(ours), np.isposinf(ref))


def test_trellis_batch_padding(rng):
    """Padded batch entries must match their standalone trellis."""
    import jax.numpy as jnp

    V = 6
    specs = [(18, 4), (10, 2)]
    T_max = 18
    ems = [_rand_emission(rng, T, V) for T, _ in specs]
    toks = [rng.integers(1, V, N).tolist() for _, N in specs]

    padded = np.stack(
        [np.pad(e, ((0, T_max - e.shape[0]), (0, 0))) for e in ems]
    )
    N_max = 4
    tok_arr = np.zeros((2, N_max), np.int32)
    for i, tl in enumerate(toks):
        tok_arr[i, : len(tl)] = tl
    out = np.asarray(
        ctc_trellis_batch(
            jnp.asarray(padded), jnp.asarray(tok_arr),
            jnp.asarray([t for t, _ in specs], dtype=jnp.int32),
            jnp.asarray([n for _, n in specs], dtype=jnp.int32),
        )
    )
    for i, (T, N) in enumerate(specs):
        ref = brute_force_trellis(ems[i], toks[i])
        got = out[i, : T + 1, : N + 1]
        finite = np.isfinite(ref)
        np.testing.assert_allclose(got[finite], ref[finite], atol=1e-4)


def test_backtrack_recovers_planted_alignment(rng):
    """Emissions heavily peaked on a known path must recover that path."""
    V, blank = 6, 0
    tokens = [2, 3, 1]
    # In this trellis "staying" on a token emits blank, so the unambiguous
    # planted path alternates token advances with blank frames:
    # t0: advance 'a', t1: blank, t2: advance 'b', t3: blank, t4: advance 'c'.
    frame_labels = [2, 0, 3, 0, 1]
    T = len(frame_labels)
    em = np.full((T, V), -10.0, np.float32)
    for t, lab in enumerate(frame_labels):
        em[t, lab] = -0.01

    paths = align_tokens_batch(em[None], [tokens], [T], blank=blank)
    path = paths[0]
    assert path is not None
    spans = merge_repeats(path, "abc")
    labels = [s.label for s in spans]
    assert labels == ["a", "b", "c"]
    a, b, c = spans
    assert (a.start, a.end) == (0, 2)  # advance@0 + blank-stay@1
    assert (b.start, b.end) == (2, 4)
    assert c.start == 4


def test_backtrack_failure_returns_none():
    """More tokens than frames → alignment impossible → None."""
    V = 4
    em = np.log(np.full((2, V), 0.25, np.float32))
    tokens = [1, 2, 3]
    # T < N: trellis is degenerate (col0 all inf after row 0)
    trellis = brute_force_trellis(em, tokens)
    res = backtrack(trellis, em[:, 0], em[:, tokens])
    assert res is None or len(res) <= 2


def test_merge_words():
    from whisperx_tpu.ops.ctc import CharSpan

    spans = [
        CharSpan("h", 0, 2, 0.9),
        CharSpan("i", 2, 3, 0.8),
        CharSpan("|", 3, 4, 0.5),
        CharSpan("y", 4, 6, 0.7),
        CharSpan("o", 6, 8, 0.6),
    ]
    words = merge_words(spans)
    assert [w.label for w in words] == ["hi", "yo"]
    assert words[0].start == 0 and words[0].end == 3
    assert abs(words[0].score - (0.9 * 2 + 0.8 * 1) / 3) < 1e-6


def test_device_backtrack_matches_host():
    """Fused device trellis+backtrack == host numpy walk (paths and scores),
    including the failure (None) contract."""
    import numpy as np

    from whisperx_tpu.ops.ctc import align_tokens_batch

    rng = np.random.default_rng(5)
    B, T, V = 4, 60, 12
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    token_lists = [
        [3, 4, 5],
        [1, 2, 3, 4, 5, 6, 7, 8],
        list(rng.integers(1, V, 55)),  # nearly as many tokens as frames
        [9],
    ]
    t_lens = [60, 40, 58, 25]

    host = align_tokens_batch(logp, token_lists, t_lens, blank=0, backtrack_impl="host")
    dev = align_tokens_batch(logp, token_lists, t_lens, blank=0, backtrack_impl="device")

    assert len(host) == len(dev)
    for h, d in zip(host, dev):
        if h is None:
            assert d is None
            continue
        assert d is not None
        assert [(p.token_index, p.time_index) for p in h] == [
            (p.token_index, p.time_index) for p in d
        ]
        np.testing.assert_allclose(
            [p.score for p in h], [p.score for p in d], rtol=1e-5, atol=1e-6
        )


def test_unknown_backend_raises():
    """An unknown trellis backend must raise, not silently no-op (ADVICE r2:
    docs listed a deleted 'pallas' backend the code quietly swallowed)."""
    import pytest

    from whisperx_tpu.ops.ctc import align_tokens_batch

    rng = np.random.default_rng(0)
    logp = rng.standard_normal((1, 10, 5)).astype(np.float32)
    with pytest.raises(ValueError, match="unknown CTC trellis backend"):
        align_tokens_batch(logp, [[1, 2]], [10], blank=0, backend="pallas")
