"""Native C++ audio library vs. the numpy oracle."""

import numpy as np
import pytest

from whisperx_tpu import native
from whisperx_tpu.audio.io import _decode_wav_bytes, write_wav


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_decode_matches_numpy(lib_ok, tmp_path):
    rng = np.random.default_rng(0)
    audio = np.clip(rng.standard_normal(5000) * 0.3, -0.99, 0.99).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, audio, 16000)

    native_out = native.decode_wav(path)
    assert native_out is not None
    samples, rate = native_out
    with open(path, "rb") as f:
        ref_samples, ref_rate = _decode_wav_bytes(f.read())
    assert rate == ref_rate == 16000
    np.testing.assert_allclose(samples, ref_samples, atol=1e-7)


def test_native_decode_24bit(lib_ok, tmp_path):
    import struct

    rng = np.random.default_rng(1)
    vals = (rng.standard_normal(400) * 0.4 * 8388607).astype(np.int32)
    b = np.zeros((400, 3), np.uint8)
    b[:, 0] = vals & 0xFF
    b[:, 1] = (vals >> 8) & 0xFF
    b[:, 2] = (vals >> 16) & 0xFF
    body = b.tobytes()
    path = tmp_path / "d24.wav"
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 48000, 3, 24))
        f.write(b"data" + struct.pack("<I", len(body)) + body)

    samples, rate = native.decode_wav(str(path))
    with open(path, "rb") as f:
        ref, _ = _decode_wav_bytes(f.read())
    np.testing.assert_allclose(samples, ref, atol=1e-7)


def test_native_resample_matches_scipy(lib_ok):
    from scipy.signal import resample_poly

    rng = np.random.default_rng(2)
    t = np.arange(44100) / 44100
    x = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(len(t))).astype(
        np.float32
    )
    ours = native.resample_poly(x, 160, 441)
    ref = resample_poly(x.astype(np.float64), 160, 441).astype(np.float32)
    assert ours is not None
    assert len(ours) == len(ref)
    # Same filter design → near-identical output.
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_native_resample_identity(lib_ok):
    x = np.arange(100, dtype=np.float32)
    out = native.resample_poly(x, 3, 3)
    np.testing.assert_array_equal(out, x)


def test_ingest_pool_matches_load_audio(tmp_path):
    """The C++ ingest pool (decode+downmix+resample on worker threads — the
    DataLoader-workers equivalent, reference whisperx/asr.py:158-171) must
    produce the same waveform as the synchronous load_audio path."""
    import numpy as np
    import pytest

    from whisperx_tpu import native
    from whisperx_tpu.audio.io import load_audio, write_wav

    if not native.available():
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(0)
    paths = []
    for i, sr in enumerate((16000, 8000, 44100)):
        p = tmp_path / f"clip{i}.wav"
        write_wav(str(p), (rng.standard_normal(sr) * 0.1).astype(np.float32), sr=sr)
        paths.append(str(p))

    with native.IngestPool(threads=2) as pool:
        jobs = [pool.submit(p, 16000) for p in paths]
        for p, j in zip(paths, jobs):
            got = pool.get(j)
            ref = load_audio(p)
            assert got is not None
            np.testing.assert_allclose(got, ref, atol=1e-6)

    # Error path: nonexistent file reports failure (caller falls back).
    with native.IngestPool(threads=1) as pool:
        j = pool.submit(str(tmp_path / "missing.wav"), 16000)
        assert pool.get(j) is None


def test_audio_prefetcher_streams_in_order(tmp_path):
    import numpy as np

    from whisperx_tpu.audio.io import AudioPrefetcher, load_audio, write_wav

    rng = np.random.default_rng(1)
    paths = []
    for i in range(4):
        p = tmp_path / f"f{i}.wav"
        write_wav(str(p), (rng.standard_normal(8000) * 0.1).astype(np.float32))
        paths.append(str(p))
    # .npy goes through the synchronous fallback inside the iterator.
    npy = tmp_path / "f4.npy"
    np.save(npy, (rng.standard_normal(1000) * 0.1).astype(np.float32))
    paths.append(str(npy))

    out = list(AudioPrefetcher(paths, lookahead=2))
    assert [p for p, _ in out] == paths
    for p, audio in out:
        np.testing.assert_allclose(audio, load_audio(p), atol=1e-6)
