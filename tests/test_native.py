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
