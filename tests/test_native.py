"""Native C++ audio runtime tests: parity with the numpy WAV path, batch
decoder, and in-place preprocessing ops."""

import numpy as np
import pytest

from speech_enhancement_via_hybrid_vision_transformer_project_tpu import native
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data import (
    load_audio,
    save_wav,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.wavio import (
    read_wav_raw,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops import audio as A

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _write(tmp_path, name, x, sr=16000, subtype="pcm16"):
    p = tmp_path / name
    save_wav(p, x, sr, subtype=subtype)
    return p


@pytest.mark.parametrize("subtype", ["pcm16", "float32"])
def test_native_read_matches_numpy(tmp_path, rng, subtype):
    x = (rng.random(5000).astype(np.float32) * 1.6 - 0.8)
    p = _write(tmp_path, f"a_{subtype}.wav", x, subtype=subtype)
    xn, srn = native.read_wav(p)
    xp, srp = read_wav_raw(p)
    assert srn == srp == 16000
    np.testing.assert_allclose(xn, xp, atol=1e-7)


def test_native_write_roundtrip(tmp_path, rng):
    x = (rng.random(3000).astype(np.float32) * 1.8 - 0.9)
    p = tmp_path / "w.wav"
    native.write_wav(p, x, 16000)
    y, sr = load_audio(p, None)
    assert sr == 16000
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1e-4)


def test_decode_batch(tmp_path, rng):
    paths = []
    wavs = []
    for i in range(5):
        x = np.clip(
            rng.standard_normal(2000 + 700 * i).astype(np.float32) * 0.4, -1, 1
        )
        paths.append(_write(tmp_path, f"b{i}.wav", x))
        wavs.append(x)
    paths.append(tmp_path / "missing.wav")  # error row
    out, lengths, rates = native.decode_batch(paths, max_len=6000)
    assert out.shape == (6, 6000)
    for i, x in enumerate(wavs):
        assert lengths[i] == len(x)
        assert rates[i] == 16000
        np.testing.assert_allclose(out[i, : len(x)], x, atol=2e-4)
        assert np.all(out[i, len(x):] == 0)
    assert lengths[5] == -1


def test_decode_batch_normalize(tmp_path, rng):
    x = rng.standard_normal(3000).astype(np.float32) * 0.1
    p = _write(tmp_path, "n.wav", x)
    out, lengths, _ = native.decode_batch([p], 4000, normalize=True, target=0.95)
    assert abs(np.abs(out[0, :3000]).max() - 0.95) < 1e-3


def test_peak_normalize_matches_python(rng):
    x = rng.standard_normal(4000).astype(np.float32) * 0.3
    ref, peak_ref = A.peak_normalize(x.copy(), 0.95)
    xn = x.copy()
    peak = native.peak_normalize_inplace(xn, 0.95)
    assert peak == pytest.approx(peak_ref, rel=1e-6)
    np.testing.assert_allclose(xn, ref, atol=1e-6)


def test_pre_emphasis_matches_python(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    ref = A.pre_emphasis(x, 0.97)
    xn = x.copy()
    native.pre_emphasis_inplace(xn, 0.97)
    np.testing.assert_allclose(xn, ref, atol=1e-6)


def test_load_audio_uses_native(tmp_path, rng):
    x = rng.standard_normal(2500).astype(np.float32) * 0.5
    p = _write(tmp_path, "l.wav", x)
    y_native, _ = load_audio(p, None, use_native=True)
    y_py, _ = load_audio(p, None, use_native=False)
    np.testing.assert_allclose(y_native, y_py, atol=1e-7)
