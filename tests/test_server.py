"""Serving-layer tests: in-memory WAV codec, dynamic batcher, HTTP server
round trip with concurrent requests (inference/server.py)."""

import threading
import urllib.request

import numpy as np
import pytest

import jax

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.wavio import (
    read_wav_bytes,
    wav_bytes,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (
    AudioEnhancer,
    make_server,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
    HybridViT,
)

from test_model import SMALL


def test_wav_bytes_roundtrip(rng):
    x = (0.5 * rng.standard_normal(12345)).astype(np.float32)
    x = np.clip(x, -1.0, 1.0)
    data = wav_bytes(x, 16000, subtype="float32")
    y, sr = read_wav_bytes(data, 16000)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-7)
    # pcm16 path quantizes
    y16, _ = read_wav_bytes(wav_bytes(x, 16000), 16000)
    np.testing.assert_allclose(y16, x, atol=5e-5)  # 0.5 LSB + 1/32768 scale
    # resample on decode
    y8, sr8 = read_wav_bytes(data, 8000)
    assert sr8 == 8000 and len(y8) == len(x) // 2 + len(x) % 2


@pytest.fixture(scope="module")
def served():
    model = HybridViT(**SMALL, dropout=0.0, attn_dropout=0.0,
                      drop_path_rate=0.0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        np.zeros((1, 257, 64, 1), np.float32), train=False,
    )
    enhancer = AudioEnhancer(model, variables, {})
    server = make_server(enhancer, port=0, max_batch=8, max_wait_ms=50.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}", enhancer, server
    server.shutdown()
    server.batcher.close()
    server.server_close()


def test_healthz_and_stats(served):
    url, _, _ = served
    assert urllib.request.urlopen(f"{url}/healthz").read() == b"ok"
    import json

    stats = json.loads(urllib.request.urlopen(f"{url}/stats").read())
    assert {"requests", "batches", "audio_seconds_per_s"} <= stats.keys()


def test_enhance_roundtrip_matches_direct(served, rng):
    url, enhancer, _ = served
    sr = 16000
    w = (0.4 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
         + 0.05 * rng.standard_normal(sr)).astype(np.float32)
    resp = urllib.request.urlopen(
        urllib.request.Request(
            f"{url}/enhance", data=wav_bytes(w, sr, subtype="float32")
        ),
        timeout=120,
    )
    assert resp.headers["Content-Type"] == "audio/wav"
    got, got_sr = read_wav_bytes(resp.read(), sr)
    ref = enhancer.enhance_batch([w])[0]
    assert got_sr == sr and got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-6)  # float32 WAV response


def test_concurrent_requests_batch(served, rng):
    """Concurrent posts coalesce into shared batches and all succeed."""
    url, _, server = served
    sr = 16000
    before = dict(server.batcher.stats)
    wavs = [
        (0.3 * np.sin(2 * np.pi * (150 + 30 * i) * np.arange(sr) / sr)
         + 0.05 * rng.standard_normal(sr)).astype(np.float32)
        for i in range(6)
    ]
    results = [None] * len(wavs)

    def post(i):
        r = urllib.request.urlopen(
            urllib.request.Request(
                f"{url}/enhance",
                data=wav_bytes(wavs[i], sr, subtype="float32"),
            ),
            timeout=120,
        )
        results[i] = read_wav_bytes(r.read(), sr)[0]

    threads = [threading.Thread(target=post, args=(i,)) for i in range(len(wavs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None and len(r) == sr for r in results)
    added_reqs = server.batcher.stats["requests"] - before["requests"]
    added_batches = server.batcher.stats["batches"] - before["batches"]
    assert added_reqs == 6
    assert added_batches < 6  # at least some coalescing happened


def test_bad_requests(served):
    url, _, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            urllib.request.Request(f"{url}/enhance", data=b"not a wav"),
            timeout=30,
        )
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{url}/nope", timeout=30)
    assert e.value.code == 404


def test_long_clip_routes_to_streaming(served, rng):
    """Clips longer than the largest bucket must NOT be truncated — the
    batcher routes them through the chunked streaming path."""
    url, enhancer, _ = served
    sr = 16000
    cap = (max(enhancer.buckets) - 1) * enhancer.stft_cfg.hop_length
    n = cap + 3 * sr  # 3 s beyond the largest bucket
    w = (0.3 * np.sin(2 * np.pi * 180 * np.arange(n) / sr)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    r = urllib.request.urlopen(
        urllib.request.Request(
            f"{url}/enhance", data=wav_bytes(w, sr, subtype="float32")
        ),
        timeout=300,
    )
    y, _ = read_wav_bytes(r.read(), sr)
    assert y.shape == w.shape
    # the tail beyond the bucket capacity must carry signal, not zeros
    tail = y[cap:]
    assert np.sqrt(np.mean(tail**2)) > 1e-4


def test_batcher_pads_to_power_of_two(served, rng):
    """Coalesced batches pad to power-of-two sizes so the compiled
    (batch, bucket) program set stays small and fixed."""
    import unittest.mock as mock

    url, enhancer, server = served
    sr = 16000
    seen = []
    orig = enhancer.enhance_batch

    def spy(wavs, *a, **kw):
        seen.append(len(wavs))
        return orig(wavs, *a, **kw)

    with mock.patch.object(enhancer, "enhance_batch", side_effect=spy):
        wavs = [
            (0.2 * np.sin(2 * np.pi * 200 * np.arange(sr) / sr)
             + 0.02 * rng.standard_normal(sr)).astype(np.float32)
            for _ in range(3)
        ]
        threads = []
        for w in wavs:
            req = urllib.request.Request(
                f"{url}/enhance", data=wav_bytes(w, sr, subtype="float32")
            )
            t = threading.Thread(
                target=lambda rq=req: urllib.request.urlopen(rq, timeout=120).read()
            )
            t.start()
            threads.append(t)
        for t in threads:
            t.join(timeout=120)
    assert seen and all(b & (b - 1) == 0 for b in seen), seen  # powers of 2
