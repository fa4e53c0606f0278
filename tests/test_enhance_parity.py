"""End-to-end enhancement parity: our jitted AudioEnhancer pipeline vs the
reference's enhance() semantics (inference/enhancer.py:55-135) executed
with the reference torch model and torch.stft as the oracle.

This exercises the exact reference contract: peak normalize -> STFT ->
max-only magnitude normalize -> model -> denormalize -> recombine with
noisy phase -> iSTFT(length) -> output denormalize (SURVEY.md §7.2-7.4).
"""


import numpy as np

import jax

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (
    AudioEnhancer,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
    HybridViT,
)

from test_model import SMALL, _init, _torch_reference_model, _transplant


def _reference_enhance(torch, torch_model, noisy: np.ndarray) -> np.ndarray:
    """The reference enhance() pipeline, torch.stft standing in for librosa
    (they agree for these params, tests/test_stft.py)."""
    max_val = float(np.abs(noisy).max())
    if max_val > 1e-8:
        x = noisy / max_val
    else:
        x, max_val = noisy, 1.0
    xt = torch.from_numpy(x.astype(np.float32))
    spec = torch.stft(
        xt, n_fft=512, hop_length=128, win_length=512,
        window=torch.hann_window(512, periodic=True),
        center=True, pad_mode="reflect", return_complex=True,
    )
    mag = spec.abs()
    phase = torch.angle(spec)
    mag_max = float(mag.max())
    if mag_max <= 1e-8:
        mag_max = 1.0
    normed = (mag / mag_max)[None, None]
    with torch.no_grad():
        out = torch_model(normed).squeeze(0).squeeze(0)
    enhanced_mag = out * mag_max
    enhanced = enhanced_mag * torch.exp(1j * phase)
    y = torch.istft(
        enhanced, n_fft=512, hop_length=128, win_length=512,
        window=torch.hann_window(512, periodic=True),
        center=True, length=len(noisy),
    )
    return (y.numpy() * max_val).astype(np.float32)


def test_enhancer_matches_reference_pipeline(rng):
    cfg = dict(SMALL, max_patches=10000)
    torch_model, torch = _torch_reference_model(cfg)
    model = HybridViT(
        dropout=0.0, attn_dropout=0.0, drop_path_rate=0.0,
        use_pallas_attention=False, **cfg
    )
    variables, _ = _init(model, shape=(1, 257, 64, 1))
    variables = _transplant(torch_model, variables)

    n = 63 * 128  # exactly one bucket -> zero padding divergence
    t = np.arange(n) / 16000
    noisy = (
        0.4 * np.sin(2 * np.pi * 200 * t)
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)

    ref = _reference_enhance(torch, torch_model, noisy)
    enhancer = AudioEnhancer(
        model, variables, {}, buckets=(64,), stft_method="matmul"
    )
    ours = enhancer.enhance(noisy)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_exact_mode_matches_reference_arbitrary_length(rng):
    """exact=True reproduces the reference pipeline at a length that does
    NOT land on a bucket boundary (bucket padding would perturb the
    maskless global attention — the reference never pads at inference)."""
    cfg = dict(SMALL, max_patches=10000)
    torch_model, torch = _torch_reference_model(cfg)
    model = HybridViT(
        dropout=0.0, attn_dropout=0.0, drop_path_rate=0.0,
        use_pallas_attention=False, **cfg
    )
    variables, _ = _init(model, shape=(1, 257, 64, 1))
    variables = _transplant(torch_model, variables)

    n = 8147  # arbitrary length, not a bucket boundary
    noisy = (0.2 * rng.standard_normal(n)).astype(np.float32)
    ref = _reference_enhance(torch, torch_model, noisy)
    enhancer = AudioEnhancer(model, variables, {}, stft_method="matmul")
    ours = enhancer.enhance(noisy, exact=True)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_mask_padding_noop_at_bucket_boundary(rng):
    """A clip that exactly fills its bucket has an all-true patch mask, so
    mask_padding=True must reproduce the unmasked result bit-for-bit —
    masking is pure plumbing when there is no padding."""
    model = HybridViT(**SMALL, dropout=0.0, attn_dropout=0.0,
                      drop_path_rate=0.0, use_pallas_attention=False)
    variables, _ = _init(model)
    n = 63 * 128  # exactly one 64-frame bucket
    noisy = (0.2 * rng.standard_normal(n)).astype(np.float32)
    plain = AudioEnhancer(model, variables, {}, buckets=(64,),
                          stft_method="matmul").enhance(noisy)
    masked = AudioEnhancer(model, variables, {}, buckets=(64,),
                           stft_method="matmul",
                           mask_padding=True).enhance(noisy)
    np.testing.assert_array_equal(plain, masked)


def test_mask_padding_changes_padded_result(rng):
    """For a clip shorter than its bucket the key-padding mask removes pad
    patches from attention, so the output must differ from the unmasked
    run (which attends to zero-padding tokens) while keeping shape and
    finiteness. Exact/masked/unmasked *quality* deltas are measured with
    a trained model and recorded in PERF.md (VERDICT r1 next #8)."""
    model = HybridViT(**SMALL, dropout=0.0, attn_dropout=0.0,
                      drop_path_rate=0.0, use_pallas_attention=False)
    variables, _ = _init(model)
    n = 30 * 128  # under half the 64-frame bucket -> real padding
    noisy = (0.3 * rng.standard_normal(n)).astype(np.float32)
    plain = AudioEnhancer(model, variables, {}, buckets=(64,),
                          stft_method="matmul").enhance(noisy)
    masked = AudioEnhancer(model, variables, {}, buckets=(64,),
                           stft_method="matmul",
                           mask_padding=True).enhance(noisy)
    assert plain.shape == masked.shape == noisy.shape
    assert np.isfinite(masked).all()
    assert np.abs(plain - masked).max() > 1e-7


def test_mesh_data_parallel_enhancement_matches_single_device(rng):
    """Batch enhancement sharded over a 4-device 'data' mesh must equal the
    single-device result (params replicated, batch rows sharded); batch
    sizes that don't tile the mesh get zero-row padding."""
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.parallel.mesh import (
        make_mesh,
    )

    model = HybridViT(**SMALL, dropout=0.0, attn_dropout=0.0,
                      drop_path_rate=0.0, use_pallas_attention=False)
    variables, _ = _init(model)
    wavs = [
        (0.4 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
        for n in (9000, 12000, 16000)  # 3 rows: not a multiple of 4
    ]
    single = AudioEnhancer(model, variables, {})
    mesh = make_mesh(data_parallel=4, devices=jax.devices()[:4])
    sharded = AudioEnhancer(model, variables, {}, mesh=mesh)
    out_s = single.enhance_batch(wavs)
    out_m = sharded.enhance_batch(wavs)
    assert len(out_s) == len(out_m) == 3
    for a, b, w in zip(out_s, out_m, wavs):
        assert a.shape == b.shape == w.shape
        np.testing.assert_allclose(a, b, atol=1e-5)
    # exact mode also pads the data axis
    e_s = single.enhance(wavs[0], exact=True)
    e_m = sharded.enhance(wavs[0], exact=True)
    np.testing.assert_allclose(e_s, e_m, atol=1e-5)


def test_factored_pos_embed_bucket_invariant_enhancement(rng):
    """With pos_embed_type='factored_2d' + mask_padding, a clip's enhanced
    output must not depend on which bucket it is padded into (measured:
    ~0.0 rel RMS vs ~0.15 for the reference 1-D table, PERF.md #14) as
    long as the clip ends a few patch columns before the smaller bucket's
    edge, so decoder-conv bucket-edge effects land in cropped columns.
    This is what makes bucketed training/serving self-consistent."""
    n = 200 * 128  # 201 frames: 13 of 16 patch cols valid in a 256 bucket
    t = np.arange(n, dtype=np.float32) / 16000.0
    wav = (0.5 * np.sin(2 * np.pi * 220 * t)
           + 0.1 * rng.standard_normal(n)).astype(np.float32)
    wav /= np.abs(wav).max()

    def cross_bucket_rel_rms(model):
        variables, _ = _init(model)
        outs = {}
        for bucket in (256, 512):
            enh = AudioEnhancer(model, variables, mask_padding=True,
                                buckets=(bucket,))
            outs[bucket] = enh.enhance(wav)
        diff = outs[256] - outs[512]
        return float(np.sqrt(np.mean(diff**2))
                     / (np.sqrt(np.mean(outs[256] ** 2)) + 1e-12))

    factored = cross_bucket_rel_rms(
        HybridViT(**SMALL, pos_embed_type="factored_2d", dropout=0.0,
                  attn_dropout=0.0, drop_path_rate=0.0)
    )
    assert factored < 1e-4, factored

    # the reference 1-D table does NOT have this property — guards against
    # the test passing vacuously (e.g. mask accidentally zeroing everything)
    flat = cross_bucket_rel_rms(
        HybridViT(**SMALL, dropout=0.0, attn_dropout=0.0,
                  drop_path_rate=0.0)
    )
    assert flat > 0.01, flat
