#!/usr/bin/env python3
"""Train the committed ``tiny_denoiser`` test fixture (CPU, ~25 min).

tests/test_streaming_bound.py needs a model whose output is *signal-
dominated* (a real, if small, denoiser) to bound streaming-vs-exact
inference error meaningfully — with random weights the positional
embeddings dominate and the bound says nothing (VERDICT r2 next-step #9).
This script trains a ~0.6M-param HybridViT on 200 synthetic formant pairs
(scripts/synth_dataset.py signals, SNR 0-10 dB) with the exact featurize
path the real Trainer uses, verifies it improves held-out SI-SDR, and
saves weights-only to tests/fixtures/tiny_denoiser/ (~2.5 MB).

Usage: python tests/fixtures/make_tiny_denoiser.py [--steps N]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from synth_dataset import coloured_noise, speechlike  # noqa: E402

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation.metrics import (  # noqa: E402
    si_sdr,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (  # noqa: E402
    AudioEnhancer,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (  # noqa: E402
    HybridViT,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.audio import (  # noqa: E402
    mix_at_snr,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.stft import (  # noqa: E402
    STFTConfig,
    magphase,
    stft,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils.checkpoint import (  # noqa: E402
    save_model_weights,
)

SR = 16000
CFG = STFTConfig()

# Matches tests/test_streaming_bound.py::tiny_model — keep in sync.
TINY = dict(
    embed_dim=128,
    num_heads=4,
    num_layers=2,
    mlp_ratio=2.0,
    encoder_channels=(16, 32, 64),
    decoder_channels=(32, 16, 1),
    dropout=0.0,
    attn_dropout=0.0,
    drop_path_rate=0.0,
    use_pallas_attention=False,
    pos_embed_type="factored_2d",
)


def make_pairs(n, seconds, rng, snr_lo=0.0, snr_hi=10.0):
    cs, ns = [], []
    for _ in range(n):
        c = speechlike(seconds, rng)
        x = mix_at_snr(c, coloured_noise(len(c), rng), rng.uniform(snr_lo, snr_hi))
        cs.append(np.asarray(c, np.float32))
        ns.append(np.asarray(x, np.float32))
    return np.stack(cs), np.stack(ns)


def normalize(wav):
    """Per-utterance min-max spectrogram normalization — the same contract
    as data/pipeline.py::featurize_batch (all fixture clips are unpadded
    equal length, so no frame mask is needed)."""
    re, im = stft(jnp.asarray(wav), CFG, method="matmul")
    mag, _ = magphase(re, im)
    mn = mag.min(axis=(-2, -1), keepdims=True)
    mx = mag.max(axis=(-2, -1), keepdims=True)
    return (mag - mn) / jnp.maximum(mx - mn, 1e-8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--pairs", type=int, default=200)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--out", default=str(Path(__file__).parent / "tiny_denoiser")
    )
    ap.add_argument(
        "--mask-head",
        action="store_true",
        help="train with model.output_mode='mask' semantics: the Tanh "
             "output is a [0,1] mask on the full-resolution noisy "
             "magnitude (PERF.md r4; fixture saved with that config)",
    )
    ap.add_argument(
        "--head",
        default="resize",
        choices=["resize", "fullres_mask"],
        help="output head (fullres_mask = the r5 sub-pixel + input-skip "
             "head; pair with --mask-head — PERF.md r5)",
    )
    ap.add_argument(
        "--log-compression",
        action="store_true",
        help="train on log-compressed magnitudes (loss-recipe experiments)",
    )
    ap.add_argument(
        "--log-l1",
        type=float,
        default=0.0,
        help="blended log-L1 weight added to the linear L1 (PERF.md #16)",
    )
    ap.add_argument(
        "--log-eps",
        type=float,
        default=1e-8,
        help="log floor for the blended term: bounds the 1/(|x|+eps) "
        "gradient of near-silent bins (PERF.md #16 ablation)",
    )
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    train_c, train_n = make_pairs(args.pairs, args.seconds, rng)

    model = HybridViT(**TINY, head_type=args.head)
    variables = model.init(
        jax.random.PRNGKey(0), normalize(train_n[:1])[..., None], train=False
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"tiny model: {n_params/1e6:.2f}M params")

    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, 1e-3, 200, args.steps),
        weight_decay=0.01,
    )
    params, bstats = variables["params"], variables.get("batch_stats", {})
    opt_state = tx.init(params)

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training.losses import (
        log_compress,
    )

    def err(pred, target):
        if args.log_compression:
            return jnp.abs(log_compress(pred) - log_compress(target))
        e = jnp.abs(pred - target)
        if args.log_l1 > 0:
            e = e + args.log_l1 * jnp.abs(
                log_compress(pred, args.log_eps) - log_compress(target, args.log_eps)
            )
        return e

    @jax.jit
    def step(params, bstats, opt_state, noisy, clean):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bstats},
                normalize(noisy)[..., None],
                train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
            )
            if args.mask_head:
                # mask-head contract (training/trainer.py::_pred_target):
                # pred = (tanh+1)/2 * noisy_mag/noisy_max vs clean_mag/noisy_max
                re_n, im_n = stft(noisy, CFG, method="matmul")
                mag_n, _ = magphase(re_n, im_n)
                re_c, im_c = stft(clean, CFG, method="matmul")
                mag_c, _ = magphase(re_c, im_c)
                nmax = jnp.maximum(mag_n.max(axis=(-2, -1), keepdims=True), 1e-8)
                pred = (out[..., 0] + 1.0) * 0.5 * (mag_n / nmax)
                return err(pred, mag_c / nmax).mean(), upd["batch_stats"]
            return err(out[..., 0], normalize(clean)).mean(), upd["batch_stats"]

        (loss, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), nbs, opt_state, loss

    t0 = time.time()
    for i in range(args.steps):
        idx = rng.integers(0, len(train_c), args.batch)
        params, bstats, opt_state, loss = step(
            params, bstats, opt_state, jnp.asarray(train_n[idx]), jnp.asarray(train_c[idx])
        )
        if (i + 1) % 250 == 0:
            print(
                f"step {i+1}/{args.steps}  loss {float(loss):.4f}  "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )

    # Held-out check: the fixture must actually denoise.
    variables = {"params": params, "batch_stats": bstats}
    fx_cfg = {"model": {}}
    if args.mask_head:
        fx_cfg["model"]["output_mode"] = "mask"
    if args.head != "resize":
        fx_cfg["model"]["head"] = args.head
    if not fx_cfg["model"]:
        fx_cfg = {}
    enh = AudioEnhancer(model, variables, fx_cfg, buckets=(64, 128, 256), mask_padding=True)
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation.metrics import (
        log_spectral_distance,
    )

    heldout = np.random.default_rng(args.seed + 1)
    gains, lsd_deltas = [], []
    for _ in range(6):
        c = speechlike(args.seconds, heldout)
        x = np.asarray(
            mix_at_snr(c, coloured_noise(len(c), heldout), heldout.uniform(0, 10)),
            np.float32,
        )
        y = enh.enhance(x)
        gains.append(si_sdr(c[: len(y)], y) - si_sdr(c[: len(x)], x))
        lsd_deltas.append(
            log_spectral_distance(c[: len(x)], x) - log_spectral_distance(c[: len(y)], y)
        )
    gains, lsd_deltas = np.asarray(gains), np.asarray(lsd_deltas)
    print(f"held-out SI-SDR improvement: {gains.mean():+.2f} dB  (per-clip {np.round(gains,2)})")
    print(f"held-out LSD improvement (noisy-enhanced, +=better): {lsd_deltas.mean():+.2f}")

    save_cfg = {"tiny": TINY, "heldout_si_sdr_gain_db": float(gains.mean())}
    save_cfg.update(fx_cfg)
    save_model_weights(args.out, variables, config=save_cfg)
    print(f"saved fixture to {args.out}")
    if gains.mean() <= 0:
        print("WARNING: fixture does not denoise — do not commit", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
