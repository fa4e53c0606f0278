"""Training loop: jitted SPMD train/eval steps + epoch driver.

TPU-native re-design of the reference Trainer (reference:
training/trainer.py:24-412). The per-batch work — on-device featurization
(STFT/normalize/SpecAugment), forward, loss, grad, clip, AdamW — is ONE
jitted program compiled per length-bucket, with the batch sharded over the
mesh's ``data`` axis and the state replicated (or TP-sharded). XLA's SPMD
partitioner inserts the gradient/BN-stat collectives from the sharding
annotations (GSPMD global-view: BatchNorm batch statistics are
automatically *global* across data-parallel shards).

Mixed precision is bf16 activations / fp32 params+optimizer — no
GradScaler (the reference's fp16 AMP machinery, training/trainer.py:148-183,
is unnecessary on TPU; clip-by-global-norm-1.0 semantics are preserved).

Epoch-level contract mirrors the reference: per-epoch scheduler step
(plateau consumes val loss), best/periodic/final checkpoints, early
stopping with patience, TensorBoard/JSONL scalars.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.augmentation import SpecAugmentConfig
from ..data.pipeline import featurize_batch
from ..ops.stft import STFTConfig
from ..parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    distribute_batch,
    mesh_from_config,
)
from ..parallel.sharding import shard_variables
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.logging import MetricsLogger, Stopwatch
from .losses import LossConfig, batch_si_sdr_db, combined_loss
from .optimizer import chain_with_clip, create_optimizer, create_scheduler

Array = jax.Array


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array


def _has_injected_lr(s) -> bool:
    """Duck-typed match for optax's InjectHyperparamsState /
    InjectStatefulHyperparamsState (the class name changed across optax
    versions; both carry a ``hyperparams`` dict + ``_replace``)."""
    hp = getattr(s, "hyperparams", None)
    return (
        isinstance(hp, dict)
        and "learning_rate" in hp
        and hasattr(s, "_replace")
    )


def set_learning_rate(opt_state, lr: float):
    """Functionally set the injected learning_rate anywhere in the opt
    state (handles chain tuples and optax.MultiSteps wrapping)."""

    def walk(s):
        if _has_injected_lr(s):
            hp = dict(s.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return s._replace(hyperparams=hp)
        if isinstance(s, optax.MultiStepsState):
            return s._replace(inner_opt_state=walk(s.inner_opt_state))
        if type(s) is tuple:
            return tuple(walk(x) for x in s)
        return s

    return walk(opt_state)


def get_learning_rate(opt_state) -> float:
    def walk(s):
        if _has_injected_lr(s):
            return float(np.asarray(s.hyperparams["learning_rate"]))
        if isinstance(s, optax.MultiStepsState):
            return walk(s.inner_opt_state)
        if type(s) is tuple:
            for x in s:
                r = walk(x)
                if r is not None:
                    return r
        return None

    lr = walk(opt_state)
    return lr if lr is not None else float("nan")


def make_step_fns(
    model,
    optimizer: optax.GradientTransformation,
    loss_cfg: LossConfig,
    stft_cfg: STFTConfig,
    aug_cfg: SpecAugmentConfig,
    *,
    stft_method: str = "matmul",
    augment: bool = True,
    use_attention_mask: bool = False,
    skip_nonfinite: bool = True,
    output_mode: str = "magnitude",
    mesh=None,
):
    """Build jitted (train_step, eval_step) closed over static config.

    ``use_attention_mask=True`` excludes bucket-padding patches from
    attention in both train and eval steps (training.mask_padding config
    key / ``train.py --mask-padding``). Off by default: the reference
    lets padded frames attend (SURVEY.md §7.8). Combine with
    ``model.transformer.pos_embed: factored_2d`` for fully bucket-
    consistent training (PERF.md #14).

    ``output_mode`` (config key ``model.output_mode``):
      * ``"magnitude"`` (default, reference parity): the model output IS
        the normalized clean-magnitude estimate (reference:
        models/hybrid_vit.py:396-469). Its fidelity is capped by the
        decoder's 64-row frequency bottleneck + bilinear resize —
        measured +3.2 dB SI-SDR oracle on the r4 synthetic test set
        (benchmarks/results/oracle_r4.json).
      * ``"mask"`` (framework extension): the Tanh output maps to a
        [0,1] spectral mask ((out+1)/2) that MULTIPLIES the full-
        resolution noisy magnitude; the resize bottleneck then blurs
        only the mask, not the spectrum — measured +8.9 dB oracle on
        the same set (oracle_mask_r4.json). Loss compares
        mask*noisy_mag against clean_mag on the shared noisy-max scale.
    """
    if output_mode not in ("magnitude", "mask"):
        raise ValueError(
            f"model.output_mode must be 'magnitude' or 'mask', got {output_mode!r}"
        )
    mask_mode = output_mode == "mask"

    def _patch_mask(feats, batch):
        from ..models.components import patch_validity_mask

        return patch_validity_mask(
            batch["length"],
            feats.noisy_spec.shape[1],
            feats.noisy_spec.shape[2],
            stft_cfg.hop_length,
            pool_sizes=getattr(model, "encoder_pool_sizes", (2, 2, 1)),
            patch_size=getattr(model, "patch_size", 4),
        )

    def _featurize(batch, key):
        return featurize_batch(
            batch["noisy_audio"],
            batch["clean_audio"],
            batch["length"],
            stft_cfg,
            augment_key=key,
            augment_config=aug_cfg,
            stft_method=stft_method,
        )

    def _pred_target(out, feats):
        """Model output -> (prediction, target) for the loss."""
        if not mask_mode:
            return out, feats.clean_spec
        m = (out[..., 0].astype(jnp.float32) + 1.0) * 0.5  # Tanh -> [0,1]
        pred = m * feats.noisy_over_max
        return pred[..., None], feats.clean_over_max[..., None]

    def _si_sdr_term(pred, feats, batch):
        """-mean SI-SDR(dB) of the reconstructed waveform vs clean
        (loss.si_sdr_weight, round 5): the train step runs the exact
        inference reconstruction — predicted magnitude * noisy_max +
        noisy phase -> iSTFT — inside the jitted program and optimizes
        the benchmark metric directly. Padded rows are excluded; padded
        tails are zeros in both signals (zero clean padding, ~zero
        estimated magnitude there), so no frame masking is needed."""
        from ..data.pipeline import int16_to_float
        from ..ops.stft import reconstruct

        est_mag = pred[..., 0].astype(jnp.float32) * jnp.maximum(
            feats.noisy_max, 1e-8
        )[:, None, None]
        length = batch["clean_audio"].shape[-1]
        est = reconstruct(
            est_mag, feats.noisy_phase, stft_cfg, length=length,
            method="matmul",
        )
        ref = int16_to_float(batch["clean_audio"])
        si = batch_si_sdr_db(ref, est, valid=batch["valid"])
        return -si, si

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array):
        step_rng = jax.random.fold_in(rng, state.step)
        aug_key, drop_key = jax.random.split(step_rng)
        feats = _featurize(batch, aug_key if augment else None)
        valid = batch["valid"]
        # reference default: padded frames attend (§7.8); masking opt-in
        attn_mask = _patch_mask(feats, batch) if use_attention_mask else None

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                feats.noisy_spec,
                mask=attn_mask,
                train=True,
                rngs={"dropout": drop_key},
                mutable=["batch_stats"],
            )
            pred, target = _pred_target(out, feats)
            total, comps = combined_loss(
                pred,
                target,
                loss_cfg,
                frame_mask=feats.frame_mask,
                sample_valid=valid,
            )
            if loss_cfg.si_sdr_weight > 0:
                term, si = _si_sdr_term(pred, feats, batch)
                total = total + loss_cfg.si_sdr_weight * term
                comps = dict(comps)
                comps["si_sdr_db"] = si
                comps["total"] = total
            return total, (comps, mutated["batch_stats"])

        (_, (comps, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {k: v for k, v in comps.items()}
        metrics["grad_norm"] = gnorm
        if skip_nonfinite:
            # A single non-finite gradient (bf16 overflow, loss spike)
            # would otherwise poison the params FOREVER — every later
            # step computes NaN·0 = NaN. The reference is protected by
            # torch.cuda.amp.GradScaler, which skips the optimizer step
            # when it finds infs/NaNs (reference: training/trainer.py
            # scaler.step/update); this is the bf16-no-scaler equivalent:
            # keep params/opt-state/batch-stats from BEFORE the bad step.
            ok = jnp.isfinite(gnorm) & jnp.isfinite(comps["total"])

            def keep(new, old):
                return jax.tree_util.tree_map(
                    lambda n, o: jnp.where(ok, n, o), new, old
                )

            new_params = keep(new_params, state.params)
            new_opt = keep(new_opt, state.opt_state)
            new_stats = keep(new_stats, state.batch_stats)
            # mask the metrics too: a skipped step's NaN loss/grad-norm
            # must not poison the per-epoch averages (params are kept,
            # so the logs should reflect the accepted trajectory);
            # train_epoch divides loss metrics by the ACCEPTED count
            metrics = {
                k: jnp.where(ok, v, jnp.zeros_like(v))
                for k, v in metrics.items()
            }
            metrics["nonfinite_skipped"] = 1.0 - ok.astype(jnp.float32)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    def eval_step(state: TrainState, batch: Dict[str, Array]):
        feats = _featurize(batch, None)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            feats.noisy_spec,
            mask=_patch_mask(feats, batch) if use_attention_mask else None,
            train=False,
        )
        pred, target = _pred_target(out, feats)
        total, comps = combined_loss(
            pred,
            target,
            loss_cfg,
            frame_mask=feats.frame_mask,
            sample_valid=batch["valid"],
        )
        if loss_cfg.si_sdr_weight > 0:
            term, si = _si_sdr_term(pred, feats, batch)
            comps = dict(comps)
            comps["si_sdr_db"] = si
            comps["total"] = comps["total"] + loss_cfg.si_sdr_weight * term
        return comps

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P(DATA_AXIS))
        batch_sh = {
            "noisy_audio": data_sh,
            "clean_audio": data_sh,
            "length": data_sh,
            "valid": data_sh,
        }
        train_step = jax.jit(
            train_step,
            in_shardings=(None, batch_sh, repl),
            donate_argnums=(0,),
        )
        eval_step = jax.jit(eval_step, in_shardings=(None, batch_sh))
    else:
        train_step = jax.jit(train_step, donate_argnums=(0,))
        eval_step = jax.jit(eval_step)
    return train_step, eval_step


class Trainer:
    """Epoch-loop driver with the reference's training contract."""

    def __init__(
        self,
        model,
        config: Dict,
        train_loader,
        val_loader=None,
        *,
        mesh=None,
        checkpoint_dir: Optional[str | Path] = None,
        log_dir: Optional[str | Path] = None,
        resume_from: Optional[str | Path] = None,
        example_batch: Optional[Dict[str, np.ndarray]] = None,
        profile_dir: Optional[str | Path] = None,
    ):
        self.model = model
        self.config = config
        self.profile_dir = profile_dir
        self.train_loader = train_loader
        self.val_loader = val_loader
        tc = config.get("training", {})
        self.num_epochs = tc.get("num_epochs", 100)
        self.grad_accum = tc.get("gradient_accumulation_steps", 1)
        self.log_every = tc.get("logging", {}).get("log_every_n_steps", 10)
        self.seed = tc.get("seed", 42)
        self.sample_rate = config.get("data", {}).get("sample_rate", 16000)

        ckpt_cfg = tc.get("checkpoint", {})
        self.checkpoint_dir = Path(
            checkpoint_dir or ckpt_cfg.get("save_dir", "checkpoints")
        )
        self.save_every = ckpt_cfg.get("save_every_n_epochs", 5)
        self.save_best_only = ckpt_cfg.get("save_best_only", True)
        self.val_every = tc.get("validation", {}).get("val_every_n_epochs", 1)
        es = tc.get("early_stopping", {})
        self.early_stopping = es.get("enabled", True)
        self.patience = es.get("patience", 10)
        self.min_delta = es.get("min_delta", 1e-4)

        self.mesh = mesh if mesh is not None else mesh_from_config(config)
        # Tensor parallelism engages automatically whenever the mesh has a
        # non-trivial model axis (--model-parallel N / mesh.model_parallel):
        # qkv/MLP kernels Megatron-sharded, optimizer moments included
        # (parallel/sharding.py). mesh.use_tensor_parallel=false opts out
        # (replicated weights, model axis idle).
        self.use_tp = (
            self.mesh.shape.get(MODEL_AXIS, 1) > 1
            and config.get("mesh", {}).get("use_tensor_parallel", True)
        )
        self.stft_cfg = STFTConfig(
            n_fft=config.get("audio", {}).get("n_fft", 512),
            hop_length=config.get("audio", {}).get("hop_length", 128),
            win_length=config.get("audio", {}).get("win_length", 512),
            window=config.get("audio", {}).get("window", "hann"),
        )
        self.loss_cfg = LossConfig.from_config(config)
        aug = config.get("data", {}).get("augmentation", {})
        sa = aug.get("spec_augment", {})
        rg = aug.get("random_gain", {})
        self.aug_cfg = SpecAugmentConfig(
            freq_mask_num=sa.get("freq_mask_num", 2),
            freq_mask_width=sa.get("freq_mask_width", 15),
            time_mask_num=sa.get("time_mask_num", 2),
            time_mask_width=sa.get("time_mask_width", 30),
            gain_prob=rg.get("probability", 0.5),
            gain_db_range=tuple(rg.get("gain_db_range", (-3.0, 3.0))),
            enabled=sa.get("enabled", True) and aug.get("enabled", True),
            gain_enabled=rg.get("enabled", True) and aug.get("enabled", True),
        )

        base_opt = create_optimizer(config)
        clip = tc.get("gradient_clip_max_norm", 1.0)
        self.optimizer = chain_with_clip(base_opt, clip)
        if self.grad_accum > 1:
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=self.grad_accum
            )
        self.scheduler = create_scheduler(config, self.num_epochs)

        self.logger = MetricsLogger(
            log_dir or tc.get("logging", {}).get("log_dir", "logs"),
            tc.get("experiment_name", "experiment"),
            use_tensorboard=tc.get("logging", {}).get("use_tensorboard", True),
        )

        # ----- state init -----
        self.rng = jax.random.PRNGKey(self.seed)
        init_batch = example_batch or next(iter(train_loader))
        self.state = self._init_state(init_batch)
        self.current_epoch = 0
        self.best_val_loss = float("inf")
        self.epochs_no_improve = 0
        if resume_from:
            self.load(resume_from)

        stft_method = config.get("tpu", {}).get("stft_method", "matmul")
        self.train_step, self.eval_step = make_step_fns(
            self.model,
            self.optimizer,
            self.loss_cfg,
            self.stft_cfg,
            self.aug_cfg,
            stft_method=stft_method,
            augment=aug.get("enabled", True),
            use_attention_mask=tc.get("mask_padding", False),
            skip_nonfinite=tc.get("skip_nonfinite_updates", True),
            output_mode=config.get("model", {}).get("output_mode", "magnitude"),
            mesh=self.mesh,
        )
        self.stopwatch = Stopwatch()
        lc = tc.get("logging", {})
        # audio-sample logging: the reference config promises this
        # (train_config.yaml:73-74) but nothing implements it (SURVEY §5)
        self.log_audio_samples = lc.get("save_audio_samples", False) and (
            self.logger.tb is not None
        )
        self.num_audio_samples = lc.get("num_audio_samples", 5)

    # ------------------------------------------------------------------
    def _log_audio_samples(self, epoch: int) -> None:
        """Enhance a few validation utterances and write noisy/enhanced
        audio to TensorBoard."""
        if not self.log_audio_samples or self.val_loader is None:
            return
        try:
            from ..inference.enhancer import AudioEnhancer

            variables = {
                "params": jax.device_get(self.state.params),
                "batch_stats": jax.device_get(self.state.batch_stats),
            }
            enhancer = AudioEnhancer(
                self.model, variables, self.config,
                buckets=tuple(self.train_loader.buckets),
            )
            ds = self.val_loader.dataset
            n = min(self.num_audio_samples, len(ds))
            wavs = [ds.load_pair(i)[0] for i in range(n)]
            outs = enhancer.enhance_batch(wavs)
            step = int(jax.device_get(self.state.step))
            for i, (noisy, enh) in enumerate(zip(wavs, outs)):
                if epoch == 0:
                    self.logger.log_audio(
                        step, f"audio/noisy_{i}", noisy, self.sample_rate
                    )
                self.logger.log_audio(
                    step, f"audio/enhanced_{i}", enh, self.sample_rate
                )
        except Exception as e:  # never kill training over logging
            print(f"warning: audio sample logging failed: {e}")

    # ------------------------------------------------------------------
    def _init_state(self, batch: Dict[str, np.ndarray]) -> TrainState:
        feats = featurize_batch(
            jnp.asarray(batch["noisy_audio"][:1]),
            jnp.asarray(batch["clean_audio"][:1]),
            jnp.asarray(batch["length"][:1]),
            self.stft_cfg,
        )
        init_rng, self.rng = jax.random.split(self.rng)
        init = jax.jit(functools.partial(self.model.init, train=False))
        variables = init(
            {"params": init_rng, "dropout": jax.random.PRNGKey(0)},
            feats.noisy_spec,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)
        opt_state = set_learning_rate(opt_state, self.scheduler(0))
        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.asarray(0, jnp.int32),
        )
        return shard_variables(state, self.mesh, use_tp=self.use_tp)

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        """One epoch. Metric scalars stay on device and are summed there;
        the host syncs once per epoch (plus once every ``log_every``
        batches for the batch log) — per-batch host syncs would serialize
        the async dispatch pipeline (expensive on remote/tunneled TPUs)."""
        totals: Dict[str, Array] = {}
        count = 0
        step_counter = 0
        epoch_rng = jax.random.fold_in(self.rng, epoch)
        profiling = False
        for batch in self.train_loader:
            # jax.profiler trace of a few steady-state steps (SURVEY §5:
            # the reference has no profiling; TPU build adds trace hooks)
            if self.profile_dir and epoch == 0 and count == 1:
                # skip batch 0 (compile); trace a few steady-state steps
                jax.profiler.start_trace(str(self.profile_dir))
                profiling = True
            audio_sec = float(batch["length"].sum()) / self.sample_rate
            batch = distribute_batch(batch, self.mesh)
            self.state, metrics = self.train_step(self.state, batch, epoch_rng)
            count += 1
            step_counter += 1
            if profiling and count >= 6:
                jax.block_until_ready(metrics["total"])
                jax.profiler.stop_trace()
                profiling = False
            for k, v in metrics.items():
                totals[k] = v if k not in totals else totals[k] + v
            if step_counter % self.log_every == 0:
                host = {k: float(v) for k, v in metrics.items()}
                self.logger.log_scalars(step_counter, host, prefix="train/batch_")
            self.stopwatch.tick(audio_sec)
        if profiling:  # fewer than 8 batches in the epoch
            jax.profiler.stop_trace()
        host_totals = jax.device_get(totals)
        # skipped (non-finite) steps contribute zeros to every metric sum,
        # so average the loss/grad metrics over the ACCEPTED steps only;
        # nonfinite_skipped itself stays a fraction of ALL steps
        skipped = float(host_totals.get("nonfinite_skipped", 0.0))
        accepted = count - skipped
        if count and accepted <= 0:
            # every step diverged: zero-filled sums would report a perfect
            # 0.0 loss (and a no-val run would then save it as best_model);
            # NaN is the honest value and never wins a best-loss compare
            return {
                k: (1.0 if k == "nonfinite_skipped" else float("nan"))
                for k in host_totals
            }
        return {
            k: float(v)
            / (max(count, 1) if k == "nonfinite_skipped" else max(accepted, 1.0))
            for k, v in host_totals.items()
        }

    def validate(self) -> Dict[str, float]:
        if self.val_loader is None:
            return {}
        totals: Dict[str, Array] = {}
        count = 0
        for batch in self.val_loader:
            batch = distribute_batch(batch, self.mesh)
            metrics = self.eval_step(self.state, batch)
            for k, v in metrics.items():
                totals[k] = v if k not in totals else totals[k] + v
            count += 1
        host_totals = jax.device_get(totals)
        return {k: float(v) / max(count, 1) for k, v in host_totals.items()}

    # ------------------------------------------------------------------
    def train(self) -> Dict[str, float]:
        """Full training run (reference: training/trainer.py:253-348)."""
        history = {"train_loss": [], "val_loss": []}
        if self.val_loader is None:
            # the reference always has a val split, so `best_model` is
            # always best-on-val (trainer.py:314-328). Without any
            # validation the closest equivalent is best-on-TRAIN-loss —
            # never silently dropping the best-checkpoint contract.
            print(
                "warning: no validation loader — best_model will track "
                "the training loss instead of a validation loss"
            )
        for epoch in range(self.current_epoch, self.num_epochs):
            t0 = time.perf_counter()
            train_metrics = self.train_epoch(epoch)
            run_val = (epoch + 1) % max(self.val_every, 1) == 0
            val_metrics = self.validate() if run_val else {}
            validated = run_val and "total" in val_metrics
            val_loss = val_metrics.get("total", train_metrics.get("total", 0.0))

            # per-epoch scheduler step (plateau gets the val loss, and only
            # on epochs that actually validated — a train loss must never
            # drive the plateau state)
            lr = self.scheduler(epoch + 1, val_loss if validated else None)
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, lr)
            )

            step = int(jax.device_get(self.state.step))
            scalars = {f"train_{k}": v for k, v in train_metrics.items()}
            scalars.update({f"val_{k}": v for k, v in val_metrics.items()})
            scalars["lr"] = lr
            scalars["epoch_time_s"] = time.perf_counter() - t0
            scalars["audio_seconds_per_s"] = self.stopwatch.audio_seconds_per_second
            self.logger.log_scalars(step, scalars, prefix="epoch/")
            history["train_loss"].append(train_metrics.get("total", 0.0))
            history["val_loss"].append(val_loss)

            self._log_audio_samples(epoch)
            # best-model / early-stop bookkeeping runs ONLY on epochs that
            # actually validated: with val_every_n_epochs > 1 a (low-dropout)
            # train loss must never overwrite best_model or reset patience.
            # The reference validates every epoch (trainer.py:269-337) so it
            # never faces this; the knob is ours, so is the guard.
            # Exception: with NO validation loader at all, `val_loss` above
            # falls back to the train loss and best_model tracks that —
            # otherwise a no-val run would never write best_model and
            # report `best val loss inf` (round-3 regression).
            if validated or self.val_loader is None:
                improved = val_loss < self.best_val_loss - self.min_delta
                if improved:
                    self.best_val_loss = val_loss
                    self.epochs_no_improve = 0
                    # best-on-val is always kept (reference policy:
                    # best + every-N + final, trainer.py:314-342)
                    self.save(self.checkpoint_dir / "best_model", epoch)
                else:
                    self.epochs_no_improve += 1
            if self.save_every and (epoch + 1) % self.save_every == 0:
                self.save(self.checkpoint_dir / f"checkpoint_epoch_{epoch+1}", epoch)
            self.current_epoch = epoch + 1
            if self.early_stopping and self.epochs_no_improve >= self.patience:
                print(f"Early stopping at epoch {epoch + 1}")
                break
        self.save(self.checkpoint_dir / "final_model", self.current_epoch - 1)
        return history

    # ------------------------------------------------------------------
    def save(self, path: str | Path, epoch: int) -> Path:
        tree = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        if jax.process_count() > 1:
            # multi-host: TP-sharded leaves are not host-addressable —
            # gather to replicated (every host participates in the
            # collective), then only host 0 touches the filesystem
            rep = NamedSharding(self.mesh, P())
            tree = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep)
                if isinstance(x, jax.Array) and not x.is_fully_addressable
                else x,
                tree,
            )
            jax.block_until_ready(tree)
            if jax.process_index() != 0:
                return Path(path)
        return save_checkpoint(
            path,
            tree,
            epoch=epoch,
            global_step=int(jax.device_get(self.state.step)),
            best_val_loss=self.best_val_loss,
            config=self.config,
        )

    def load(self, path: str | Path) -> None:
        """Resume: restores model/opt state + loop position
        (reference: training/trainer.py:382-412 → epoch+1 semantics)."""
        template = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        tree, meta = load_checkpoint(path, template)
        self.state = TrainState(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=jnp.asarray(tree["step"]),
        )
        self.state = shard_variables(self.state, self.mesh, use_tp=self.use_tp)
        self.current_epoch = int(meta.get("epoch", -1)) + 1
        self.best_val_loss = float(meta.get("best_val_loss", float("inf")))
