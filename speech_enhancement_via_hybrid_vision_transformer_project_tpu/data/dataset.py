"""VoiceBank-DEMAND dataset: pairing, splits, bucketed batching, loader.

TPU-first re-design of the reference pipeline (reference: data/dataset.py).
Key differences, by design:

* The loader yields **padded waveform batches** (+ true lengths); STFT,
  per-utterance min-max normalization and SpecAugment run **on-device**
  inside the jitted train step (see ``data.pipeline``) — host CPUs only
  decode WAVs, the MXU does the DFT.
* Batches are **length-bucketed** to a fixed set of frame counts so XLA
  compiles one program per bucket instead of one per batch-max length
  (the reference pads to batch max, data/dataset.py:297-347, which under
  jit would retrace every step).
* No torch DataLoader: a thread-pool prefetcher feeds numpy batches
  (equivalent of the reference's num_workers=4 worker processes).

Pairing / split semantics are kept bit-identical to the reference:
noisy files sorted, paired by filename, train = first 90% of the sorted
list, val = the tail (reference: data/dataset.py:96-147; SURVEY.md §7.7).
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.stft import STFTConfig
from .preprocessing import AudioPreprocessor
from .wavio import load_audio

DEFAULT_BUCKETS = (128, 256, 384, 512, 768, 1024)


def pair_files(
    noisy_dir: Path, clean_dir: Path, warn=print
) -> List[Tuple[Path, Path]]:
    """Sorted noisy files paired with same-named clean files
    (reference: data/dataset.py:124-135)."""
    pairs = []
    for noisy_path in sorted(noisy_dir.glob("*.wav")):
        clean_path = clean_dir / noisy_path.name
        if clean_path.exists():
            pairs.append((noisy_path, clean_path))
        else:
            warn(f"Warning: No clean file found for {noisy_path.name}")
    return pairs


class VoiceBankDataset:
    """Paired noisy/clean utterances with deterministic train/val split."""

    def __init__(
        self,
        data_root: str | Path,
        split: str = "train",
        config: Optional[dict] = None,
        preprocessor: Optional[AudioPreprocessor] = None,
        cache_audio: Optional[bool] = None,
    ):
        self.config = (config or {}).get("data", config or {})
        self.data_root = Path(data_root)
        self.split = split
        self.sample_rate = self.config.get("sample_rate", 16000)
        self.stft_config = STFTConfig(
            n_fft=self.config.get("n_fft", 512),
            hop_length=self.config.get("hop_length", 128),
            win_length=self.config.get("win_length", 512),
            window=self.config.get("window", "hann"),
        )
        self.preprocessor = preprocessor or AudioPreprocessor(
            sample_rate=self.sample_rate,
            normalize=self.config.get("normalize_audio", True),
        )
        if cache_audio is None:
            cache_audio = self.config.get("cache", {}).get("enabled", False)
        self.cache_audio = cache_audio
        self._cache: Dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.file_pairs = self._load_file_pairs()

    def _load_file_pairs(self) -> List[Tuple[Path, Path]]:
        if self.split in ("train", "val"):
            noisy_dir = self.data_root / self.config.get(
                "noisy_train_dir", "noisy_trainset_28spk_wav"
            )
            clean_dir = self.data_root / self.config.get(
                "clean_train_dir", "clean_trainset_28spk_wav"
            )
        elif self.split == "test":
            noisy_dir = self.data_root / self.config.get(
                "noisy_test_dir", "noisy_testset_wav"
            )
            clean_dir = self.data_root / self.config.get(
                "clean_test_dir", "clean_testset_wav"
            )
        else:
            raise ValueError(
                f"Invalid split: {self.split}. Must be 'train', 'val', or 'test'"
            )
        for d in (noisy_dir, clean_dir):
            if not d.exists():
                raise FileNotFoundError(
                    f"Audio directory not found: {d}\n"
                    f"Download VoiceBank-DEMAND into {self.data_root}"
                )
        pairs = pair_files(noisy_dir, clean_dir)
        if self.split in ("train", "val"):
            frac = self.config.get("train_val_split", 0.9)
            split_idx = int(len(pairs) * frac)
            pairs = pairs[:split_idx] if self.split == "train" else pairs[split_idx:]
        return pairs

    def __len__(self) -> int:
        return len(self.file_pairs)

    def load_pair(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        """Preprocessed, length-matched (noisy, clean) waveforms
        (reference: data/dataset.py:248-268)."""
        if self.cache_audio and idx in self._cache:
            return self._cache[idx]
        noisy_path, clean_path = self.file_pairs[idx]
        noisy, _ = load_audio(noisy_path, self.sample_rate)
        clean, _ = load_audio(clean_path, self.sample_rate)
        noisy = self.preprocessor.process(noisy)
        clean = self.preprocessor.process(clean)
        n = min(len(noisy), len(clean))
        out = (noisy[:n], clean[:n])
        if self.cache_audio:
            self._cache[idx] = out
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        noisy, clean = self.load_pair(idx)
        return {
            "noisy_audio": noisy,
            "clean_audio": clean,
            "length": np.int32(len(noisy)),
        }

    def shard(self, host_id: int, num_hosts: int) -> "VoiceBankDataset":
        """Host-local file sharding for multi-host input pipelines
        (each host reads its stride of the sorted list; SURVEY.md §5)."""
        import copy

        ds = copy.copy(self)
        ds.file_pairs = self.file_pairs[host_id::num_hosts]
        ds._cache = {}
        return ds


# ---------------------------------------------------------------------------
# Bucketed collation
# ---------------------------------------------------------------------------


def bucket_for_frames(
    n_frames: int, buckets: Sequence[int] = DEFAULT_BUCKETS
) -> int:
    """Smallest bucket >= n_frames (last bucket caps — longer utterances
    are truncated there, mirroring the pos-table cap, SURVEY.md §7.11)."""
    for b in buckets:
        if n_frames <= b:
            return b
    return buckets[-1]


def frames_needed(n_samples: int, hop_length: int) -> int:
    """Frame bucket large enough that its waveform length (bucket-1)*hop
    covers ``n_samples`` without truncation: 1 + ceil(L / hop)."""
    return 1 + -(-n_samples // hop_length)


def collate_waveforms(
    items: List[Dict[str, np.ndarray]],
    stft_config: STFTConfig = STFTConfig(),
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    batch_size: Optional[int] = None,
    fixed_bucket: Optional[int] = None,
    transfer_dtype: str = "float32",
) -> Dict[str, np.ndarray]:
    """Right-pad waveforms so every item in the batch produces the same
    bucketed frame count (zero padding — reference pads spectrograms with
    zeros to batch max, data/dataset.py:297-347).

    If ``batch_size`` is given the batch is additionally padded with empty
    rows to a fixed size (static shapes for jit); ``valid`` marks real rows.
    ``fixed_bucket`` forces one frame count for every batch — required in
    multi-host training, where all hosts must execute the identical
    compiled step in lockstep regardless of their local clip lengths.

    ``transfer_dtype='int16'`` (round 5) ships the batch as PCM16 and lets
    ``featurize_batch`` rescale on device — halving host->device traffic,
    the dominant per-epoch cost on a remote-relay TPU. The sources are
    PCM16 WAVs, so requantization costs at most 1 PCM16 LSB (~3e-5),
    orders below the bf16 compute noise (equivalence tested).
    """
    hop = stft_config.hop_length
    if fixed_bucket is not None:
        bucket = fixed_bucket
    else:
        frames = [frames_needed(len(it["noisy_audio"]), hop) for it in items]
        bucket = bucket_for_frames(max(frames), buckets)
    wav_len = (bucket - 1) * hop  # num_frames(wav_len) == bucket (center)
    b = batch_size or len(items)
    noisy = np.zeros((b, wav_len), np.float32)
    clean = np.zeros((b, wav_len), np.float32)
    lengths = np.zeros((b,), np.int32)
    valid = np.zeros((b,), bool)
    for i, it in enumerate(items):
        n = min(len(it["noisy_audio"]), wav_len)
        noisy[i, :n] = it["noisy_audio"][:n]
        clean[i, :n] = it["clean_audio"][:n]
        lengths[i] = n
        valid[i] = True
    if transfer_dtype == "int16":
        noisy = np.clip(np.rint(noisy * 32768.0), -32768, 32767).astype(
            np.int16
        )
        clean = np.clip(np.rint(clean * 32768.0), -32768, 32767).astype(
            np.int16
        )
    elif transfer_dtype != "float32":
        raise ValueError(
            f"transfer_dtype must be float32|int16, got {transfer_dtype!r}"
        )
    return {
        "noisy_audio": noisy,
        "clean_audio": clean,
        "length": lengths,
        "valid": valid,
    }


class DataLoader:
    """Thread-pool prefetching loader yielding collated numpy batches.

    Groups shuffled items into per-bucket batches so compiled shapes repeat
    (equivalent role to the reference's torch DataLoader + collate_fn,
    data/dataset.py:350-380).
    """

    def __init__(
        self,
        dataset: VoiceBankDataset,
        batch_size: int = 16,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 42,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        drop_last: bool = False,
        pad_to_batch: bool = True,
        fixed_bucket: Optional[int] = None,
        max_batches: Optional[int] = None,
        transfer_dtype: str = "float32",
    ):
        """``fixed_bucket``/``max_batches`` are the multi-host lockstep
        knobs: with a fixed frame bucket every host compiles and executes
        the same program shape each step, and ``max_batches`` (set to the
        smallest per-host batch count, computable locally from the global
        file count) keeps all hosts stepping the same number of times."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.buckets = tuple(buckets)
        self.drop_last = drop_last
        self.pad_to_batch = pad_to_batch
        self.fixed_bucket = fixed_bucket
        self.max_batches = max_batches
        self.transfer_dtype = transfer_dtype
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            n_batches = n // self.batch_size
        else:
            n_batches = (n + self.batch_size - 1) // self.batch_size
        if self.max_batches is not None:
            # lockstep contract: EXACTLY max_batches per epoch — truncate
            # when over, pad with all-invalid batches when under (a host
            # whose shard is smaller than its peers' must still step)
            n_batches = self.max_batches
        return n_batches

    def _batch_indices(self) -> List[Optional[List[int]]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        batches: List[Optional[List[int]]] = [
            list(idx[i : i + self.batch_size])
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.max_batches is not None:
            batches = batches[: self.max_batches]
            # None = padding batch: collated from item 0 with EVERY row
            # marked invalid, so SPMD peers can keep stepping in lockstep
            # while this host's shard is exhausted (multi-host uneven val)
            batches.extend([None] * (self.max_batches - len(batches)))
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batch_indices()
        self.epoch += 1
        cfg = self.dataset.stft_config
        out_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()
        trunc_lock = threading.Lock()
        trunc_count = 0
        cap_bucket = self.fixed_bucket or self.buckets[-1]
        max_wav = (cap_bucket - 1) * cfg.hop_length

        def producer(worker_id: int):
            nonlocal trunc_count
            error = None
            try:
                for bi in range(worker_id, len(batches), self.num_workers):
                    if stop.is_set():
                        return
                    if batches[bi] is None:  # lockstep padding batch
                        items = [self.dataset[0]]
                        batch = collate_waveforms(
                            items,
                            cfg,
                            self.buckets,
                            self.batch_size if self.pad_to_batch else None,
                            fixed_bucket=self.fixed_bucket,
                            transfer_dtype=self.transfer_dtype,
                        )
                        batch["valid"][:] = False
                        out_q.put((bi, batch))
                        continue
                    items = [self.dataset[i] for i in batches[bi]]
                    over = sum(
                        1 for it in items if len(it["noisy_audio"]) > max_wav
                    )
                    if over:
                        with trunc_lock:
                            trunc_count += over
                    batch = collate_waveforms(
                        items,
                        cfg,
                        self.buckets,
                        self.batch_size if self.pad_to_batch else None,
                        fixed_bucket=self.fixed_bucket,
                        transfer_dtype=self.transfer_dtype,
                    )
                    out_q.put((bi, batch))
            except Exception as e:  # propagate instead of hanging the consumer
                error = e
            finally:
                out_q.put((None, error))

        threads = [
            threading.Thread(target=producer, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            pending: Dict[int, Dict[str, np.ndarray]] = {}
            done_workers = 0
            next_bi = 0
            while done_workers < len(threads) or pending:
                if next_bi in pending:
                    yield pending.pop(next_bi)
                    next_bi += 1
                    continue
                bi, batch = out_q.get()
                if bi is None:
                    if batch is not None:  # a worker raised
                        raise batch
                    done_workers += 1
                    continue
                pending[bi] = batch
            while next_bi < len(batches) and next_bi in pending:
                yield pending.pop(next_bi)
                next_bi += 1
        finally:
            stop.set()
            if trunc_count:
                sr = getattr(self.dataset, "sample_rate", 16000)
                print(
                    f"warning: {trunc_count} utterance(s) exceeded the "
                    f"largest bucket ({cap_bucket} frames ≈ "
                    f"{max_wav / sr:.1f}s) this epoch and were truncated "
                    f"for training (raise data.bucketing.frame_buckets to "
                    f"keep full length)"
                )


def get_data_loader(
    dataset: VoiceBankDataset,
    batch_size: int = 16,
    shuffle: bool = True,
    num_workers: int = 4,
    **kw,
) -> DataLoader:
    """Factory mirroring the reference helper (data/dataset.py:350-380)."""
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        num_workers=num_workers,
        **kw,
    )
