"""Dataset semantics tests: filename pairing, deterministic sorted-tail
train/val split (SURVEY.md §7.7), host sharding, buckets, RAM cache
(reference: data/dataset.py:96-147, :350-380)."""

import numpy as np
import pytest

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.dataset import (
    DEFAULT_BUCKETS,
    VoiceBankDataset,
    bucket_for_frames,
    frames_needed,
    pair_files,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.wavio import (
    save_wav,
)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vb")
    rng = np.random.default_rng(0)
    sr = 16000
    # deliberately unsorted creation order; names sort p000..p019
    for i in [3, 0, 7, 1, 9, 2, 8, 4, 6, 5, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19]:
        x = (0.3 * rng.standard_normal(sr)).astype(np.float32)
        save_wav(root / "clean_trainset_28spk_wav" / f"p{i:03d}.wav", x, sr)
        save_wav(root / "noisy_trainset_28spk_wav" / f"p{i:03d}.wav", x, sr)
    # one orphan noisy file with no clean twin
    save_wav(root / "noisy_trainset_28spk_wav" / "orphan.wav",
             np.zeros(sr, np.float32), sr)
    return root


def test_pairing_sorted_and_orphans_skipped(root):
    warns = []
    pairs = pair_files(
        root / "noisy_trainset_28spk_wav",
        root / "clean_trainset_28spk_wav",
        warn=warns.append,
    )
    names = [n.name for n, _ in pairs]
    assert names == sorted(names) and len(names) == 20
    assert "orphan.wav" not in names
    assert warns and "orphan" in warns[0]


def test_sorted_tail_split_deterministic(root):
    """val = last 10% of the sorted list — independent of seeds (§7.7)."""
    cfg = {"data": {"train_val_split": 0.9}}
    train = VoiceBankDataset(root, "train", cfg)
    val = VoiceBankDataset(root, "val", cfg)
    assert len(train) == 18 and len(val) == 2
    val_names = [n.name for n, _ in val.file_pairs]
    assert val_names == ["p018.wav", "p019.wav"]  # sorted tail
    # no overlap, full cover
    train_names = {n.name for n, _ in train.file_pairs}
    assert train_names.isdisjoint(val_names)


def test_host_sharding_partitions(root):
    ds = VoiceBankDataset(root, "train", {"data": {"train_val_split": 1.0}})
    shards = [ds.shard(h, 4) for h in range(4)]
    seen = [n.name for s in shards for n, _ in s.file_pairs]
    assert sorted(seen) == sorted(n.name for n, _ in ds.file_pairs)
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1  # balanced


def test_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        VoiceBankDataset(tmp_path, "train", {})
    with pytest.raises(ValueError):
        VoiceBankDataset(tmp_path, "nope", {})


def test_bucket_helpers():
    assert frames_needed(16000, 128) == 16000 // 128 + 1
    for f in (10, 64, 65, 500):
        b = bucket_for_frames(f, DEFAULT_BUCKETS)
        assert b in DEFAULT_BUCKETS
        assert b >= min(f, max(DEFAULT_BUCKETS))
    # beyond the largest bucket: capped at the largest
    assert bucket_for_frames(10**6, DEFAULT_BUCKETS) == max(DEFAULT_BUCKETS)


def test_ram_cache_hits(root):
    ds = VoiceBankDataset(
        root, "train", {"data": {"train_val_split": 1.0}}, cache_audio=True
    )
    a1, _ = ds.load_pair(0)
    a2, _ = ds.load_pair(0)
    assert a1 is a2  # second read served from cache
    ds2 = VoiceBankDataset(
        root, "train", {"data": {"train_val_split": 1.0}}, cache_audio=False
    )
    b1, _ = ds2.load_pair(0)
    b2, _ = ds2.load_pair(0)
    assert b1 is not b2
    np.testing.assert_array_equal(b1, np.asarray(a1))
