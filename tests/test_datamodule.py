"""End-to-end data pipeline tests on a synthetic on-disk dataset laid out
exactly like the reference expects ({split}_video_seg12s/{folder}/clip.npy +
{split}_text_seg12s/{folder}/clip.txt with sibling .wav,
reference: av_dataset.py:110-138)."""

import os
import wave as wave_mod

import numpy as np
import pytest

from mocov2_whisper_flamingo_tpu.config import get_config
from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import AVDataset, DataProcessor
from mocov2_whisper_flamingo_tpu.datamodule.data_module import DataModule, collate_fn
from mocov2_whisper_flamingo_tpu.datamodule.samplers import (
    ByFrameCountSampler, RandomSamplerWrapper, ShardedSampler)
from mocov2_whisper_flamingo_tpu.datamodule.transforms import (
    AudioTransform, VideoTransform, spec_augment, add_noise_snr, bilinear_resize)
from mocov2_whisper_flamingo_tpu.utils.tokenizer import ByteTokenizer


def _write_wav(path, seconds=1.0, sr=16000, freq=440.0):
    t = np.arange(int(seconds * sr)) / sr
    x = 0.4 * np.sin(2 * np.pi * freq * t)
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("<i2").tobytes())


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("avsr_data")
    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        vdir = root / split / f"{split}_video_seg12s" / "spk1"
        tdir = root / split / f"{split}_text_seg12s" / "spk1"
        vdir.mkdir(parents=True)
        tdir.mkdir(parents=True)
        n = 6 if split == "train" else 2
        for i in range(n):
            frames = rng.integers(0, 255, size=(8 + 4 * i, 64, 64, 3), dtype=np.uint8)
            np.save(vdir / f"clip{i}.npy", frames)
            _write_wav(vdir / f"clip{i}.wav", seconds=0.5 + 0.25 * i)
            (tdir / f"clip{i}.txt").write_text(f"xin chao viet nam {i}")
    return str(root)


def _config(dataset_root):
    return get_config({
        "data.root_dir": dataset_root,
        "data.batch_size": 2,
        "data.max_frames": 24,
        "data.max_frames_val": 24,
        "data.num_workers": 2,
    })


def test_dataset_walk_and_getitem(dataset_root):
    ds = AVDataset(dataset_root, "train", "audiovisual",
                   AudioTransform("train"), VideoTransform("train"),
                   max_frames=24, tokenizer=ByteTokenizer(), frame_size=64)
    assert len(ds) == 6
    item = ds[0]
    assert item["audio"].shape == (3000, 80)
    assert item["video"].shape[0] == 24 and item["video"].shape[1] == 3
    assert item["video"].shape[2] == 64  # train path resizes to 64
    assert item["audio_mask"].sum() > 0
    assert item["target_text"].startswith("xin chao")
    assert item["target_lengths"] > 0
    assert 0 < item["audio_lengths"] <= 400
    assert np.isfinite(item["audio"]).all()


def test_dataset_empty_sample_on_error(dataset_root):
    ds = AVDataset(dataset_root, "train", "audiovisual",
                   AudioTransform("train"), VideoTransform("train"),
                   max_frames=24, tokenizer=ByteTokenizer(), frame_size=64)
    ds.samples[1]["video_path"] = "/nonexistent/clip.npy"
    item = ds[1]  # must not raise (reference: av_dataset.py:236-238)
    assert item["video_lengths"] == 0
    assert item["target_text"] == ""
    assert item["video"].shape == (24, 3, 64, 64)


def test_by_frame_count_sampler_buckets(dataset_root):
    ds = AVDataset(dataset_root, "train", "audiovisual",
                   AudioTransform("train"), VideoTransform("train"),
                   max_frames=24, tokenizer=ByteTokenizer())
    sampler = ByFrameCountSampler(ds, max_frames_per_gpu=48, shuffle=True, max_frames=24)
    batches = list(sampler)
    flat = np.concatenate(batches)
    assert sorted(flat) == list(range(len(ds)))
    for b in batches:
        if len(b) > 1:
            assert len(b) * max(sampler.sizes[i] for i in b) <= 48
    # epoch changes composition order deterministically
    sampler.set_epoch(1)
    batches2 = list(sampler)
    assert len(batches2) >= 1


def test_quantized_batch_sampler_sizes():
    from mocov2_whisper_flamingo_tpu.datamodule.samplers import QuantizedBatchSampler

    class FakeSampler(list):
        def set_epoch(self, e):
            pass

    base = FakeSampler([np.arange(7), np.arange(7, 12), np.arange(12, 16)])
    q = QuantizedBatchSampler(base, max_batch_size=4)
    pieces = list(q)
    # every piece size is a power of two <= 4; no sample dropped or reordered
    assert all(len(p) in (1, 2, 4) for p in pieces)
    assert [int(x) for p in pieces for x in p] == list(range(16))
    assert len(q) == len(pieces)


def test_collate_target_len_buckets():
    items = [
        {"target_ids": np.arange(1, 6, dtype=np.int32), "target_text": "a",
         "target_lengths": np.int32(5), "audio": np.zeros((4, 2)),
         "audio_mask": np.ones(4, bool), "audio_lengths": np.int32(4),
         "video": np.zeros((2, 3, 4, 4)), "video_mask": np.ones(2, bool),
         "video_lengths": np.int32(2)}
        for _ in range(2)
    ]
    out = collate_fn(items, target_len_buckets=(8, 16))
    assert out["target_ids"].shape == (2, 8)  # rounded up to the 8 bucket
    assert (out["target_ids"][:, 5:] == 0).all()  # quirk Q3 pad value kept
    with pytest.raises(ValueError):
        collate_fn(items, target_len_buckets=(2, 4))


def test_sharded_sampler_covers_all():
    class FakeSampler(list):
        def set_epoch(self, e):
            pass

    base = FakeSampler([np.array([i]) for i in range(5)])
    shards = [list(ShardedSampler(base, 2, r, shuffle=False)) for r in range(2)]
    assert len(shards[0]) == len(shards[1]) == 3  # padded to even
    seen = {int(b[0]) for shard in shards for b in shard}
    assert seen == {0, 1, 2, 3, 4}


def test_datamodule_end_to_end(dataset_root):
    dm = DataModule(_config(dataset_root))
    dm.setup()
    loader = dm.train_dataloader()
    assert len(loader) >= 1
    batch = next(iter(loader))
    b = batch["audio"].shape[0]
    assert batch["audio"].shape == (b, 3000, 80)
    assert batch["video"].shape[1] == 24
    assert batch["target_ids"].shape[0] == b
    assert len(batch["target_text"]) == b
    # collate pads targets with 0 (quirk Q3, data_module.py:134-137)
    lengths = batch["target_lengths"]
    for j in range(b):
        assert (batch["target_ids"][j, lengths[j]:] == 0).all()

    val_batch = next(iter(dm.val_dataloader()))
    assert val_batch["audio"].shape[1:] == (3000, 80)
    test_batch = next(iter(dm.test_dataloader()))
    assert test_batch["video"] is not None


def test_spec_augment_masks(rng):
    mel = np.ones((240, 80), np.float32)
    out = spec_augment(mel, np.random.default_rng(0))
    # exactly-48-bin freq masks and len//8 time masks zero entire rows/cols
    assert (out == 0).any()
    zero_cols = (out == 0).all(axis=0).sum()
    assert zero_cols >= 40  # at least one 48-bin mask (may overlap)
    zero_rows = (out == 0).all(axis=1).sum()
    assert 30 <= zero_rows <= 60  # 2 masks of 240//8=30, overlap possible


def test_add_noise_snr_math(rng):
    sig = rng.standard_normal((4, 1000)).astype(np.float32)
    noise = rng.standard_normal(1000).astype(np.float32)
    out = add_noise_snr(sig, noise, 0.0)
    # at 0 dB the added noise power per row matches the signal power
    added = out - sig
    ratio = (sig ** 2).sum(-1) / (added ** 2).sum(-1)
    np.testing.assert_allclose(ratio, 1.0, rtol=1e-3)
    # snr=inf-ish leaves the signal untouched
    out_inf = add_noise_snr(sig, noise, 999999)
    np.testing.assert_allclose(out_inf, sig, atol=1e-5)


def test_bilinear_resize_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 3, 48, 40)).astype(np.float32)
    ours = bilinear_resize(x, 64)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(64, 64), mode="bilinear", align_corners=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_process_audio_whisper_parity(rng):
    """DataProcessor.process_audio_whisper must match the HF feature
    extractor (reference: av_dataset.py:33-55)."""
    from transformers import WhisperFeatureExtractor

    wave_data = rng.standard_normal(24000).astype(np.float32) * 0.3
    proc = DataProcessor()
    ours = proc.process_audio_whisper(wave_data)

    fe = WhisperFeatureExtractor(feature_size=80, sampling_rate=16000)
    peak = np.abs(wave_data).max()
    ref = fe(wave_data / peak, sampling_rate=16000, return_tensors="np",
             padding="max_length").input_features[0]
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_video_transform_val_skips_resize(rng):
    """Reference quirk: val/test path normalizes without resizing
    (transforms.py:93-95)."""
    vt = VideoTransform("val")
    x = rng.integers(0, 255, size=(4, 3, 96, 96)).astype(np.uint8)
    out = vt(x)
    assert out.shape == (4, 3, 96, 96)
    vt_train = VideoTransform("train")
    out_train = vt_train(x, rng=np.random.default_rng(0))
    assert out_train.shape == (4, 3, 64, 64)


def test_quantized_batch_sampler_min_size():
    """min_size (the per-host device share in multi-host SPMD) bounds piece
    sizes from below: remainders are wrap-padded up to it so every piece
    divides over the local devices."""
    from mocov2_whisper_flamingo_tpu.datamodule.samplers import QuantizedBatchSampler

    class FakeSampler(list):
        def set_epoch(self, e):
            pass

    base = FakeSampler([np.arange(11), np.arange(11, 14), np.arange(14, 15)])
    q = QuantizedBatchSampler(base, max_batch_size=8, min_size=4)
    pieces = list(q)
    assert all(len(p) % 4 == 0 for p in pieces)
    assert all(len(p) in (4, 8) for p in pieces)
    # every original sample still present (padding duplicates, never drops)
    seen = {int(x) for p in pieces for x in p}
    assert seen == set(range(15))
    assert len(q) == len(pieces)


def test_quantized_batch_sampler_no_pad_remainder():
    """pad_remainder=False (single-host eval): the short tail passes
    through unpadded — no duplicated samples to inflate eval counts/WER
    weighting; exact multiset of inputs preserved."""
    from mocov2_whisper_flamingo_tpu.datamodule.samplers import QuantizedBatchSampler

    class FakeSampler(list):
        def set_epoch(self, e):
            pass

    base = FakeSampler([np.arange(11), np.arange(11, 14), np.arange(14, 15)])
    q = QuantizedBatchSampler(base, max_batch_size=8, min_size=4,
                              pad_remainder=False)
    pieces = list(q)
    # exact partition: no sample dropped, none duplicated, order kept
    assert [int(x) for p in pieces for x in p] == list(range(15))
    # full-size pieces still quantized; only tails may be short
    assert all(len(p) in (4, 8) or len(p) < 4 for p in pieces)
    assert len(q) == len(pieces)


def test_sharded_sampler_size_aligned_across_ranks():
    """At every step, all ranks hold a batch of the SAME size (multi-host
    global-shape agreement — round-2 advisor finding), shuffle included,
    and every batch is still assigned to some rank."""
    class FakeSampler(list):
        def set_epoch(self, e):
            pass

    # mixed sizes, counts not divisible by the 3 ranks
    batches = ([np.arange(i * 8, i * 8 + 8) for i in range(4)]
               + [np.arange(100 + i * 4, 100 + i * 4 + 4) for i in range(5)]
               + [np.arange(200 + i * 2, 200 + i * 2 + 2) for i in range(2)])
    base = FakeSampler(batches)
    for shuffle in (False, True):
        shards = [list(ShardedSampler(base, 3, r, shuffle=shuffle, seed=5))
                  for r in range(3)]
        assert len({len(s) for s in shards}) == 1
        for step in range(len(shards[0])):
            sizes = {len(shards[r][step]) for r in range(3)}
            assert len(sizes) == 1, f"step {step}: ranks disagree {sizes}"
        seen = {int(b[0]) for s in shards for b in s}
        assert seen >= {int(b[0]) for b in batches}
    # set_epoch changes the order but keeps alignment
    sh = ShardedSampler(base, 3, 0, shuffle=True, seed=5)
    sh.set_epoch(3)
    assert len(list(sh)) == len(shards[0])


def test_by_frame_count_sampler_len_tracks_epoch(dataset_root):
    """__len__ reflects the CURRENT epoch's packing (round-2 finding: a
    length frozen at epoch 0 can disagree with the iterated batch count
    that the trainer derives schedule lengths from)."""
    ds = AVDataset(dataset_root, "train", "audiovisual",
                   AudioTransform("train"), VideoTransform("train"),
                   max_frames=24, tokenizer=ByteTokenizer())
    sampler = ByFrameCountSampler(ds, max_frames_per_gpu=48, shuffle=True,
                                  max_frames=24)
    for epoch in range(4):
        sampler.set_epoch(epoch)
        assert len(sampler) == len(list(sampler))


def test_dataloader_prefetch_matches_sync(dataset_root):
    """The prefetching loader yields exactly the synchronous stream (order
    and content), applies the device_put hook on the producer thread, and
    shuts down cleanly on early break."""
    import threading

    dm = DataModule(_config(dataset_root))
    dm.setup()
    from mocov2_whisper_flamingo_tpu.datamodule.data_module import DataLoader

    def make(prefetch, device_put=None):
        # val split: deterministic transforms, so two passes are comparable
        loader = dm.val_dataloader()
        return DataLoader(loader.dataset, loader.batch_sampler,
                          collate=loader.collate, num_workers=2,
                          prefetch_batches=prefetch, device_put=device_put)

    sync_batches = list(make(0))
    pre_batches = list(make(3))
    assert len(pre_batches) == len(sync_batches) >= 1
    for a, b in zip(pre_batches, sync_batches):
        np.testing.assert_array_equal(a["target_ids"], b["target_ids"])
        np.testing.assert_allclose(a["audio"], b["audio"])

    # device_put hook runs off the consumer thread
    seen_threads = []

    def tag(batch):
        seen_threads.append(threading.current_thread().name)
        batch["tagged"] = True
        return batch

    tagged = list(make(2, device_put=tag))
    assert all(b.get("tagged") for b in tagged)
    assert all(t == "dataloader-prefetch" for t in seen_threads)

    # early break must not hang or leak (join happens in the finally)
    it = iter(make(2))
    next(it)
    it.close()

    # producer exceptions surface on the consumer side
    def boom(batch):
        raise RuntimeError("producer failure")

    with pytest.raises(RuntimeError, match="producer failure"):
        list(make(2, device_put=boom))


def test_dataloader_prefetch_set_epoch(dataset_root):
    """set_epoch before iteration changes the prefetched epoch's batch
    composition the same way it changes the synchronous one."""
    dm = DataModule(_config(dataset_root))
    dm.setup()
    loader = dm.train_dataloader()
    loader.set_epoch(2)
    pre = [b["target_ids"].shape for b in loader]
    loader2 = dm.train_dataloader()
    loader2.prefetch_batches = 0
    loader2.set_epoch(2)
    sync = [b["target_ids"].shape for b in loader2]
    assert pre == sync


def test_mp4_path_via_stub_cli(tmp_path, monkeypatch):
    """The mp4 decode/probe path runs end-to-end against stub ffmpeg/ffprobe
    executables that honor the exact CLI contracts our code issues (the
    image ships no ffmpeg, so this is how CI keeps the path alive: argument
    construction, probe parsing, rawvideo reshape/transpose all execute
    for real)."""
    import stat

    from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import (
        probe_video_frames, read_video)

    t, h, w = 5, 6, 8
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 255, (t, h, w, 3), dtype=np.uint8)

    bindir = tmp_path / "bin"
    bindir.mkdir()
    ffprobe = bindir / "ffprobe"
    ffprobe.write_text(
        "#!/bin/sh\n"
        'case "$*" in\n'
        f'  *nb_read_packets*) echo "{t}";;\n'
        f'  *width,height*) echo "{w},{h}";;\n'
        "esac\n")
    ffmpeg = bindir / "ffmpeg"
    ffmpeg.write_text(
        "#!/bin/sh\n"
        'prev=""\n'
        'for a in "$@"; do\n'
        '  if [ "$prev" = "-i" ]; then path="$a"; fi\n'
        '  prev="$a"\n'
        "done\n"
        'cat "$path.raw"\n')
    for f in (ffprobe, ffmpeg):
        f.chmod(f.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    clip = tmp_path / "clip.mp4"
    clip.write_bytes(b"")  # the stub reads the sidecar, not the container
    (tmp_path / "clip.mp4.raw").write_bytes(raw.tobytes())

    assert probe_video_frames(str(clip), default=-1) == t
    frames = read_video(str(clip))
    assert frames.shape == (t, 3, h, w)
    np.testing.assert_array_equal(frames, raw.transpose(0, 3, 1, 2))


def test_mp4_in_process_cv2(tmp_path):
    """A real encoded mp4 decodes IN-PROCESS via cv2 (no subprocess), matching
    the reference's in-process torchvision/libavcodec path
    (reference: av_dataset.py:58-62). Smooth frames survive lossy encode
    within a loose tolerance; probe gets the count from container metadata."""
    cv2 = pytest.importorskip("cv2")

    t, h, w = 10, 32, 32
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.stack([
        np.stack([(yy * 8 + i * 3) % 256, (xx * 8) % 256,
                  np.full((h, w), 128)], axis=-1)
        for i in range(t)]).astype(np.uint8)
    clip = tmp_path / "clip.mp4"
    writer = cv2.VideoWriter(str(clip), cv2.VideoWriter_fourcc(*"mp4v"),
                             25, (w, h))
    if not writer.isOpened():
        pytest.skip("cv2 build has no mp4 encoder")
    for f in frames:
        writer.write(f[..., ::-1])
    writer.release()

    from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import (
        _read_mp4_video_cv2, probe_video_frames, read_video)

    assert probe_video_frames(str(clip), default=-1) == t
    got = read_video(str(clip))
    assert got.shape == (t, 3, h, w)
    # read_video must have used the in-process decoder (no ffmpeg binary in
    # this image, so equality with the direct cv2 call proves the route).
    np.testing.assert_array_equal(got, _read_mp4_video_cv2(str(clip)))
    err = np.abs(got.transpose(0, 2, 3, 1).astype(int) - frames.astype(int))
    assert err.mean() < 16  # lossy codec, smooth content


@pytest.mark.skipif(__import__("shutil").which("ffmpeg") is None,
                    reason="real ffmpeg not installed")
def test_mp4_path_real_ffmpeg(tmp_path):
    """Where a real ffmpeg exists, round-trip an actual encoded mp4."""
    import subprocess

    t, h, w = 4, 16, 16
    raw = (np.linspace(0, 255, t * h * w * 3) % 255).astype(np.uint8)
    src = tmp_path / "src.raw"
    src.write_bytes(raw.tobytes())
    clip = tmp_path / "clip.mp4"
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "rawvideo", "-pix_fmt", "rgb24",
         "-s", f"{w}x{h}", "-r", "25", "-i", str(src),
         "-pix_fmt", "yuv420p", str(clip)], check=True)

    from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import (
        probe_video_frames, read_video)

    assert probe_video_frames(str(clip), default=-1) == t
    frames = read_video(str(clip))
    assert frames.shape == (t, 3, h, w)


def test_sharded_sampler_tile_pads_small_groups():
    """A size group smaller than its pad must TILE so every rank still gets
    the same batch count (a 1-batch group on 4 replicas previously gave
    ranks 2-3 nothing and desynced multi-host batch counts)."""
    from mocov2_whisper_flamingo_tpu.datamodule.samplers import ShardedSampler

    class OneBatch:
        def __iter__(self):
            return iter([[7, 8]])

        def __len__(self):
            return 1

    shards = [list(ShardedSampler(OneBatch(), 4, r, shuffle=False))
              for r in range(4)]
    assert all(len(s) == 1 for s in shards)
    assert all(s[0] == [7, 8] for s in shards)
    assert all(len(ShardedSampler(OneBatch(), 4, r)) == 1 for r in range(4))
