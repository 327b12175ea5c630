"""On-device train augmentation mode (``augmentation.on_device``).

The host loader emits raw mel / raw resized frames and the stochastic
augmentation chain runs batched inside the jitted train step — the fix for
single-core hosts whose per-sample numpy pipeline (~1.1 s/batch measured)
cannot feed an ~88 ms device step (BASELINE.md sustained-training entry).
Covers: length-aware SpecAugment/time-mask semantics (masks stay in the
real region of pre-padded tensors), deterministic-path parity with the
host transforms, the raw-mode dataset/datamodule contract, and the
Trainer wiring end to end.
"""

import wave as wave_mod

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.config import get_config
from mocov2_whisper_flamingo_tpu.ops import augment
from mocov2_whisper_flamingo_tpu.ops.video import train_video_pipeline

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# -- length-aware ops ---------------------------------------------------------


def test_spec_augment_lengths_keeps_masks_in_real_region():
    mel = jnp.ones((1, 3000, 80))
    out = np.asarray(augment.spec_augment(
        mel, jax.random.PRNGKey(0), lengths=jnp.asarray([1200])))[0]
    full_zero_rows = (out == 0).all(axis=1).nonzero()[0]
    # time masks (fully-zero rows) stay below the real length; width is
    # the host/reference 1200//8 per mask, two masks
    assert full_zero_rows.size > 0
    assert full_zero_rows.max() < 1200
    assert 150 <= full_zero_rows.size <= 300


def test_spec_augment_zero_length_sample_unmasked_in_time():
    mel = jnp.ones((2, 100, 80))
    out = np.asarray(augment.spec_augment(
        mel, jax.random.PRNGKey(1), freq_mask_param=200,  # F=80 < param: off
        lengths=jnp.asarray([100, 0])))
    assert (out[1] == 1).all()  # zero-length sample untouched
    assert (out[0] == 0).any()


def test_adaptive_time_mask_lengths_per_sample():
    video = jnp.ones((2, 100, 3, 4, 4))
    out = np.asarray(augment.adaptive_time_mask(
        video, jax.random.PRNGKey(2), window=10, stride=25,
        lengths=jnp.asarray([100, 10])))
    zero0 = (out[0] == 0).all(axis=(1, 2, 3)).nonzero()[0]
    zero1 = (out[1] == 0).all(axis=(1, 2, 3)).nonzero()[0]
    assert zero0.size > 0
    if zero1.size:  # sample 1 masks must stay inside its 10 real frames
        assert zero1.max() < 10
    # per-sample masks differ (shared-mask fallback would match exactly)
    assert not np.array_equal(out[0], out[1])


def test_train_video_pipeline_deterministic_parity_and_pad_zeroing():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 12, 3, 8, 8)).astype(np.float32)
    lengths = jnp.asarray([12, 5])
    out = np.asarray(train_video_pipeline(
        jnp.asarray(frames), jax.random.PRNGKey(0), resize=None,
        flip_prob=0.0, jitter=None, grayscale_prob=0.0,
        time_mask_window=1,  # widths in [0,1) == 0: no masking
        lengths=lengths))
    expected = ((frames / 255.0 - IMAGENET_MEAN[:, None, None])
                / IMAGENET_STD[:, None, None])
    np.testing.assert_allclose(out[0], expected[0], atol=1e-5)
    np.testing.assert_allclose(out[1, :5], expected[1, :5], atol=1e-5)
    assert (out[1, 5:] == 0).all()  # pad frames exact zeros (host pads
    # after normalize, so its pad rows are exact zeros too)


def test_train_audio_pipeline_deterministic_matches_host_ln():
    from mocov2_whisper_flamingo_tpu.datamodule.transforms import global_layer_norm_np

    rng = np.random.default_rng(1)
    mel_tf = np.zeros((3000, 80), np.float32)  # pre-padded raw mel
    mel_tf[:1200] = rng.standard_normal((1200, 80)).astype(np.float32) ** 2
    out = np.asarray(augment.train_audio_pipeline(
        jnp.asarray(mel_tf.T)[None], jax.random.PRNGKey(0),
        lengths=jnp.asarray([1200]),
        spec_augment_kwargs=dict(n_freq_masks=0, n_time_masks=0)))[0]
    np.testing.assert_allclose(out, global_layer_norm_np(mel_tf),
                               atol=1e-4, rtol=1e-4)


# -- make_batch_augment -------------------------------------------------------


def test_make_batch_augment_jits_and_normalizes():
    cfg = get_config({"augmentation.on_device": True})
    fn = jax.jit(augment.make_batch_augment(cfg))
    rng = np.random.default_rng(2)
    mask = np.zeros((2, 3000), bool)
    mask[0, :900] = True
    mask[1, :1500] = True
    batch = {
        "audio": jnp.asarray(np.abs(rng.standard_normal((2, 3000, 80))
                                    ).astype(np.float32) * mask[..., None]),
        "audio_mask": jnp.asarray(mask),
        "video": jnp.asarray(rng.integers(0, 255, (2, 6, 3, 8, 8))
                             .astype(np.float32)),
        "video_lengths": jnp.asarray([6, 3]),
        "target_ids": jnp.zeros((2, 4), jnp.int32),
    }
    out = fn(batch, jax.random.PRNGKey(0))
    audio = np.asarray(out["audio"])
    video = np.asarray(out["video"])
    assert audio.shape == (2, 3000, 80) and np.isfinite(audio).all()
    # globally layer-normed per example
    assert abs(audio[0].mean()) < 1e-3 and abs(audio[0].std() - 1) < 1e-2
    assert np.isfinite(video).all()
    assert (video[1, 3:] == 0).all()  # pad frames re-zeroed
    assert (np.abs(video) < 20).all()  # normalized scale, not 0-255
    # untouched keys pass through unchanged
    np.testing.assert_array_equal(np.asarray(out["target_ids"]),
                                  np.asarray(batch["target_ids"]))


def test_make_batch_augment_audio_only():
    cfg = get_config({"augmentation.on_device": True})
    fn = augment.make_batch_augment(cfg)
    batch = {"audio": jnp.ones((1, 3000, 80)), "audio_mask": None,
             "video": None, "video_lengths": None}
    out = fn(batch, jax.random.PRNGKey(0))
    assert out["video"] is None
    assert np.isfinite(np.asarray(out["audio"])).all()


# -- on-device mel (waveform shipping) ----------------------------------------


def test_pack_waveform_device_mel_matches_host_stft():
    """The packed buffer's reflect tail makes the device matmul-DFT mel
    reproduce the host's unpadded centered-reflect STFT over the real
    frames (the frames past t_real are masked by the batched augment)."""
    from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import pack_waveform
    from mocov2_whisper_flamingo_tpu.datamodule.transforms import np_reference_mel
    from mocov2_whisper_flamingo_tpu.ops.mel import reference_mel

    from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import PACKED_WAVE_LEN

    rng = np.random.default_rng(3)
    # 479,900 samples exercises the near-30 s corner: the reflect tail only
    # fits because the buffer carries an extra n_fft//2 continuation slot.
    for n in (50_000, 479_900):
        wave = (rng.standard_normal(n) * 0.3).astype(np.float32)
        host = np_reference_mel(wave).T[:3000]  # [T_real, 80]
        buf, t_real = pack_waveform(wave)
        assert buf.shape == (PACKED_WAVE_LEN,)
        assert t_real == min(1 + n // 160, 3000) == host.shape[0]
        dev = np.asarray(reference_mel(jnp.asarray(buf)[None])[0]).T  # [T, 80]
        np.testing.assert_allclose(dev[:t_real], host, rtol=5e-4, atol=1e-2)


def test_pack_waveform_trims_long_audio():
    from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import (
        PACKED_WAVE_LEN, pack_waveform)

    wave = np.ones(500_000, np.float32)
    buf, t_real = pack_waveform(wave)
    assert buf.shape == (PACKED_WAVE_LEN,) and t_real == 3000
    assert (buf == 1).all()  # no tail written: the buffer is all real signal


def test_empty_sample_keys_follow_modality(tmp_path):
    """A failed sample in an audio-only (or video-only) run must emit only
    the keys real samples carry, or collate's key probe breaks the batch."""
    from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import AVDataset
    from mocov2_whisper_flamingo_tpu.datamodule.transforms import (
        AudioTransform, VideoTransform)

    for modality, keys in (("audio", {"audio", "audio_mask", "audio_lengths"}),
                           ("video", {"video", "video_mask", "video_lengths"})):
        ds = AVDataset(str(tmp_path), "train", modality,
                       AudioTransform("train", on_device=True,
                                      on_device_mel=True),
                       VideoTransform("train", on_device=True))
        empty = ds._get_empty_sample()
        assert keys | {"target_ids", "target_text", "target_lengths"} == set(empty)
    # waveform-mode empty audio matches the packed shape
    from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import PACKED_WAVE_LEN
    assert empty.get("audio") is None
    ds_a = AVDataset(str(tmp_path), "train", "audio",
                     AudioTransform("train", on_device=True, on_device_mel=True),
                     VideoTransform("train", on_device=True))
    assert ds_a._get_empty_sample()["audio"].shape == (PACKED_WAVE_LEN,)


def test_datamodule_rejects_on_device_mel_without_on_device(raw_root):
    from mocov2_whisper_flamingo_tpu.datamodule.data_module import DataModule

    cfg = get_config({"data.root_dir": raw_root,
                      "augmentation.on_device_mel": True})
    dm = DataModule(cfg)
    with pytest.raises(ValueError, match="on_device_mel"):
        dm.setup("fit")


def test_make_batch_augment_waveform_mode_matches_mel_mode():
    """Same key -> the waveform branch (mel on the MXU) and the mel branch
    (host-computed raw mel) produce the same augmented features."""
    from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import pack_waveform
    from mocov2_whisper_flamingo_tpu.datamodule.transforms import np_reference_mel

    rng = np.random.default_rng(4)
    waves = [(rng.standard_normal(n) * 0.2).astype(np.float32)
             for n in (40_000, 64_000)]
    packed = [pack_waveform(w) for w in waves]
    mask = np.zeros((2, 3000), bool)
    for i, (_, t_real) in enumerate(packed):
        mask[i, :t_real] = True

    cfg_wf = get_config({"augmentation.on_device": True,
                         "augmentation.on_device_mel": True})
    fn_wf = jax.jit(augment.make_batch_augment(cfg_wf))
    wf_batch = {"audio": jnp.asarray(np.stack([b for b, _ in packed])),
                "audio_mask": jnp.asarray(mask),
                "video": None, "video_lengths": None}
    out_wf = np.asarray(fn_wf(wf_batch, jax.random.PRNGKey(7))["audio"])

    mels = np.zeros((2, 3000, 80), np.float32)
    for i, w in enumerate(waves):
        m = np_reference_mel(w).T[:3000]
        mels[i, : m.shape[0]] = m
    fn_mel = jax.jit(augment.make_batch_augment(
        get_config({"augmentation.on_device": True})))
    mel_batch = {"audio": jnp.asarray(mels), "audio_mask": jnp.asarray(mask),
                 "video": None, "video_lengths": None}
    out_mel = np.asarray(fn_mel(mel_batch, jax.random.PRNGKey(7))["audio"])

    assert np.isfinite(out_wf).all()
    np.testing.assert_allclose(out_wf, out_mel, rtol=1e-3, atol=1e-3)


# -- raw-mode dataset / datamodule contract -----------------------------------


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("avsr_raw")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        vdir = root / split / f"{split}_video_seg12s" / "spk"
        tdir = root / split / f"{split}_text_seg12s" / "spk"
        vdir.mkdir(parents=True)
        tdir.mkdir(parents=True)
        for i in range(4):
            frames = rng.integers(0, 255, (10 + 2 * i, 32, 32, 3), dtype=np.uint8)
            np.save(vdir / f"c{i}.npy", frames)
            t = np.arange(int((0.4 + 0.2 * i) * 16000)) / 16000
            x = 0.4 * np.sin(2 * np.pi * 300 * t)
            with wave_mod.open(str(vdir / f"c{i}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((x * 32767).astype("<i2").tobytes())
            (tdir / f"c{i}.txt").write_text(f"xin chao {i}")
    return str(root)


def test_datamodule_on_device_mode_emits_raw_batches(raw_root):
    from mocov2_whisper_flamingo_tpu.datamodule.data_module import DataModule

    cfg = get_config({
        "data.root_dir": raw_root,
        "data.batch_size": 2,
        "data.max_frames": 16,
        "data.max_frames_val": 16,
        "data.num_workers": 0,
        "augmentation.on_device": True,
        "augmentation.video.train.resize": 24,
    })
    dm = DataModule(cfg)
    dm.setup("fit")
    train_batch = next(iter(dm.train_dataloader()))
    # audio: RAW power mel (no layer-norm: non-negative, std far from 1),
    # mask carries the REAL frame count (not all-True)
    assert train_batch["audio"].min() >= 0
    assert not train_batch["audio_mask"].all()
    real = train_batch["audio_mask"].sum(axis=1)
    assert (real > 0).all() and (real < 3000).all()
    # audio_lengths derive from the real mel length (len/7.5 capped 400)
    np.testing.assert_array_equal(
        train_batch["audio_lengths"],
        np.minimum((real / 7.5).astype(int), 400))
    # video: raw 0-255 uint8 (quarter the host->device transfer of f32),
    # host-resized to the configured size
    assert train_batch["video"].shape[-1] == 24
    assert train_batch["video"].dtype == np.uint8
    assert train_batch["video"].max() > 10
    # val stays fully host-processed (normalized f32, no resize in val path)
    val_batch = next(iter(dm.val_dataloader()))
    assert val_batch["video"].shape[-1] == 32
    assert val_batch["video"].dtype == np.float32
    assert val_batch["video"].min() < -0.5  # ImageNet-normalized


def test_datamodule_on_device_mel_mode_ships_waveform(raw_root):
    from mocov2_whisper_flamingo_tpu.datamodule.data_module import DataModule

    cfg = get_config({
        "data.root_dir": raw_root,
        "data.batch_size": 2,
        "data.max_frames": 16,
        "data.max_frames_val": 16,
        "data.num_workers": 0,
        "augmentation.on_device": True,
        "augmentation.on_device_mel": True,
        "augmentation.video.train.resize": 24,
    })
    dm = DataModule(cfg)
    dm.setup("fit")
    from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import PACKED_WAVE_LEN

    batch = next(iter(dm.train_dataloader()))
    b = batch["audio"].shape[0]
    # train audio is the packed raw waveform; mel runs on-device
    assert batch["audio"].shape[1:] == (PACKED_WAVE_LEN,)
    assert batch["audio"].dtype == np.float32
    real = batch["audio_mask"].sum(axis=1)
    assert (real > 0).all() and (real < 3000).all()
    np.testing.assert_array_equal(
        batch["audio_lengths"], np.minimum((real / 7.5).astype(int), 400))
    assert b >= 2  # quantized to the virtual-device count
    # the augment turns it into the model's [B, 3000, 80] features
    fn = jax.jit(augment.make_batch_augment(cfg))
    out = np.asarray(fn({"audio": jnp.asarray(batch["audio"]),
                         "audio_mask": jnp.asarray(batch["audio_mask"]),
                         "video": None, "video_lengths": None},
                        jax.random.PRNGKey(0))["audio"])
    assert out.shape == (b, 3000, 80) and np.isfinite(out).all()
    # val path is unaffected (host-processed mel)
    val_batch = next(iter(dm.val_dataloader()))
    assert val_batch["audio"].shape[1:] == (3000, 80)


@pytest.mark.parametrize("on_device_mel", [False, True])
def test_trainer_on_device_augment_end_to_end(raw_root, tmp_path, on_device_mel):
    """Full wiring: DataModule raw mode -> Trainer builds augment_fn ->
    jitted train step augments + updates, finite losses. With
    ``on_device_mel`` the loader ships the packed waveform and the step
    computes the mel on-device."""
    from mocov2_whisper_flamingo_tpu.datamodule.data_module import DataModule
    from mocov2_whisper_flamingo_tpu.models.av_net import AVNet
    from mocov2_whisper_flamingo_tpu.models.whisper import (
        WhisperConfig, WhisperEncoder)
    from mocov2_whisper_flamingo_tpu.training.trainer import Trainer
    from test_training import _StubFrontend

    cfg = get_config({
        "data.root_dir": raw_root,
        "data.batch_size": 2,
        "data.max_frames": 16,
        "data.max_frames_val": 16,
        "data.num_workers": 0,
        "data.prefetch_batches": 0,
        "training.epochs": 1,
        "training.accumulate_grad_batches": 1,
        "output.checkpoint_dir": str(tmp_path / "ckpt"),
        "output.log_dir": str(tmp_path / "logs"),
        "output.log_every_n_steps": 1,
        "augmentation.on_device": True,
        "augmentation.on_device_mel": on_device_mel,
        "augmentation.video.train.resize": 24,
    })
    dm = DataModule(cfg)
    dm.setup("fit")
    # tiny AVNet able to take the full [B, 3000, 80] raw-mode mel
    # (encoder PE table sized for the 1500 post-conv positions)
    tiny = WhisperConfig(
        n_mels=80, d_model=32, encoder_layers=1, decoder_layers=1,
        n_heads=4, d_ff=64, vocab_size=dm.vocab_size,
        max_source_positions=1500, max_target_positions=32)
    net = AVNet("audiovisual", None, 96, (32, 4, 2, 3000, 128, 0.0),
                dm.vocab_size)
    net.whisper_config = tiny
    net.whisper_encoder = WhisperEncoder(tiny, net.precision, net.backend)
    net.visual_frontend = _StubFrontend()
    trainer = Trainer(cfg, net, tokenizer=dm.tokenizer)
    assert trainer.task.augment_fn is not None
    params = net.init(jax.random.PRNGKey(0))
    trainer.fit(dm, params, max_steps=2)
    assert trainer.global_step == 2
