"""Config system tests: reference section/key parity + override mechanics."""

from mocov2_whisper_flamingo_tpu.config import get_config


def test_reference_sections_present():
    cfg = get_config()
    # Same top-level sections as reference get_config() (config.py:104-146).
    for section in ["data", "model", "training", "augmentation", "whisper", "output", "trainer"]:
        assert section in cfg, section
    # Reference hyperparameters preserved (config.py:7-44).
    assert cfg.model.d_model == 512
    assert cfg.model.n_heads == 8
    assert cfg.model.n_layers == 6
    assert cfg.model.pe_max_len == 3000
    assert cfg.model.fc_hidden_size == 2048
    assert cfg.data.batch_size == 4
    assert cfg.data.max_frames == 400
    assert cfg.training.accumulate_grad_batches == 4
    assert cfg.training.label_smoothing == 0.1
    assert cfg.whisper.freeze_encoder is True


def test_attribute_and_item_access():
    cfg = get_config()
    assert cfg["model"]["d_model"] == cfg.model.d_model
    assert cfg.model.nonexistent_key is None  # DotDict semantics


def test_overrides_string_and_mapping():
    cfg = get_config(["model.d_model=256", "training.max_lr=0.002", "data.modality=audio"])
    assert cfg.model.d_model == 256
    assert cfg.training.max_lr == 0.002
    assert cfg.data.modality == "audio"

    cfg2 = get_config({"mesh.model": 2, "new.nested.key": 7})
    assert cfg2.mesh.model == 2
    assert cfg2.new.nested.key == 7


def test_flatten_and_dotted_get():
    cfg = get_config()
    flat = cfg.flatten()
    assert flat["model.d_model"] == 512
    assert cfg.get_dotted("output.save_top_k") == 3
    assert cfg.get_dotted("no.such.key", 42) == 42


def test_override_bool_word_coercion():
    """CLI-style lowercase true/false/null coerce to real Python values —
    a truthy "false" string would silently ENABLE boolean flags."""
    cfg = get_config(["augmentation.on_device=true",
                      "training.pad_to_ignore=false",
                      "data.updated_tokenizer_dir=null",
                      "whisper.language=vietnamese"])
    assert cfg.augmentation.on_device is True
    assert cfg.training.pad_to_ignore is False
    assert cfg.data.updated_tokenizer_dir is None
    assert cfg.whisper.language == "vietnamese"  # other strings untouched
