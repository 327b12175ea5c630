"""Utility coverage: tfevents CRC framing, WER edge cases, tokenizer
round-trips, profiling helpers."""

import numpy as np

from mocov2_whisper_flamingo_tpu.utils.tb_writer import crc32c, _masked_crc
from mocov2_whisper_flamingo_tpu.utils.tokenizer import ByteTokenizer, load_tokenizer
from mocov2_whisper_flamingo_tpu.utils.wer import wer


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283
    # masking is invertible-ish sanity: deterministic and != raw
    assert _masked_crc(b"abc") != crc32c(b"abc")


def test_wer_edges():
    assert wer("a b c", "a b c") == 0.0
    assert wer("a b c", "a x c") == 1 / 3
    assert wer(["a b", "c d"], ["a b", "c x"]) == 0.25
    assert wer("", "") == 0.0
    assert wer("", "word") == 1.0  # insertion against empty reference


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    text = "xin chào Việt Nam 123"
    ids = tok.encode(text)
    assert ids[: len(tok.prefix_token_ids)] == tok.prefix_token_ids
    assert ids[-1] == tok.eos_token_id
    assert tok.decode(ids) == text
    assert tok.batch_decode([ids, tok.encode("ok")]) == [text, "ok"]


def test_load_tokenizer_fallback_and_fail_loud(tmp_path):
    import pytest

    # None -> ByteTokenizer fallback (no-assets environments)
    tok = load_tokenizer(None)
    assert isinstance(tok, ByteTokenizer)
    # an EXPLICIT but nonexistent dir must raise, not silently degrade
    with pytest.raises(FileNotFoundError):
        load_tokenizer(str(tmp_path / "missing"))
    # an explicit dir with corrupt assets must raise too
    bad = tmp_path / "corrupt"
    bad.mkdir()
    (bad / "vocab.json").write_text("{not json")
    with pytest.raises(RuntimeError):
        load_tokenizer(str(bad))


def test_profiling_helpers():
    from mocov2_whisper_flamingo_tpu.utils.profiling import StepTimer, device_memory_report

    t = StepTimer()
    with t:
        sum(range(1000))
    assert t.seconds > 0
    report = device_memory_report()
    assert len(report) >= 1
    for stats in report.values():
        assert "bytes_in_use" in stats
