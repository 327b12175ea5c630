"""Serving subsystem tests: micro-batcher policy, pad/trim helpers, engine
correctness vs direct single-request decodes (row independence of the
padded batch), compile-set boundedness, warmup, and the HTTP front-end.

The reference has no serving surface; this covers the new capability
(serving/batcher.py, serving/engine.py, serving/server.py)."""

import http.client
import json
import threading
import time

import jax
import numpy as np
import pytest

from mocov2_whisper_flamingo_tpu.models.asr import WhisperASR
from mocov2_whisper_flamingo_tpu.models.whisper import WhisperConfig
from mocov2_whisper_flamingo_tpu.serving import (
    MicroBatcher, Plan, TranscriptionServer, canonical_wav, make_audio_engine,
    pad_rows, quantize_bucket, trim_at_eos)

CFG = WhisperConfig(
    n_mels=80, d_model=48, encoder_layers=1, decoder_layers=1, n_heads=4,
    d_ff=96, vocab_size=64, max_source_positions=16, max_target_positions=32,
)
PREFIX = [1, 2]
EOS = 3
# 32 mel frames = 2 * max_source_positions -> 32 * 160 samples of 16 kHz
SECONDS = 32 * 160 / 16_000
MAX_LEN = 10
BEAM = 2


# -- policy ------------------------------------------------------------------------


def test_quantize_bucket():
    assert quantize_bucket(1, (1, 2, 4)) == 1
    assert quantize_bucket(3, (1, 2, 4)) == 4
    assert quantize_bucket(9, (1, 2, 4)) == 4  # overflow -> max bucket
    with pytest.raises(ValueError):
        quantize_bucket(0, (1, 2, 4))


def test_plan_empty_queue():
    assert MicroBatcher((1, 2, 4), 0.01).plan([], now=1.0) is None


def test_plan_full_bucket_fires_immediately():
    mb = MicroBatcher((1, 2, 4), max_wait_s=10.0)
    assert mb.plan([1.0] * 4, now=1.0) == Plan(4, 4)
    assert mb.plan([1.0] * 9, now=1.0) == Plan(4, 4)  # takes one full bucket


def test_plan_deadline():
    mb = MicroBatcher((1, 2, 4), max_wait_s=0.05)
    assert mb.plan([1.00, 1.01], now=1.01) is None  # still inside the window
    assert mb.plan([1.00, 1.01], now=1.06) == Plan(2, 2)
    assert mb.plan([1.00] * 3, now=1.06) == Plan(3, 4)  # pad 3 -> bucket 4
    assert mb.next_deadline([1.00, 1.01]) == pytest.approx(1.05)
    assert mb.next_deadline([]) is None


def test_bad_ladder_rejected():
    with pytest.raises(ValueError):
        MicroBatcher((), 0.01)
    with pytest.raises(ValueError):
        MicroBatcher((0, 2), 0.01)


# -- helpers -----------------------------------------------------------------------


def test_pad_rows_stacks_and_pads():
    rows = [(np.ones(3, np.float32), np.int32(2)),
            (np.full(3, 2.0, np.float32), np.int32(5))]
    (wav, lens) = pad_rows(rows, 4)
    assert wav.shape == (4, 3) and lens.shape == (4,)
    np.testing.assert_array_equal(wav[0], 1.0)
    np.testing.assert_array_equal(wav[2:], 0.0)
    assert lens.tolist() == [2, 5, 0, 0]


def test_pad_rows_device_resident_rows_collate_on_device():
    """jax.Array payload rows take the jnp path: the batch tree stays on
    device (zero-copy serving for co-located pipelines) and matches the
    host collate bit-for-bit."""
    import jax.numpy as jnp

    host_rows = [(np.ones(3, np.float32), np.int32(2)),
                 (np.full(3, 2.0, np.float32), np.int32(5))]
    dev_rows = [tuple(jnp.asarray(x) for x in r) for r in host_rows]
    host = pad_rows(host_rows, 4)
    dev = pad_rows(dev_rows, 4)
    for h, d in zip(host, dev):
        assert isinstance(d, jax.Array)
        np.testing.assert_array_equal(h, np.asarray(d))
        assert h.dtype == d.dtype


def test_trim_at_eos():
    row = np.array([1, 2, 7, 8, EOS, 9], np.int32)
    np.testing.assert_array_equal(trim_at_eos(row, EOS, 2), [1, 2, 7, 8])
    # EOS inside the prefix region does not count
    row2 = np.array([EOS, 2, 7, 8], np.int32)
    np.testing.assert_array_equal(trim_at_eos(row2, EOS, 2), row2)
    row3 = np.array([1, 2, 7, 8], np.int32)
    np.testing.assert_array_equal(trim_at_eos(row3, EOS, 2), row3)


def test_canonical_wav():
    out = canonical_wav(np.ones(10, np.float64), seconds=1.0, sample_rate=16)
    assert out.shape == (16,) and out.dtype == np.float32
    assert out[9] == 1.0 and out[10] == 0.0
    out = canonical_wav(np.ones(99), seconds=1.0, sample_rate=16)
    assert out.shape == (16,)


# -- engine ------------------------------------------------------------------------


class DummyTok:
    def decode(self, ids):
        return ",".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def asr_setup():
    asr = WhisperASR(config=CFG)
    params = asr.init(jax.random.PRNGKey(0))
    n = int(SECONDS * 16_000)
    rng = np.random.default_rng(0)
    wavs = [canonical_wav(0.1 * rng.standard_normal(n), seconds=SECONDS)
            for _ in range(7)]

    def direct(wav):
        toks = np.asarray(asr.transcribe_tokens(
            params, wav[None], PREFIX, beam_size=BEAM, max_len=MAX_LEN,
            eos_id=EOS, pad_to=n))[0]
        return trim_at_eos(toks, EOS, len(PREFIX))

    return asr, params, wavs, direct


def make_engine(asr, params, **kw):
    kw.setdefault("buckets", (1, 2, 4))
    kw.setdefault("max_wait_s", 0.05)
    return make_audio_engine(
        asr, params, PREFIX, beam_size=BEAM, max_len=MAX_LEN, eos_id=EOS,
        seconds=SECONDS, **kw)


def test_engine_single_request_matches_direct(asr_setup):
    asr, params, wavs, direct = asr_setup
    with make_engine(asr, params, max_wait_s=0.0) as eng:
        res = eng.transcribe(wavs[0], timeout=120)
    np.testing.assert_array_equal(res.tokens, direct(wavs[0]))
    assert res.text is None
    assert res.bucket == 1
    assert res.total_ms >= res.decode_ms > 0


def test_engine_batched_rows_match_independent_decodes(asr_setup):
    """Concurrent requests are co-batched (padded bucket) yet each row's
    tokens equal its own single-request decode — padding is exact."""
    asr, params, wavs, direct = asr_setup
    with make_engine(asr, params, max_wait_s=0.25) as eng:
        futs = [eng.submit(w) for w in wavs[:3]]
        results = [f.result(timeout=120) for f in futs]
    for w, r in zip(wavs[:3], results):
        np.testing.assert_array_equal(r.tokens, direct(w))
    stats = eng.stats()
    assert stats["requests"] == 3
    assert set(stats["compiled_buckets"]) <= {1, 2, 4}


def test_engine_bounded_compile_set_under_load(asr_setup):
    asr, params, wavs, direct = asr_setup
    with make_engine(asr, params, max_wait_s=0.01) as eng:
        futs = [eng.submit(w) for w in wavs]
        results = [f.result(timeout=240) for f in futs]
    for w, r in zip(wavs, results):
        np.testing.assert_array_equal(r.tokens, direct(w))
    stats = eng.stats()
    assert stats["requests"] == len(wavs)
    assert set(stats["compiled_buckets"]) <= {1, 2, 4}
    assert sum(stats["bucket_counts"].values()) == stats["batches"]


def test_engine_warmup_precompiles_all_buckets(asr_setup):
    asr, params, wavs, _ = asr_setup
    with make_engine(asr, params) as eng:
        eng.warmup((wavs[0],))
        assert eng.stats()["compiled_buckets"] == [1, 2, 4]


def test_engine_tokenizer_text(asr_setup):
    asr, params, wavs, direct = asr_setup
    with make_engine(asr, params, tokenizer=DummyTok(),
                     max_wait_s=0.0) as eng:
        res = eng.transcribe(wavs[1], timeout=120)
    expect = direct(wavs[1])
    assert res.text == ",".join(str(i) for i in expect[len(PREFIX):])


def test_engine_rejects_after_close(asr_setup):
    asr, params, wavs, _ = asr_setup
    eng = make_engine(asr, params)
    eng.close()
    with pytest.raises(RuntimeError):
        eng.submit(wavs[0])


# -- AV engine ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def av_setup():
    """Tiny AVWhisperNet (the test_av_whisper.py shrink pattern) plus raw
    uint8 per-request payloads in the engine convention."""
    from mocov2_whisper_flamingo_tpu.models.av_whisper import AVWhisperNet
    from mocov2_whisper_flamingo_tpu.models.whisper import (
        WhisperDecoder, WhisperEncoder)
    from mocov2_whisper_flamingo_tpu.ops.video import eval_video_pipeline

    tiny = WhisperConfig(
        n_mels=80, d_model=32, encoder_layers=1, decoder_layers=1, n_heads=4,
        d_ff=64, vocab_size=64, max_source_positions=64,
        max_target_positions=32)
    net = AVWhisperNet(modelargs=(32, 4, 2, 3000, 128, 0.0), vocab_size=64,
                       whisper_name="whisper-tiny", backend="xla")
    net.whisper_config = tiny
    net.trunk.whisper_config = tiny
    net.trunk.whisper_encoder = WhisperEncoder(tiny, net.trunk.precision, "xla")
    net.decoder = WhisperDecoder(tiny, net.precision, "xla")
    params = net.init(jax.random.PRNGKey(0))

    t_video, hw = 6, 32
    rng = np.random.default_rng(1)

    def payload(i):
        return (
            np.asarray(rng.standard_normal((80, 128)), np.float32),
            np.ones(128, bool),
            rng.integers(0, 255, (t_video, 3, hw, hw)).astype(np.uint8),
            np.ones(t_video, bool),
            np.int32(t_video - (i % 2)),
        )

    payloads = [payload(i) for i in range(3)]

    def direct(p):
        batch = tuple(np.asarray(x)[None] for x in p)
        audio, audio_mask, video_u8, video_mask, video_len = batch
        video = eval_video_pipeline(video_u8, resize=hw)
        toks = np.asarray(net.beam(
            params, (audio, audio_mask, video, video_mask, video_len),
            PREFIX, beam_size=BEAM, max_len=MAX_LEN,
            eos_id=EOS).sequences)[0, 0]
        return trim_at_eos(toks, EOS, len(PREFIX))

    return net, params, payloads, direct, hw


def test_av_engine_matches_direct_beam(av_setup):
    """make_av_engine rows equal the top beam hypothesis of an independent
    single-request decode (incl. uint8 -> device eval_video_pipeline)."""
    from mocov2_whisper_flamingo_tpu.serving import make_av_engine

    net, params, payloads, direct, hw = av_setup
    with make_av_engine(net, params, PREFIX, beam_size=BEAM, max_len=MAX_LEN,
                        eos_id=EOS, buckets=(1, 2), max_wait_s=0.25,
                        video_resize=hw) as eng:
        futs = [eng.submit(*p) for p in payloads]
        results = [f.result(timeout=240) for f in futs]
    for p, r in zip(payloads, results):
        assert r.tokens.ndim == 1  # one row per request, not [beam, L]
        np.testing.assert_array_equal(r.tokens, direct(p))
    stats = eng.stats()
    assert stats["requests"] == 3
    assert set(stats["compiled_buckets"]) <= {1, 2}


def test_av_engine_device_resident_payloads(av_setup):
    """Pre-staged device payloads run through the same engine (device-side
    jnp collate, device_put no-op) and reproduce the host-payload rows."""
    from mocov2_whisper_flamingo_tpu.serving import make_av_engine

    net, params, payloads, direct, hw = av_setup
    dev = [tuple(jax.device_put(x) for x in p) for p in payloads[:2]]
    with make_av_engine(net, params, PREFIX, beam_size=BEAM, max_len=MAX_LEN,
                        eos_id=EOS, buckets=(2,), max_wait_s=0.25,
                        video_resize=hw) as eng:
        futs = [eng.submit(*p) for p in dev]
        results = [f.result(timeout=240) for f in futs]
    for p, r in zip(payloads, results):
        np.testing.assert_array_equal(r.tokens, direct(p))


def test_av_engine_tokenizer_text(av_setup):
    from mocov2_whisper_flamingo_tpu.serving import make_av_engine

    net, params, payloads, direct, hw = av_setup
    with make_av_engine(net, params, PREFIX, tokenizer=DummyTok(),
                        beam_size=BEAM, max_len=MAX_LEN, eos_id=EOS,
                        buckets=(1,), max_wait_s=0.0,
                        video_resize=hw) as eng:
        res = eng.transcribe(*payloads[0], timeout=240)
    expect = direct(payloads[0])
    assert res.text == ",".join(str(i) for i in expect[len(PREFIX):])


# -- HTTP server -------------------------------------------------------------------


def _post(host, port, path, body) -> tuple[int, dict]:
    conn = http.client.HTTPConnection(host, port, timeout=240)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    return r.status, out


def _get(host, port, path) -> tuple[int, dict]:
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("GET", path)
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    return r.status, out


def test_http_server_roundtrip(asr_setup):
    asr, params, wavs, direct = asr_setup
    with make_engine(asr, params, tokenizer=DummyTok(),
                     max_wait_s=0.0) as eng:
        with TranscriptionServer(eng, port=0, seconds=SECONDS) as srv:
            host, port = srv.address
            status, body = _get(host, port, "/healthz")
            assert status == 200 and body == {"ok": True}

            status, body = _post(host, port, "/v1/transcribe",
                                 {"audio": wavs[0].tolist()})
            assert status == 200, body
            expect = direct(wavs[0])
            assert body["tokens"] == [int(t) for t in expect]
            assert body["text"] == ",".join(
                str(i) for i in expect[len(PREFIX):])
            assert body["bucket"] == 1

            import base64

            status, body2 = _post(
                host, port, "/v1/transcribe",
                {"audio_b64": base64.b64encode(
                    wavs[0].astype(np.float32).tobytes()).decode()})
            assert status == 200 and body2["tokens"] == body["tokens"]

            status, metrics = _get(host, port, "/metrics")
            assert status == 200 and metrics["requests"] >= 2

            status, err = _post(host, port, "/v1/transcribe", {"nope": 1})
            assert status == 400 and "error" in err
            status, err = _get(host, port, "/nothing")
            assert status == 404


def test_http_concurrent_requests_batched(asr_setup):
    """Several simultaneous HTTP clients ride one micro-batch and all get
    their own correct transcripts back."""
    asr, params, wavs, direct = asr_setup
    results = {}

    def client(host, port, i):
        status, body = _post(host, port, "/v1/transcribe",
                             {"audio": wavs[i].tolist()})
        results[i] = (status, body)

    with make_engine(asr, params, max_wait_s=0.25) as eng:
        with TranscriptionServer(eng, port=0, seconds=SECONDS) as srv:
            host, port = srv.address
            threads = [threading.Thread(target=client, args=(host, port, i))
                       for i in range(3)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=240)
    for i in range(3):
        status, body = results[i]
        assert status == 200, body
        assert body["tokens"] == [int(t) for t in direct(wavs[i])]
