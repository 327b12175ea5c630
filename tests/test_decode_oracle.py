"""Beam-search oracle: token-exact parity vs HF ``generate``.

The reference has no beam search to mirror (reference: train.py:130-141 only
argmaxes), so the KV-cached beam search — the north star's core new math —
is verified against an independent implementation: a random-init HF
``WhisperForConditionalGeneration`` decoded with
``GenerationMixin.generate(num_beams=K)``. Both sides consume the SAME
encoder features, isolating the decoder + beam semantics (decoder numerics
are parity-tested separately in tests/test_whisper.py).

``GenerationMixin.generate`` is called unbound to bypass Whisper's
long-form-specific ``generate`` override; the generation config pins the
semantics (no suppress/forced tokens, pad==eos so padded tails compare
elementwise).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.decode import beam_search, greedy_decode
from mocov2_whisper_flamingo_tpu.models import convert
from mocov2_whisper_flamingo_tpu.models.whisper import WhisperConfig, WhisperDecoder

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = WhisperConfig(
    n_mels=80, d_model=64, encoder_layers=2, decoder_layers=2, n_heads=4,
    d_ff=128, vocab_size=100, max_source_positions=20, max_target_positions=32,
)
EOS = 2
PREFIX = [1, 7]
B = 8
MAX_NEW = 10
MAX_LEN = len(PREFIX) + MAX_NEW


@pytest.fixture(scope="module")
def oracle():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=CFG.vocab_size, num_mel_bins=CFG.n_mels,
        encoder_layers=CFG.encoder_layers, encoder_attention_heads=CFG.n_heads,
        decoder_layers=CFG.decoder_layers, decoder_attention_heads=CFG.n_heads,
        d_model=CFG.d_model, encoder_ffn_dim=CFG.d_ff, decoder_ffn_dim=CFG.d_ff,
        max_source_positions=CFG.max_source_positions,
        max_target_positions=CFG.max_target_positions,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        pad_token_id=EOS, bos_token_id=1, eos_token_id=EOS,
        decoder_start_token_id=1, begin_suppress_tokens=None,
        suppress_tokens=None, forced_decoder_ids=None,
    )
    torch.manual_seed(1)
    model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    dec_params = convert.whisper_decoder_from_torch(
        model.model.state_dict(), CFG.decoder_layers)
    rng = np.random.default_rng(3)
    features = rng.standard_normal(
        (B, CFG.max_source_positions, CFG.d_model)).astype(np.float32)
    return model, dec_params, features


def _hf_generate(model, features, *, num_beams, early_stopping=False,
                 length_penalty=1.0):
    from transformers.generation import GenerationMixin
    from transformers.modeling_outputs import BaseModelOutput

    gc = transformers.GenerationConfig(
        num_beams=num_beams, num_return_sequences=num_beams,
        max_new_tokens=MAX_NEW, min_new_tokens=0, do_sample=False,
        length_penalty=length_penalty, early_stopping=early_stopping,
        eos_token_id=EOS, pad_token_id=EOS, decoder_start_token_id=1,
        output_scores=True, return_dict_in_generate=True, use_cache=True,
    )
    with torch.no_grad():
        out = GenerationMixin.generate(
            model,
            decoder_input_ids=torch.tensor([PREFIX] * features.shape[0]),
            encoder_outputs=BaseModelOutput(
                last_hidden_state=torch.from_numpy(features)),
            generation_config=gc,
        )
    seq = out.sequences.reshape(features.shape[0], num_beams, -1).numpy()
    # pad HF's cropped output to our static buffer with EOS (pad==eos)
    pad = MAX_LEN - seq.shape[-1]
    if pad > 0:
        seq = np.pad(seq, ((0, 0), (0, 0), (0, pad)), constant_values=EOS)
    scores = (out.sequences_scores.reshape(features.shape[0], num_beams).numpy()
              if out.sequences_scores is not None else None)
    return seq, scores


@pytest.mark.parametrize("early_stopping,length_penalty", [
    (False, 1.0), (True, 1.0), (False, 0.6),
])
def test_beam_matches_hf_generate(oracle, early_stopping, length_penalty):
    model, dec_params, features = oracle
    hf_seq, hf_scores = _hf_generate(
        model, features, num_beams=5, early_stopping=early_stopping,
        length_penalty=length_penalty)

    dec = WhisperDecoder(CFG)
    res = beam_search(dec, dec_params, jnp.asarray(features), PREFIX,
                      beam_size=5, max_len=MAX_LEN, eos_id=EOS,
                      length_penalty=length_penalty,
                      early_stopping=early_stopping)
    ours = np.asarray(res.sequences)

    np.testing.assert_array_equal(ours, hf_seq)
    np.testing.assert_allclose(np.asarray(res.scores), hf_scores,
                               rtol=1e-4, atol=1e-5)


def test_greedy_matches_hf_generate(oracle):
    model, dec_params, features = oracle
    from transformers.generation import GenerationMixin
    from transformers.modeling_outputs import BaseModelOutput

    gc = transformers.GenerationConfig(
        num_beams=1, max_new_tokens=MAX_NEW, do_sample=False,
        eos_token_id=EOS, pad_token_id=EOS, decoder_start_token_id=1,
        use_cache=True,
    )
    with torch.no_grad():
        hf = GenerationMixin.generate(
            model, decoder_input_ids=torch.tensor([PREFIX] * B),
            encoder_outputs=BaseModelOutput(
                last_hidden_state=torch.from_numpy(features)),
            generation_config=gc).numpy()

    dec = WhisperDecoder(CFG)
    ours = np.asarray(greedy_decode(dec, dec_params, jnp.asarray(features),
                                    PREFIX, MAX_LEN, EOS))
    pad = MAX_LEN - hf.shape[-1]
    if pad > 0:
        hf = np.pad(hf, ((0, 0), (0, pad)), constant_values=EOS)
    np.testing.assert_array_equal(ours, hf)


# ---------------------------------------------------------------------------
# Decode-time logit rules (suppress / begin-suppress / forced / timestamps)
# vs the HF processors that real-weight Whisper decoding applies by default.
# ---------------------------------------------------------------------------

from mocov2_whisper_flamingo_tpu.decode import LogitRules

SUPPRESS = (5, 17, 42, 73)        # suppressed at every step
BEGIN_SUPPRESS = (2, 30)          # suppressed at the first generated position
                                  # (includes EOS=2, HF whisper-style)


def test_beam_matches_hf_with_suppression(oracle):
    model, dec_params, features = oracle
    gc = transformers.GenerationConfig(
        num_beams=5, num_return_sequences=5, max_new_tokens=MAX_NEW,
        min_new_tokens=0, do_sample=False, length_penalty=1.0,
        eos_token_id=EOS, pad_token_id=EOS, decoder_start_token_id=1,
        suppress_tokens=list(SUPPRESS),
        begin_suppress_tokens=list(BEGIN_SUPPRESS),
        output_scores=True, return_dict_in_generate=True, use_cache=True,
    )
    from transformers.generation import GenerationMixin
    from transformers.modeling_outputs import BaseModelOutput
    with torch.no_grad():
        out = GenerationMixin.generate(
            model, decoder_input_ids=torch.tensor([PREFIX] * B),
            encoder_outputs=BaseModelOutput(
                last_hidden_state=torch.from_numpy(features)),
            generation_config=gc)
    hf_seq = out.sequences.reshape(B, 5, -1).numpy()
    pad = MAX_LEN - hf_seq.shape[-1]
    if pad > 0:
        hf_seq = np.pad(hf_seq, ((0, 0), (0, 0), (0, pad)), constant_values=EOS)

    rules = LogitRules(vocab_size=CFG.vocab_size, suppress=SUPPRESS,
                       begin_suppress=BEGIN_SUPPRESS, eos_id=EOS)
    dec = WhisperDecoder(CFG)
    res = beam_search(dec, dec_params, jnp.asarray(features), PREFIX,
                      beam_size=5, max_len=MAX_LEN, eos_id=EOS,
                      logit_rules=rules)
    ours = np.asarray(res.sequences)
    np.testing.assert_array_equal(ours, hf_seq)
    assert not np.isin(ours[:, :, len(PREFIX):], SUPPRESS).any()


def test_greedy_matches_hf_with_suppression(oracle):
    model, dec_params, features = oracle
    from transformers.generation import GenerationMixin
    from transformers.modeling_outputs import BaseModelOutput
    gc = transformers.GenerationConfig(
        num_beams=1, max_new_tokens=MAX_NEW, do_sample=False,
        eos_token_id=EOS, pad_token_id=EOS, decoder_start_token_id=1,
        suppress_tokens=list(SUPPRESS),
        begin_suppress_tokens=list(BEGIN_SUPPRESS), use_cache=True,
    )
    with torch.no_grad():
        hf = GenerationMixin.generate(
            model, decoder_input_ids=torch.tensor([PREFIX] * B),
            encoder_outputs=BaseModelOutput(
                last_hidden_state=torch.from_numpy(features)),
            generation_config=gc).numpy()
    pad = MAX_LEN - hf.shape[-1]
    if pad > 0:
        hf = np.pad(hf, ((0, 0), (0, pad)), constant_values=EOS)

    rules = LogitRules(vocab_size=CFG.vocab_size, suppress=SUPPRESS,
                       begin_suppress=BEGIN_SUPPRESS, eos_id=EOS)
    dec = WhisperDecoder(CFG)
    ours = np.asarray(greedy_decode(dec, dec_params, jnp.asarray(features),
                                    PREFIX, MAX_LEN, EOS, logit_rules=rules))
    np.testing.assert_array_equal(ours, hf)


def test_forced_tokens_equal_prefix_extension():
    """Forced positions (HF ForceTokensLogitsProcessor semantics: -inf
    everywhere, 0.0 at the forced id) must decode exactly like teacher-
    forcing those tokens as prefix — greedy path, where score bookkeeping
    is irrelevant."""
    import jax

    dec = WhisperDecoder(CFG)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    features = jnp.asarray(rng.standard_normal(
        (3, CFG.max_source_positions, CFG.d_model)).astype(np.float32))

    forced = ((2, 33), (3, 44))  # positions right after PREFIX=[1, 7]
    rules = LogitRules(vocab_size=CFG.vocab_size, forced=forced, eos_id=EOS)
    with_rules = np.asarray(greedy_decode(
        dec, params, features, PREFIX, MAX_LEN, EOS, logit_rules=rules))
    as_prefix = np.asarray(greedy_decode(
        dec, params, features, PREFIX + [33, 44], MAX_LEN, EOS))
    np.testing.assert_array_equal(with_rules, as_prefix)


NO_TS = 89          # <|notimestamps|> stand-in; timestamps are ids 90..99
MAX_INITIAL_TS = 6


def _ts_generation_config(num_beams):
    return transformers.GenerationConfig(
        num_beams=num_beams, num_return_sequences=num_beams,
        max_new_tokens=MAX_NEW, min_new_tokens=0, do_sample=False,
        length_penalty=1.0, eos_token_id=EOS, pad_token_id=EOS,
        decoder_start_token_id=1, use_cache=True,
        return_dict_in_generate=True, output_scores=True,
    )


@pytest.mark.parametrize("num_beams", [1, 4])
def test_timestamp_rules_match_hf(oracle, num_beams):
    """Full Whisper timestamp grammar vs HF WhisperTimeStampLogitsProcessor
    (pairing, non-decreasing, initial-timestamp cap, logprob detection)."""
    model, dec_params, features = oracle
    from transformers.generation import GenerationMixin
    from transformers.generation.logits_process import (
        LogitsProcessorList, WhisperTimeStampLogitsProcessor)
    from transformers.modeling_outputs import BaseModelOutput

    gc = _ts_generation_config(num_beams)
    gc.no_timestamps_token_id = NO_TS
    gc.max_initial_timestamp_index = MAX_INITIAL_TS
    ts_proc = WhisperTimeStampLogitsProcessor(gc, begin_index=len(PREFIX))
    with torch.no_grad():
        out = GenerationMixin.generate(
            model, decoder_input_ids=torch.tensor([PREFIX] * B),
            encoder_outputs=BaseModelOutput(
                last_hidden_state=torch.from_numpy(features)),
            generation_config=gc,
            logits_processor=LogitsProcessorList([ts_proc]))
    hf_seq = out.sequences.reshape(B, num_beams, -1).numpy()
    pad = MAX_LEN - hf_seq.shape[-1]
    if pad > 0:
        hf_seq = np.pad(hf_seq, ((0, 0), (0, 0), (0, pad)),
                        constant_values=EOS)

    rules = LogitRules(vocab_size=CFG.vocab_size, eos_id=EOS,
                       timestamp_begin=NO_TS + 1, no_timestamps_id=NO_TS,
                       max_initial_timestamp_index=MAX_INITIAL_TS)
    dec = WhisperDecoder(CFG)
    if num_beams == 1:
        ours = np.asarray(greedy_decode(
            dec, dec_params, jnp.asarray(features), PREFIX, MAX_LEN, EOS,
            logit_rules=rules))[:, None]
    else:
        ours = np.asarray(beam_search(
            dec, dec_params, jnp.asarray(features), PREFIX, beam_size=num_beams,
            max_len=MAX_LEN, eos_id=EOS, logit_rules=rules).sequences)
    np.testing.assert_array_equal(ours, hf_seq)
    # sanity: the grammar actually fired — first generated token is a
    # timestamp within the initial cap
    first = ours[:, :, len(PREFIX)]
    assert ((first >= NO_TS + 1) & (first <= NO_TS + 1 + MAX_INITIAL_TS)).all()
