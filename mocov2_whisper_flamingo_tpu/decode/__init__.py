"""Decoding: greedy and KV-cached beam search (jit-compiled, static shapes),
plus chunked streaming with a persistent cache.

The reference only argmaxes a linear head per frame (reference:
train.py:130-141; its beam_width/lambda config keys are vestigial, quirk Q4).
Autoregressive decoding through the Whisper decoder is the north-star
capability built here.
"""

from mocov2_whisper_flamingo_tpu.decode.greedy import greedy_decode  # noqa: F401
from mocov2_whisper_flamingo_tpu.decode.beam import (  # noqa: F401
    beam_search, default_read_windows)
from mocov2_whisper_flamingo_tpu.decode.logit_rules import LogitRules  # noqa: F401
from mocov2_whisper_flamingo_tpu.decode.streaming import StreamingDecoder  # noqa: F401
from mocov2_whisper_flamingo_tpu.decode.sampling import (  # noqa: F401
    compression_ratio, decode_with_fallback, needs_fallback,
    no_speech_probability, sample_decode)
from mocov2_whisper_flamingo_tpu.decode.timestamps import (  # noqa: F401
    WordTiming, token_timestamps, word_timestamps)
from mocov2_whisper_flamingo_tpu.decode.language import (  # noqa: F401
    detect_language)
