"""Model zoo: Whisper encoder/decoder, MoCo visual frontend, gated
cross-modal fusion, and the AVNet assembly."""

from mocov2_whisper_flamingo_tpu.models.whisper import (  # noqa: F401
    WhisperConfig,
    WhisperEncoder,
    WhisperDecoder,
    WHISPER_SIZES,
)
from mocov2_whisper_flamingo_tpu.models.av_net import AVNet  # noqa: F401
