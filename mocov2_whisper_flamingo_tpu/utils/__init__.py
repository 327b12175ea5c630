"""Utilities: WER metric, tokenizer loading, TensorBoard event writing,
debug logging."""

from mocov2_whisper_flamingo_tpu.utils.wer import wer  # noqa: F401
from mocov2_whisper_flamingo_tpu.utils.logging_utils import (  # noqa: F401
    setup_logging,
    log_tensor_info,
)
