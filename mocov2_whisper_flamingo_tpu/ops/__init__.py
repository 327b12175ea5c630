"""TPU compute kernels: audio DSP, attention, fusion, losses, augmentation."""

from mocov2_whisper_flamingo_tpu.ops.mel import (  # noqa: F401
    hann_window,
    mel_filter_bank,
    log_mel_spectrogram,
    whisper_log_mel,
    reference_mel,
)
from mocov2_whisper_flamingo_tpu.ops.losses import (  # noqa: F401
    ctc_loss,
    label_smoothed_cross_entropy,
)
