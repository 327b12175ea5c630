"""TPU-native audio-visual speech recognition framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of the
PyTorch reference ``maihathm/MoCov2-Whisper-Flamingo``:

- Whisper encoder audio path with fused STFT -> 80-bin log-mel preprocessing,
  babble-noise SNR mixing, and SpecAugment (``ops.mel``, ``ops.augment``).
- MoCo-v2 ResNet-50 lip-video frontend behind a 3D-conv stem
  (``models.visual_frontend``).
- Flamingo-style tanh-gated cross-attention fusion over the Pallas
  flash-attention kernel (``models.fusion``, ``ops.flash_attention``).
- Joint CTC + label-smoothed cross-entropy training with length-bucketed
  batching and SPMD data/tensor parallelism over a ``jax.sharding.Mesh``
  (``training``, ``parallel``).
- Greedy and KV-cached beam-search decoding through the extended
  ``TW_tokenizer`` (``decode``).
- Online serving: dynamic micro-batching over static bucket shapes with a
  dispatch/completion pipeline and an HTTP front-end (``serving``,
  ``tools.serve``).

The public surface mirrors the reference so its ``test.py`` /
``verify_model.py`` workflows carry over: ``AVNet`` keeps the
``(modal, MoCofile, reqInpLen, modelargs, vocab_size, enable_logging)``
constructor and the 5-tuple ``forward`` contract
(reference: models/av_net.py:15,67), and ``DataModule`` keeps
``setup()/train_dataloader()/...`` (reference: datamodule/data_module.py:154).
"""

__version__ = "0.1.0"

from mocov2_whisper_flamingo_tpu.config import get_config, ConfigDict  # noqa: F401
