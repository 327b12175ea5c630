"""Host data pipeline: dataset IO, transforms, bucketed sampling, collate."""

from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import (  # noqa: F401
    AVDataset,
    DataProcessor,
)
from mocov2_whisper_flamingo_tpu.datamodule.data_module import (  # noqa: F401
    DataModule,
    DataLoader,
    collate_fn,
)
from mocov2_whisper_flamingo_tpu.datamodule.transforms import (  # noqa: F401
    AudioTransform,
    VideoTransform,
)
