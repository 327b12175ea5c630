#!/usr/bin/env python
"""Dataloader smoke test: build the DataModule, iterate a few train batches,
print keys and timing (capability parity with reference: test.py:1-13)."""

from __future__ import annotations

import argparse
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    from mocov2_whisper_flamingo_tpu.config import add_config_flags, config_from_args

    add_config_flags(parser)
    parser.add_argument("--num-batches", type=int, default=3)
    args = parser.parse_args()
    config = config_from_args(args)

    from mocov2_whisper_flamingo_tpu.datamodule.data_module import DataModule

    dm = DataModule(config)
    dm.setup("fit")
    loader = dm.train_dataloader()
    print(f"train batches: {len(loader)}")
    t0 = time.time()
    for i, batch in enumerate(loader):
        if i >= args.num_batches:
            break
        shapes = {k: getattr(v, "shape", len(v) if v is not None else None)
                  for k, v in batch.items()}
        print(f"batch {i} ({time.time() - t0:.2f}s): {shapes}")
        t0 = time.time()


if __name__ == "__main__":
    main()
