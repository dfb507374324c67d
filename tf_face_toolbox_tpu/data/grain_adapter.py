"""Grain adapter: FaceShard as a grain RandomAccessDataSource.

Optional ecosystem bridge — grain (installed in this image) provides the
multi-worker prefetch/Ordered-sampling machinery many JAX codebases
standardize on; this adapter lets FaceShard files plug straight into it.
The framework's own pipeline (data/pipeline.py + native loader) remains
the default path.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from tf_face_toolbox_tpu.data.pipeline import FaceShardSource


class FaceShardDataSource:
    """grain.RandomAccessDataSource over one FaceShard file.

    Records are {'image': (H,W,3) u8, 'label': int32}. Implements the
    grain protocol (``__len__`` / ``__getitem__``) without importing
    grain — duck typing keeps the dependency optional.
    """

    def __init__(self, path: str):
        self._source = FaceShardSource(path)

    def __len__(self) -> int:
        return self._source.index.count

    def __getitem__(self, record_key: int) -> dict[str, Any]:
        image, label = self._source.record(int(record_key))
        return {"image": image, "label": np.int32(label)}


def make_grain_dataset(path: str, *, batch_size: int, seed: int = 0,
                       num_epochs: int | None = None,
                       worker_count: int = 0):
    """A grain DataLoader over a FaceShard (shuffled, batched)."""
    import grain.python as grain

    source = FaceShardDataSource(path)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=grain.NoSharding(),
        shuffle=True,
        num_epochs=num_epochs,
        seed=seed,
    )
    return grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size, drop_remainder=True)],
        worker_count=worker_count,
    )
