"""Data: FaceShard format, packer, host pipeline, device prefetch."""

from tf_face_toolbox_tpu.data.format import (  # noqa: F401
    pack_arrays,
    pack_image_list,
    read_index,
    ShardReader,
    write_shard,
)
from tf_face_toolbox_tpu.data.pipeline import (  # noqa: F401
    FaceShardSource,
    batch_iterator,
    device_prefetch,
)
