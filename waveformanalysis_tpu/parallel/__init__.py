"""Multi-device parallelism: meshes, shardings, sharded time-axis scans."""

from waveformanalysis_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    pad_to_shards,
    replicated,
)
from waveformanalysis_tpu.parallel.scan import (
    make_sharded_pipeline,
    shard_halo_exchange,
    shard_table_arrays,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "pad_to_shards",
    "make_sharded_pipeline",
    "shard_halo_exchange",
    "shard_table_arrays",
]
