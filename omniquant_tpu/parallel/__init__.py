from .sharding import (
    make_mesh,
    block_specs,
    model_specs,
    shard_params,
    to_shardings,
)
from .ring_attention import ring_attention
