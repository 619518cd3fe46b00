from .mesh import (  # noqa: F401
    make_mesh,
    shard_search_inputs,
    sharded_batch_search,
    merge_shard_results,
)
