from .distributed import (
    ShardedCSR,
    make_row_mesh,
    pagerank_sharded,
    pagerank_step_sharded,
    shard_csr,
    spmv_csr_sharded,
)

__all__ = [
    "ShardedCSR",
    "make_row_mesh",
    "shard_csr",
    "spmv_csr_sharded",
    "pagerank_sharded",
    "pagerank_step_sharded",
]
