from .distributed import (
    ShardedCSR,
    init_distributed,
    make_row_mesh,
    ShardedWindowEll,
    pagerank_sharded,
    pagerank_step_sharded,
    shard_csr,
    shard_csr_packed,
    spmv_csr_sharded,
    spmv_csr_sharded_packed,
)

__all__ = [
    "ShardedCSR",
    "init_distributed",
    "make_row_mesh",
    "shard_csr",
    "shard_csr_packed",
    "spmv_csr_sharded",
    "spmv_csr_sharded_packed",
    "ShardedWindowEll",
    "pagerank_sharded",
    "pagerank_step_sharded",
]
