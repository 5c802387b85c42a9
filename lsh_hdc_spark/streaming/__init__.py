from .ingest import (
    StreamIndex,
    attach_batch,
    rebuild_index,
    run_attach_stream,
    seed_index,
    start_attach_stream,
    write_index_epoch,
)

__all__ = [
    "StreamIndex",
    "attach_batch",
    "rebuild_index",
    "run_attach_stream",
    "seed_index",
    "start_attach_stream",
    "write_index_epoch",
]
