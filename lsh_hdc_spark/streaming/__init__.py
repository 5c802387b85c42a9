from .audio_ingest import (
    attach_audio_batch,
    rebuild_audio_index,
    run_audio_attach_stream,
    write_audio_epoch,
)
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
    "attach_audio_batch",
    "attach_batch",
    "rebuild_audio_index",
    "rebuild_index",
    "run_attach_stream",
    "run_audio_attach_stream",
    "seed_index",
    "start_attach_stream",
    "write_audio_epoch",
    "write_index_epoch",
]
