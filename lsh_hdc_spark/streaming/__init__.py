from .audio_ingest import (
    attach_audio_batch,
    audio_sketch_edges,
    rebuild_audio_index,
    run_audio_attach_stream,
    seed_audio_index,
    write_audio_epoch,
)
from .fused import (
    FusedStreamIndex,
    attach_fused_batch,
    rebuild_fused_index,
    run_fused_attach_stream,
    seed_fused_index,
    write_fused_epoch,
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
    "FusedStreamIndex",
    "StreamIndex",
    "attach_audio_batch",
    "attach_batch",
    "attach_fused_batch",
    "audio_sketch_edges",
    "rebuild_audio_index",
    "rebuild_fused_index",
    "rebuild_index",
    "run_attach_stream",
    "run_audio_attach_stream",
    "run_fused_attach_stream",
    "seed_audio_index",
    "seed_fused_index",
    "seed_index",
    "start_attach_stream",
    "write_audio_epoch",
    "write_fused_epoch",
    "write_index_epoch",
]
