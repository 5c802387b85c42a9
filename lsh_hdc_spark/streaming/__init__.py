from .ingest import StreamIndex, attach_batch, run_attach_stream

__all__ = ["StreamIndex", "attach_batch", "run_attach_stream"]
