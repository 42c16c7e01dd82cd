"""Structured Streaming surface: incremental edge ingestion.

The reference is a batch library (SURVEY.md §1.2), so batch supersteps —
not streams — deliver its semantics; this package adds the incremental-edges
mode the checkpoint layout was designed to admit: new Common-Crawl-style
page files land in a directory, the SAME vectorized extraction produces
href edges, and an append sink maintains a growing edge table the batch
kernels (CC/PageRank/...) run over per snapshot.
"""

from .ingest import (
    edge_rate_by_window,
    host_crawl_stats,
    stream_edges,
    stream_pages,
    write_edges_stream,
)

__all__ = [
    "edge_rate_by_window",
    "host_crawl_stats",
    "stream_edges",
    "stream_pages",
    "write_edges_stream",
]
