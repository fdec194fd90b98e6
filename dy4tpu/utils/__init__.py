"""Host-side utilities: stream I/O, logging, checkpointing, generators."""
