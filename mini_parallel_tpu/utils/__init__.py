"""Runtime utilities: config, checkpointing, benchmarking, system info."""
