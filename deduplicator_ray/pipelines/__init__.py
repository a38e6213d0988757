"""End-to-end pipelines: the flagship dedup pipeline, the driver-facing
query registry, and the CLI entry point."""
