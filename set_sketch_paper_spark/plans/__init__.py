"""End-to-end resumable pipelines."""
