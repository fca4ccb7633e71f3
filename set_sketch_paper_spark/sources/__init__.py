"""Table loaders and deterministic synthetic corpus generation."""
