"""Large-scale training-data operators: dedup, similarity search, text
analysis, multimodal plumbing. First-class components of the engine
alongside the CDC core (see repo brief)."""
