"""Engine operators: CDC semantics, dedup, similarity search, text, multimodal."""
