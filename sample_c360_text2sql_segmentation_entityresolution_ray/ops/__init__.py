"""General operator library (relational, dedup, ANN, text, multimodal)."""
