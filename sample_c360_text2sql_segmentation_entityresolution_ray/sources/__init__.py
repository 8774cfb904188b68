"""Sources: readers and deterministic fixture synthesis."""
