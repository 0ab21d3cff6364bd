"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing — the operations a 100 TB pretraining-data
pipeline runs next to the link-graph engine (first-class per the build
brief; not part of the reference, which is graph-only)."""
