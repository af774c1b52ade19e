"""Dataflow operators (SURVEY.md §2): dedup, politeness scheduling, fetch,
extraction, text-dedup families, similarity search, multimodal plumbing."""
