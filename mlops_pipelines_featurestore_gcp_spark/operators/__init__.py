"""Engine operators beyond stock Spark: dedup family, similarity search,
text analysis, as-of joins, multimodal plumbing (SURVEY.md §4.3 + the
north-star LLM-data-pipeline surface)."""
