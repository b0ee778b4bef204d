"""Custom operators: PromAlign range functions, dedup family, similarity
search, text analysis, multimodal plumbing."""
