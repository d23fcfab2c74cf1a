"""Training-data pipeline stages: text analysis, dedup, similarity search,
multimodal plumbing. All are Dataset -> Dataset batch transforms."""
