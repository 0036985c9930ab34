"""Training-data pipeline operators over the documents/embeddings tables:
deduplication, similarity search, text analysis, multimodal plumbing."""
