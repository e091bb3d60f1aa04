"""Word-embedding integration (transformer LM hidden-state embeddings)."""
