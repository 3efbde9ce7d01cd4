"""Search/retrieval layer Q1-Q15 (SURVEY §2.5): BM25 postings, cosine
similarity, bounded BFS, rerankers, filters, recipes, dispatcher."""
