"""Large-scale training-data pipeline extensions (BASELINE.json north star).

Beyond the reference's migration surface: deduplication, similarity
search, text analysis, and multimodal-column plumbing — each designed
for 100 TB (expression-only hot paths, bounded shuffles, LSH instead of
quadratic joins)."""
