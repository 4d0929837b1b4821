"""End-to-end pipelines: the crawl wave loop, streaming corpus
extraction, enrichment, dedup suites, similarity search, text
analysis."""
