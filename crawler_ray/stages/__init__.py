"""Stateless batch transforms (``map_batches`` bodies) shared by the
crawl wave loop and the standalone Ray Data pipelines."""
