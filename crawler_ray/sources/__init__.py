"""Sources: the synthetic-web page store (fetch-as-join), seed and
robots table loaders."""
