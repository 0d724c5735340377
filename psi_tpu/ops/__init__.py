"""Device-side matching engines: batched FM search, frontier traversal."""
