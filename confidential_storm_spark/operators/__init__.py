"""DataFrame-level operators (SURVEY §2 inventory)."""
