"""Column-level helper functions (crypto envelope, security, text)."""
