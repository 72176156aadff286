"""Vendored data files (wordlists, fixtures)."""
