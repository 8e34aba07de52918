"""Placeholder — populated in a later milestone."""
