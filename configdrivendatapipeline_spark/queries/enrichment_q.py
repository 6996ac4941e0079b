"""Placeholder — populated in a later phase."""
