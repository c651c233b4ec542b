"""Utility modules: tuning, visualization."""
