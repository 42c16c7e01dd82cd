"""Vectorized (pandas/Arrow) and native column functions."""
