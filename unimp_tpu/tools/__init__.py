"""Tooling: synthetic data, dataset preprocessing, checkpoint conversion."""
