"""Utilities: metrics/logging, profiling, config plumbing."""
