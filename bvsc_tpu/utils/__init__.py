"""Observability, logging, profiling helpers."""
