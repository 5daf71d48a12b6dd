"""Batched multi-stream serving runtime."""

from bvsc_tpu.serve.engine import ServingEngine

__all__ = ["ServingEngine"]
