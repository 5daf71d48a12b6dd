"""Batched multi-stream serving runtime."""

from bvsc_tpu.serve.engine import DecodeEngine, ServingEngine

__all__ = ["DecodeEngine", "ServingEngine"]
