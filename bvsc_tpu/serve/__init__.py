"""Batched multi-stream serving runtime + AOT serving bundles."""

from bvsc_tpu.serve.engine import DecodeEngine, ServingEngine
from bvsc_tpu.serve.export import ServingBundle, export_serving_bundle

__all__ = [
    "DecodeEngine",
    "ServingEngine",
    "ServingBundle",
    "export_serving_bundle",
]
