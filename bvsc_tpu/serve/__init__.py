"""Batched multi-stream serving runtime, TCP daemon + AOT serving bundles.

All exports are lazy so that the pure client half (``CodecClient``,
``bvsc_tpu.serve.protocol``) stays importable without jax — a receiver box
needs only numpy + stdlib.
"""

_LAZY = {
    "DecodeEngine": ("bvsc_tpu.serve.engine", "DecodeEngine"),
    "ServingEngine": ("bvsc_tpu.serve.engine", "ServingEngine"),
    "ServingBundle": ("bvsc_tpu.serve.export", "ServingBundle"),
    "export_serving_bundle": ("bvsc_tpu.serve.export", "export_serving_bundle"),
    "CodecDaemon": ("bvsc_tpu.serve.daemon", "CodecDaemon"),
    "CodecClient": ("bvsc_tpu.serve.client", "CodecClient"),
    "client_binary": ("bvsc_tpu.serve.native_client", "client_binary"),
    "run_native_client": ("bvsc_tpu.serve.native_client", "run_native_client"),
}

__all__ = sorted(_LAZY)


def __getattr__(name):
    try:
        module, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib

    return getattr(importlib.import_module(module), attr)
