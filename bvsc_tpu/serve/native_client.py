"""Build/locate the native BVSP client (``bvsc_tpu/native/bvsp_client.c``).

The C client lets a deployment box stream to a :class:`CodecDaemon` with no
Python at all.  Like the other native kernels (``ops/bitpack.py``,
``ops/rans.py``) it is compiled from source on demand into a hash-keyed
cache path — no prebuilt binary is ever loaded from the repo.

Stdio contract of the binary (see the C file's header comment):

* ``bvsp_client HOST PORT resynth BITRATE  < in.f32   > out.f32``
* ``bvsp_client HOST PORT encode  BITRATE  < in.f32   > out.bvspf``
* ``bvsp_client HOST PORT decode [BITRATE] < in.bvspf > out.f32``

``.f32`` is raw little-endian float32 samples at the codec rate; ``.bvspf``
is a sequence of BVSP wire frames verbatim (u8 type, u32le length, payload
— parse/produce them with :mod:`bvsc_tpu.serve.protocol`).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import tempfile

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_SRC = os.path.join(_NATIVE_DIR, "bvsp_client.c")
_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "bvsc_tpu",
)


def client_binary() -> str:
    """Compile (once per source hash) and return the bvsp_client path.

    Raises ``RuntimeError`` when no C toolchain is available.
    """
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    exe_path = os.path.join(_CACHE_DIR, f"bvsp_client-{digest}")
    if not os.path.exists(exe_path):
        with tempfile.NamedTemporaryFile(dir=_CACHE_DIR, delete=False) as tmp:
            try:
                try:
                    proc = subprocess.run(
                        ["cc", "-O2", "-o", tmp.name, _SRC],
                        capture_output=True,
                    )
                except FileNotFoundError as e:
                    raise RuntimeError(
                        "no C toolchain: 'cc' not found on PATH"
                    ) from e
                if proc.returncode:
                    raise RuntimeError(
                        "bvsp_client build failed:\n"
                        + proc.stderr.decode(errors="replace")
                    )
                os.chmod(tmp.name, 0o755)
                os.replace(tmp.name, exe_path)
            finally:
                if os.path.exists(tmp.name):
                    os.unlink(tmp.name)
    return exe_path


def run_native_client(
    host: str,
    port: int,
    mode: str,
    bitrate: float | None,
    stdin_bytes: bytes,
    timeout: float = 120.0,
) -> subprocess.CompletedProcess:
    """One-shot convenience wrapper: feed ``stdin_bytes``, capture stdout.

    Mirrors ``CodecClient(...); send...; close_input(); drain()``.
    """
    br = "nan" if bitrate is None else repr(float(bitrate))
    return subprocess.run(
        [client_binary(), host, str(port), mode, br],
        input=stdin_bytes,
        capture_output=True,
        timeout=timeout,
    )
