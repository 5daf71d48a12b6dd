"""Export a BVRNN trainer checkpoint to the flat-npz demo format.

The demo artifact format (``chkpts/*.npz``) stores the parameter pytree as
flat ``a/0/b``-keyed float16 arrays — small enough to commit, loadable by
``BVRNNCodecModel(bvrnn_chkpt_path=...)`` (``codec._unflatten_npz`` is the
inverse of this flattening).

Usage:
  python scripts/export_bvrnn_npz.py exp/run/best/bvrnn_00001000 out.npz
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from flatten(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], np.asarray(tree)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        raise SystemExit(__doc__)
    src, dst = argv
    from bvsc_tpu.codec import _load_bvrnn_checkpoint

    params = _load_bvrnn_checkpoint(src, np.float32)
    flat = {k: v.astype(np.float16) for k, v in flatten(params)}
    np.savez_compressed(dst, **flat)
    n = sum(v.size for v in flat.values())
    print(f"{dst}: {len(flat)} arrays, {n / 1e6:.2f} M params, "
          f"{os.path.getsize(dst) / 1e6:.1f} MB (f16)")


if __name__ == "__main__":
    main()
