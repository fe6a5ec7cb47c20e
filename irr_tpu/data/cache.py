"""Decoded-sample disk cache (host-side).

PNG decode is the input pipeline's dominant host cost (~27 ms per Sintel
frame via PIL, ~6 ms native). With the cache enabled, the first epoch
decodes and writes each array as .npy into the cache root; later epochs
load the page-cached .npy (~0.5 ms). Entries are keyed by content identity
(absolute path + mtime + size), so edits to source files invalidate
naturally; stale entries are just orphaned files.

Enable with the --decode_cache_dir CLI flag (irr_tpu/config.py) or the
IRR_TPU_DECODE_CACHE environment variable. Off by default: behavior (and
disk usage) is unchanged unless asked for. Thread/process safe: writes go
through a unique temp file + atomic os.replace.

The reference has no equivalent (its DataLoader workers re-decode every
epoch, datasets/common.py:10-42); this is a TPU-first addition to keep a
single host feeding a chip that evaluates ~30 pairs/s.
"""

import hashlib
import os
import threading

import numpy as np

_ROOT = {"path": os.environ.get("IRR_TPU_DECODE_CACHE", "") or None}


def set_decode_cache(path):
    """Set (or disable, with None/'') the decode cache root."""
    _ROOT["path"] = path or None


def decode_cache_root():
    return _ROOT["path"]


def _entry_path(root, filename):
    st = os.stat(filename)
    key = hashlib.sha1(
        ("%s:%d:%d" % (os.path.abspath(filename), st.st_mtime_ns,
                       st.st_size)).encode()).hexdigest()
    return os.path.join(root, key[:2], key + ".npy")


def cached_array(filename, decode_fn):
    """decode_fn(filename) -> np.ndarray, memoized on disk when enabled."""
    root = _ROOT["path"]
    if root is None:
        return decode_fn(filename)
    try:
        cpath = _entry_path(root, filename)
    except OSError:
        return decode_fn(filename)
    try:
        return np.load(cpath, allow_pickle=False)
    except (FileNotFoundError, ValueError, EOFError):
        pass
    arr = decode_fn(filename)
    try:
        os.makedirs(os.path.dirname(cpath), exist_ok=True)
        tmp = "%s.%d.%d.tmp" % (cpath, os.getpid(), threading.get_ident())
        with open(tmp, "wb") as f:
            np.save(f, arr)
        os.replace(tmp, cpath)
    except OSError:
        pass  # cache write failure is never fatal
    return arr
