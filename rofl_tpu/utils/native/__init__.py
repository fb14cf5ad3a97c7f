"""Native (C) host-side helpers, compiled on demand with the system cc.

The TPU owns the data plane; these cover inherently-sequential host work
(STROBE sponge driving for Merlin transcripts). Build artifacts are cached
next to the sources; a pure-Python fallback is always available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_rofl_native.so")
_SRC = os.path.join(_DIR, "keccak.c")
_lock = threading.Lock()
_lib = None
_tried = False


def get_lib():
    """ctypes handle to the native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["cc", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.keccak_f1600.argtypes = [ctypes.c_void_p]
            lib.merlin_absorb_msgs.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_void_p, ctypes.c_long,
                ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
                ctypes.c_int,
            ]
            lib.merlin_absorb_msgs.restype = ctypes.c_int
            for fn in (lib.strobe_absorb, lib.strobe_overwrite, lib.strobe_squeeze):
                fn.argtypes = [
                    ctypes.c_void_p,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.c_void_p,
                    ctypes.c_long,
                    ctypes.c_int,
                ]
                fn.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib
