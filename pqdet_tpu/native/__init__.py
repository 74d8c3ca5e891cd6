"""Native (C++) runtime components, built on first use with g++.

Shared objects are cached next to the sources keyed by a source hash;
loading falls back gracefully (callers keep a pure-Python path) when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE = {}


class NativeBuildError(RuntimeError):
    pass


def _build(name: str) -> str:
    src = os.path.join(_DIR, f'{name}.cpp')
    with open(src, 'rb') as fr:
        tag = hashlib.sha256(fr.read()).hexdigest()[:12]
    out = os.path.join(_DIR, f'_{name}_{tag}.so')
    if os.path.exists(out):
        return out
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', src, '-o', out + '.tmp']
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as exc:
        detail = getattr(exc, 'stderr', b'') or b''
        raise NativeBuildError(f'{name}: {detail.decode()[:500]}') from exc
    os.replace(out + '.tmp', out)
    return out


def load(name: str) -> ctypes.CDLL:
    """Build (if needed) and dlopen a native component by basename."""
    with _LOCK:
        if name not in _CACHE:
            _CACHE[name] = ctypes.CDLL(_build(name))
        return _CACHE[name]
