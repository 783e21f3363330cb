"""ctypes bindings to the C++ extraction engine (igmc_tpu/native/extract.cpp).

Falls back cleanly when the shared library has not been built; build it with
`python -m igmc_tpu.native.build` (see igmc_tpu/native/).
"""

from __future__ import annotations

_LIB = None
_TRIED = False

ABI_VERSION = 2  # must match igmc_extract_abi_version() in extract.cpp


def _abi_ok(lib) -> bool:
    try:
        return lib.igmc_extract_abi_version() == ABI_VERSION
    except AttributeError:  # pre-versioning binary
        return False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    import ctypes
    import os

    def _build():
        try:
            from ..native.build import build

            return build(verbose=False)
        except Exception:
            return None

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "native", "libigmc_extract.so")
    if not os.path.isfile(path):
        path = _build()  # build on first use when a toolchain is available
        if path is None:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    if not _abi_ok(lib):
        # Stale prebuilt binary: calling it would misalign arguments.
        # Rebuild from source; refuse (NumPy fallback) if that fails.
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        if not _abi_ok(lib):
            return None
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def extract_many_native(links, labels, A, h, sample_ratio, max_nodes_per_hop,
                        u_features, v_features, class_values, seed,
                        indices=None):
    from .native_impl import extract_many_native as impl

    return impl(links, labels, A, h, sample_ratio, max_nodes_per_hop,
                u_features, v_features, class_values, seed, _load(),
                indices=indices)
