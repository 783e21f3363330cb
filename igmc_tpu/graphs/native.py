"""ctypes bindings to the C++ extraction engine (igmc_tpu/native/extract.cpp).

Falls back cleanly when the shared library has not been built; build it with
`python -m igmc_tpu.native.build` (see igmc_tpu/native/).
"""

from __future__ import annotations

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    import ctypes
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "native", "libigmc_extract.so")
    if not os.path.isfile(path):
        # Build on first use when a toolchain is available.
        try:
            from ..native.build import build

            path = build(verbose=False)
        except Exception:
            return None
    try:
        _LIB = ctypes.CDLL(path)
    except OSError:
        _LIB = None
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
