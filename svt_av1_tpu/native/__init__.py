"""Native (C) runtime components.

Build with: python setup.py build_ext --inplace
Falls back to the pure-Python implementations when unbuilt.
"""
try:
    from .ec_native import EcEnc  # noqa: F401
    HAVE_NATIVE_EC = True
except ImportError:  # pragma: no cover - build-environment dependent
    EcEnc = None
    HAVE_NATIVE_EC = False
