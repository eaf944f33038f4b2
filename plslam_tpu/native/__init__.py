"""Native (C++) runtime components, exposed via ctypes.

The compute path of the engine is JAX/XLA; the host-sequential runtime
around it (dataset decode + prefetch) is C++ — the same split the reference
makes between its OpenCV image IO and its C++ pipeline. Builds lazily with
g++ on first use; callers fall back to the Python/cv2 path when no
toolchain is available.
"""

from .loader import TumLoader, native_available  # noqa: F401
