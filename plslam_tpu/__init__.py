"""plslam_tpu — TPU-native point-and-line RGB-D visual SLAM.

A ground-up re-design of the capabilities of
``wolfcanli/ORB_SLAM2_Modification_with-point-and-line-feature`` (a C++
ORB-SLAM2 fork with LSD/LBD line features) as an idiomatic JAX/XLA/Pallas
framework for TPU:

- perception (ORB pyramid extraction, line segment detection, binary
  descriptors) as batched array programs / Pallas kernels,
- data association (point + line matching) as batched popcount/gating
  kernels,
- state estimation (pose optimization, local/global bundle adjustment,
  Sim3 pose graph) as jitted Levenberg–Marquardt with Schur complement,
- the reference's three pthreads (Tracking / LocalMapping / LoopClosing)
  re-expressed as sequential or sharded batch passes over fixed-capacity,
  mask-padded state.

Layer map (mirrors SURVEY.md §1 of the reference):
  models/    pipeline stages + map model (Frame, Map arenas, Tracking,
             LocalMapping, LoopClosing, PointCloudMapping, System facade)
  ops/       perception & association kernels (pyramid, FAST, ORB, LSD,
             LBD, Hamming matching, line matching)
  optim/     optimizers replacing g2o (pose LM, Schur BA, Sim3 graph)
  geometry/  SE3/Sim3/projection/Plücker primitives
  bow/       bag-of-binary-words vocabulary + keyframe database
  parallel/  device mesh, sharded matching + distributed BA
  utils/     config, TUM dataset IO, trajectory/PCD writers, metrics
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Geometry/optimization math is small-matrix and precision-sensitive (3x3
# rotations, 6x6 normal equations, chi² gates): default all matmuls to f32
# accumulation. FLOP-heavy kernels (descriptor matmuls, image convs) opt into
# lower precision explicitly where profitable.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the big jitted programs (fused track step,
# Schur bundle adjustment) take tens of seconds of XLA compile time on first
# use — and on a networked TPU that compile also stalls the shared transport
# every process start. Cache compiled executables across runs. The directory
# is keyed by this host's CPU feature set: XLA:CPU AOT executables are
# machine-code specialized, and loading one compiled on a different
# microarchitecture can SIGILL.
if not _os.environ.get("PLSLAM_NO_COMPILE_CACHE") \
        and _os.environ.get("JAX_PLATFORMS") != "cpu":
    # The cache exists for the TPU path (first compiles stall the shared
    # tunneled transport for tens of seconds). On the forced-CPU path
    # (tests/conftest.py) it is DISABLED: serializing some XLA:CPU
    # executables crashes this jaxlib (observed: SIGSEGV in
    # put_executable_and_time and SIGABRT in get_executable_and_time on
    # the stereo build_frame program), and CPU AOT code is
    # microarchitecture-specialized anyway.
    import hashlib as _hashlib

    try:
        with open("/proc/cpuinfo") as _f:
            _lines = _f.readlines()
        _feat = next((l for l in _lines if l.startswith("flags")), "") + \
            next((l for l in _lines if l.startswith("model name")), "")
        del _lines
    except OSError:  # pragma: no cover - non-Linux
        import platform as _platform

        _feat = _platform.processor()
    # key on jaxlib too: serialized executables are not stable across
    # jaxlib versions, and on the CPU feature set + model: XLA:CPU AOT
    # code is microarchitecture-specialized — a stale entry from another
    # machine aborts (observed: SIGABRT in get_executable_and_time) or
    # SIGILLs on load
    import jaxlib as _jaxlib

    _feat += getattr(_jaxlib, "__version__", "?")
    _key = _hashlib.sha1(_feat.encode()).hexdigest()[:10]
    _cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser(f"~/.cache/plslam_tpu_xla_{_key}"),
    )
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    del _hashlib, _key, _cache
del _jax, _os
