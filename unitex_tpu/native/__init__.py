"""ctypes bindings for the native C++ mesh-processing kernels.

The shared library builds lazily on first use (g++ -O3) and is cached next
to the source; every native entry point has a numpy/Python fallback (the
dual-implementation pattern, SURVEY.md §4) used when no compiler exists.
"""

from . import meshproc  # noqa: F401
