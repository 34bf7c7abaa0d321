"""Version / backend reporting.

Mirrors ``vector_version()`` (reference src/sqlite-vector.c:2545-2547)
and ``vector_backend()`` (2549-2551; SIMD dispatch selection
distance-cpu.c:797-812). Our "backends" are execution strategies, not
CPU ISAs: ``codegen`` = Catalyst higher-order-function expressions
(whole-stage codegen, JVM), ``arrow-numpy`` = Arrow-batched pandas
UDFs over NumPy.
"""

__version__ = "0.1.0"

#: Execution backends, analogous to CPU/SSE2/AVX2/NEON in the reference.
BACKENDS = ("codegen", "arrow-numpy")

_active_backend = "codegen"


def vector_version() -> str:
    """Engine version string (parity: vector_version())."""
    return __version__


def vector_backend() -> str:
    """Currently selected distance-kernel backend (parity: vector_backend())."""
    return _active_backend


def set_backend(name: str) -> None:
    """Force a backend, mirroring init_distance_functions(force_cpu)
    (reference distance-cpu.c:797-812)."""
    global _active_backend
    if name not in BACKENDS:
        raise ValueError(f"unknown backend {name!r}; choose from {BACKENDS}")
    _active_backend = name
