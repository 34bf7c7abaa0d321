"""Vector element types, distance metrics, quantization types.

Mirrors the reference enums:
- ``vector_type`` (src/distance-cpu.h:36-43) — F32/F16/BF16/I8/U8;
  name<->type mapping src/sqlite-vector.c:772-790; bytes-per-element
  761-770.
- ``vector_distance`` (parsing src/sqlite-vector.c:798-808) — L2
  (alias EUCLIDEAN), SQUARED_L2, COSINE, DOT (alias INNER), L1 (alias
  MANHATTAN).
- ``vector_qtype`` (src/distance-cpu.h:45-49) — AUTO/U8BIT/S8BIT.

Option-string parsing mirrors ``parse_keyvalue_string``
(src/sqlite-vector.c:878-914) with keys ``type, dimension, normalized,
max_memory, distance, qtype`` (916-992), including human-readable
memory units KB/MB/GB (916-933).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass


class VectorType(str, enum.Enum):
    F32 = "FLOAT32"
    F16 = "FLOAT16"
    BF16 = "FLOATB16"
    I8 = "INT8"
    U8 = "UINT8"

    @property
    def elem_bytes(self) -> int:
        # reference src/sqlite-vector.c:761-770
        return {"FLOAT32": 4, "FLOAT16": 2, "FLOATB16": 2, "INT8": 1, "UINT8": 1}[self.value]


_TYPE_NAMES = {
    "FLOAT32": VectorType.F32,
    "FLOAT16": VectorType.F16,
    "FLOATB16": VectorType.BF16,
    "BFLOAT16": VectorType.BF16,
    "INT8": VectorType.I8,
    "UINT8": VectorType.U8,
}


class Metric(str, enum.Enum):
    L2 = "L2"
    SQUARED_L2 = "SQUARED_L2"
    COSINE = "COSINE"
    DOT = "DOT"
    L1 = "L1"


_METRIC_NAMES = {
    "L2": Metric.L2,
    "EUCLIDEAN": Metric.L2,
    "SQUARED_L2": Metric.SQUARED_L2,
    "COSINE": Metric.COSINE,
    "DOT": Metric.DOT,
    "INNER": Metric.DOT,
    "L1": Metric.L1,
    "MANHATTAN": Metric.L1,
}


class QType(str, enum.Enum):
    AUTO = "AUTO"
    U8 = "U8BIT"
    S8 = "S8BIT"


_QTYPE_NAMES = {"AUTO": QType.AUTO, "U8BIT": QType.U8, "UINT8": QType.U8, "S8BIT": QType.S8, "INT8": QType.S8}

#: default quantize chunk memory budget (reference src/sqlite-vector.c:71)
DEFAULT_MAX_MEMORY = 30 * 1024 * 1024


def parse_type(name: str) -> VectorType:
    try:
        return _TYPE_NAMES[name.strip().upper()]
    except KeyError:
        raise ValueError(f"unknown vector type {name!r}") from None


def parse_metric(name: str) -> Metric:
    try:
        return _METRIC_NAMES[name.strip().upper()]
    except KeyError:
        raise ValueError(f"unknown distance metric {name!r}") from None


def parse_qtype(name: str) -> QType:
    try:
        return _QTYPE_NAMES[name.strip().upper()]
    except KeyError:
        raise ValueError(f"unknown qtype {name!r}") from None


def parse_memory(value: str) -> int:
    """Human units, reference src/sqlite-vector.c:916-933."""
    s = str(value).strip().upper()
    mult = 1
    for suffix, m in (("KB", 1024), ("MB", 1024**2), ("GB", 1024**3), ("K", 1024), ("M", 1024**2), ("G", 1024**3)):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(float(s) * mult)


@dataclass
class VectorOptions:
    """Parsed ``key=value,key=value`` option string
    (reference src/sqlite-vector.c:878-992)."""

    type: VectorType = VectorType.F32
    dimension: int | None = None
    normalized: bool = False  # reference parses but never uses it (SURVEY §1.3); here the router answers cosine with a single dot fold on registered-normalized columns
    max_memory: int = DEFAULT_MAX_MEMORY
    distance: Metric = Metric.L2
    qtype: QType = QType.AUTO


def parse_options(opts: str | None) -> VectorOptions:
    out = VectorOptions()
    if not opts:
        return out
    for pair in opts.split(","):
        pair = pair.strip()
        if not pair:
            continue
        if "=" not in pair:
            raise ValueError(f"malformed option {pair!r} (expected key=value)")
        key, _, val = pair.partition("=")
        key, val = key.strip().lower(), val.strip()
        if key == "type":
            out.type = parse_type(val)
        elif key == "dimension":
            out.dimension = int(val)
        elif key == "normalized":
            out.normalized = val.lower() in ("1", "true", "yes")
        elif key == "max_memory":
            out.max_memory = parse_memory(val)
        elif key == "distance":
            out.distance = parse_metric(val)
        elif key == "qtype":
            out.qtype = parse_qtype(val)
        else:
            raise ValueError(f"unknown option key {key!r}")
    return out
