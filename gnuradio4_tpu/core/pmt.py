"""PMT — polymorphic value types with a canonical binary wire format.

≈ reference pmt ``Value``/``ValueMap`` (core Value.hpp:31-42, ValueMap.hpp:1742)
and its wire format (WireFormat.hpp:19-46, docs/CORE_WireFormat.md): every value
serializes as a little-endian self-describing **8-byte prefix + payload** so a
whole map packs into one contiguous blob that can be scanned, mmapped, or shipped
over IPC without a schema. This is the settings/message/tag payload codec — the
YAML path (yaml_io.py) is the human-readable alternative.

Prefix layout (8 bytes, little-endian):
    [0:4]  u32  total element size in bytes (prefix + payload, 8-byte aligned)
    [4]    u8   value type  (ValueType)
    [5]    u8   container type (ContainerType: scalar / vector / map / string)
    [6]    u8   flags (bit0: read-only hint, bit1: CRC32C trailer present)
    [7]    u8   payload offset from element start (≥ 8; allows alignment pads)

Maps serialize as a sequence of (key-string element, value element) pairs.
Vectors of numeric types pack their data contiguously (zero-copy viewable via
numpy). An optional CRC32C trailer (4 bytes) protects individual elements.
"""

from __future__ import annotations

import enum
import struct
from typing import Any

import numpy as np

from .errors import GrError
from .utils_crc import crc32c


class ValueType(enum.IntEnum):
    NULL = 0
    BOOL = 1
    INT8 = 2
    UINT8 = 3
    INT16 = 4
    UINT16 = 5
    INT32 = 6
    UINT32 = 7
    INT64 = 8
    UINT64 = 9
    FLOAT32 = 10
    FLOAT64 = 11
    COMPLEX64 = 12
    COMPLEX128 = 13
    STRING = 14
    MAP = 15


class ContainerType(enum.IntEnum):
    SCALAR = 0
    VECTOR = 1
    STRING = 2
    MAP = 3


_NUMPY_OF = {
    ValueType.BOOL: np.dtype(np.bool_),
    ValueType.INT8: np.dtype(np.int8),
    ValueType.UINT8: np.dtype(np.uint8),
    ValueType.INT16: np.dtype(np.int16),
    ValueType.UINT16: np.dtype(np.uint16),
    ValueType.INT32: np.dtype(np.int32),
    ValueType.UINT32: np.dtype(np.uint32),
    ValueType.INT64: np.dtype(np.int64),
    ValueType.UINT64: np.dtype(np.uint64),
    ValueType.FLOAT32: np.dtype(np.float32),
    ValueType.FLOAT64: np.dtype(np.float64),
    ValueType.COMPLEX64: np.dtype(np.complex64),
    ValueType.COMPLEX128: np.dtype(np.complex128),
}
_VT_OF_NUMPY = {v: k for k, v in _NUMPY_OF.items()}

FLAG_READONLY = 0x01
FLAG_CRC = 0x02

_PREFIX = struct.Struct("<IBBBB")


def _align8(n: int) -> int:
    return (n + 7) & ~7


def _classify(value: Any) -> tuple[ValueType, ContainerType]:
    if value is None:
        return ValueType.NULL, ContainerType.SCALAR
    if isinstance(value, bool):
        return ValueType.BOOL, ContainerType.SCALAR
    if isinstance(value, int):
        return ValueType.INT64, ContainerType.SCALAR
    if isinstance(value, float):
        return ValueType.FLOAT64, ContainerType.SCALAR
    if isinstance(value, complex):
        return ValueType.COMPLEX128, ContainerType.SCALAR
    if isinstance(value, str):
        return ValueType.STRING, ContainerType.STRING
    if isinstance(value, bytes):
        return ValueType.UINT8, ContainerType.VECTOR
    if isinstance(value, dict):
        return ValueType.MAP, ContainerType.MAP
    if isinstance(value, (list, tuple, np.ndarray)):
        arr = np.asarray(value)
        if arr.dtype == object or arr.dtype.kind == "U":
            raise GrError(f"cannot pack heterogeneous/str sequence {value!r}")
        vt = _VT_OF_NUMPY.get(arr.dtype)
        if vt is None:
            raise GrError(f"unsupported array dtype {arr.dtype}")
        return vt, ContainerType.VECTOR
    if isinstance(value, np.generic):
        vt = _VT_OF_NUMPY.get(np.dtype(value.dtype))
        if vt is None:
            raise GrError(f"unsupported numpy scalar {value.dtype}")
        return vt, ContainerType.SCALAR
    raise GrError(f"cannot pack value of type {type(value).__name__}")


def pack(value: Any, *, crc: bool = False, readonly: bool = False) -> bytes:
    """Serialize one value (recursively for maps) to the wire format.

    Vector/string payloads lead with a u32 byte-length (padding would otherwise
    make their true extent ambiguous); the optional CRC32C trailer occupies the
    element's last 4 bytes and covers the padded payload region.
    """
    vt, ct = _classify(value)
    if ct is ContainerType.MAP:
        payload = b"".join(pack(str(k), crc=crc) + pack(v, crc=crc)
                           for k, v in value.items())
    elif ct is ContainerType.STRING:
        raw = value.encode("utf-8")
        payload = struct.pack("<I", len(raw)) + raw
    elif ct is ContainerType.VECTOR:
        arr = np.ascontiguousarray(
            np.frombuffer(value, np.uint8) if isinstance(value, bytes)
            else np.asarray(value))
        raw = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
        payload = struct.pack("<I", len(raw)) + raw
    elif vt is ValueType.NULL:
        payload = b""
    else:
        dt = {ValueType.BOOL: "<?", ValueType.INT64: "<q",
              ValueType.FLOAT64: "<d"}.get(vt)
        if vt is ValueType.COMPLEX128:
            payload = struct.pack("<dd", value.real, value.imag)
        elif dt is not None:
            payload = struct.pack(dt, value)
        else:  # numpy scalar
            payload = np.asarray(value).astype(
                np.dtype(value.dtype).newbyteorder("<")).tobytes()
    flags = (FLAG_READONLY if readonly else 0) | (FLAG_CRC if crc else 0)
    pay_off = 8
    total = _align8(pay_off + len(payload) + (4 if crc else 0))
    head = _PREFIX.pack(total, int(vt), int(ct), flags, pay_off)
    pad_to = total - (4 if crc else 0)
    body = head + payload + b"\0" * (pad_to - 8 - len(payload))
    if crc:
        body += struct.pack("<I", crc32c(body[pay_off:]))
    return body


def _unpack_one(buf: memoryview, offset: int) -> tuple[Any, int]:
    if offset + 8 > len(buf):
        raise GrError("truncated pmt element (no prefix)")
    total, vt_b, ct_b, flags, pay_off = _PREFIX.unpack_from(buf, offset)
    if total < 8 or offset + total > len(buf):
        raise GrError(f"corrupt pmt element size {total} at offset {offset}")
    vt, ct = ValueType(vt_b), ContainerType(ct_b)
    end = offset + total
    pay_start = offset + pay_off
    crc_len = 4 if flags & FLAG_CRC else 0
    limit = end - crc_len
    if crc_len:
        stored = struct.unpack_from("<I", buf, end - 4)[0]
        if crc32c(bytes(buf[pay_start:limit])) != stored:
            raise GrError("pmt CRC32C mismatch")
    if ct is ContainerType.MAP:
        inner: dict[str, Any] = {}
        pos = pay_start
        # maps contain only whole elements; trailing zero padding < 8 B skipped
        while pos + 8 <= limit:
            k, pos = _unpack_one(buf, pos)
            v, pos = _unpack_one(buf, pos)
            inner[k] = v
        value: Any = inner
    elif ct in (ContainerType.STRING, ContainerType.VECTOR):
        blen = struct.unpack_from("<I", buf, pay_start)[0]
        raw = bytes(buf[pay_start + 4: pay_start + 4 + blen])
        if ct is ContainerType.STRING:
            value = raw.decode("utf-8")
        else:
            value = np.frombuffer(raw, dtype=_NUMPY_OF[vt].newbyteorder("<")).copy()
    elif vt is ValueType.NULL:
        value = None
    elif vt is ValueType.BOOL:
        value = bool(buf[pay_start])
    elif vt is ValueType.INT64:
        value = struct.unpack_from("<q", buf, pay_start)[0]
    elif vt is ValueType.FLOAT64:
        value = struct.unpack_from("<d", buf, pay_start)[0]
    elif vt is ValueType.COMPLEX128:
        re, im = struct.unpack_from("<dd", buf, pay_start)
        value = complex(re, im)
    else:
        value = np.frombuffer(buf, dtype=_NUMPY_OF[vt], count=1,
                              offset=pay_start)[0]
    return value, end


def unpack(data: bytes | memoryview) -> Any:
    """Deserialize one value from the wire format."""
    value, _ = _unpack_one(memoryview(data), 0)
    return value


def pack_map(d: dict[str, Any], **kw) -> bytes:
    return pack(dict(d), **kw)


def unpack_map(data: bytes) -> dict[str, Any]:
    v = unpack(data)
    if not isinstance(v, dict):
        raise GrError(f"expected map, got {type(v).__name__}")
    return v
