"""Dependency-free TF TensorBundle (checkpoint V2) reader and writer.

TF-1.x ``Saver`` checkpoints are "tensor bundles": a ``<prefix>.index`` file
(an SSTable in the leveldb table format, TF fork ``tensorflow/core/lib/io``)
mapping variable names to BundleEntryProto records, plus one or more
``<prefix>.data-NNNNN-of-MMMMM`` shards holding raw little-endian tensor
bytes.  The reference ships ``tacotron_model.ckpt-206500`` in exactly this
format (only the .index is present in this mount; reference
read_checkpoint.py:1-16 reads it via tf.train.NewCheckpointReader).

This module implements both directions with zero dependencies beyond numpy:

* ``read_bundle(prefix)``  -> {name: np.ndarray} — lets
  tools/import_tf_checkpoint.py consume the real checkpoint the day the
  .data blob appears, without tensorflow installed.
* ``write_bundle(prefix, {name: np.ndarray})`` — produces a bundle in the
  exact on-disk layout TF's BundleWriter emits (sorted keys, header entry
  at key "", masked-crc32c block trailers and per-tensor data checksums),
  used to value-validate the importer's layout/transform assumptions with
  synthetic checkpoints (tests/test_tf_import.py).

Format facts encoded here (tensorflow/core/util/tensor_bundle + lib/io/table):
* index SSTable: blocks of prefix-compressed (key, value) entries, restart
  array, 5-byte trailer (compression type 0 + masked crc32c of data+type);
  footer = metaindex BlockHandle + index BlockHandle padded to 40 bytes +
  magic 0xdb4775248b80fb57 (little-endian).
* key ""   -> BundleHeaderProto(num_shards=1, endianness=LITTLE,
             version={producer: 1}).
* key name -> BundleEntryProto(dtype=1, shape=2, shard_id=3, offset=4,
             size=5, crc32c=6 fixed32) — crc32c is the MASKED crc of the
             tensor bytes (mask(c) = ((c>>15 | c<<17) + 0xa282ead8)).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

TABLE_MAGIC = bytes([0x57, 0xFB, 0x80, 0x8B, 0x24, 0x75, 0x47, 0xDB])
CRC_MASK_DELTA = 0xA282EAD8

# TF DataType enum values <-> numpy (the subset a TF-1 TTS checkpoint uses)
DTYPES = {
    1: np.dtype("<f4"),  # DT_FLOAT
    2: np.dtype("<f8"),  # DT_DOUBLE
    3: np.dtype("<i4"),  # DT_INT32
    9: np.dtype("<i8"),  # DT_INT64
    14: np.dtype("<u2"),  # DT_BFLOAT16 (raw u16 payload)
    19: np.dtype("<f2"),  # DT_HALF
}
NP_TO_DT = {v: k for k, v in DTYPES.items() if k != 14}


# ---------------------------------------------------------------------------
# crc32c (Castagnoli): native slice-by-8 (native/crc32c.cc, ~GB/s) with a
# table-driven pure-Python fallback (~MB/s) — real checkpoints are hundreds
# of MB, so verification must not run byte-at-a-time in Python
# ---------------------------------------------------------------------------

_CRC_TABLE: List[int] = []
_NATIVE_CRC = None


def _native_crc():
    """ctypes handle to native/libcrc32c.so, building it on demand."""
    global _NATIVE_CRC
    if _NATIVE_CRC is not None:
        return _NATIVE_CRC or None
    import ctypes
    import os
    import subprocess

    native_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
    lib_path = os.path.join(native_dir, "libcrc32c.so")
    try:
        if not os.path.exists(lib_path):
            subprocess.run(
                ["make", "-C", native_dir, "libcrc32c.so"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(lib_path)
        lib.crc32c_update.restype = ctypes.c_uint32
        lib.crc32c_update.argtypes = [
            ctypes.c_uint32, ctypes.c_char_p, ctypes.c_size_t,
        ]
        _NATIVE_CRC = lib
    except Exception:
        _NATIVE_CRC = False
    return _NATIVE_CRC or None


def _crc_table() -> List[int]:
    if not _CRC_TABLE:
        poly = 0x82F63B78  # reflected Castagnoli
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def crc32c(data: bytes, crc: int = 0) -> int:
    lib = _native_crc()
    if lib is not None:
        return int(lib.crc32c_update(crc, data, len(data)))
    table = _crc_table()
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = table[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + CRC_MASK_DELTA) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# varint / minimal protobuf
# ---------------------------------------------------------------------------


def _enc_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _pb_field(field: int, wire: int) -> bytes:
    return _enc_varint((field << 3) | wire)


def _pb_varint(field: int, value: int) -> bytes:
    return _pb_field(field, 0) + _enc_varint(value)


def _pb_bytes(field: int, value: bytes) -> bytes:
    return _pb_field(field, 2) + _enc_varint(len(value)) + value


def _pb_fixed32(field: int, value: int) -> bytes:
    return _pb_field(field, 5) + struct.pack("<I", value)


def _pb_walk(buf: bytes):
    """Yield (field, wire, value) over a serialized protobuf message.

    value is int for varint/fixed wires, bytes for length-delimited."""
    pos = 0
    while pos < len(buf):
        tag, pos = _dec_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _dec_varint(buf, pos)
        elif wire == 2:
            n, pos = _dec_varint(buf, pos)
            v = buf[pos : pos + n]
            pos += n
        elif wire == 5:
            v = struct.unpack("<I", buf[pos : pos + 4])[0]
            pos += 4
        elif wire == 1:
            v = struct.unpack("<Q", buf[pos : pos + 8])[0]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def encode_bundle_header(num_shards: int = 1) -> bytes:
    # BundleHeaderProto: num_shards=1 (varint), endianness=2 (0 LITTLE,
    # omitted as default), version=3 (VersionDef{producer=1})
    version = _pb_varint(1, 1)
    return _pb_varint(1, num_shards) + _pb_bytes(3, version)


def decode_bundle_header(buf: bytes) -> Dict[str, int]:
    out = {"num_shards": 1}
    for field, _, v in _pb_walk(buf):
        if field == 1:
            out["num_shards"] = v
        elif field == 2:
            out["endianness"] = v
    return out


def encode_bundle_entry(
    dtype: int, shape: Tuple[int, ...], shard_id: int, offset: int, size: int, crc: int
) -> bytes:
    dims = b"".join(_pb_bytes(2, _pb_varint(1, d)) for d in shape)
    out = _pb_varint(1, dtype)
    out += _pb_bytes(2, dims)  # TensorShapeProto even when scalar (empty)
    if shard_id:
        out += _pb_varint(3, shard_id)
    if offset:
        out += _pb_varint(4, offset)
    out += _pb_varint(5, size)
    out += _pb_fixed32(6, crc)
    return out


def decode_bundle_entry(buf: bytes) -> Dict:
    entry = {"dtype": 1, "shape": [], "shard_id": 0, "offset": 0, "size": 0, "crc": None}
    for field, _, v in _pb_walk(buf):
        if field == 1:
            entry["dtype"] = v
        elif field == 2:  # TensorShapeProto
            for f2, _, v2 in _pb_walk(v):
                if f2 == 2:  # Dim
                    for f3, _, v3 in _pb_walk(v2):
                        if f3 == 1:
                            entry["shape"].append(v3)
        elif field == 3:
            entry["shard_id"] = v
        elif field == 4:
            entry["offset"] = v
        elif field == 5:
            entry["size"] = v
        elif field == 6:
            entry["crc"] = v
    return entry


# ---------------------------------------------------------------------------
# leveldb-format table (block) encode/decode
# ---------------------------------------------------------------------------


def _encode_block(entries: List[Tuple[bytes, bytes]]) -> bytes:
    """One uncompressed block, restart interval 1 (no prefix compression —
    valid for any reader; restarts only accelerate binary search)."""
    out = bytearray()
    restarts = []
    for key, value in entries:
        restarts.append(len(out))
        out += _enc_varint(0)  # shared
        out += _enc_varint(len(key))
        out += _enc_varint(len(value))
        out += key
        out += value
    if not restarts:
        restarts = [0]
    for r in restarts:
        out += struct.pack("<I", r)
    out += struct.pack("<I", len(restarts))
    return bytes(out)


def _decode_block(block: bytes) -> List[Tuple[bytes, bytes]]:
    n_restarts = struct.unpack("<I", block[-4:])[0]
    data_end = len(block) - 4 - 4 * n_restarts
    pos, key, out = 0, b"", []
    while pos < data_end:
        shared, pos = _dec_varint(block, pos)
        unshared, pos = _dec_varint(block, pos)
        vlen, pos = _dec_varint(block, pos)
        key = key[:shared] + block[pos : pos + unshared]
        pos += unshared
        out.append((key, block[pos : pos + vlen]))
        pos += vlen
    return out


def _block_with_trailer(block: bytes) -> bytes:
    crc = crc32c(block)
    crc = crc32c(b"\x00", crc)  # extend over the type byte
    masked = (((crc >> 15) | (crc << 17)) + CRC_MASK_DELTA) & 0xFFFFFFFF
    return block + b"\x00" + struct.pack("<I", masked)


def _write_table(entries: List[Tuple[bytes, bytes]]) -> bytes:
    """Serialize a single-data-block SSTable (ample for checkpoint indexes:
    entries are ~100 bytes each; TF's own reader has no per-block size
    requirement)."""
    out = bytearray()
    data_block = _encode_block(entries)
    data_off, data_len = 0, len(data_block)
    out += _block_with_trailer(data_block)

    meta_block = _encode_block([])
    meta_off, meta_len = len(out), len(meta_block)
    out += _block_with_trailer(meta_block)

    last_key = entries[-1][0] if entries else b""
    handle = _enc_varint(data_off) + _enc_varint(data_len)
    index_block = _encode_block([(last_key, handle)])
    index_off, index_len = len(out), len(index_block)
    out += _block_with_trailer(index_block)

    footer = (
        _enc_varint(meta_off)
        + _enc_varint(meta_len)
        + _enc_varint(index_off)
        + _enc_varint(index_len)
    )
    footer += b"\x00" * (40 - len(footer))
    footer += TABLE_MAGIC
    out += footer
    return bytes(out)


def _read_table(data: bytes, verify: bool = True) -> List[Tuple[bytes, bytes]]:
    if data[-8:] != TABLE_MAGIC:
        raise ValueError("not an SSTable (bad footer magic)")
    pos = len(data) - 48
    _, pos = _dec_varint(data, pos)  # metaindex offset
    _, pos = _dec_varint(data, pos)  # metaindex size
    ioff, pos = _dec_varint(data, pos)
    isize, pos = _dec_varint(data, pos)

    def block(off: int, size: int) -> bytes:
        ctype = data[off + size]
        if ctype != 0:
            raise ValueError(f"compressed SSTable block (type {ctype}) unsupported")
        if verify:
            stored = struct.unpack("<I", data[off + size + 1 : off + size + 5])[0]
            crc = crc32c(data[off : off + size])
            crc = crc32c(b"\x00", crc)
            masked = (((crc >> 15) | (crc << 17)) + CRC_MASK_DELTA) & 0xFFFFFFFF
            if stored != masked:
                raise ValueError(f"block at {off}: crc mismatch")
        return data[off : off + size]

    out: List[Tuple[bytes, bytes]] = []
    for _, handle in _decode_block(block(ioff, isize)):
        off, p = _dec_varint(handle, 0)
        size, _ = _dec_varint(handle, p)
        out.extend(_decode_block(block(off, size)))
    return out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def write_bundle(prefix: str, tensors: Dict[str, np.ndarray]) -> None:
    """Write ``<prefix>.index`` + ``<prefix>.data-00000-of-00001``."""
    data = bytearray()
    entries: List[Tuple[bytes, bytes]] = []
    header = encode_bundle_header(num_shards=1)
    entries.append((b"", header))
    for name in sorted(tensors):
        # NOT ascontiguousarray: it silently promotes 0-d arrays to 1-d,
        # which would corrupt scalar entries like global_step
        arr = np.asarray(tensors[name])
        if not arr.flags["C_CONTIGUOUS"]:
            arr = arr.copy(order="C")
        dt = NP_TO_DT.get(arr.dtype.newbyteorder("<"))
        if dt is None:
            raise ValueError(f"{name}: unsupported dtype {arr.dtype}")
        raw = arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes()
        offset = len(data)
        data += raw
        entry = encode_bundle_entry(
            dt, arr.shape, 0, offset, len(raw), masked_crc32c(raw)
        )
        entries.append((name.encode("utf-8"), entry))
    with open(f"{prefix}.data-00000-of-00001", "wb") as f:
        f.write(bytes(data))
    with open(f"{prefix}.index", "wb") as f:
        f.write(_write_table(entries))


def read_bundle(
    prefix: str, verify: bool = True, names: List[str] | None = None
) -> Dict[str, np.ndarray]:
    """Read a tensor bundle -> {name: np.ndarray}.  ``verify`` checks both
    the index block crcs and each tensor's masked crc32c."""
    index = open(f"{prefix}.index", "rb").read()
    kv = _read_table(index, verify=verify)
    header = decode_bundle_header(dict(kv)[b""])
    num_shards = header["num_shards"]
    shards = {}

    def shard(i: int) -> bytes:
        if i not in shards:
            shards[i] = open(
                f"{prefix}.data-{i:05d}-of-{num_shards:05d}", "rb"
            ).read()
        return shards[i]

    out: Dict[str, np.ndarray] = {}
    wanted = set(names) if names is not None else None
    for key, value in kv:
        if not key:
            continue
        name = key.decode("utf-8")
        if wanted is not None and name not in wanted:
            continue
        e = decode_bundle_entry(value)
        if e["dtype"] not in DTYPES:
            raise ValueError(f"{name}: unsupported TF dtype enum {e['dtype']}")
        raw = shard(e["shard_id"])[e["offset"] : e["offset"] + e["size"]]
        if len(raw) != e["size"]:
            raise ValueError(f"{name}: shard truncated")
        if verify and e["crc"] is not None and masked_crc32c(raw) != e["crc"]:
            raise ValueError(f"{name}: tensor crc mismatch")
        arr = np.frombuffer(raw, dtype=DTYPES[e["dtype"]]).reshape(e["shape"])
        out[name] = arr
    return out
