"""Roaring bitmaps for Delta deletion vectors — pure stdlib, from the
public specs.

Two layers, both implemented strictly enough that ANY deviation from
our reading of the spec fails loudly instead of decoding wrong:

* 32-bit Roaring (RoaringFormatSpec): serialize/deserialize of the
  standard portable format. The reader handles all three container
  types (array / bitmap / run) and validates cookies, cardinalities,
  and offsets; the writer emits array/bitmap containers under the
  no-run cookie (always legal).
* RoaringBitmapArray (delta-io's 64-bit extension, PROTOCOL.md
  "Deletion Vector Format"): the "portable" format —
  ``<number of 32-bit bitmaps: 8B LE>`` then per bitmap
  ``<key: 4B LE> <standard 32-bit roaring>``, prefixed by the magic
  number 1681511377 (4B LE). Keys are the high 32 bits of the 64-bit
  row indexes.

Row indexes here are row positions WITHIN one parquet data file, so
in practice they are far below 2^32 and land in bitmap key 0 — but
the full 64-bit framing is implemented because that is what the
protocol stores.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = 1681511377  # RoaringBitmapArray portable magic (PROTOCOL.md)

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


# ------------------------------------------------------- 32-bit codec


def serialize32(values: list[int]) -> bytes:
    """Standard-format bytes for a sorted list of uint32 values.
    Emits the no-run cookie with array/bitmap containers only."""
    if any(v < 0 or v > 0xFFFFFFFF for v in values):
        raise ValueError("roaring32: value out of uint32 range")
    containers: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (always present under the no-run cookie)
    header_len = 8 + 4 * n + 4 * n
    pos = header_len
    sizes = []
    for k in keys:
        card = len(containers[k])
        sz = 8192 if card > _ARRAY_MAX else 2 * card
        sizes.append(sz)
    for sz in sizes:
        out += struct.pack("<I", pos)
        pos += sz
    for k in keys:
        vals = containers[k]
        if len(vals) > _ARRAY_MAX:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            out += bits
        else:
            out += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(out)


def deserialize32(buf: bytes, base: int = 0) -> tuple[list[int], int]:
    """(sorted uint32 values, bytes consumed) from a standard-format
    stream starting at ``base``. Validates every structural field."""
    if len(buf) - base < 4:
        raise ValueError("roaring32: truncated cookie")
    (cookie32,) = struct.unpack_from("<I", buf, base)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE_NO_RUN:
        if len(buf) - base < 8:
            raise ValueError("roaring32: truncated size")
        (n,) = struct.unpack_from("<I", buf, base + 4)
        run_flags = None
        off = base + 8
    elif cookie == _SERIAL_COOKIE:
        n = (cookie32 >> 16) + 1
        nb = (n + 7) // 8
        run_flags = buf[base + 4 : base + 4 + nb]
        if len(run_flags) < nb:
            raise ValueError("roaring32: truncated run flags")
        off = base + 4 + nb
    else:
        raise ValueError(f"roaring32: bad cookie {cookie}")
    keys, cards = [], []
    for i in range(n):
        if len(buf) < off + 4:
            raise ValueError("roaring32: truncated descriptive header")
        k, cm1 = struct.unpack_from("<HH", buf, off)
        keys.append(k)
        cards.append(cm1 + 1)
        off += 4
    has_offsets = run_flags is None or n >= _NO_OFFSET_THRESHOLD
    offsets = []
    if has_offsets:
        for i in range(n):
            if len(buf) < off + 4:
                raise ValueError("roaring32: truncated offset header")
            (o,) = struct.unpack_from("<I", buf, off)
            offsets.append(base + o)
            off += 4
    values: list[int] = []
    pos = off
    for i in range(n):
        if has_offsets:
            if offsets[i] != pos:
                # offsets are relative to the stream start; trust but
                # verify — a mismatch means our framing assumption is
                # wrong for this producer, refuse to guess
                raise ValueError(
                    f"roaring32: container {i} offset {offsets[i]} != "
                    f"cursor {pos}"
                )
        is_run = run_flags is not None and (
            run_flags[i >> 3] >> (i & 7)
        ) & 1
        hi = keys[i] << 16
        card = cards[i]
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            total = 0
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(hi | v for v in range(start, start + length + 1))
                total += length + 1
            if total != card:
                raise ValueError(
                    "roaring32: run container cardinality mismatch"
                )
        elif card > _ARRAY_MAX:
            chunk = buf[pos : pos + 8192]
            if len(chunk) < 8192:
                raise ValueError("roaring32: truncated bitmap container")
            pos += 8192
            total = 0
            for byte_i, b in enumerate(chunk):
                while b:
                    low = b & (-b)
                    values.append(hi | (byte_i << 3) | low.bit_length() - 1)
                    total += 1
                    b ^= low
            if total != card:
                raise ValueError(
                    "roaring32: bitmap container cardinality mismatch"
                )
        else:
            end = pos + 2 * card
            if len(buf) < end:
                raise ValueError("roaring32: truncated array container")
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos = end
            values.extend(hi | v for v in vals)
    return values, pos - base


# ------------------------------------- 64-bit RoaringBitmapArray blob


def serialize_rbm_array(positions: list[int]) -> bytes:
    """The DV data blob: magic + portable RoaringBitmapArray of the
    given 64-bit row positions."""
    if any(p < 0 for p in positions):
        raise ValueError("deletion vector: negative row position")
    by_key: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        by_key.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<I", MAGIC))
    out += struct.pack("<q", len(by_key))
    for k in sorted(by_key):
        out += struct.pack("<I", k)
        out += serialize32(by_key[k])
    return bytes(out)


def deserialize_rbm_array(blob: bytes) -> list[int]:
    """Sorted 64-bit row positions from a DV data blob. Magic and
    framing are validated; any surprise raises."""
    if len(blob) < 12:
        raise ValueError("deletion vector: blob too short")
    (magic,) = struct.unpack_from("<I", blob, 0)
    if magic != MAGIC:
        raise ValueError(
            f"deletion vector: magic {magic} != {MAGIC}; refusing to "
            "decode an unrecognized serialization"
        )
    (n_bitmaps,) = struct.unpack_from("<q", blob, 4)
    if n_bitmaps < 0:
        raise ValueError("deletion vector: negative bitmap count")
    pos = 12
    out: list[int] = []
    last_key = -1
    for _ in range(n_bitmaps):
        if len(blob) < pos + 4:
            raise ValueError("deletion vector: truncated bitmap key")
        (key,) = struct.unpack_from("<I", blob, pos)
        if key <= last_key:
            raise ValueError("deletion vector: bitmap keys not increasing")
        last_key = key
        pos += 4
        vals, used = deserialize32(blob, pos)
        pos += used
        out.extend((key << 32) | v for v in vals)
    if pos != len(blob):
        raise ValueError(
            f"deletion vector: {len(blob) - pos} trailing byte(s) after "
            "the last bitmap — unrecognized framing"
        )
    return out


# ------------------------------------------------------ DV file layout


def checksum(data: bytes) -> int:
    return zlib.crc32(data) & 0xFFFFFFFF


def pack_dv_entry(positions: list[int]) -> tuple[bytes, int]:
    """One on-disk DV entry: ``<dataSize: 4B BE><data><crc32: 4B BE>``
    where data = magic + portable bitmaps. Returns (entry bytes,
    sizeInBytes for the descriptor — the data length)."""
    data = serialize_rbm_array(positions)
    return (
        struct.pack(">I", len(data)) + data + struct.pack(">I", checksum(data)),
        len(data),
    )


def unpack_dv_entry(buf: bytes, offset: int, size_in_bytes: int) -> list[int]:
    """Decode the entry at ``offset``; every frame field is verified
    against the descriptor before any bitmap decoding happens."""
    if len(buf) < offset + 4:
        raise ValueError("deletion vector: offset past end of file")
    (data_size,) = struct.unpack_from(">I", buf, offset)
    if data_size != size_in_bytes:
        raise ValueError(
            f"deletion vector: stored dataSize {data_size} != descriptor "
            f"sizeInBytes {size_in_bytes}"
        )
    start = offset + 4
    end = start + data_size
    if len(buf) < end + 4:
        raise ValueError("deletion vector: truncated entry")
    data = buf[start:end]
    (crc,) = struct.unpack_from(">I", buf, end)
    if crc != checksum(data):
        raise ValueError("deletion vector: checksum mismatch")
    return deserialize_rbm_array(data)


# --------------------------------------------------------- base85 ids

_B85 = (
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~"
)
_B85_INV = {c: i for i, c in enumerate(_B85)}


def b85_encode(data: bytes) -> str:
    """RFC 1924 base85 (the alphabet PROTOCOL.md specifies for DV
    UUIDs and inline DVs). Input length must be a multiple of 4."""
    if len(data) % 4:
        raise ValueError("base85: length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (x,) = struct.unpack_from(">I", data, i)
        chunk = []
        for _ in range(5):
            x, r = divmod(x, 85)
            chunk.append(_B85[r])
        out.extend(reversed(chunk))
    return "".join(out)


def b85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("base85: length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        x = 0
        for c in text[i : i + 5]:
            if c not in _B85_INV:
                raise ValueError(f"base85: bad character {c!r}")
            x = x * 85 + _B85_INV[c]
        if x > 0xFFFFFFFF:
            raise ValueError("base85: group overflows 32 bits")
        out += struct.pack(">I", x)
    return bytes(out)


# ----------------------------------------------- descriptor resolution


def validate_descriptor(table_path: str, dv: dict) -> None:
    """Frame-validate a deletionVector descriptor WITHOUT decoding
    its positions: storage type known, base85 uuid well-formed, the
    DV file present with the right version byte, the entry's stored
    dataSize matching the descriptor. O(1) IO per descriptor — cheap
    enough to run driver-side for every referenced file, so a
    malformed or vacuumed descriptor raises a loud ValueError at plan
    time instead of a wrapped executor exception mid-scan (the
    strict-decode-or-refuse contract; the O(positions) bitmap decode
    itself stays on the executors)."""
    import os
    import struct as _struct
    import uuid as _uuid

    st = dv.get("storageType")
    if st == "i":
        data = b85_decode(dv["pathOrInlineDv"])
        size = int(dv.get("sizeInBytes", len(data)))
        if size > len(data):
            raise ValueError(
                "deletion vector: inline sizeInBytes exceeds decoded "
                "payload"
            )
        return
    if st == "u":
        enc = dv["pathOrInlineDv"]
        if len(enc) < 20:
            raise ValueError(
                "deletion vector: pathOrInlineDv shorter than a base85 "
                "uuid"
            )
        u = _uuid.UUID(bytes=b85_decode(enc[-20:]))
        path = os.path.join(
            table_path, enc[:-20], f"deletion_vector_{u}.bin"
        )
    elif st == "p":
        path = dv["pathOrInlineDv"]
    else:
        raise NotImplementedError(
            f"deletion vector storageType {st!r} is not supported"
        )
    if not os.path.exists(path):
        raise ValueError(
            f"deletion vector file missing: {path} (vacuumed?)"
        )
    offset = int(dv["offset"])
    with open(path, "rb") as f:
        head = f.read(1)
        if not head or head[0] != 1:
            raise ValueError(
                "deletion vector: unknown on-disk format version "
                f"{head[0] if head else '<empty>'}"
            )
        f.seek(offset)
        frame = f.read(4)
    if len(frame) < 4:
        raise ValueError("deletion vector: offset past end of file")
    (data_size,) = _struct.unpack(">I", frame)
    if data_size != int(dv["sizeInBytes"]):
        raise ValueError(
            f"deletion vector: stored dataSize {data_size} != "
            f"descriptor sizeInBytes {dv['sizeInBytes']}"
        )


def read_descriptor(table_path: str, dv: dict) -> list[int]:
    """Deleted row positions for a deletionVector descriptor, given
    the table root ('u' paths resolve against it). Pure file IO —
    callable from Python DataSource workers, no Spark needed. Every
    frame field is validated; unknown storage types refuse."""
    import os
    import uuid as _uuid

    st = dv.get("storageType")
    if st == "i":
        data = b85_decode(dv["pathOrInlineDv"])
        size = int(dv.get("sizeInBytes", len(data)))
        if size > len(data):
            raise ValueError(
                "deletion vector: inline sizeInBytes exceeds decoded "
                "payload"
            )
        return deserialize_rbm_array(data[:size])
    if st == "u":
        enc = dv["pathOrInlineDv"]
        if len(enc) < 20:
            raise ValueError(
                "deletion vector: pathOrInlineDv shorter than a base85 "
                "uuid"
            )
        u = _uuid.UUID(bytes=b85_decode(enc[-20:]))
        path = os.path.join(
            table_path, enc[:-20], f"deletion_vector_{u}.bin"
        )
    elif st == "p":
        path = dv["pathOrInlineDv"]
    else:
        raise NotImplementedError(
            f"deletion vector storageType {st!r} is not supported"
        )
    if not os.path.exists(path):
        raise ValueError(
            f"deletion vector file missing: {path} (vacuumed?)"
        )
    with open(path, "rb") as f:
        buf = f.read()
    if not buf or buf[0] != 1:
        raise ValueError(
            "deletion vector: unknown on-disk format version "
            f"{buf[0] if buf else '<empty>'}"
        )
    return unpack_dv_entry(buf, int(dv["offset"]), int(dv["sizeInBytes"]))
