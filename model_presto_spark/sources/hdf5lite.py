"""Dependency-free HDF5 codec (numpy + struct only) for the subset
libhdf5 writes by default: superblock version 0, version-1 object
headers, version-1 group B-trees with SNOD symbol-table nodes, local
heaps, and datasets with CONTIGUOUS layout of fixed-point / IEEE
float datatypes.

The reference reads and appends flat numeric datasets with h5py
(presto-tolbi/presto/eval/cropharvest_extensions.py:340-375,489-499).
h5py is not in this container, so — same move as sources/tiff.py and
sources/netcdf3.py — this module implements the public HDF5 file
format directly and makes the S6 scan and S14 sink real, tested code.

Out of scope (detected and reported with a clear error, and routed to
the h5py import gate in sources/scientific.py): chunked/compressed
layouts, variable-length and compound datatypes, version-2+
superblocks and object headers, links other than hard links in the
root group's symbol table.
"""

from __future__ import annotations

import struct

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

# object-header message types (public HDF5 spec)
_MSG_DATASPACE = 0x0001
_MSG_DATATYPE = 0x0003
_MSG_FILL_OLD = 0x0004
_MSG_FILL = 0x0005
_MSG_LAYOUT = 0x0008
_MSG_CONTINUATION = 0x0010
_MSG_SYMBOL_TABLE = 0x0011


def is_hdf5(content: bytes) -> bool:
    return content[:8] == _SIG


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _u(buf: bytes, off: int, n: int) -> int:
    return int.from_bytes(buf[off : off + n], "little")


def _parse_messages(buf: bytes, oh_addr: int) -> dict[int, bytes]:
    """Version-1 object header -> {msg type: raw msg data} (first of
    each type wins; continuation blocks followed)."""
    if buf[oh_addr] != 1:
        raise ValueError(
            f"object header version {buf[oh_addr]} unsupported (need v1; "
            "v2 headers come from libver='latest' files)"
        )
    n_msgs = _u(buf, oh_addr + 2, 2)
    # header size counts message blocks only; first block starts after
    # the 12-byte prefix, padded to 8-byte alignment (i.e. at +16 from
    # some writers? no: v1 block starts right at +12, already aligned
    # because the prefix is 12 bytes and messages are 8-aligned from
    # there per spec implementations)
    blocks = [(oh_addr + 16, _u(buf, oh_addr + 8, 4))]
    # NOTE: the v1 prefix is 12 bytes + 4 pad bytes => first message at
    # +16 (matches libhdf5's H5O_SIZEOF_HDR for v1 with checksum-less
    # headers).
    out: dict[int, bytes] = {}
    seen = 0
    while blocks and seen < n_msgs:
        pos, remaining = blocks.pop(0)
        while remaining >= 8 and seen < n_msgs:
            mtype = _u(buf, pos, 2)
            msize = _u(buf, pos + 2, 2)
            body = buf[pos + 8 : pos + 8 + msize]
            pos += 8 + msize
            remaining -= 8 + msize
            seen += 1
            if mtype == _MSG_CONTINUATION:
                blocks.append((_u(body, 0, 8), _u(body, 8, 8)))
            elif mtype not in out:
                out[mtype] = body
    return out


def _parse_dataspace(body: bytes) -> list[int]:
    version = body[0]
    ndims = body[1]
    if version == 1:
        off = 8
    elif version == 2:
        off = 4
    else:
        raise ValueError(f"dataspace version {version} unsupported")
    return [_u(body, off + 8 * i, 8) for i in range(ndims)]


def _parse_datatype(body: bytes) -> np.dtype:
    cls = body[0] & 0x0F
    version = body[0] >> 4
    if version not in (1, 2, 3):
        raise ValueError(f"datatype version {version} unsupported")
    bits0 = body[1]
    size = _u(body, 4, 4)
    order = ">" if (bits0 & 1) else "<"
    if cls == 0:  # fixed-point
        signed = "i" if (bits0 & 0x08) else "u"
        return np.dtype(f"{order}{signed}{size}")
    if cls == 1:  # IEEE float
        return np.dtype(f"{order}f{size}")
    raise ValueError(
        f"datatype class {cls} unsupported (only fixed-point and float)"
    )


def _parse_layout(body: bytes) -> tuple[int, int]:
    version = body[0]
    if version == 3:
        layout_class = body[1]
        if layout_class != 1:
            raise ValueError(
                f"layout class {layout_class} unsupported (only contiguous; "
                "chunked/compact need h5py)"
            )
        return _u(body, 2, 8), _u(body, 10, 8)
    raise ValueError(f"data layout version {version} unsupported")


def _read_heap_name(buf: bytes, heap_addr: int, offset: int) -> str:
    if buf[heap_addr : heap_addr + 4] != b"HEAP":
        raise ValueError("bad local heap signature")
    data_addr = _u(buf, heap_addr + 24, 8)
    end = buf.index(b"\x00", data_addr + offset)
    return buf[data_addr + offset : end].decode("utf-8")


def _walk_btree(buf: bytes, btree_addr: int, heap_addr: int) -> list[tuple[str, int]]:
    """Group B-tree (v1) -> [(link name, object header address)]."""
    if buf[btree_addr : btree_addr + 4] != b"TREE":
        raise ValueError("bad group B-tree signature")
    level = buf[btree_addr + 5]
    n = _u(buf, btree_addr + 6, 2)
    entries: list[tuple[str, int]] = []
    # children at btree_addr + 24 + key0(8): child_i at +24 + 8 + i*16
    for i in range(n):
        child = _u(buf, btree_addr + 24 + 8 + i * 16, 8)
        if level > 0:
            entries.extend(_walk_btree(buf, child, heap_addr))
            continue
        if buf[child : child + 4] != b"SNOD":
            raise ValueError("bad symbol table node signature")
        n_sym = _u(buf, child + 6, 2)
        for s in range(n_sym):
            e = child + 8 + s * 40
            name_off = _u(buf, e, 8)
            oh_addr = _u(buf, e + 8, 8)
            entries.append((_read_heap_name(buf, heap_addr, name_off), oh_addr))
    return entries


def decode_hdf5(content: bytes) -> dict[str, np.ndarray]:
    """Parse an HDF5 file -> {dataset name: shaped ndarray} for every
    fixed-point/float contiguous dataset in the root group."""
    if not is_hdf5(content):
        raise ValueError("not an HDF5 file (bad signature)")
    sb_ver = content[8]
    if sb_ver != 0:
        raise ValueError(
            f"superblock version {sb_ver} unsupported (need v0; v2/v3 "
            "come from libver='latest' files)"
        )
    if content[13] != 8 or content[14] != 8:
        raise ValueError("only 8-byte offsets/lengths supported")
    # root group symbol table entry at offset 24 + 4*8 = 56
    root_oh = _u(content, 56 + 8, 8)
    msgs = _parse_messages(content, root_oh)
    if _MSG_SYMBOL_TABLE not in msgs:
        raise ValueError("root group has no symbol table (new-style group?)")
    st = msgs[_MSG_SYMBOL_TABLE]
    btree_addr, heap_addr = _u(st, 0, 8), _u(st, 8, 8)
    out: dict[str, np.ndarray] = {}
    for name, oh_addr in _walk_btree(content, btree_addr, heap_addr):
        dm = _parse_messages(content, oh_addr)
        if _MSG_DATATYPE not in dm or _MSG_LAYOUT not in dm:
            continue  # sub-group or non-dataset object
        dims = _parse_dataspace(dm[_MSG_DATASPACE]) if _MSG_DATASPACE in dm else []
        dt = _parse_datatype(dm[_MSG_DATATYPE])
        addr, size = _parse_layout(dm[_MSG_LAYOUT])
        count = int(np.prod(dims)) if dims else 1
        if addr == _UNDEF or size == 0:
            arr = np.zeros(dims, dtype=dt)  # never-written dataset
        else:
            arr = np.frombuffer(content, dtype=dt, count=count, offset=addr)
            arr = arr.reshape(dims) if dims else arr[0]
        out[name] = arr
    return out


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((-len(b)) % 8)


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _dt_msg(dt: np.dtype) -> bytes:
    kind, size = dt.kind, dt.itemsize
    if kind in ("i", "u"):
        bits0 = 0x08 if kind == "i" else 0x00
        props = struct.pack("<HH", 0, size * 8)  # bit offset, precision
        return struct.pack("<B3BI", 0x10, bits0, 0, 0, size) + props
    if kind == "f":
        # IEEE float, little-endian: sign bit at position size*8-1
        if size == 8:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        elif size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            raise ValueError(f"float{size * 8} unsupported")
        bitfield = (0x20, size * 8 - 1, 0)  # mantissa-normalized, sign loc
        return struct.pack("<B3BI", 0x11, *bitfield, size) + props
    raise ValueError(f"dtype {dt} unsupported (cast to int/float first)")


def _object_header(messages: list[bytes]) -> bytes:
    block = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(block)) + block


def encode_hdf5(variables: dict[str, "np.ndarray"]) -> bytes:
    """Encode arrays as an HDF5 file: one contiguous dataset per name
    in the root group. Little-endian int8..64/uint/float32/64; other
    dtypes are cast to float64. Layout: superblock, root object
    header, local heap, B-tree node, SNOD, dataset object headers,
    then raw data blocks."""
    arrays: dict[str, np.ndarray] = {}
    for name, a in sorted(variables.items()):  # SNOD entries must be sorted
        a = np.ascontiguousarray(a)
        if a.dtype.kind not in ("i", "u", "f") or a.dtype.itemsize > 8:
            a = a.astype("f8")
        if a.dtype.byteorder == ">":
            a = a.astype(a.dtype.newbyteorder("<"))
        arrays[name] = a

    # local heap data: offset 0 holds an 8-byte empty-name slot
    heap_data = bytearray(b"\x00" * 8)
    name_offsets = {}
    for name in arrays:
        name_offsets[name] = len(heap_data)
        heap_data += _pad8(name.encode("utf-8") + b"\x00")
    heap_data = bytes(heap_data)

    # fixed-size pieces first so addresses can be laid out in one pass
    sb_size = 24 + 4 * 8 + 40  # v0 superblock + root symtab entry = 96
    root_oh_placeholder = _object_header([_msg(_MSG_SYMBOL_TABLE, b"\x00" * 16)])
    heap_hdr_size = 32
    btree_size = 24 + 8 + 16  # 1 leaf child: key0, child0, key1
    snod_size = 8 + 40 * len(arrays)

    ds_headers: dict[str, bytes] = {}
    for name, a in arrays.items():
        dims = b"".join(struct.pack("<Q", d) for d in a.shape)
        space = struct.pack("<BBB5x", 1, a.ndim, 0) + dims
        layout = struct.pack("<BBQQ", 3, 1, 0, a.nbytes)  # addr patched later
        ds_headers[name] = _object_header(
            [
                _msg(_MSG_DATASPACE, space),
                _msg(_MSG_DATATYPE, _dt_msg(a.dtype)),
                _msg(_MSG_FILL, struct.pack("<BBBB", 2, 2, 0, 0)),
                _msg(_MSG_LAYOUT, layout),
            ]
        )

    a_root = sb_size
    a_heap_hdr = a_root + len(root_oh_placeholder)
    a_heap_data = a_heap_hdr + heap_hdr_size
    a_btree = a_heap_data + len(heap_data)
    a_snod = a_btree + btree_size
    a_ds = a_snod + snod_size
    ds_addrs, off = {}, a_ds
    for name, h in ds_headers.items():
        ds_addrs[name] = off
        off += len(h)
    data_addrs = {}
    for name, a in arrays.items():
        data_addrs[name] = off
        off += len(_pad8(a.tobytes()))
    eof = off

    # superblock v0
    out = bytearray()
    out += _SIG
    out += struct.pack("<BBBxB BBx HHI", 0, 0, 0, 0, 8, 8, 4, 16, 0)
    out += struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
    # root symbol table entry: name offset 0, header addr, cached stab
    out += struct.pack("<QQI4xQQ", 0, a_root, 1, a_btree, a_heap_hdr)
    assert len(out) == sb_size

    # root group object header (symbol table message with real addrs)
    out += _object_header(
        [_msg(_MSG_SYMBOL_TABLE, struct.pack("<QQ", a_btree, a_heap_hdr))]
    )
    # local heap: HEAP, v0, data size, free-list offset UNDEF (full)
    out += b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), _UNDEF, a_heap_data)
    out += heap_data
    # B-tree: one leaf pointing at the single SNOD
    names = list(arrays)
    out += b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, _UNDEF, _UNDEF)
    out += struct.pack("<QQQ", 0, a_snod, name_offsets[names[-1]] if names else 0)
    # SNOD with one entry per dataset (sorted)
    out += b"SNOD" + struct.pack("<BxH", 1, len(arrays)) + b"".join(
        struct.pack("<QQI4x16x", name_offsets[n], ds_addrs[n], 0) for n in names
    )
    # dataset object headers with patched layout addresses
    for name, h in ds_headers.items():
        patched = h.replace(
            struct.pack("<BBQQ", 3, 1, 0, arrays[name].nbytes),
            struct.pack("<BBQQ", 3, 1, data_addrs[name], arrays[name].nbytes),
            1,
        )
        out += patched
    for a in arrays.values():
        out += _pad8(a.tobytes())
    assert len(out) == eof
    return bytes(out)
