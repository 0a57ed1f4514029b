"""OpenVDB 4.0.2-compatible ``.vdb`` writer/reader (pure Python + numpy).

The reference writes one ``simulation/mygrids<i>.vdb`` per frame plus an
accumulated ``mygrids.vdb`` via ``openvdb::io::File::write``
(``fluid.cc:1364-1371,1503-1509``).  This module re-implements the 4.0.2
archive format from its specification in the vendored sources so the
framework's outputs stay consumable by the reference's tools
(``vdb_print`` / ``vdb_view`` / ``vdb_render``):

* archive layout:      ``openvdb/io/Archive.cc:939-982`` (writeHeader),
                       ``:1150-1330`` (write/writeGrid)
* grid descriptors:    ``openvdb/io/GridDescriptor.cc:81-98``
* strings/metadata:    ``openvdb/util/Name.h:57-63``, ``openvdb/MetaMap.cc:117``,
                       ``openvdb/Metadata.h:210-311``
* transform maps:      ``openvdb/math/Transform.cc`` + ``openvdb/math/Maps.h:834-850``
                       (ScaleMap family: 5 Vec3d fields)
* tree topology:       ``openvdb/tree/Tree.h:1297,1439``,
                       ``openvdb/tree/RootNode.h`` (writeTopology),
                       ``openvdb/tree/InternalNode.h`` (masks + tile values),
                       ``openvdb/tree/LeafNode.h`` (value mask + buffers)
* value compression:   ``openvdb/io/Compression.h:77-100,462-640``
                       (per-node metadata byte, active-mask compaction, zlib
                       framing from ``openvdb/io/Compression.cc`` zipToStream)

Tree type is the standard ``Tree4<T, 5, 4, 3>``: root -> 32^3 internal ->
16^3 internal -> 8^3 leaf (``openvdb/openvdb.h:49-82``).

Only features the reference apps produce are implemented: float/Vec3-less
dense grids, fully-voxelized boxes, NONE/ZIP/ACTIVE_MASK compression.
"""

from __future__ import annotations

import dataclasses
import struct
import uuid as _uuid
import zlib
from typing import List, Sequence

import numpy as np

OPENVDB_MAGIC = 0x56444220           # openvdb/version.h:83
FILE_VERSION = 224                   # openvdb/version.h:96
LIB_MAJOR, LIB_MINOR = 4, 0

COMPRESS_NONE = 0
COMPRESS_ZIP = 0x1
COMPRESS_ACTIVE_MASK = 0x2

# Per-node compression metadata byte (openvdb/io/Compression.h:93-100)
NO_MASK_OR_INACTIVE_VALS = 0
NO_MASK_AND_MINUS_BG = 1
NO_MASK_AND_ONE_INACTIVE_VAL = 2
MASK_AND_NO_INACTIVE_VALS = 3
MASK_AND_ONE_INACTIVE_VAL = 4
MASK_AND_TWO_INACTIVE_VALS = 5
NO_MASK_AND_ALL_VALS = 6

# Tree4<float,5,4,3> geometry
LEAF_LOG2 = 3          # 8^3 leaves
INT1_LOG2 = 4          # 16^3 internal (children = leaves), span 128
INT2_LOG2 = 5          # 32^3 internal (children = int1), span 4096
LEAF_DIM = 1 << LEAF_LOG2
INT1_SPAN = LEAF_DIM << INT1_LOG2       # 128
INT2_SPAN = INT1_SPAN << INT2_LOG2      # 4096


@dataclasses.dataclass
class VdbGrid:
    """A dense float grid with OpenVDB placement info."""

    values: np.ndarray                 # (nx, ny, nz) float32
    origin: tuple = (0, 0, 0)          # index-space coordinate of values[0,0,0]
    active: np.ndarray | None = None   # bool same shape; default: all active
    name: str = ""
    background: float = 0.0
    voxel_size: float = 1.0


def _write_string(buf: bytearray, s: str):
    data = s.encode()
    buf += struct.pack("<I", len(data)) + data


def _read_string(mv, off):
    (n,) = struct.unpack_from("<I", mv, off)
    off += 4
    return bytes(mv[off:off + n]).decode(), off + n


def _meta_entry(buf: bytearray, name: str, typename: str, payload: bytes):
    _write_string(buf, name)
    _write_string(buf, typename)
    buf += struct.pack("<i", len(payload)) + payload


def _grid_metadata(grid: VdbGrid, compression: int) -> bytearray:
    """Grid-level MetaMap, mirroring Archive::writeGrid's stats metadata
    (``Archive.cc:1305-1313``).  std::map order => alphabetical keys."""
    act = grid.active
    if act is None:
        act = np.ones(grid.values.shape, dtype=bool)
    nactive = int(act.sum())
    idx = np.argwhere(act)
    if len(idx):
        mn = idx.min(axis=0) + np.asarray(grid.origin)
        mx = idx.max(axis=0) + np.asarray(grid.origin)
    else:
        mn = np.zeros(3, np.int64)
        mx = -np.ones(3, np.int64)
    comp_name = {COMPRESS_NONE: "none", COMPRESS_ZIP: "zip",
                 COMPRESS_ACTIVE_MASK: "active values",
                 COMPRESS_ZIP | COMPRESS_ACTIVE_MASK: "zip + active values"}[compression]
    entries = bytearray()
    count = 4 + (1 if grid.name else 0)
    entries += struct.pack("<I", count)
    _meta_entry(entries, "file_bbox_max", "vec3i", struct.pack("<3i", *mx))
    _meta_entry(entries, "file_bbox_min", "vec3i", struct.pack("<3i", *mn))
    _meta_entry(entries, "file_compression", "string", comp_name.encode())
    _meta_entry(entries, "file_voxel_count", "int64", struct.pack("<q", nactive))
    if grid.name:
        _meta_entry(entries, "name", "string", grid.name.encode())
    return entries


def _transform_bytes(voxel_size: float) -> bytearray:
    """UniformScaleMap serialization (``math/Maps.h:843-850``): 5 Vec3d —
    scale, voxel size, 1/scale, 1/scale^2, 1/(2 scale)."""
    buf = bytearray()
    _write_string(buf, "UniformScaleMap")
    s = float(voxel_size)
    inv = 1.0 / s
    for v in (s, s, inv, inv * inv, inv / 2.0):
        buf += struct.pack("<3d", v, v, v)
    return buf


def _pack_mask(bits: np.ndarray) -> bytes:
    """NodeMask::save (``util/NodeMasks.h:565``): raw little-endian bit words.
    ``bits`` is a flat bool array in node-offset order (x-major, z-fastest)."""
    return np.packbits(bits, bitorder="little").tobytes()


def _unpack_mask(data: bytes, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")[:n].astype(bool)


def _write_data(buf: bytearray, arr: np.ndarray, compression: int):
    """``io::writeData`` + ``zipToStream`` framing (``Compression.cc``)."""
    raw = np.ascontiguousarray(arr, dtype="<f4").tobytes()
    if compression & COMPRESS_ZIP:
        z = zlib.compress(raw, 1)
        if len(z) < len(raw):
            buf += struct.pack("<q", len(z)) + z
        else:
            buf += struct.pack("<q", -len(raw)) + raw
    else:
        buf += raw


def _write_compressed_values(buf: bytearray, values: np.ndarray,
                             value_mask: np.ndarray, child_mask: np.ndarray,
                             background: float, compression: int):
    """``io::writeCompressedValues`` (``Compression.h:462-640``) for float32.

    values/value_mask/child_mask are flat, node-offset order.
    """
    if not (compression & COMPRESS_ACTIVE_MASK):
        buf.append(NO_MASK_AND_ALL_VALS)
        _write_data(buf, values, compression)
        return

    inactive = (~value_mask) & (~child_mask)
    ivals = values[inactive]
    uniq = np.unique(ivals.astype(np.float32))
    bg = np.float32(background)
    neg_bg = np.float32(-background)

    if len(uniq) == 0 or (len(uniq) == 1 and uniq[0] == bg):
        meta = NO_MASK_OR_INACTIVE_VALS
        extra = b""
        selection = None
    elif len(uniq) == 1 and uniq[0] == neg_bg:
        meta = NO_MASK_AND_MINUS_BG
        extra = b""
        selection = None
    elif len(uniq) == 1:
        meta = NO_MASK_AND_ONE_INACTIVE_VAL
        extra = struct.pack("<f", float(uniq[0]))
        selection = None
    elif len(uniq) == 2:
        # Selection mask marks entries equal to inactiveVal[1]; the writer
        # (Compression.h:540-583) swaps so that inactiveVal[1] is the
        # background whenever one of the two values is the background.
        v0, v1 = [np.float32(u) for u in uniq]
        if bg not in (v0, v1):
            meta = MASK_AND_TWO_INACTIVE_VALS
            extra = struct.pack("<ff", float(v0), float(v1))
            sel_val = v1
        else:
            nonbg = v0 if v1 == bg else v1
            if nonbg == neg_bg:
                meta = MASK_AND_NO_INACTIVE_VALS   # [-bg, +bg]
                extra = b""
            else:
                meta = MASK_AND_ONE_INACTIVE_VAL   # [nonbg, +bg]
                extra = struct.pack("<f", float(nonbg))
            sel_val = bg
        selection = inactive & (values.astype(np.float32) == sel_val)
    else:
        meta = NO_MASK_AND_ALL_VALS
        extra = b""
        selection = None

    buf.append(meta)
    buf += extra
    if meta == NO_MASK_AND_ALL_VALS:
        _write_data(buf, values, compression)
        return
    if selection is not None and meta in (MASK_AND_NO_INACTIVE_VALS,
                                          MASK_AND_ONE_INACTIVE_VAL,
                                          MASK_AND_TWO_INACTIVE_VALS):
        buf += _pack_mask(selection)
    _write_data(buf, values[value_mask], compression)


def _block_view(arr: np.ndarray, log2: int):
    """Reshape (a*D, b*D, c*D, ...) -> (a, b, c, D, D, D, ...) blocks."""
    d = 1 << log2
    s = arr.shape
    v = arr.reshape(s[0] // d, d, s[1] // d, d, s[2] // d, d, *s[3:])
    return np.moveaxis(v, (1, 3), (3, 4))  # -> (a,b,c,d,d,d,...)


class _TreeBuilder:
    """Decompose a dense box into Tree4<f32,5,4,3> nodes."""

    def __init__(self, grid: VdbGrid):
        vals = np.asarray(grid.values, np.float32)
        act = grid.active if grid.active is not None else np.ones(vals.shape, bool)
        o = np.asarray(grid.origin, np.int64)
        hi = o + vals.shape
        lo_a = (o // LEAF_DIM) * LEAF_DIM
        hi_a = ((hi + LEAF_DIM - 1) // LEAF_DIM) * LEAF_DIM
        shape = tuple(hi_a - lo_a)
        self.vals = np.full(shape, np.float32(grid.background), np.float32)
        self.act = np.zeros(shape, bool)
        s = tuple(slice(int(o[d] - lo_a[d]), int(o[d] - lo_a[d] + vals.shape[d]))
                  for d in range(3))
        self.vals[s] = vals
        self.act[s] = act
        self.lo = lo_a          # aligned origin of the padded box
        self.background = float(grid.background)

        # leaves: (nlx,nly,nlz) blocks of 8^3
        self.leaf_vals = _block_view(self.vals, LEAF_LOG2)
        self.leaf_act = _block_view(self.act, LEAF_LOG2)
        self.leaf_on = self.leaf_act.any(axis=(3, 4, 5))

    def leaf_origin(self, i, j, k):
        return self.lo + np.array([i, j, k]) * LEAF_DIM

    def root_children(self):
        """Group active leaves by INT2 (4096^3) node origin; return sorted
        (lexicographic Coord order = std::map order, ``math/Coord.h``)."""
        idx = np.argwhere(self.leaf_on)
        groups = {}
        for (i, j, k) in idx:
            org = tuple(((self.leaf_origin(i, j, k)) // INT2_SPAN) * INT2_SPAN)
            groups.setdefault(org, []).append((int(i), int(j), int(k)))
        return sorted(groups.items())


def _node_offsets(local: np.ndarray, log2: int) -> np.ndarray:
    """VDB node offset = (x << 2L) + (y << L) + z  (x-major, z-fastest)."""
    return (local[..., 0] << (2 * log2)) + (local[..., 1] << log2) + local[..., 2]


def grid_to_bytes(grid: VdbGrid, compression: int) -> tuple:
    """Serialize one grid: returns (topology+buffers bytes are merged by the
    caller) -> (meta, transform, topology, buffers)."""
    tb = _TreeBuilder(grid)
    bg = np.float32(grid.background)

    topo = bytearray()
    topo += struct.pack("<i", 1)                       # TreeBase bufferCount
    topo += struct.pack("<f", bg)                      # root background

    root = tb.root_children()
    topo += struct.pack("<II", 0, len(root))           # numTiles, numChildren

    buffers = bytearray()
    for org2, leaves in root:
        topo += struct.pack("<3i", *org2)
        # ---- InternalNode<.,5> (32^3 children of span 128) ----
        leaves = np.asarray(leaves)
        lorg = tb.lo + leaves * LEAF_DIM               # leaf origins (L,3)
        rel2 = (lorg - org2) // INT1_SPAN              # int1 index within int2
        off2 = _node_offsets(rel2, INT2_LOG2)
        child2_mask = np.zeros(1 << (3 * INT2_LOG2), bool)
        child2_mask[off2] = True
        topo += _pack_mask(child2_mask)                        # child mask
        topo += _pack_mask(np.zeros_like(child2_mask))         # value mask
        _write_compressed_values(
            topo, np.full(child2_mask.size, bg, np.float32),
            np.zeros_like(child2_mask), child2_mask, grid.background, compression)

        # ---- children in offset order ----
        order = np.argsort(off2, kind="stable")
        int1_groups = {}
        for li in order:
            o1 = tuple((lorg[li] // INT1_SPAN) * INT1_SPAN)
            int1_groups.setdefault(o1, []).append(leaves[li])
        for o1, lvs in int1_groups.items():
            lvs = np.asarray(lvs)
            lorg1 = tb.lo + lvs * LEAF_DIM
            rel1 = (lorg1 - o1) // LEAF_DIM
            off1 = _node_offsets(rel1, INT1_LOG2)
            child1_mask = np.zeros(1 << (3 * INT1_LOG2), bool)
            child1_mask[off1] = True
            topo += _pack_mask(child1_mask)
            topo += _pack_mask(np.zeros_like(child1_mask))
            _write_compressed_values(
                topo, np.full(child1_mask.size, bg, np.float32),
                np.zeros_like(child1_mask), child1_mask, grid.background,
                compression)
            for li in np.argsort(off1, kind="stable"):
                i, j, k = lvs[li]
                lmask = tb.leaf_act[i, j, k].reshape(-1)
                topo += _pack_mask(lmask)              # leaf topology: value mask
                lvals = tb.leaf_vals[i, j, k].reshape(-1)
                buffers += _pack_mask(lmask)           # leaf buffers: mask again
                _write_compressed_values(buffers, lvals, lmask,
                                         np.zeros_like(lmask),
                                         grid.background, compression)
    return topo, buffers


def write_vdb(path: str, grids: Sequence[VdbGrid],
              compression: int = COMPRESS_ZIP | COMPRESS_ACTIVE_MASK):
    """Write an OpenVDB 4.0.2 archive (``Archive::write``, ``Archive.cc:1150``)."""
    buf = bytearray()
    buf += struct.pack("<q", OPENVDB_MAGIC)
    buf += struct.pack("<I", FILE_VERSION)
    buf += struct.pack("<II", LIB_MAJOR, LIB_MINOR)
    buf.append(1)                                      # hasGridOffsets (seekable)
    buf += str(_uuid.uuid4()).encode()                 # 36-char ASCII uuid
    buf += struct.pack("<I", 0)                        # file-level MetaMap: empty
    buf += struct.pack("<i", len(grids))

    names = {}
    for g in grids:
        # unique names (Archive.cc:1196-1207): empty or repeated names get
        # an appended "[N]" suffix via GridDescriptor::addSuffix.
        base = g.name
        n = names.get(base, 0)
        names[base] = n + 1
        unique = base if (base and n == 0) else f"{base}[{n}]"

        _write_string(buf, unique)
        _write_string(buf, "Tree_float_5_4_3")
        _write_string(buf, "")                         # instance parent
        offset_pos = len(buf)
        buf += struct.pack("<3q", 0, 0, 0)             # patched below
        grid_pos = len(buf)
        buf += struct.pack("<I", compression)
        buf += _grid_metadata(g, compression)
        buf += _transform_bytes(g.voxel_size)
        topo, leaf_buffers = grid_to_bytes(g, compression)
        buf += topo
        block_pos = len(buf)
        buf += leaf_buffers
        end_pos = len(buf)
        struct.pack_into("<3q", buf, offset_pos, grid_pos, block_pos, end_pos)

    with open(path, "wb") as f:
        f.write(bytes(buf))


# --------------------------------------------------------------------------
# Reader (round-trip validation + `print` CLI). Handles the subset we write
# plus uncompressed/zip/active-mask files from the reference tools.
# --------------------------------------------------------------------------

def _read_data(mv, off, count, compression):
    if compression & COMPRESS_ZIP:
        (nz,) = struct.unpack_from("<q", mv, off)
        off += 8
        if nz <= 0:
            raw = bytes(mv[off:off - nz])
            off += -nz
        else:
            raw = zlib.decompress(bytes(mv[off:off + nz]))
            off += nz
        return np.frombuffer(raw, "<f4", count=count), off
    vals = np.frombuffer(mv, "<f4", count=count, offset=off)
    return vals, off + 4 * count


def _read_compressed_values(mv, off, count, value_mask, background, compression):
    """Mirror of the reference read path (``Compression.h`` read loop):
    inactive value = selectionMask ? inactiveVal1 : inactiveVal0, with
    inactiveVal0 defaulting to -background for metadata != 0 and
    inactiveVal1 defaulting to +background."""
    meta = mv[off]; off += 1
    if meta == NO_MASK_AND_ALL_VALS:
        vals, off = _read_data(mv, off, count, compression)
        return vals.copy(), off
    inactive_val1 = np.float32(background)
    inactive_val0 = np.float32(background if meta == NO_MASK_OR_INACTIVE_VALS
                               else -background)
    if meta in (NO_MASK_AND_ONE_INACTIVE_VAL, MASK_AND_ONE_INACTIVE_VAL,
                MASK_AND_TWO_INACTIVE_VALS):
        (v0,) = struct.unpack_from("<f", mv, off); off += 4
        inactive_val0 = np.float32(v0)
        if meta == MASK_AND_TWO_INACTIVE_VALS:
            (v1,) = struct.unpack_from("<f", mv, off); off += 4
            inactive_val1 = np.float32(v1)
    sel = None
    if meta in (MASK_AND_NO_INACTIVE_VALS, MASK_AND_ONE_INACTIVE_VAL,
                MASK_AND_TWO_INACTIVE_VALS):
        nbytes = (count + 7) // 8
        sel = _unpack_mask(bytes(mv[off:off + nbytes]), count)
        off += nbytes
    n_active = int(value_mask.sum())
    vals, off = _read_data(mv, off, n_active, compression)
    values = np.full(count, inactive_val0, np.float32)
    if sel is not None:
        values[sel] = inactive_val1
    values[value_mask] = vals
    return values, off


def read_vdb(path: str) -> List[VdbGrid]:
    data = open(path, "rb").read()
    mv = memoryview(data)
    off = 0
    (magic,) = struct.unpack_from("<q", mv, off); off += 8
    assert magic == OPENVDB_MAGIC, f"bad magic {magic:#x}"
    (version,) = struct.unpack_from("<I", mv, off); off += 4
    assert version >= 222, f"unsupported file version {version}"
    off += 8                                          # library version
    off += 1                                          # hasGridOffsets
    off += 36                                         # ascii uuid
    (nmeta,) = struct.unpack_from("<I", mv, off); off += 4
    for _ in range(nmeta):
        _, off = _read_string(mv, off)
        _, off = _read_string(mv, off)
        (sz,) = struct.unpack_from("<i", mv, off); off += 4 + sz
    (ngrids,) = struct.unpack_from("<i", mv, off); off += 4

    out = []
    for _ in range(ngrids):
        name, off = _read_string(mv, off)
        gtype, off = _read_string(mv, off)
        assert gtype == "Tree_float_5_4_3", f"unsupported grid type {gtype}"
        parent, off = _read_string(mv, off)
        grid_pos, block_pos, end_pos = struct.unpack_from("<3q", mv, off)
        off += 24
        (compression,) = struct.unpack_from("<I", mv, off); off += 4
        (nmeta,) = struct.unpack_from("<I", mv, off); off += 4
        meta = {}
        for _ in range(nmeta):
            mname, off = _read_string(mv, off)
            mtype, off = _read_string(mv, off)
            (sz,) = struct.unpack_from("<i", mv, off); off += 4
            meta[mname] = (mtype, bytes(mv[off:off + sz])); off += sz
        map_type, off = _read_string(mv, off)
        assert map_type in ("UniformScaleMap", "ScaleMap"), map_type
        scale = struct.unpack_from("<3d", mv, off)
        off += 5 * 24
        off += 4                                      # bufferCount
        (background,) = struct.unpack_from("<f", mv, off); off += 4
        ntiles, nchildren = struct.unpack_from("<II", mv, off); off += 8
        assert ntiles == 0, "root tiles not supported"

        leaves = {}                                   # origin -> (mask, placeholder)
        int2n = 1 << (3 * INT2_LOG2)
        int1n = 1 << (3 * INT1_LOG2)
        leafn = 1 << (3 * LEAF_LOG2)
        leaf_order = []
        for _ in range(nchildren):
            org2 = np.asarray(struct.unpack_from("<3i", mv, off)); off += 12
            cm2 = _unpack_mask(bytes(mv[off:off + int2n // 8]), int2n); off += int2n // 8
            vm2 = _unpack_mask(bytes(mv[off:off + int2n // 8]), int2n); off += int2n // 8
            _, off = _read_compressed_values(mv, off, int2n, vm2, background,
                                             compression)
            for o2 in np.flatnonzero(cm2):
                x = (o2 >> (2 * INT2_LOG2)) & 31
                y = (o2 >> INT2_LOG2) & 31
                z = o2 & 31
                org1 = org2 + np.asarray([x, y, z]) * INT1_SPAN
                cm1 = _unpack_mask(bytes(mv[off:off + int1n // 8]), int1n)
                off += int1n // 8
                vm1 = _unpack_mask(bytes(mv[off:off + int1n // 8]), int1n)
                off += int1n // 8
                _, off = _read_compressed_values(mv, off, int1n, vm1, background,
                                                 compression)
                for o1 in np.flatnonzero(cm1):
                    lx = (o1 >> (2 * INT1_LOG2)) & 15
                    ly = (o1 >> INT1_LOG2) & 15
                    lz = o1 & 15
                    lorg = org1 + np.asarray([lx, ly, lz]) * LEAF_DIM
                    lm = _unpack_mask(bytes(mv[off:off + leafn // 8]), leafn)
                    off += leafn // 8
                    leaves[tuple(lorg)] = lm
                    leaf_order.append(tuple(lorg))

        # leaf buffers, same order
        leaf_vals = {}
        for lorg in leaf_order:
            lm = _unpack_mask(bytes(mv[off:off + leafn // 8]), leafn)
            off += leafn // 8
            vals, off = _read_compressed_values(mv, off, leafn, lm, background,
                                                compression)
            leaf_vals[lorg] = (vals, lm)

        if leaf_order:
            orgs = np.asarray(leaf_order)
            lo = orgs.min(axis=0)
            hi = orgs.max(axis=0) + LEAF_DIM
            shape = tuple(hi - lo)
            dense = np.full(shape, np.float32(background), np.float32)
            active = np.zeros(shape, bool)
            for lorg in leaf_order:
                vals, lm = leaf_vals[lorg]
                s = tuple(slice(int(lorg[d] - lo[d]), int(lorg[d] - lo[d] + LEAF_DIM))
                          for d in range(3))
                dense[s] = vals.reshape(LEAF_DIM, LEAF_DIM, LEAF_DIM)
                active[s] = lm.reshape(LEAF_DIM, LEAF_DIM, LEAF_DIM)
        else:
            dense = np.zeros((0, 0, 0), np.float32)
            active = np.zeros((0, 0, 0), bool)
            lo = np.zeros(3, np.int64)

        out.append(VdbGrid(values=dense, origin=tuple(int(x) for x in lo),
                           active=active, name=name, background=background,
                           voxel_size=float(scale[0])))
        if end_pos > 0:
            off = end_pos
    return out
