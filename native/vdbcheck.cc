// vdbcheck: standalone OpenVDB 4.0.2 archive PARSER for cross-validation.
//
// Written from the format specification in the reference sources ONLY —
// shares no code with the framework's writer (fluidsim_tpu/io/vdb.py) or
// its C++ encoder (native/vdbio.cc); it exists precisely to be a third,
// independent implementation so format correctness does not rest on a
// writer validating itself.  Spec citations:
//   header:           openvdb/io/Archive.cc:939-982 (writeHeader): int64
//                     magic, uint32 file version, uint32 lib major/minor,
//                     bool hasGridOffsets, 36-char ASCII uuid, file MetaMap,
//                     int32 grid count
//   grid descriptor:  openvdb/io/GridDescriptor.cc:81-98: unique name,
//                     grid type (+ "_HalfFloat" suffix, :50,86), instance
//                     parent, 3x int64 offsets (grid/blocks/end)
//   value types:      openvdb/openvdb.h:49-82 registered grid families,
//                     type names from openvdb/Types.h:326-344
//   metadata:         openvdb/MetaMap.cc (uint32 count; per entry: name,
//                     type name, int32 size, payload)
//   transform:        openvdb/math/Transform.cc + Maps.h:834-850
//                     (map type name + map-specific doubles)
//   tree:             openvdb/tree/Tree.h (int32 bufferCount, background
//                     value, uint32 numTiles, uint32 numChildren), then per
//                     root child: Coord origin + InternalNode<5> topology,
//                     recursively InternalNode<4>, LeafNode<3> (value mask;
//                     buffers in a second pass at the blocks offset)
//   bool leaves:      openvdb/tree/LeafNodeBool.h writeBuffers — value
//                     mask, leaf origin Coord, raw value bitmask (never
//                     zip/mask-compacted)
//   node masks:       openvdb/util/NodeMasks.h:565 (save = raw bit words,
//                     little-endian)
//   compression:      openvdb/io/Compression.h:77-100 (flags; per-node
//                     metadata byte; inactive values stored full
//                     ValueT-width even under toHalf, :570-588),
//                     Compression.cc zipToStream framing (int64 byte
//                     count; negative = stored uncompressed)
//   instancing:       openvdb/io/Archive.cc:1329-1367 writeGridInstance —
//                     descriptor + compression + metadata + transform,
//                     NO tree; parent named in the descriptor
//
// Usage: vdbcheck file.vdb
// Prints one JSON line per grid: {"name", "type", "half", "leaf_count",
// "active_voxels", "active_sum", "bbox": [...], "file_voxel_count"} (plus
// "instance_parent" for instances) and a final {"ok": true, "grids": N}
// line; exits non-zero on any parse error.
//
// Build: g++ -O2 -std=c++17 -o vdbcheck vdbcheck.cc -lz

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct Cursor {
  const uint8_t* p;
  size_t n;
  size_t off = 0;

  void need(size_t k) const {
    if (off + k > n) throw std::runtime_error("truncated archive");
  }
  template <typename T>
  T scalar() {
    need(sizeof(T));
    T v;
    std::memcpy(&v, p + off, sizeof(T));
    off += sizeof(T);
    return v;
  }
  std::string str() {
    uint32_t len = scalar<uint32_t>();
    need(len);
    std::string s(reinterpret_cast<const char*>(p + off), len);
    off += len;
    return s;
  }
  void skip(size_t k) {
    need(k);
    off += k;
  }
  const uint8_t* raw(size_t k) {
    need(k);
    const uint8_t* q = p + off;
    off += k;
    return q;
  }
};

constexpr int64_t kMagic = 0x56444220;  // openvdb/version.h:83
constexpr uint32_t kCompressZip = 0x1;  // io/Compression.h:77-81
constexpr uint32_t kCompressActiveMask = 0x2;
constexpr uint32_t kCompressBlosc = 0x4;

// Per-node compression metadata byte (io/Compression.h:93-100)
enum {
  kNoMaskOrInactiveVals = 0,
  kNoMaskAndMinusBg = 1,
  kNoMaskAndOneInactiveVal = 2,
  kMaskAndNoInactiveVals = 3,
  kMaskAndOneInactiveVal = 4,
  kMaskAndTwoInactiveVals = 5,
  kNoMaskAndAllVals = 6,
};

// Value-type descriptor (openvdb/openvdb.h:49-82; Types.h:326-344 names).
enum class Kind { F32, F64, I32, I64, Bool };

struct VType {
  int comps;       // components per voxel
  int bytes;       // bytes per component (full-width ValueT)
  Kind kind;
  bool real() const { return kind == Kind::F32 || kind == Kind::F64; }
};

VType vtypeOf(const std::string& base) {
  static const std::map<std::string, VType> kTypes = {
      {"float", {1, 4, Kind::F32}},  {"double", {1, 8, Kind::F64}},
      {"int32", {1, 4, Kind::I32}},  {"int64", {1, 8, Kind::I64}},
      {"bool", {1, 1, Kind::Bool}},  {"vec3s", {3, 4, Kind::F32}},
      {"vec3d", {3, 8, Kind::F64}},  {"vec3i", {3, 4, Kind::I32}},
  };
  const std::string prefix = "Tree_", suffix = "_5_4_3";
  if (base.size() <= prefix.size() + suffix.size() ||
      base.compare(0, prefix.size(), prefix) != 0 ||
      base.compare(base.size() - suffix.size(), suffix.size(), suffix) != 0)
    throw std::runtime_error("unknown grid type " + base);
  std::string vt = base.substr(prefix.size(),
                               base.size() - prefix.size() - suffix.size());
  auto it = kTypes.find(vt);
  if (it == kTypes.end()) throw std::runtime_error("unknown value type " + vt);
  return it->second;
}

struct Meta {
  std::string name, type;
  std::vector<uint8_t> payload;
};

std::vector<Meta> readMetaMap(Cursor& c) {
  uint32_t count = c.scalar<uint32_t>();
  std::vector<Meta> out;
  out.reserve(count);
  for (uint32_t i = 0; i < count; ++i) {
    Meta m;
    m.name = c.str();
    m.type = c.str();
    int32_t sz = c.scalar<int32_t>();
    if (sz < 0) throw std::runtime_error("negative metadata size");
    const uint8_t* q = c.raw(size_t(sz));
    m.payload.assign(q, q + sz);
    out.push_back(std::move(m));
  }
  return out;
}

// LZ4 raw-block decode (the published block format: token, literals,
// little-endian 2-byte offset, match copy; last sequence literals-only).
std::vector<uint8_t> lz4Decompress(const uint8_t* src, size_t n,
                                   size_t dst_size) {
  std::vector<uint8_t> dst;
  dst.reserve(dst_size);
  size_t i = 0;
  while (i < n) {
    uint8_t token = src[i++];
    size_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do { b = src[i++]; lit += b; } while (b == 255 && i < n);
    }
    if (i + lit > n) throw std::runtime_error("lz4: literal overrun");
    dst.insert(dst.end(), src + i, src + i + lit);
    i += lit;
    if (i >= n) break;
    size_t offset = src[i] | (size_t(src[i + 1]) << 8);
    i += 2;
    size_t mlen = (token & 15) + 4;
    if ((token & 15) == 15) {
      uint8_t b;
      do { b = src[i++]; mlen += b; } while (b == 255 && i < n);
    }
    if (offset == 0 || offset > dst.size())
      throw std::runtime_error("lz4: bad match offset");
    size_t start = dst.size() - offset;
    for (size_t k = 0; k < mlen; ++k) dst.push_back(dst[start + k]);
  }
  if (dst.size() != dst_size) throw std::runtime_error("lz4: size mismatch");
  return dst;
}

// Blosc-1 chunk decode: 16-byte header (version, versionlz, flags,
// typesize, nbytes, blocksize, cbytes LE), optional memcpy mode, per-block
// uint32 start offsets, per-block split streams [int32 csize][bytes]
// (csize == stream size -> stored raw), byte unshuffle per block.  The
// reference writes lz4 + byte shuffle + one block (Compression.cc:157-197);
// zlib-codec chunks are also handled, other codecs are named in the error.
std::vector<uint8_t> bloscDecompress(const uint8_t* p, size_t n) {
  if (n < 16) throw std::runtime_error("blosc: truncated header");
  uint8_t flags = p[2], typesize = p[3];
  uint32_t nbytes, blocksize, cbytes;
  std::memcpy(&nbytes, p + 4, 4);
  std::memcpy(&blocksize, p + 8, 4);
  std::memcpy(&cbytes, p + 12, 4);
  if (cbytes > n) throw std::runtime_error("blosc: truncated chunk");
  if (flags & 0x2) {  // memcpyed
    if (16 + size_t(nbytes) > n) throw std::runtime_error("blosc: short");
    return std::vector<uint8_t>(p + 16, p + 16 + nbytes);
  }
  if (flags & 0x4) throw std::runtime_error("blosc: bit-shuffle unsupported");
  int codec = (flags >> 5) & 7;
  if (codec != 1 && codec != 3) {
    static const char* names[] = {"blosclz", "lz4", "snappy", "zlib", "zstd"};
    throw std::runtime_error(std::string("blosc: codec '") +
                             (codec < 5 ? names[codec] : "?") +
                             "' unsupported (lz4/zlib only)");
  }
  size_t nblocks = blocksize ? (nbytes + blocksize - 1) / blocksize : 0;
  std::vector<uint32_t> bstarts(nblocks);
  std::memcpy(bstarts.data(), p + 16, 4 * nblocks);
  std::vector<uint8_t> out;
  out.reserve(nbytes);
  for (size_t b = 0; b < nblocks; ++b) {
    size_t bsize = std::min<size_t>(blocksize, nbytes - b * blocksize);
    bool leftover = bsize != blocksize;
    size_t nsp = 1;
    if (!(flags & 0x10) && !leftover && typesize >= 2 && typesize <= 16 &&
        bsize % typesize == 0 && bsize / typesize >= 128)
      nsp = typesize;
    size_t neblock = bsize / nsp;
    size_t off = bstarts[b];
    std::vector<uint8_t> block;
    block.reserve(bsize);
    for (size_t s = 0; s < nsp; ++s) {
      int32_t csize;
      if (off + 4 > n) throw std::runtime_error("blosc: stream overrun");
      std::memcpy(&csize, p + off, 4);
      off += 4;
      if (csize < 0 || off + size_t(csize) > n)
        throw std::runtime_error("blosc: stream overrun");
      if (size_t(csize) == neblock) {
        block.insert(block.end(), p + off, p + off + neblock);
      } else if (codec == 1) {
        auto part = lz4Decompress(p + off, size_t(csize), neblock);
        block.insert(block.end(), part.begin(), part.end());
      } else {
        std::vector<uint8_t> part(neblock);
        uLongf dst = neblock;
        if (uncompress(part.data(), &dst, p + off, uLong(csize)) != Z_OK ||
            dst != neblock)
          throw std::runtime_error("blosc: zlib stream failed");
        block.insert(block.end(), part.begin(), part.end());
      }
      off += size_t(csize);
    }
    if (flags & 0x1) {  // byte unshuffle: lanes-major -> elements-major
      size_t full = bsize - bsize % typesize, nel = full / typesize;
      std::vector<uint8_t> un(bsize);
      for (size_t e = 0; e < nel; ++e)
        for (size_t t = 0; t < typesize; ++t)
          un[e * typesize + t] = block[t * nel + e];
      for (size_t r = full; r < bsize; ++r) un[r] = block[r];
      block.swap(un);
    }
    out.insert(out.end(), block.begin(), block.end());
  }
  if (out.size() != nbytes) throw std::runtime_error("blosc: size mismatch");
  return out;
}

// io/Compression.cc unzipFromStream: int64 count; >0 zipped, <=0 stored raw.
// readData checks BLOSC before ZIP (Compression.h:179-193); both share the
// int64-size framing with negative = stored uncompressed.
std::vector<uint8_t> readDataBytes(Cursor& c, uint32_t flags,
                                   size_t expect_bytes) {
  if (flags & kCompressBlosc) {
    int64_t nz = c.scalar<int64_t>();
    if (nz <= 0) {
      size_t raw = size_t(-nz);
      if (raw != expect_bytes) throw std::runtime_error("raw size mismatch");
      const uint8_t* q = c.raw(raw);
      return std::vector<uint8_t>(q, q + raw);
    }
    const uint8_t* q = c.raw(size_t(nz));
    auto out = bloscDecompress(q, size_t(nz));
    if (out.size() != expect_bytes)
      throw std::runtime_error("blosc payload size mismatch");
    return out;
  }
  if (!(flags & kCompressZip)) {
    const uint8_t* q = c.raw(expect_bytes);
    return std::vector<uint8_t>(q, q + expect_bytes);
  }
  int64_t nz = c.scalar<int64_t>();
  if (nz <= 0) {
    size_t raw = size_t(-nz);
    if (raw != expect_bytes) throw std::runtime_error("raw size mismatch");
    const uint8_t* q = c.raw(raw);
    return std::vector<uint8_t>(q, q + raw);
  }
  const uint8_t* q = c.raw(size_t(nz));
  std::vector<uint8_t> out(expect_bytes);
  uLongf dst = expect_bytes;
  int rc = uncompress(out.data(), &dst, q, uLong(nz));
  if (rc != Z_OK || dst != expect_bytes)
    throw std::runtime_error("zlib inflate failed");
  return out;
}

inline float halfToFloat(uint16_t h) {
  uint32_t sign = uint32_t(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t man = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int e = -1;
      do {
        ++e;
        man <<= 1;
      } while (!(man & 0x400));
      bits = sign | uint32_t(127 - 15 - e) << 23 | (man & 0x3ff) << 13;
    }
  } else if (exp == 31) {
    bits = sign | 0x7f800000u | man << 13;
  } else {
    bits = sign | (exp - 15 + 127) << 23 | man << 13;
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

struct ValueStats {
  double sum = 0.0;
  size_t count = 0;
};

// Decode one component at q (stored width: 2 bytes if half, else full
// ValueT width) into a double for the checksum.
double decodeComp(const uint8_t* q, const VType& vt, bool half) {
  if (half) {
    uint16_t hv;
    std::memcpy(&hv, q, 2);
    return double(halfToFloat(hv));
  }
  switch (vt.kind) {
    case Kind::F32: {
      float v;
      std::memcpy(&v, q, 4);
      return double(v);
    }
    case Kind::F64: {
      double v;
      std::memcpy(&v, q, 8);
      return v;
    }
    case Kind::I32: {
      int32_t v;
      std::memcpy(&v, q, 4);
      return double(v);
    }
    case Kind::I64: {
      int64_t v;
      std::memcpy(&v, q, 8);
      return double(v);
    }
    case Kind::Bool:
      return double(*q != 0);
  }
  return 0.0;
}

// io::readCompressedValues (Compression.h:462-640): per-node metadata byte,
// optional inactive values + selection mask, then the (possibly compacted)
// value payload.  We only need to WALK it (and fold active leaf values into
// the checksum), not reconstruct inactive values.
void readCompressedValues(Cursor& c, size_t count, size_t activeCount,
                          const uint8_t* valueMask, uint32_t flags,
                          const VType& vt, bool half, ValueStats* stats) {
  size_t csz = half ? 2 : size_t(vt.bytes);      // stored component bytes
  size_t vsz = csz * size_t(vt.comps);
  auto fold = [&](const std::vector<uint8_t>& data, size_t i) {
    for (int k = 0; k < vt.comps; ++k)
      stats->sum += decodeComp(data.data() + i * vsz + size_t(k) * csz, vt,
                               half);
    stats->count += 1;
  };
  if (!(flags & kCompressActiveMask)) {
    // no ACTIVE_MASK: one metadata byte then ALL values
    uint8_t meta = c.scalar<uint8_t>();
    if (meta != kNoMaskAndAllVals)
      throw std::runtime_error("unexpected metadata without ACTIVE_MASK");
    std::vector<uint8_t> data = readDataBytes(c, flags, count * vsz);
    if (stats && valueMask) {
      for (size_t i = 0; i < count; ++i)
        if (valueMask[i >> 3] >> (i & 7) & 1) fold(data, i);
    }
    return;
  }
  uint8_t meta = c.scalar<uint8_t>();
  // inactive values are stored full-ValueT-width even under toHalf
  // (Compression.h:570-588 truncateRealToHalf keeps sizeof(ValueT))
  size_t inactSz = size_t(vt.bytes) * size_t(vt.comps);
  switch (meta) {
    case kNoMaskOrInactiveVals:
    case kNoMaskAndMinusBg:
    case kMaskAndNoInactiveVals:
      break;
    case kNoMaskAndOneInactiveVal:
    case kMaskAndOneInactiveVal:
      c.skip(inactSz);
      break;
    case kMaskAndTwoInactiveVals:
      c.skip(2 * inactSz);
      break;
    case kNoMaskAndAllVals:
      break;
    default:
      throw std::runtime_error("bad node compression metadata byte");
  }
  if (meta == kMaskAndNoInactiveVals || meta == kMaskAndOneInactiveVal ||
      meta == kMaskAndTwoInactiveVals) {
    c.skip((count + 7) / 8);  // selection mask
  }
  size_t stored = (meta == kNoMaskAndAllVals) ? count : activeCount;
  std::vector<uint8_t> data = readDataBytes(c, flags, stored * vsz);
  if (stats && valueMask) {
    if (meta == kNoMaskAndAllVals) {
      for (size_t i = 0; i < count; ++i)
        if (valueMask[i >> 3] >> (i & 7) & 1) fold(data, i);
    } else {
      // compacted payload: stored values ARE the active ones, in order
      for (size_t i = 0; i < stored; ++i) fold(data, i);
    }
  }
}

size_t popcount(const uint8_t* mask, size_t bits) {
  size_t c = 0;
  for (size_t i = 0; i < (bits + 7) / 8; ++i)
    c += size_t(__builtin_popcount(mask[i]));
  return c;
}

struct GridReport {
  std::string name, type, parent;
  bool half = false;
  size_t leafCount = 0;
  size_t activeVoxels = 0;
  double activeSum = 0.0;
  int64_t fileVoxelCount = -1;
  int32_t bbox[6] = {0, 0, 0, -1, -1, -1};
};

// Tree4<T,5,4,3>: root -> InternalNode 32^3 -> InternalNode 16^3 -> Leaf 8^3
constexpr size_t kN2 = size_t(1) << 15;  // 32^3 offsets
constexpr size_t kN1 = size_t(1) << 12;  // 16^3
constexpr size_t kNL = size_t(1) << 9;   // 8^3

void parseGrid(Cursor& c, uint32_t flags, const VType& vt, bool half,
               GridReport* rep, std::vector<std::vector<uint8_t>>* leafMasks) {
  c.scalar<int32_t>();  // TreeBase bufferCount
  c.skip(size_t(vt.bytes) * size_t(vt.comps));  // root background (ValueT)
  uint32_t numTiles = c.scalar<uint32_t>();
  uint32_t numChildren = c.scalar<uint32_t>();
  for (uint32_t t = 0; t < numTiles; ++t) {  // root tiles: Coord+val+bool
    c.skip(12 + size_t(vt.bytes) * size_t(vt.comps) + 1);
  }
  // recursive descent, depth-first in stored order
  for (uint32_t ch = 0; ch < numChildren; ++ch) {
    c.skip(12);  // root child Coord origin
    const uint8_t* cm2 = c.raw(kN2 / 8);
    std::vector<uint8_t> child2(cm2, cm2 + kN2 / 8);
    const uint8_t* vm2 = c.raw(kN2 / 8);
    size_t act2 = popcount(vm2, kN2);
    readCompressedValues(c, kN2, act2, nullptr, flags, vt, half, nullptr);
    size_t n1nodes = popcount(child2.data(), kN2);
    for (size_t i1 = 0; i1 < n1nodes; ++i1) {
      const uint8_t* cm1 = c.raw(kN1 / 8);
      std::vector<uint8_t> child1(cm1, cm1 + kN1 / 8);
      const uint8_t* vm1 = c.raw(kN1 / 8);
      size_t act1 = popcount(vm1, kN1);
      readCompressedValues(c, kN1, act1, nullptr, flags, vt, half, nullptr);
      size_t nleaf = popcount(child1.data(), kN1);
      for (size_t il = 0; il < nleaf; ++il) {
        const uint8_t* lm = c.raw(kNL / 8);  // leaf topology: value mask
        leafMasks->emplace_back(lm, lm + kNL / 8);
        rep->leafCount += 1;
        rep->activeVoxels += popcount(lm, kNL);
      }
    }
  }
}

void parseLeafBuffers(Cursor& c, uint32_t flags, const VType& vt, bool half,
                      const std::vector<std::vector<uint8_t>>& leafMasks,
                      GridReport* rep) {
  ValueStats stats;
  for (const auto& lm : leafMasks) {
    const uint8_t* lm2 = c.raw(kNL / 8);  // buffers repeat the value mask
    if (std::memcmp(lm2, lm.data(), kNL / 8) != 0)
      throw std::runtime_error("leaf buffer mask != topology mask");
    if (vt.kind == Kind::Bool) {
      // LeafNodeBool.h writeBuffers: origin Coord + raw value bitmask
      c.skip(12);
      const uint8_t* vb = c.raw(kNL / 8);
      for (size_t i = 0; i < kNL; ++i) {
        if (!(lm.data()[i >> 3] >> (i & 7) & 1)) continue;
        stats.sum += double(vb[i >> 3] >> (i & 7) & 1);
        stats.count += 1;
      }
    } else {
      readCompressedValues(c, kNL, popcount(lm.data(), kNL), lm.data(), flags,
                           vt, half, &stats);
    }
  }
  rep->activeSum = stats.sum;
  if (stats.count != rep->activeVoxels)
    throw std::runtime_error("active value count mismatch");
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: vdbcheck file.vdb\n");
    return 2;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", argv[1]);
    return 2;
  }
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(sz), 0);
  if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) return 2;
  std::fclose(f);

  try {
    Cursor c{buf.data(), buf.size()};
    int64_t magic = c.scalar<int64_t>();
    if (magic != kMagic) throw std::runtime_error("bad magic");
    uint32_t version = c.scalar<uint32_t>();
    if (version < 222) throw std::runtime_error("file version too old");
    c.scalar<uint32_t>();  // lib major
    c.scalar<uint32_t>();  // lib minor
    uint8_t hasOffsets = c.scalar<uint8_t>();
    c.skip(36);            // ASCII uuid
    readMetaMap(c);        // file-level metadata
    int32_t ngrids = c.scalar<int32_t>();
    std::vector<std::string> written;  // names with trees (instance parents)

    for (int32_t g = 0; g < ngrids; ++g) {
      GridReport rep;
      rep.name = c.str();
      rep.type = c.str();
      rep.parent = c.str();  // instance parent (Archive.cc:1329)
      rep.half = rep.type.size() > 10 &&
                 rep.type.rfind("_HalfFloat") == rep.type.size() - 10;
      std::string base =
          rep.half ? rep.type.substr(0, rep.type.size() - 10) : rep.type;
      VType vt = vtypeOf(base);
      if (rep.half && !vt.real())
        throw std::runtime_error("half-float suffix on non-real type");

      int64_t gridPos = 0, blockPos = 0, endPos = 0;
      if (hasOffsets) {
        gridPos = c.scalar<int64_t>();
        blockPos = c.scalar<int64_t>();
        endPos = c.scalar<int64_t>();
        if (size_t(gridPos) != c.off)
          throw std::runtime_error("grid offset does not point here");
      }
      uint32_t flags = c.scalar<uint32_t>();
      auto meta = readMetaMap(c);
      for (const auto& m : meta) {
        if (m.name == "file_voxel_count" && m.payload.size() == 8)
          std::memcpy(&rep.fileVoxelCount, m.payload.data(), 8);
        if (m.name == "file_bbox_min" && m.payload.size() == 12)
          std::memcpy(rep.bbox, m.payload.data(), 12);
        if (m.name == "file_bbox_max" && m.payload.size() == 12)
          std::memcpy(rep.bbox + 3, m.payload.data(), 12);
      }
      std::string mapType = c.str();
      size_t mapDoubles;
      if (mapType == "UniformScaleMap" || mapType == "ScaleMap")
        mapDoubles = 5 * 3;  // math/Maps.h:834-850
      else if (mapType == "UniformScaleTranslateMap" ||
               mapType == "ScaleTranslateMap")
        mapDoubles = 6 * 3;
      else if (mapType == "TranslationMap")
        mapDoubles = 3;
      else if (mapType == "AffineMap")
        mapDoubles = 16;
      else
        throw std::runtime_error("unknown map type " + mapType);
      c.skip(8 * mapDoubles);

      if (!rep.parent.empty()) {
        // instance grid: no tree follows (Archive::writeGridInstance);
        // parent must be an earlier grid that owns a tree
        bool found = false;
        for (const auto& w : written)
          if (w == rep.parent) found = true;
        if (!found)
          throw std::runtime_error("instance parent \"" + rep.parent +
                                   "\" not previously written");
        if (hasOffsets && size_t(endPos) != c.off)
          throw std::runtime_error("end offset mismatch after instance");
        std::printf(
            "{\"name\": \"%s\", \"type\": \"%s\", \"half\": %s, "
            "\"instance_parent\": \"%s\"}\n",
            rep.name.c_str(), rep.type.c_str(), rep.half ? "true" : "false",
            rep.parent.c_str());
        continue;
      }

      std::vector<std::vector<uint8_t>> leafMasks;
      parseGrid(c, flags, vt, rep.half, &rep, &leafMasks);
      if (hasOffsets && size_t(blockPos) != c.off)
        throw std::runtime_error("block offset mismatch after topology");
      parseLeafBuffers(c, flags, vt, rep.half, leafMasks, &rep);
      if (hasOffsets && size_t(endPos) != c.off)
        throw std::runtime_error("end offset mismatch after buffers");
      if (rep.fileVoxelCount >= 0 &&
          size_t(rep.fileVoxelCount) != rep.activeVoxels)
        throw std::runtime_error("file_voxel_count != counted active voxels");
      written.push_back(rep.name);

      std::printf(
          "{\"name\": \"%s\", \"type\": \"%s\", \"half\": %s, "
          "\"leaf_count\": %zu, \"active_voxels\": %zu, "
          "\"active_sum\": %.8e, \"file_voxel_count\": %lld, "
          "\"bbox\": [%d, %d, %d, %d, %d, %d]}\n",
          rep.name.c_str(), rep.type.c_str(), rep.half ? "true" : "false",
          rep.leafCount, rep.activeVoxels, rep.activeSum,
          static_cast<long long>(rep.fileVoxelCount), rep.bbox[0], rep.bbox[1],
          rep.bbox[2], rep.bbox[3], rep.bbox[4], rep.bbox[5]);
    }
    std::printf("{\"ok\": true, \"grids\": %d}\n", ngrids);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "PARSE ERROR: %s\n", e.what());
    return 1;
  }
  return 0;
}
