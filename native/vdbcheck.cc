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
//   metadata:         openvdb/MetaMap.cc (uint32 count; per entry: name,
//                     type name, int32 size, payload)
//   transform:        openvdb/math/Transform.cc + Maps.h:834-850
//                     (map type name + map-specific doubles)
//   tree:             openvdb/tree/Tree.h (int32 bufferCount, background
//                     value, uint32 numTiles, uint32 numChildren), then per
//                     root child: Coord origin + InternalNode<5> topology,
//                     recursively InternalNode<4>, LeafNode<3> (value mask;
//                     buffers in a second pass at the blocks offset)
//   node masks:       openvdb/util/NodeMasks.h:565 (save = raw bit words,
//                     little-endian)
//   compression:      openvdb/io/Compression.h:77-100 (flags; per-node
//                     metadata byte), Compression.cc zipToStream framing
//                     (int64 byte count; negative = stored uncompressed)
//
// Usage: vdbcheck file.vdb
// Prints one JSON line per grid: {"name", "type", "half", "leaf_count",
// "active_voxels", "active_sum", "bbox": [...], "file_voxel_count"} and a
// final {"ok": true, "grids": N} line; exits non-zero on any parse error.
//
// Build: g++ -O2 -std=c++17 -o vdbcheck vdbcheck.cc -lz

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
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

// io/Compression.cc unzipFromStream: int64 count; >0 zipped, <=0 stored raw.
std::vector<uint8_t> readDataBytes(Cursor& c, uint32_t flags,
                                   size_t expect_bytes) {
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

// io::readCompressedValues (Compression.h:462-640): per-node metadata byte,
// optional inactive values + selection mask, then the (possibly compacted)
// value payload.  We only need to WALK it (and fold active leaf values into
// the checksum), not reconstruct inactive values.
void readCompressedValues(Cursor& c, size_t count, size_t activeCount,
                          const uint8_t* valueMask, uint32_t flags, int comps,
                          bool half, ValueStats* stats) {
  size_t vsz = (half ? 2 : 4) * size_t(comps);
  if (!(flags & kCompressActiveMask)) {
    // no ACTIVE_MASK: one metadata byte then ALL values
    uint8_t meta = c.scalar<uint8_t>();
    if (meta != kNoMaskAndAllVals)
      throw std::runtime_error("unexpected metadata without ACTIVE_MASK");
    std::vector<uint8_t> data = readDataBytes(c, flags, count * vsz);
    if (stats && valueMask) {
      for (size_t i = 0; i < count; ++i) {
        if (!(valueMask[i >> 3] >> (i & 7) & 1)) continue;
        for (int k = 0; k < comps; ++k) {
          const uint8_t* q = data.data() + i * vsz + k * (half ? 2 : 4);
          float v;
          if (half) {
            uint16_t hv;
            std::memcpy(&hv, q, 2);
            v = halfToFloat(hv);
          } else {
            std::memcpy(&v, q, 4);
          }
          stats->sum += v;
        }
        stats->count += 1;
      }
    }
    return;
  }
  uint8_t meta = c.scalar<uint8_t>();
  switch (meta) {
    case kNoMaskOrInactiveVals:
    case kNoMaskAndMinusBg:
    case kMaskAndNoInactiveVals:
      break;
    case kNoMaskAndOneInactiveVal:
    case kMaskAndOneInactiveVal:
      c.skip(4 * size_t(comps));  // inactive values are stored f32
      break;
    case kMaskAndTwoInactiveVals:
      c.skip(8 * size_t(comps));
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
      for (size_t i = 0; i < count; ++i) {
        if (!(valueMask[i >> 3] >> (i & 7) & 1)) continue;
        for (int k = 0; k < comps; ++k) {
          const uint8_t* q = data.data() + i * vsz + k * (half ? 2 : 4);
          float v;
          if (half) {
            uint16_t hv;
            std::memcpy(&hv, q, 2);
            v = halfToFloat(hv);
          } else {
            std::memcpy(&v, q, 4);
          }
          stats->sum += v;
        }
        stats->count += 1;
      }
    } else {
      // compacted payload: stored values ARE the active ones, in order
      for (size_t i = 0; i < stored; ++i) {
        for (int k = 0; k < comps; ++k) {
          const uint8_t* q = data.data() + i * vsz + k * (half ? 2 : 4);
          float v;
          if (half) {
            uint16_t hv;
            std::memcpy(&hv, q, 2);
            v = halfToFloat(hv);
          } else {
            std::memcpy(&v, q, 4);
          }
          stats->sum += v;
        }
        stats->count += 1;
      }
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
  std::string name, type;
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

void parseGrid(Cursor& c, uint32_t flags, int comps, bool half,
               GridReport* rep, std::vector<std::vector<uint8_t>>* leafMasks) {
  c.scalar<int32_t>();                        // TreeBase bufferCount
  c.skip(4 * size_t(comps));                  // root background (f32 each)
  uint32_t numTiles = c.scalar<uint32_t>();
  uint32_t numChildren = c.scalar<uint32_t>();
  for (uint32_t t = 0; t < numTiles; ++t) {   // root tiles: Coord+val+bool
    c.skip(12 + 4 * size_t(comps) + 1);
  }
  // recursive descent, depth-first in stored order
  for (uint32_t ch = 0; ch < numChildren; ++ch) {
    c.skip(12);  // root child Coord origin
    const uint8_t* cm2 = c.raw(kN2 / 8);
    std::vector<uint8_t> child2(cm2, cm2 + kN2 / 8);
    const uint8_t* vm2 = c.raw(kN2 / 8);
    size_t act2 = popcount(vm2, kN2);
    readCompressedValues(c, kN2, act2, nullptr, flags, comps, half, nullptr);
    size_t n1nodes = popcount(child2.data(), kN2);
    for (size_t i1 = 0; i1 < n1nodes; ++i1) {
      const uint8_t* cm1 = c.raw(kN1 / 8);
      std::vector<uint8_t> child1(cm1, cm1 + kN1 / 8);
      const uint8_t* vm1 = c.raw(kN1 / 8);
      size_t act1 = popcount(vm1, kN1);
      readCompressedValues(c, kN1, act1, nullptr, flags, comps, half, nullptr);
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

void parseLeafBuffers(Cursor& c, uint32_t flags, int comps, bool half,
                      const std::vector<std::vector<uint8_t>>& leafMasks,
                      GridReport* rep) {
  ValueStats stats;
  for (const auto& lm : leafMasks) {
    const uint8_t* lm2 = c.raw(kNL / 8);  // buffers repeat the value mask
    if (std::memcmp(lm2, lm.data(), kNL / 8) != 0)
      throw std::runtime_error("leaf buffer mask != topology mask");
    readCompressedValues(c, kNL, popcount(lm.data(), kNL), lm.data(), flags,
                         comps, half, &stats);
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

    for (int32_t g = 0; g < ngrids; ++g) {
      GridReport rep;
      rep.name = c.str();
      rep.type = c.str();
      c.str();  // instance parent
      rep.half = rep.type.size() > 10 &&
                 rep.type.rfind("_HalfFloat") == rep.type.size() - 10;
      std::string base =
          rep.half ? rep.type.substr(0, rep.type.size() - 10) : rep.type;
      int comps;
      if (base == "Tree_float_5_4_3") comps = 1;
      else if (base == "Tree_vec3s_5_4_3") comps = 3;
      else if (base == "Tree_vec3d_5_4_3" || base == "Tree_double_5_4_3")
        throw std::runtime_error("f64 trees not produced by this framework");
      else throw std::runtime_error("unknown grid type " + rep.type);

      int64_t gridPos = 0, blockPos = 0, endPos = 0;
      if (hasOffsets) {
        gridPos = c.scalar<int64_t>();
        blockPos = c.scalar<int64_t>();
        endPos = c.scalar<int64_t>();
        if (size_t(gridPos) != c.off)
          throw std::runtime_error("grid offset does not point here");
      }
      uint32_t flags = c.scalar<uint32_t>();
      if (flags & kCompressBlosc)
        throw std::runtime_error("BLOSC not supported");
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

      std::vector<std::vector<uint8_t>> leafMasks;
      parseGrid(c, flags, comps, rep.half, &rep, &leafMasks);
      if (hasOffsets && size_t(blockPos) != c.off)
        throw std::runtime_error("block offset mismatch after topology");
      parseLeafBuffers(c, flags, comps, rep.half, leafMasks, &rep);
      if (hasOffsets && size_t(endPos) != c.off)
        throw std::runtime_error("end offset mismatch after buffers");
      if (rep.fileVoxelCount >= 0 &&
          size_t(rep.fileVoxelCount) != rep.activeVoxels)
        throw std::runtime_error("file_voxel_count != counted active voxels");

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
