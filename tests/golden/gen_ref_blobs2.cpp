// Golden-blob generator #2: the remaining MGARD-X lossless classes
// (BlockDelta fixed/delta/outlier, SymbolRans, ZeroRLE_Rans) as COMPLETE
// compressed streams from the reference SERIAL backend (/root/reference,
// Apache-2.0), for the cross-decoding tests. Same structure as
// gen_ref_blobs.cpp; build + run: tests/golden/generate_ref_blobs2.sh.
//
// Each case also dumps the reference's OWN decompressed output (in a fresh
// process — the reference cache leaks state across shapes) as the fidelity
// oracle.

#include <cmath>
#include <cstdio>
#include <limits>
#include <string>
#include <vector>

#include "mgard-x/CompressionHighLevel/CompressionHighLevel.hpp"
#include "mgard-x/CompressionLowLevel/Compressor.hpp"
#include "mgard-x/CompressionLowLevel/CompressorCache.hpp"
#include "mgard-x/CompressionLowLevel/NormCalculator.hpp"
#include "mgard-x/DataRefactoring/DataRefactor.hpp"
#include "mgard-x/DataRefactoring/MultiDimension/Coefficient/CalcCoefficients3D.hpp"
#include "mgard-x/DataRefactoring/MultiDimension/Coefficient/CalcCoefficientsND.hpp"
#include "mgard-x/DataRefactoring/MultiDimension/Coefficient/CoefficientsRestore3D.hpp"
#include "mgard-x/DataRefactoring/MultiDimension/Coefficient/CoefficientsRestoreND.hpp"
#include "mgard-x/DataRefactoring/MultiDimension/Correction/CalcCorrection3D.hpp"
#include "mgard-x/DataRefactoring/MultiDimension/Correction/CalcCorrectionND.hpp"
#include "mgard-x/DataRefactoring/MultiDimension/CopyND/AddND.hpp"
#include "mgard-x/DataRefactoring/MultiDimension/CopyND/CopyND.hpp"
#include "mgard-x/DataRefactoring/MultiDimension/CopyND/SubtractND.hpp"
#include "mgard-x/DataRefactoring/MultiDimension/DataRefactoring.hpp"
#include "mgard-x/DataRefactoring/SingleDimension/Coefficient/CalcCoefficients.hpp"
#include "mgard-x/DataRefactoring/SingleDimension/Coefficient/CoefficientsRestore.hpp"
#include "mgard-x/DataRefactoring/SingleDimension/Correction/CalcCorrection.hpp"
#include "mgard-x/DataRefactoring/SingleDimension/DataRefactoring.hpp"
#include "mgard-x/Quantization/LinearQuantization.hpp"

using namespace mgard_x;

namespace {

template <typename T>
std::vector<T> make_field(const std::vector<std::size_t> &shape) {
  std::size_t n = 1;
  for (auto s : shape) n *= s;
  std::vector<T> v(n);
  std::vector<double> inv(shape.size());
  for (std::size_t d = 0; d < shape.size(); ++d)
    inv[d] = 1.0 / static_cast<double>(shape[d] - 1 ? shape[d] - 1 : 1);
  for (std::size_t i = 0; i < n; ++i) {
    std::size_t rem = i;
    double acc = 0.0, prod = 1.0;
    for (std::size_t d = shape.size(); d-- > 0;) {
      const double x = static_cast<double>(rem % shape[d]) * inv[d];
      rem /= shape[d];
      acc += std::sin(2.0 * M_PI * (d + 1) * x);
      prod *= std::cos(M_PI * x + 0.3 * (d + 1));
    }
    v[i] = static_cast<T>(acc + 0.5 * prod);
  }
  return v;
}

void dump(const std::string &path, const void *p, std::size_t bytes) {
  std::FILE *f = std::fopen(path.c_str(), "wb");
  std::fwrite(p, 1, bytes, f);
  std::fclose(f);
}

void gen(const std::vector<SIZE> &shape, lossless_type ltype,
         block_delta_mode_type bd_mode, const std::string &tag) {
  std::vector<std::size_t> shv(shape.begin(), shape.end());
  auto v = make_field<float>(shv);
  // input identical to the committed ref_input_3d65_f32_lz4_abs.bin
  // (same make_field) — not re-dumped

  Config cfg;
  cfg.lossless = ltype;
  cfg.block_delta_mode = bd_mode;
  void *compressed = nullptr;
  size_t compressed_size = 0;
  auto st = general_compress<3, float, SERIAL, Compressor<3, float, SERIAL>>(
      std::vector<SIZE>(shape), 1e-3f,
      std::numeric_limits<float>::infinity(), error_bound_type::ABS,
      v.data(), compressed, compressed_size, cfg, true, std::vector<float *>(),
      false);
  if (st != compress_status_type::Success) {
    std::printf("FAILED %s status %d\n", tag.c_str(), (int)st);
    return;
  }
  dump("ref_blob_" + tag + ".mgard", compressed, compressed_size);
  std::printf("wrote %s: %zu bytes\n", tag.c_str(), compressed_size);
}

void dump_decode(const std::vector<SIZE> &shape, const std::string &tag) {
  std::string bp = "ref_blob_" + tag + ".mgard";
  std::FILE *f = std::fopen(bp.c_str(), "rb");
  if (!f) { std::printf("missing %s\n", bp.c_str()); return; }
  std::fseek(f, 0, SEEK_END); long sz = std::ftell(f); std::fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> blob(sz);
  if (std::fread(blob.data(), 1, sz, f) != (size_t)sz) { std::fclose(f); return; }
  std::fclose(f);
  std::size_t n = 1;
  for (auto s : shape) n *= s;
  void *dec = nullptr;
  Config cfg;
  auto st = general_decompress<3, float, SERIAL, Compressor<3, float, SERIAL>>(
      std::vector<SIZE>(shape), blob.data(), sz, dec, cfg, false);
  if (st == compress_status_type::Success) {
    dump("ref_dec_" + tag + ".bin", dec, n * sizeof(float));
    std::printf("wrote ref_dec_%s.bin\n", tag.c_str());
  }
}

} // namespace

int main(int argc, char **argv) {
  const std::vector<SIZE> shape{65, 65, 65};
  const char *tags[] = {"3d65_f32_bdfixed", "3d65_f32_bddelta",
                        "3d65_f32_bdoutlier", "3d65_f32_symrans",
                        "3d65_f32_zrlerans"};
  if (argc > 2 && std::string(argv[1]) == "decode") {
    // one tag per process (cache state leaks across decodes)
    dump_decode(shape, argv[2]);
    return 0;
  }
  if (argc > 2 && std::string(argv[1]) == "encode") {
    const std::string tag(argv[2]);
    if (tag == "3d65_f32_bdfixed")
      gen(shape, lossless_type::BlockDelta, block_delta_mode_type::Fixed, tag);
    else if (tag == "3d65_f32_bddelta")
      gen(shape, lossless_type::BlockDelta, block_delta_mode_type::Delta, tag);
    else if (tag == "3d65_f32_bdoutlier")
      gen(shape, lossless_type::BlockDelta, block_delta_mode_type::Outlier,
          tag);
    else if (tag == "3d65_f32_symrans")
      gen(shape, lossless_type::SymbolRans, block_delta_mode_type::Delta, tag);
    else if (tag == "3d65_f32_zrlerans")
      gen(shape, lossless_type::ZeroRLE_Rans, block_delta_mode_type::Delta,
          tag);
    return 0;
  }
  for (const char *t : tags) std::printf("tag %s\n", t);
  return 0;
}
