// Golden-blob generator: produces COMPLETE compressed streams with the
// reference MGARD-X library's SERIAL backend (/root/reference, Apache-2.0)
// for the cross-decoding tests (mgard_tpu.formats.ref_stream).
//
// Reference entry point: mgard_x::general_compress<D, T, SERIAL>
// (include/mgard-x/CompressionHighLevel/CompressionHighLevel.hpp:291-309)
// with Config.lossless = LZ4 (the portable block-LZ4 on the raw quantized
// stream — include/mgard-x/Lossless/LZ4/LZ4.hpp:14-30) so the payload is
// decodable without the reference's GPU-Huffman machinery.
//
// Build + run: tests/golden/generate_ref_blobs.sh

#include <cmath>
#include <cstdio>
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
#include "mgard-x/DataRefactoring/SingleDimension/DataRefactoring.hpp"
#include "mgard-x/DataRefactoring/SingleDimension/Coefficient/CalcCoefficients.hpp"
#include "mgard-x/DataRefactoring/SingleDimension/Coefficient/CoefficientsRestore.hpp"
#include "mgard-x/DataRefactoring/SingleDimension/Correction/CalcCorrection.hpp"
#include "mgard-x/Quantization/LinearQuantization.hpp"

using namespace mgard_x;

namespace {

// same deterministic field as gen_golden.cpp / gen_golden_x.cpp
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

template <typename T>
void gen(const std::vector<SIZE> &shape, double tol, double s,
         enum error_bound_type ebtype, lossless_type ltype,
         const std::string &tag, std::size_t footprint = 0) {
  std::vector<std::size_t> shv(shape.begin(), shape.end());
  auto v = make_field<T>(shv);
  dump("ref_input_" + tag + ".bin", v.data(), v.size() * sizeof(T));

  Config cfg;
  cfg.lossless = ltype;
  if (footprint)  // force MaxDim domain decomposition at small sizes
    cfg.max_memory_footprint = footprint;
  void *compressed = nullptr;
  size_t compressed_size = 0;
  auto st = general_compress<3, T, SERIAL, Compressor<3, T, SERIAL>>(
      std::vector<SIZE>(shape), (T)tol, (T)s, ebtype, v.data(), compressed,
      compressed_size, cfg, true, std::vector<T *>(), false);
  if (st != compress_status_type::Success) {
    std::printf("FAILED %s status %d\n", tag.c_str(), (int)st);
    return;
  }
  dump("ref_blob_" + tag + ".mgard", compressed, compressed_size);
  std::printf("wrote %s: %zu bytes (input %zu)\n", tag.c_str(),
              compressed_size, v.size() * sizeof(T));
}

// Decode a written blob in a FRESH process ("decode" argv mode): decoding
// in the same process that compressed six other cases produces different
// output (reference CompressorCache state leaks across shapes), so the
// decode dumps must not share a process with the compression runs.
void dump_decode3f(const std::vector<SIZE> &shape, const std::string &tag) {
  std::string bp = "ref_blob_" + tag + ".mgard";
  std::FILE *f = std::fopen(bp.c_str(), "rb");
  if (!f) { std::printf("missing %s\n", bp.c_str()); return; }
  std::fseek(f, 0, SEEK_END); long sz = std::ftell(f); std::fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> blob(sz);
  if (std::fread(blob.data(), 1, sz, f) != (size_t)sz) { std::fclose(f); return; }
  std::fclose(f);
  std::size_t n = 1;
  for (auto s : shape) n *= s;
  // the fidelity oracle for cross-decoding is the reference's OWN
  // decompressor output: for domain-decomposed SERIAL streams the
  // reference's compress pipeline corrupts subdomain data (its own
  // round-trip misses the bound by ~3 orders of magnitude), so the
  // pinned contract is decompressor-equivalence, not the error bound
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
  if (argc > 1 && std::string(argv[1]) == "decode") {
    dump_decode3f({64, 33, 33}, "3d643333_f32_lz4_s0_dd");
    dump_decode3f({64, 33, 33}, "3d643333_f32_lz4_abs_dd");
    return 0;
  }
  gen<float>({65, 65, 65}, 1e-3, std::numeric_limits<float>::infinity(),
             error_bound_type::ABS, lossless_type::LZ4, "3d65_f32_lz4_abs");
  gen<double>({60, 65, 70}, 1e-4, std::numeric_limits<double>::infinity(),
              error_bound_type::ABS, lossless_type::LZ4, "3d606570_f64_lz4_abs");
  gen<float>({65, 65, 65}, 1e-3, std::numeric_limits<float>::infinity(),
             error_bound_type::REL, lossless_type::LZ4, "3d65_f32_lz4_rel");
  // finite-s (s=0: L2) whole-domain and DECOMPOSED streams — the
  // decomposed one pins the per-subdomain tol/sqrt(S) quantizer rule in
  // the cross-decoder
  gen<float>({65, 65, 65}, 1e-3, 0.0, error_bound_type::ABS,
             lossless_type::LZ4, "3d65_f32_lz4_s0");
  gen<float>({64, 33, 33}, 1e-3, 0.0, error_bound_type::ABS,
             lossless_type::LZ4, "3d643333_f32_lz4_s0_dd",
             /*footprint=*/1u << 19);
  gen<float>({64, 33, 33}, 1e-3, std::numeric_limits<float>::infinity(),
             error_bound_type::ABS, lossless_type::LZ4,
             "3d643333_f32_lz4_abs_dd", /*footprint=*/1u << 19);
  // the reference's DEFAULT lossless class (GPU-Huffman) and its LZ4/Zstd
  // wrapped variants — cross-decoded by formats/ref_stream._decode_x_huffman
  gen<float>({65, 65, 65}, 1e-3, std::numeric_limits<float>::infinity(),
             error_bound_type::ABS, lossless_type::Huffman, "3d65_f32_huf_abs");
  gen<float>({65, 65, 65}, 1e-3, std::numeric_limits<float>::infinity(),
             error_bound_type::ABS, lossless_type::Huffman_LZ4,
             "3d65_f32_huflz4_abs");
  gen<float>({65, 65, 65}, 1e-3, 0.0, error_bound_type::ABS,
             lossless_type::Huffman_Zstd, "3d65_f32_hufzstd_s0");
  return 0;
}
