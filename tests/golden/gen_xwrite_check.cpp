// Cross-WRITE checker: decompress a stream written by mgard-tpu's
// formats/ref_stream.compress_reference with the REFERENCE library
// (/root/reference, MGARD-X SERIAL general_decompress) and dump the
// reconstruction. Proves the bidirectional half of stream interop: the
// reference accepts and correctly reconstructs files this framework writes.
//
// Usage: gen_xwrite_check <blob> <f32|f64> <n0> <n1> <n2> <out.bin>
// Build + run: tests/golden/generate_xwrite.sh

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
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
std::vector<unsigned char> slurp(const char *path) {
  std::FILE *f = std::fopen(path, "rb");
  if (!f) { std::printf("missing %s\n", path); std::exit(1); }
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> out(sz);
  if (std::fread(out.data(), 1, sz, f) != (size_t)sz) std::exit(1);
  std::fclose(f);
  return out;
}

template <typename T>
int run(const char *blob_path, const char *out_path, std::vector<SIZE> shape) {
  auto blob = slurp(blob_path);
  void *out = nullptr;
  Config cfg;
  auto st = general_decompress<3, T, SERIAL, Compressor<3, T, SERIAL>>(
      shape, blob.data(), blob.size(), out, cfg, false);
  if (st != compress_status_type::Success) {
    std::printf("REFERENCE DECODE FAILED (%d) for %s\n", (int)st, blob_path);
    return 1;
  }
  size_t n = 1;
  for (auto s : shape) n *= s;
  std::FILE *f = std::fopen(out_path, "wb");
  std::fwrite(out, sizeof(T), n, f);
  std::fclose(f);
  std::printf("reference decoded %s -> %s\n", blob_path, out_path);
  return 0;
}
} // namespace

int main(int argc, char **argv) {
  if (argc < 7) { std::printf("usage: see header\n"); return 2; }
  std::vector<SIZE> shape{(SIZE)std::atoll(argv[3]), (SIZE)std::atoll(argv[4]),
                          (SIZE)std::atoll(argv[5])};
  if (std::strcmp(argv[2], "f64") == 0)
    return run<double>(argv[1], argv[6], shape);
  return run<float>(argv[1], argv[6], shape);
}
