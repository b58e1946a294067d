// CPU-generation golden-stream generator: produces COMPLETE self-describing
// compressed streams with the reference MGARD **CPU** library
// (mgard::compress, /root/reference, Apache-2.0) plus the reference's OWN
// decompressed output, for the cross-decoding tests in
// mgard_tpu/formats/cpu_stream.py. Build + run:
// tests/golden/generate_cpu_stream.sh (artifacts are committed so CI never
// needs the reference checkout).
//
// Reference entry points exercised:
//   mgard::compress / decompress        include/compress.tpp:34-84
//   CompressedDataset::write            include/mgard/CompressedDataset.tpp:26
//   CPU Huffman + zstd/zlib             src/mgard/compressors.cpp:316-512
//
// The compressor enum recorded in the header (CPU_HUFFMAN_ZSTD vs _ZLIB)
// follows the MGARD_ZSTD build macro; generate_cpu_stream.sh builds both
// variants so each payload class has a golden stream.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <limits>
#include <sstream>
#include <string>
#include <vector>

#include "compress.hpp"

namespace {

// same deterministic field as gen_golden.cpp
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

template <std::size_t N, typename T>
void run(const std::array<std::size_t, N> &shape, const std::string &tag,
         double s, double tol, std::FILE *manifest, bool nonuniform = false) {
  std::size_t n = 1;
  for (auto sz : shape) n *= sz;
  std::vector<std::size_t> shv(shape.begin(), shape.end());
  auto v = make_field<T>(shv);
  dump("cpu_input_" + tag + ".bin", v.data(), n * sizeof(T));

  std::array<std::vector<T>, N> coords;
  if (nonuniform) {
    // smoothly stretched coordinates (denser near 0)
    for (std::size_t d = 0; d < N; ++d) {
      const std::size_t m = shape[d];
      coords[d].resize(m);
      for (std::size_t j = 0; j < m; ++j) {
        const double t = m > 1 ? static_cast<double>(j) / (m - 1) : 0.0;
        coords[d][j] = static_cast<T>(t * t * (3 - 2 * t) * 0.8 + 0.2 * t);
      }
      dump("cpu_coords_" + tag + "_d" + std::to_string(d) + ".bin",
           coords[d].data(), m * sizeof(T));
    }
  }

  std::vector<T> u(v);
  const auto compressed =
      nonuniform
          ? mgard::compress(mgard::TensorMeshHierarchy<N, T>(shape, coords),
                            u.data(), static_cast<T>(s), static_cast<T>(tol))
          : mgard::compress(mgard::TensorMeshHierarchy<N, T>(shape), u.data(),
                            static_cast<T>(s), static_cast<T>(tol));

  std::ostringstream blob;
  compressed.write(blob);
  const std::string bytes = blob.str();
  dump("cpu_stream_" + tag + ".mgard", bytes.data(), bytes.size());

  const auto decompressed = mgard::decompress(compressed);
  dump("cpu_output_" + tag + ".bin", decompressed.data(), n * sizeof(T));

  double linf = 0.0;
  for (std::size_t i = 0; i < n; ++i)
    linf = std::max(linf,
                    std::abs(static_cast<double>(v[i]) - decompressed.data()[i]));

  std::fprintf(manifest,
               "{\"tag\": \"%s\", \"shape\": [", tag.c_str());
  for (std::size_t d = 0; d < N; ++d)
    std::fprintf(manifest, "%zu%s", shape[d], d + 1 < N ? ", " : "");
  std::fprintf(manifest,
               "], \"dtype\": \"%s\", \"s\": %s, \"tol\": %.3e, "
               "\"size\": %zu, \"linf\": %.8e, \"nonuniform\": %s},\n",
               sizeof(T) == 4 ? "f32" : "f64",
               std::isinf(s) ? "\"inf\"" : std::to_string(s).c_str(), tol,
               bytes.size(), linf, nonuniform ? "true" : "false");
}

}  // namespace

int main(int argc, char **argv) {
  // argv[1]: suffix for the build variant ("zstd" or "zlib")
  const std::string variant = argc > 1 ? argv[1] : "zstd";
  std::FILE *manifest =
      std::fopen(("cpu_manifest_" + variant + ".json").c_str(), "wb");
  std::fprintf(manifest, "[\n");
  const double inf = std::numeric_limits<double>::infinity();
  if (variant == "zlib") {
    // one stream per dtype is enough to pin the zlib container path
    run<2, double>({9, 17}, "zlib_2d9x17_f64", inf, 1e-3, manifest);
    run<1, float>({17}, "zlib_1d17_f32", 0.0, 1e-3, manifest);
  } else {
    run<1, float>({17}, "1d17_f32_sinf", inf, 1e-3, manifest);
    run<1, double>({31}, "1d31_f64_s0", 0.0, 1e-4, manifest);
    run<2, double>({9, 17}, "2d9x17_f64_sinf", inf, 1e-3, manifest);
    run<2, float>({12, 13}, "2d12x13_f32_s05", 0.5, 1e-2, manifest);
    run<3, double>({15, 16, 17}, "3d151617_f64_sinf", inf, 1e-3, manifest);
    run<3, double>({15, 16, 17}, "3d151617_f64_sm05", -0.5, 1e-2, manifest);
    run<3, float>({9, 9, 17}, "3d9917_f32_s0", 0.0, 1e-3, manifest);
    run<3, float>({1, 17, 9}, "3d1179_f32_sinf", inf, 1e-3, manifest);
    run<2, double>({17, 9}, "2d179_f64_nonuni", inf, 1e-3, manifest, true);
    run<2, double>({17, 9}, "2d179_f64_nonuni_s0", 0.0, 1e-3, manifest, true);
  }
  std::fprintf(manifest, "{}\n]\n");
  std::fclose(manifest);
  std::printf("cpu golden streams written (%s)\n", variant.c_str());
  return 0;
}
