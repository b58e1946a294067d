// Golden-vector generator: runs the REFERENCE MGARD-CPU library
// (/root/reference, Apache-2.0) to produce cross-validation vectors for
// tests/test_reference_parity.py. Build + run: tests/golden/generate.sh
// (requires the reference checkout; the generated .bin/.json artifacts are
// committed so CI never needs it).
//
// Reference entry points exercised:
//   mgard::shuffle/decompose      include/mgard/decompose.tpp:128-175
//   mgard::compress/decompress    include/compress.tpp:34-130

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "compress.hpp"
#include "mgard/decompose.hpp"
#include "mgard/shuffle.hpp"

namespace {

// deterministic smooth-ish field; exact bytes are committed, so only the
// generator needs to be reproducible
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
         std::FILE *manifest) {
  std::size_t n = 1;
  for (auto s : shape) n *= s;
  std::vector<std::size_t> shv(shape.begin(), shape.end());
  auto v = make_field<T>(shv);
  dump("input_" + tag + ".bin", v.data(), n * sizeof(T));

  const mgard::TensorMeshHierarchy<N, T> hierarchy(shape);
  // decomposed coefficients in PHYSICAL order (unshuffle after decompose)
  {
    std::vector<T> u(n), w(n), phys(n);
    std::copy(v.begin(), v.end(), u.begin());
    mgard::shuffle(hierarchy, u.data(), w.data());
    mgard::pb::Header header;
    mgard::populate_defaults(header);
    hierarchy.populate(header);
    mgard::decompose(hierarchy, header, w.data());
    mgard::unshuffle(hierarchy, w.data(), phys.data());
    dump("decomposed_" + tag + ".bin", phys.data(), n * sizeof(T));
  }

  // full compress/decompress at (s, tol) points: record achieved error
  const double svals[] = {std::numeric_limits<T>::infinity(), 0.0};
  const double tols[] = {1e-1, 1e-2, 1e-3};
  for (double s : svals) {
    for (double tol : tols) {
      std::vector<T> u(v);
      const auto compressed =
          mgard::compress(hierarchy, u.data(), static_cast<T>(s),
                          static_cast<T>(tol));
      const auto decompressed = mgard::decompress(compressed);
      const T *out = decompressed.data();
      double linf = 0.0, l2 = 0.0;
      for (std::size_t i = 0; i < n; ++i) {
        const double d = static_cast<double>(v[i]) - out[i];
        linf = std::max(linf, std::abs(d));
        l2 += d * d;
      }
      l2 = std::sqrt(l2 / n);
      std::fprintf(manifest,
                   "{\"tag\": \"%s\", \"s\": %s, \"tol\": %.1e, "
                   "\"size\": %zu, \"linf\": %.8e, \"l2\": %.8e},\n",
                   tag.c_str(),
                   std::isinf(s) ? "\"inf\"" : "0.0", tol,
                   compressed.size(), linf, l2);
    }
  }
}

}  // namespace

int main() {
  std::FILE *manifest = std::fopen("manifest.json", "wb");
  std::fprintf(manifest, "[\n");
  run<1, float>({17}, "1d17_f32", manifest);
  run<1, double>({17}, "1d17_f64", manifest);
  run<2, double>({9, 17}, "2d9x17_f64", manifest);
  run<3, float>({9, 9, 17}, "3d9x9x17_f32", manifest);
  run<3, double>({9, 9, 17}, "3d9x9x17_f64", manifest);
  run<3, double>({15, 16, 17}, "3d15x16x17_f64", manifest);
  std::fprintf(manifest, "{}\n]\n");
  std::fclose(manifest);
  std::puts("golden vectors written");
  return 0;
}
