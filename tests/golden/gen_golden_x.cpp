// Golden-vector generator #2: runs the REFERENCE MGARD-X library's SERIAL
// backend (/root/reference, Apache-2.0) to produce multi-dimensional
// coefficient vectors for tests/test_reference_parity.py.
//
// This pins the SEPARABLE multigrid transform this repo implements — the
// MGARD-X MultiDimension driver (reference: include/mgard-x/DataRefactoring/
// MultiDimension/DataRefactoring.hpp:24-178: per level CalcCoefficients3D
// then CalcCorrection3D = Lpk1..3 + Ipk1..3) — at 65^3, ulp-class, unlike
// the legacy-CPU golden vectors whose multi-D correction is a different
// operator and only supports error-manifest parity.
//
// Build + run: tests/golden/generate_x.sh (artifacts are committed so CI
// never needs the reference checkout).

#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

#include "mgard-x/Hierarchy/Hierarchy.hpp"
#include "mgard-x/RuntimeX/RuntimeX.h"
// include the kernel implementation headers so the templates instantiate
// in this TU (the reference instantiates them via generated .cpp.in files)
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

using namespace mgard_x;

namespace {

// same deterministic field as gen_golden.cpp so both generators agree
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
void run3d(SIZE n0, SIZE n1, SIZE n2, const std::string &tag) {
  std::vector<SIZE> shape{n0, n1, n2};
  std::vector<std::size_t> shv{n0, n1, n2};
  auto host = make_field<T>(shv);
  dump("input_x_" + tag + ".bin", host.data(),
       host.size() * sizeof(T));

  for (int orth = 0; orth < 2; ++orth) {
    Config cfg;
    Hierarchy<3, T, SERIAL> hierarchy(shape, cfg);
    Array<3, T, SERIAL> arr(shape);
    arr.load(host.data());
    SubArray<3, T, SERIAL> v(arr);
    SubArray<3, T, SERIAL> w, b;
    data_refactoring::multi_dimension::decompose<3, T, SERIAL>(
        hierarchy, v, w, b, hierarchy.l_target(), 0, orth != 0, 0);
    DeviceRuntime<SERIAL>::SyncQueue(0);
    T *out = arr.hostCopy();
    dump("decomposed_x_" + tag + (orth ? "_orth" : "_hier") + ".bin", out,
         host.size() * sizeof(T));
    std::printf("wrote %s l_target=%d\n",
                (tag + (orth ? "_orth" : "_hier")).c_str(),
                hierarchy.l_target());
  }
}

} // namespace

int main() {
  run3d<float>(65, 65, 65, "3d65_f32");
  run3d<double>(65, 65, 65, "3d65_f64");
  // non-dyadic odd/even mix exercises the ghost-node level-shape rule
  run3d<float>(60, 65, 70, "3d606570_f32");
  // tiny leading dim (the MaxDim domain-decomposer subdomain shape):
  // l_target is limited by the SHORT axis (chain 4->3->2)
  run3d<float>(4, 33, 33, "3d43333_f32");
  return 0;
}
