#include <cmath>
#include <cstdio>
#include <vector>
#include "mgard-x/Hierarchy/Hierarchy.hpp"
#include "mgard-x/RuntimeX/RuntimeX.h"
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
using namespace mgard_x;
void dump(const std::string &p, const void *d, std::size_t b) {
  std::FILE *f = std::fopen(p.c_str(), "wb"); std::fwrite(d, 1, b, f); std::fclose(f);
}
template <int D>
void run(std::vector<SIZE> shape, const char* tag) {
  std::size_t n = 1; for (auto s : shape) n *= s;
  std::vector<double> v(n);
  for (std::size_t i = 0; i < n; i++) v[i] = std::sin(0.37 * i) + 0.11 * (double)(i % 23);
  Hierarchy<D, double, SERIAL> hierarchy(shape, Config());
  Array<D, double, SERIAL> arr(shape);
  arr.load(v.data());
  SubArray in(arr);
  data_refactoring::single_dimension::decompose(hierarchy, in, hierarchy.l_target(), 0, 0);
  DeviceRuntime<SERIAL>::SyncQueue(0);
  dump(std::string("sdx_dec_") + tag + ".bin", arr.hostCopy(), n*8);
  dump(std::string("sdx_in_") + tag + ".bin", v.data(), n*8);
  std::printf("%s l_target=%d\n", tag, (int)hierarchy.l_target());
}
int main() {
  run<3>({3,3,5}, "335");
  run<3>({5,5,9}, "559");
  run<3>({5,9,17}, "5917");
  run<2>({5,9}, "59");
  return 0;
}
