// Checker: decompress a stream WRITTEN BY mgard_tpu (formats/cpu_stream.
// compress_cpu) with the reference CPU library's own self-describing
// entry point (mgard::decompress(void const*, size) — src/mgard/compress
// .cpp:10-22), proving the reference accepts our CPU-generation streams.
// Build + run: tests/golden/generate_cpu_write.sh
//
// Usage: gen_cpu_write_check <stream.mgard> <out.bin>

#include <cstdio>
#include <cstdlib>
#include <stdexcept>
#include <vector>

#include "compress.hpp"
#include "mgard/compress_internal.hpp"

namespace mgard {
// The reference generates this dimension switch at build time
// (scripts/generate_dimension_switch.py -> compress_internal_generated
// .cpp); provide the 1-3D instantiations here.
MemoryBuffer<const unsigned char> decompress(const pb::Header &header,
                                             const std::size_t dimension,
                                             void const *const data,
                                             const std::size_t size) {
  switch (dimension) {
  case 1:
    return decompress_N<1>(header, data, size);
  case 2:
    return decompress_N<2>(header, data, size);
  case 3:
    return decompress_N<3>(header, data, size);
  default:
    throw std::runtime_error("unsupported dimension in checker");
  }
}
} // namespace mgard

int main(int argc, char **argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s <stream.mgard> <out.bin>\n", argv[0]);
    return 2;
  }
  std::FILE *f = std::fopen(argv[1], "rb");
  if (!f) return 2;
  std::fseek(f, 0, SEEK_END);
  const long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> blob(n);
  if (std::fread(blob.data(), 1, n, f) != static_cast<std::size_t>(n))
    return 2;
  std::fclose(f);

  const mgard::MemoryBuffer<const unsigned char> out =
      mgard::decompress(blob.data(), blob.size());

  std::FILE *g = std::fopen(argv[2], "wb");
  std::fwrite(out.data.get(), 1, out.size, g);
  std::fclose(g);
  std::printf("decompressed %zu bytes from %s\n", out.size, argv[1]);
  return 0;
}
