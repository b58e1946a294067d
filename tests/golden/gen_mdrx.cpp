// MDR-X golden generator: refactor a small field with the REFERENCE
// library's MDR-X high-level API (SERIAL backend) into its directory
// format (header | metadata | component_{sub}_{level}_{bitplane}), then —
// in a FRESH process, through the same file-based flow as the mdr-x
// executable — reconstruct at a given tolerance and dump the reference's
// OWN reconstruction as the oracle for the cross-reader
// (mgard_tpu/formats/mdrx_stream.py). Build + run:
// tests/golden/generate_mdrx.sh
//
// Reference entry points: mgard_x::MDR::MDRefactor / MDRequest /
// MDReconstruct (include/mgard-x/MDRHighLevel/MDRHighLevel.hpp);
// directory layout per src/mgard-x/Executables/mdr-x.cpp
// write_mdr/read_mdr_metadata/read_mdr.

#include <cmath>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

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
#include "mgard-x/MDRHighLevel/MDRHighLevel.hpp"

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

std::vector<Byte> slurp(const std::string &path) {
  std::FILE *f = std::fopen(path.c_str(), "rb");
  if (!f) { std::printf("missing %s\n", path.c_str()); std::exit(2); }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<Byte> out(n);
  if (std::fread(out.data(), 1, n, f) != (std::size_t)n) std::exit(2);
  std::fclose(f);
  return out;
}

const std::vector<SIZE> kShape{33, 33, 33};

// mdrx3: engineered so HybridLevelCompressor's compressed-group paths
// actually fire (HybridLevelCompressor.hpp:86-115 only tries RLE/Huffman
// on merged 4-plane groups > 1e6 bytes and keeps them at CR >= 2).
// 105^3 puts the finest level at 1,008,748 elems -> merged group
// 1,008,768 bytes, just over the gate. The field itself comes from
// gen_mdrx3_field.py (integer-hash magnitudes + a sign plane patterned
// per level-linearized index so RLE fails but byte-Huffman clears the
// 2x gate on the finest group 0, while group 1 is all-zero -> RLE).
const std::vector<SIZE> kShape3{105, 105, 105};

std::vector<float> load_field3() {
  auto raw = slurp("mdrx3_input.bin");
  std::vector<float> v(raw.size() / sizeof(float));
  std::memcpy(v.data(), raw.data(), raw.size());
  return v;
}

Config make_config() {
  Config config;
  config.normalize_coordinates = false;
  config.decomposition = decomposition_type::MultiDim;
  config.total_num_bitplanes = 32;
  return config;
}

int do_refactor() {
  std::vector<std::size_t> shv(kShape.begin(), kShape.end());
  auto v = make_field<float>(shv);
  mkdir("mdrx", 0755);
  Config config = make_config();

  mgard_x::MDR::RefactoredMetadata refactored_metadata;
  mgard_x::MDR::RefactoredData refactored_data;
  std::vector<SIZE> shp(kShape);
  mgard_x::MDR::MDRefactor<3, float, SERIAL>(
      shp, v.data(), refactored_metadata, refactored_data, config, false);

  std::vector<Byte> serialized_metadata = refactored_metadata.Serialize();
  dump("mdrx/header", refactored_metadata.header.data(),
       refactored_metadata.header.size());
  dump("mdrx/metadata", serialized_metadata.data(),
       serialized_metadata.size());
  for (std::size_t sub = 0; sub < refactored_metadata.metadata.size(); sub++) {
    auto &md = refactored_metadata.metadata[sub];
    for (std::size_t l = 0; l < md.level_sizes.size(); l++) {
      for (std::size_t bp = 0; bp < md.level_sizes[l].size(); bp++) {
        if (md.level_sizes[l][bp] > 0) {
          dump("mdrx/component_" + std::to_string(sub) + "_" +
                   std::to_string(l) + "_" + std::to_string(bp),
               refactored_data.data[sub][l][bp], md.level_sizes[l][bp]);
        }
      }
    }
  }
  dump("mdrx_input.bin", v.data(), v.size() * sizeof(float));
  std::printf("refactored: %zu subdomains\n",
              refactored_metadata.metadata.size());
  return 0;
}

int do_reconstruct(double tol, double s) {
  Config config = make_config();
  std::vector<SIZE> shp(kShape);

  mgard_x::MDR::RefactoredMetadata refactored_metadata;
  mgard_x::MDR::RefactoredData refactored_data;
  mgard_x::MDR::ReconstructedData reconstructed_data;

  // read_mdr_metadata (mdr-x.cpp:227-238)
  refactored_metadata.header = slurp("mdrx/header");
  refactored_metadata.Deserialize(slurp("mdrx/metadata"));
  refactored_metadata.InitializeForReconstruction();
  refactored_data.InitializeForReconstruction(refactored_metadata);

  for (auto &metadata : refactored_metadata.metadata) {
    metadata.requested_tol = tol;
    metadata.requested_s = s;
  }
  mgard_x::MDR::MDRequest<3, float, SERIAL>(shp, refactored_metadata, config);
  for (auto &md : refactored_metadata.metadata) {
    std::printf("requested planes:");
    for (auto b : md.requested_level_num_bitplanes)
      std::printf(" %d", (int)b);
    std::printf("\n");
  }

  // read_mdr (mdr-x.cpp:185-226): load requested planes + zero signs.
  // Buffers get generous slack: the level decompressor may use them as
  // in-place scratch beyond the stored size.
  for (std::size_t sub = 0; sub < refactored_metadata.metadata.size(); sub++) {
    auto &md = refactored_metadata.metadata[sub];
    for (std::size_t l = 0; l < md.level_sizes.size(); l++) {
      int loaded = md.loaded_level_num_bitplanes[l];
      int requested = md.requested_level_num_bitplanes[l];
      for (int bp = loaded; bp < requested; bp++) {
        if (md.level_sizes[l][bp] > 0) {
          std::vector<Byte> blob =
              slurp("mdrx/component_" + std::to_string(sub) + "_" +
                    std::to_string(l) + "_" + std::to_string(bp));
          Byte *buf = (Byte *)malloc(blob.size() * 4 + (1 << 16));
          std::memcpy(buf, blob.data(), blob.size());
          refactored_data.data[sub][l][bp] = buf;
        }
      }
      refactored_data.level_signs[sub][l] =
          (bool *)calloc(md.level_num_elems[l] + 4096, sizeof(bool));
    }
  }

  mgard_x::MDR::MDReconstruct<3, float, SERIAL>(
      shp, refactored_metadata, refactored_data, reconstructed_data, config,
      false);

  char name[64];
  if (std::isinf(s))
    std::snprintf(name, sizeof(name), "mdrx_rec_%.0e.bin", tol);
  else
    std::snprintf(name, sizeof(name), "mdrx_rec_%.0e_s%g.bin", tol, s);
  std::size_t n = 33 * 33 * 33;
  dump(name, reconstructed_data.data[0], n * sizeof(float));

  auto v = make_field<float>(std::vector<std::size_t>(kShape.begin(),
                                                      kShape.end()));
  double linf = 0;
  const float *r = (const float *)reconstructed_data.data[0];
  for (std::size_t i = 0; i < n; i++)
    linf = std::max(linf, std::abs((double)v[i] - r[i]));
  std::printf("tol %.0e: reference reconstruction L_inf %.3e\n", tol, linf);
  return 0;
}

int do_refactor3() {
  auto v = load_field3();
  mkdir("mdrx3", 0755);
  Config config = make_config();

  mgard_x::MDR::RefactoredMetadata refactored_metadata;
  mgard_x::MDR::RefactoredData refactored_data;
  std::vector<SIZE> shp(kShape3);
  mgard_x::MDR::MDRefactor<3, float, SERIAL>(
      shp, v.data(), refactored_metadata, refactored_data, config, false);

  std::vector<Byte> serialized_metadata = refactored_metadata.Serialize();
  dump("mdrx3/header", refactored_metadata.header.data(),
       refactored_metadata.header.size());
  dump("mdrx3/metadata", serialized_metadata.data(),
       serialized_metadata.size());
  for (std::size_t sub = 0; sub < refactored_metadata.metadata.size(); sub++) {
    auto &md = refactored_metadata.metadata[sub];
    for (std::size_t l = 0; l < md.level_sizes.size(); l++) {
      for (std::size_t bp = 0; bp < md.level_sizes[l].size(); bp++) {
        if (md.level_sizes[l][bp] > 0) {
          dump("mdrx3/component_" + std::to_string(sub) + "_" +
                   std::to_string(l) + "_" + std::to_string(bp),
               refactored_data.data[sub][l][bp], md.level_sizes[l][bp]);
        }
      }
    }
  }
  std::printf("refactored3: %zu subdomains\n",
              refactored_metadata.metadata.size());
  return 0;
}

// Reconstruct mdrx3 at `tol`, dump the reference's own reconstruction,
// and (with trim) delete the components beyond the reference's request so
// the committed golden stays small (same trimming mdrx2 got).
int do_reconstruct3(double tol, bool trim) {
  Config config = make_config();
  std::vector<SIZE> shp(kShape3);

  mgard_x::MDR::RefactoredMetadata refactored_metadata;
  mgard_x::MDR::RefactoredData refactored_data;
  mgard_x::MDR::ReconstructedData reconstructed_data;

  refactored_metadata.header = slurp("mdrx3/header");
  refactored_metadata.Deserialize(slurp("mdrx3/metadata"));
  std::printf("deserialized\n");
  refactored_metadata.InitializeForReconstruction();
  refactored_data.InitializeForReconstruction(refactored_metadata);
  std::printf("initialized\n");

  for (auto &metadata : refactored_metadata.metadata) {
    metadata.requested_tol = tol;
    metadata.requested_s = std::numeric_limits<double>::infinity();
  }
  mgard_x::MDR::MDRequest<3, float, SERIAL>(shp, refactored_metadata, config);
  for (auto &md : refactored_metadata.metadata) {
    std::printf("requested planes:");
    for (auto b : md.requested_level_num_bitplanes)
      std::printf(" %d", (int)b);
    std::printf("\n");
  }

  for (std::size_t sub = 0; sub < refactored_metadata.metadata.size(); sub++) {
    auto &md = refactored_metadata.metadata[sub];
    for (std::size_t l = 0; l < md.level_sizes.size(); l++) {
      int loaded = md.loaded_level_num_bitplanes[l];
      int requested = md.requested_level_num_bitplanes[l];
      for (int bp = loaded; bp < requested; bp++) {
        if (md.level_sizes[l][bp] > 0) {
          std::vector<Byte> blob =
              slurp("mdrx3/component_" + std::to_string(sub) + "_" +
                    std::to_string(l) + "_" + std::to_string(bp));
          Byte *buf = (Byte *)malloc(blob.size() * 4 + (1 << 20));
          std::memcpy(buf, blob.data(), blob.size());
          refactored_data.data[sub][l][bp] = buf;
        }
      }
      if (trim) {
        for (std::size_t bp = requested; bp < md.level_sizes[l].size(); bp++)
          if (md.level_sizes[l][bp] > 0)
            unlink(("mdrx3/component_" + std::to_string(sub) + "_" +
                    std::to_string(l) + "_" + std::to_string(bp)).c_str());
      }
      refactored_data.level_signs[sub][l] =
          (bool *)calloc(md.level_num_elems[l] + 4096, sizeof(bool));
    }
  }
  std::printf("loaded\n");

  mgard_x::MDR::MDReconstruct<3, float, SERIAL>(
      shp, refactored_metadata, refactored_data, reconstructed_data, config,
      false);
  std::printf("reconstructed\n");

  char name[64];
  std::snprintf(name, sizeof(name), "mdrx3_rec_%.0e.bin", tol);
  std::size_t n = (std::size_t)105 * 105 * 105;
  dump(name, reconstructed_data.data[0], n * sizeof(float));

  auto v = load_field3();
  double linf = 0;
  const float *r = (const float *)reconstructed_data.data[0];
  for (std::size_t i = 0; i < n; i++)
    linf = std::max(linf, std::abs((double)v[i] - r[i]));
  std::printf("tol %.0e: reference reconstruction3 L_inf %.3e\n", tol, linf);
  return 0;
}

// Domain-decomposed archive: a small max_memory_footprint forces the
// DomainDecomposer to split 33^3 into MaxDim slabs, each refactored as
// an independent subdomain (component_<sub>_<level>_<bitplane>).
int do_refactor_dd() {
  std::vector<std::size_t> shv(kShape.begin(), kShape.end());
  auto v = make_field<float>(shv);
  mkdir("mdrx_dd", 0755);
  Config config = make_config();
  config.max_memory_footprint = 1 << 20;

  mgard_x::MDR::RefactoredMetadata refactored_metadata;
  mgard_x::MDR::RefactoredData refactored_data;
  std::vector<SIZE> shp(kShape);
  mgard_x::MDR::MDRefactor<3, float, SERIAL>(
      shp, v.data(), refactored_metadata, refactored_data, config, false);

  std::vector<Byte> serialized_metadata = refactored_metadata.Serialize();
  dump("mdrx_dd/header", refactored_metadata.header.data(),
       refactored_metadata.header.size());
  dump("mdrx_dd/metadata", serialized_metadata.data(),
       serialized_metadata.size());
  for (std::size_t sub = 0; sub < refactored_metadata.metadata.size(); sub++) {
    auto &md = refactored_metadata.metadata[sub];
    for (std::size_t l = 0; l < md.level_sizes.size(); l++) {
      for (std::size_t bp = 0; bp < md.level_sizes[l].size(); bp++) {
        if (md.level_sizes[l][bp] > 0) {
          dump("mdrx_dd/component_" + std::to_string(sub) + "_" +
                   std::to_string(l) + "_" + std::to_string(bp),
               refactored_data.data[sub][l][bp], md.level_sizes[l][bp]);
        }
      }
    }
  }
  std::printf("refactored_dd: %zu subdomains\n",
              refactored_metadata.metadata.size());
  return 0;
}

int do_reconstruct_dd(double tol) {
  Config config = make_config();
  config.max_memory_footprint = 1 << 20;
  std::vector<SIZE> shp(kShape);

  mgard_x::MDR::RefactoredMetadata refactored_metadata;
  mgard_x::MDR::RefactoredData refactored_data;
  mgard_x::MDR::ReconstructedData reconstructed_data;

  refactored_metadata.header = slurp("mdrx_dd/header");
  refactored_metadata.Deserialize(slurp("mdrx_dd/metadata"));
  refactored_metadata.InitializeForReconstruction();
  refactored_data.InitializeForReconstruction(refactored_metadata);

  for (auto &metadata : refactored_metadata.metadata) {
    metadata.requested_tol = tol;
    metadata.requested_s = std::numeric_limits<double>::infinity();
  }
  mgard_x::MDR::MDRequest<3, float, SERIAL>(shp, refactored_metadata, config);
  for (auto &md : refactored_metadata.metadata) {
    std::printf("requested planes:");
    for (auto b : md.requested_level_num_bitplanes)
      std::printf(" %d", (int)b);
    std::printf("\n");
  }

  for (std::size_t sub = 0; sub < refactored_metadata.metadata.size(); sub++) {
    auto &md = refactored_metadata.metadata[sub];
    for (std::size_t l = 0; l < md.level_sizes.size(); l++) {
      int loaded = md.loaded_level_num_bitplanes[l];
      int requested = md.requested_level_num_bitplanes[l];
      for (int bp = loaded; bp < requested; bp++) {
        if (md.level_sizes[l][bp] > 0) {
          std::vector<Byte> blob =
              slurp("mdrx_dd/component_" + std::to_string(sub) + "_" +
                    std::to_string(l) + "_" + std::to_string(bp));
          Byte *buf = (Byte *)malloc(blob.size() * 4 + (1 << 16));
          std::memcpy(buf, blob.data(), blob.size());
          refactored_data.data[sub][l][bp] = buf;
        }
      }
      refactored_data.level_signs[sub][l] =
          (bool *)calloc(md.level_num_elems[l] + 4096, sizeof(bool));
    }
  }

  mgard_x::MDR::MDReconstruct<3, float, SERIAL>(
      shp, refactored_metadata, refactored_data, reconstructed_data, config,
      false);

  char name[64];
  std::snprintf(name, sizeof(name), "mdrx_dd_rec_%.0e.bin", tol);
  std::size_t n = 33 * 33 * 33;
  // domain-decomposed reconstruction returns one buffer per subdomain
  std::FILE *f = std::fopen(name, "wb");
  std::size_t written = 0;
  for (std::size_t sub = 0; sub < reconstructed_data.data.size(); sub++) {
    std::size_t sn = 1;
    // slab sizes along the decomposed dim recorded in offset/shape
    sn = reconstructed_data.shape[sub][0] * reconstructed_data.shape[sub][1] *
         reconstructed_data.shape[sub][2];
    std::fwrite(reconstructed_data.data[sub], sizeof(float), sn, f);
    written += sn;
    std::printf("subdomain %zu shape %u %u %u offset %u %u %u\n", sub,
                (unsigned)reconstructed_data.shape[sub][0],
                (unsigned)reconstructed_data.shape[sub][1],
                (unsigned)reconstructed_data.shape[sub][2],
                (unsigned)reconstructed_data.offset[sub][0],
                (unsigned)reconstructed_data.offset[sub][1],
                (unsigned)reconstructed_data.offset[sub][2]);
  }
  std::fclose(f);

  auto v = make_field<float>(std::vector<std::size_t>(kShape.begin(),
                                                      kShape.end()));
  double linf = 0;
  std::size_t vi = 0;
  for (std::size_t sub = 0; sub < reconstructed_data.data.size(); sub++) {
    const float *r = (const float *)reconstructed_data.data[sub];
    std::size_t sn = reconstructed_data.shape[sub][0] *
                     reconstructed_data.shape[sub][1] *
                     reconstructed_data.shape[sub][2];
    for (std::size_t i = 0; i < sn; i++)
      linf = std::max(linf, std::abs((double)v[vi + i] - r[i]));
    vi += sn;
  }
  std::printf("tol %.0e: reference dd reconstruction L_inf %.3e (n=%zu)\n",
              tol, linf, vi);
  return 0;
}

// SingleDim-decomposition archive (header + metadata only): the
// cross-reader must reject it cleanly, not silently recompose MultiDim.
int do_refactor_sd() {
  const std::vector<SIZE> shape_sd{17, 17, 17};
  std::vector<std::size_t> shv(shape_sd.begin(), shape_sd.end());
  auto v = make_field<float>(shv);
  mkdir("mdrx_sd", 0755);
  Config config = make_config();
  config.decomposition = decomposition_type::SingleDim;

  mgard_x::MDR::RefactoredMetadata refactored_metadata;
  mgard_x::MDR::RefactoredData refactored_data;
  std::vector<SIZE> shp(shape_sd);
  mgard_x::MDR::MDRefactor<3, float, SERIAL>(
      shp, v.data(), refactored_metadata, refactored_data, config, false);

  std::vector<Byte> serialized_metadata = refactored_metadata.Serialize();
  dump("mdrx_sd/header", refactored_metadata.header.data(),
       refactored_metadata.header.size());
  dump("mdrx_sd/metadata", serialized_metadata.data(),
       serialized_metadata.size());
  std::printf("refactored_sd done\n");
  return 0;
}

} // namespace

int main(int argc, char **argv) {
  setvbuf(stdout, NULL, _IONBF, 0);  // keep progress prints on abort
  if (argc > 1 && std::string(argv[1]) == "refactor")
    return do_refactor();
  if (argc > 2 && std::string(argv[1]) == "reconstruct")
    return do_reconstruct(std::atof(argv[2]),
                          argc > 3 ? std::atof(argv[3])
                                   : std::numeric_limits<double>::infinity());
  if (argc > 1 && std::string(argv[1]) == "refactor3")
    return do_refactor3();
  if (argc > 2 && std::string(argv[1]) == "reconstruct3")
    return do_reconstruct3(std::atof(argv[2]),
                           argc > 3 && std::string(argv[3]) == "--trim");
  if (argc > 1 && std::string(argv[1]) == "refactor_sd")
    return do_refactor_sd();
  if (argc > 1 && std::string(argv[1]) == "refactor_dd")
    return do_refactor_dd();
  if (argc > 2 && std::string(argv[1]) == "reconstruct_dd")
    return do_reconstruct_dd(std::atof(argv[2]));
  std::printf("usage: gen_mdrx refactor | reconstruct <tol> | refactor3 | "
              "reconstruct3 <tol> [--trim] | refactor_sd\n");
  return 2;
}
