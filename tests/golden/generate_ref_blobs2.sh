#!/bin/sh
# Build + run the second reference-blob generator (BlockDelta/SymbolRans/
# ZeroRLE_Rans lossless classes, MGARD-X SERIAL). Same toolchain needs as
# generate_ref_blobs.sh. One process per encode AND per decode: the
# reference CompressorCache leaks state across runs in one process.
set -e
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
BUILD=$(mktemp -d)
cd "$BUILD"
protoc --proto_path="$REF/src" --cpp_out=. mgard.proto
mkdir -p proto && cp mgard.pb.h proto/
sed -e 's/#cmakedefine01 MGARD_ENABLE_SERIAL/#define MGARD_ENABLE_SERIAL 1/' \
    -e 's/#cmakedefine01 \(.*\)/#define \1 0/' \
    "$REF/include/MGARDXConfig.h.in" > MGARDXConfig.h
sed -e 's/@MGARD_VERSION@/1.6.0/; s/@MGARD_VERSION_MAJOR@/1/;
        s/@MGARD_VERSION_MINOR@/6/; s/@MGARD_VERSION_PATCH@/0/;
        s/@MGARD_FILE_VERSION_MAJOR@/1/; s/@MGARD_FILE_VERSION_MINOR@/0/;
        s/@MGARD_FILE_VERSION_PATCH@/0/;
        s/#cmakedefine[^\n]*//' \
    "$REF/include/MGARDConfig.hpp.in" > MGARDConfig.hpp
g++ -O1 -w -std=c++17 -I"$REF/include" -I. \
    "$HERE/gen_ref_blobs2.cpp" mgard.pb.cc \
    "$REF/src/mgard-x/Config/Config.cpp" \
    "$REF/src/mgard-x/Metadata/Metadata.cpp" \
    "$REF/src/mgard-x/RuntimeX/Utilities/Log.cpp" \
    "$REF/src/mgard-x/RuntimeX/DeviceAdapters/DeviceAdapterSerial.cpp" \
    "$REF/src/mgard-x/RuntimeX/AutoTuners/AutoTunerSerial.cpp" \
    -lprotobuf -lzstd -lz -o gen_ref_blobs2
for tag in 3d65_f32_bdfixed 3d65_f32_bddelta 3d65_f32_bdoutlier \
           3d65_f32_symrans 3d65_f32_zrlerans; do
  ./gen_ref_blobs2 encode "$tag"
  ./gen_ref_blobs2 decode "$tag"
done
cp ref_blob_*.mgard ref_dec_*.bin "$HERE/"
echo "ref blobs #2 updated in $HERE"
