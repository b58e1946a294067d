#!/bin/sh
# Regenerate the committed CPU-generation golden streams from the reference
# MGARD-CPU library. Requires the reference checkout at $REF (default
# /root/reference) plus protoc, g++, libprotobuf, libzstd, libz.
set -e
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
BUILD=$(mktemp -d)
cd "$BUILD"
protoc --proto_path="$REF/src" --cpp_out=. mgard.proto
mkdir -p proto && cp mgard.pb.h proto/
# the reference generates MGARDConfig.hpp from CMake; synthesize it with the
# repo's recorded versions (reference CMakeLists.txt:14-20)
sed -e 's/@MGARD_VERSION@/1.6.0/; s/@MGARD_VERSION_MAJOR@/1/;
        s/@MGARD_VERSION_MINOR@/6/; s/@MGARD_VERSION_PATCH@/0/;
        s/@MGARD_FILE_VERSION_MAJOR@/1/; s/@MGARD_FILE_VERSION_MINOR@/0/;
        s/@MGARD_FILE_VERSION_PATCH@/0/;
        s/#cmakedefine[^\n]*//' \
    "$REF/include/MGARDConfig.hpp.in" > MGARDConfig.hpp
sed -e 's/#cmakedefine01 \(.*\)/#define \1 0/' \
    "$REF/include/MGARDXConfig.h.in" > MGARDXConfig.h

# zstd build (the reference's default lossless class, CPU_HUFFMAN_ZSTD)
g++ -O2 -std=c++17 -DMGARD_ZSTD -I"$REF/include" -I. \
    "$HERE/gen_cpu_stream.cpp" mgard.pb.cc \
    "$REF/src/mgard/compressors.cpp" "$REF/src/mgard/format.cpp" \
    -lprotobuf -lzstd -lz -o gen_cpu_stream_zstd
./gen_cpu_stream_zstd zstd

# zlib build (CPU_HUFFMAN_ZLIB container)
g++ -O2 -std=c++17 -I"$REF/include" -I. \
    "$HERE/gen_cpu_stream.cpp" mgard.pb.cc \
    "$REF/src/mgard/compressors.cpp" "$REF/src/mgard/format.cpp" \
    -lprotobuf -lzstd -lz -o gen_cpu_stream_zlib
./gen_cpu_stream_zlib zlib

cp cpu_input_*.bin cpu_output_*.bin cpu_stream_*.mgard cpu_manifest_*.json \
   "$HERE/"
cp cpu_coords_*.bin "$HERE/" 2>/dev/null || true
echo "cpu golden streams updated in $HERE"
