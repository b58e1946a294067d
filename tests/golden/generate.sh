#!/bin/sh
# Regenerate the committed golden vectors from the reference MGARD-CPU
# library. Requires the reference checkout at $REF (default /root/reference)
# plus protoc, g++, libprotobuf, libzstd, libz.
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
g++ -O2 -std=c++17 -I"$REF/include" -I. \
    "$HERE/gen_golden.cpp" mgard.pb.cc \
    "$REF/src/mgard/compressors.cpp" "$REF/src/mgard/format.cpp" \
    -lprotobuf -lzstd -lz -o gen_golden
./gen_golden
cp input_*.bin decomposed_*.bin manifest.json "$HERE/"
echo "golden vectors updated in $HERE"
