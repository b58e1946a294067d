#!/bin/sh
# Regenerate the MGARD-X-serial golden coefficient vectors from the
# reference checkout at $REF (default /root/reference). Requires g++ only
# (the SERIAL backend has no external deps).
set -e
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
BUILD=$(mktemp -d)
cd "$BUILD"
sed -e 's/#cmakedefine01 MGARD_ENABLE_SERIAL/#define MGARD_ENABLE_SERIAL 1/' \
    -e 's/#cmakedefine01 \(.*\)/#define \1 0/' \
    "$REF/include/MGARDXConfig.h.in" > MGARDXConfig.h
g++ -O2 -w -std=c++17 -I"$REF/include" -I. \
    "$HERE/gen_golden_x.cpp" \
    "$REF/src/mgard-x/Config/Config.cpp" \
    "$REF/src/mgard-x/RuntimeX/Utilities/Log.cpp" \
    "$REF/src/mgard-x/RuntimeX/DeviceAdapters/DeviceAdapterSerial.cpp" \
    "$REF/src/mgard-x/RuntimeX/AutoTuners/AutoTunerSerial.cpp" \
    -o gen_golden_x
./gen_golden_x
cp input_x_*.bin decomposed_x_*.bin "$HERE/"
echo "MGARD-X golden vectors updated in $HERE"
