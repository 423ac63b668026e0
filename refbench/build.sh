#!/bin/sh
# Build the reference performance_test (scenarios per
# src/scripts/performance_test.cpp:256-263) without CMake/network.
# Header deps unavailable in this container are shimmed in shims/:
#   tcb/span.hpp -> std::span (hence -std=c++20), minimal cxxopts.hpp,
#   spec-compliant snappy.h (own implementation of the public block
#   format, pyarrow-interop-verified) so SNAPPY scenarios 2/4/5 run.
# nlohmann/json comes from the miniconda include tree already on disk.
set -e
cd "$(dirname "$0")"
REF=/root/reference/src
g++ -std=c++20 -O2 -march=native \
    -I shims -I /root/miniconda/include -I "$REF/common" -I "$REF/processing" \
    -o performance_test \
    "$REF/scripts/performance_test.cpp" \
    "$REF/common/dbpa_local.cpp" \
    "$REF/common/enum_utils.cpp" \
    "$REF/processing/encryption_sequencer.cpp" \
    "$REF/processing/parquet_utils.cpp" \
    "$REF/processing/compression_utils.cpp" \
    "$REF/processing/encryptors/basic_xor_encryptor.cpp"
echo "built: $(pwd)/performance_test"
# Example run (matches scripts/bench_pages.py inputs):
#   ./performance_test --scenario_number 1 --datatype BYTE_ARRAY \
#     --values_file values/bytearray.txt --iterations 20 --warmup 3 \
#     --skip_decrypt false
