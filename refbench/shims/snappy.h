// Failing-stub snappy shim: no snappy library ships in this container, so
// the SNAPPY scenarios (2, 4, 5) of the reference performance_test cannot
// run; the UNCOMPRESSED scenarios (1, 3, 6) never reach these functions.
// Compress aborts loudly rather than producing wrong bytes.
#pragma once
#include <cstddef>
#include <cstdio>
#include <cstdlib>

namespace snappy {

inline size_t MaxCompressedLength(size_t source_bytes) {
    return 32 + source_bytes + source_bytes / 6;
}

inline void RawCompress(const char*, size_t, char*, size_t* compressed_length) {
    std::fprintf(stderr,
                 "snappy shim: SNAPPY unavailable in this container\n");
    std::abort();
    *compressed_length = 0;
}

inline bool GetUncompressedLength(const char*, size_t, size_t* result) {
    *result = 0;
    return false;  // -> reference reports decompression failure
}

inline bool RawUncompress(const char*, size_t, char*) { return false; }

}  // namespace snappy
