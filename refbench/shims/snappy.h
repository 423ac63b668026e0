// Minimal spec-compliant snappy raw-block codec, header-only.
//
// No snappy library ships in this container, so this shim implements the
// public snappy block format (format_description.txt in google/snappy:
// ULEB128 uncompressed-length preamble, then literal/copy elements with
// 1/2/4-byte offsets) from scratch, with the same greedy 64 KiB-block
// hash-table match finder the real library uses. It exposes exactly the
// four entry points the reference's compression_utils.cpp calls:
// MaxCompressedLength, RawCompress, GetUncompressedLength, RawUncompress.
//
// Output interoperates with any conforming snappy (verified against
// pyarrow's bundled snappy both directions), so the SNAPPY scenarios
// (2, 4, 5) of the reference performance_test become runnable and the
// Python engine's pyarrow-snappy cells are apples-to-apples.
#pragma once
#include <cstddef>
#include <cstdint>
#include <cstring>

namespace snappy {

inline size_t MaxCompressedLength(size_t source_bytes) {
    return 32 + source_bytes + source_bytes / 6;
}

namespace detail {

inline uint32_t Load32(const char* p) {
    uint32_t x;
    std::memcpy(&x, p, 4);
    return x;
}

inline uint64_t Load64(const char* p) {
    uint64_t x;
    std::memcpy(&x, p, 8);
    return x;
}

#if defined(__GNUC__)
inline int CtzNonzero64(uint64_t v) { return __builtin_ctzll(v); }
#else
inline int CtzNonzero64(uint64_t v) {
    int c = 0;
    while (!(v & 1)) {
        v >>= 1;
        ++c;
    }
    return c;
}
#endif

// little-endian first-mismatch byte count within two 8-byte words
inline size_t MatchLen(const char* a, const char* b, const char* a_end) {
    const char* a0 = a;
    while (a + 8 <= a_end) {
        uint64_t x = Load64(a) ^ Load64(b);
        if (x) return (a - a0) + (CtzNonzero64(x) >> 3);
        a += 8;
        b += 8;
    }
    while (a < a_end && *a == *b) {
        ++a;
        ++b;
    }
    return a - a0;
}

inline uint32_t Hash(uint32_t v, int shift) {
    return (v * 0x1e35a7bdu) >> shift;
}

inline char* EmitLiteral(char* op, const char* s, size_t len) {
    size_t n = len - 1;  // stored length is len-1
    if (n < 60) {
        *op++ = static_cast<char>(n << 2);
    } else {
        char* tag = op++;
        int count = 0;
        size_t v = n;
        while (v > 0) {
            *op++ = static_cast<char>(v & 0xff);
            v >>= 8;
            ++count;
        }
        *tag = static_cast<char>((59 + count) << 2);
    }
    std::memcpy(op, s, len);
    return op + len;
}

inline char* EmitCopyUpTo64(char* op, size_t offset, size_t len) {
    if (len < 12 && offset < 2048) {
        // 1-byte-offset form: len 4..11, 11-bit offset
        *op++ = static_cast<char>(((offset >> 8) << 5) | ((len - 4) << 2) | 1);
        *op++ = static_cast<char>(offset & 0xff);
    } else {
        // 2-byte-offset form: len 1..64, 16-bit offset
        *op++ = static_cast<char>(((len - 1) << 2) | 2);
        *op++ = static_cast<char>(offset & 0xff);
        *op++ = static_cast<char>((offset >> 8) & 0xff);
    }
    return op;
}

inline char* EmitCopy(char* op, size_t offset, size_t len) {
    while (len >= 68) {
        op = EmitCopyUpTo64(op, offset, 64);
        len -= 64;
    }
    if (len > 64) {
        op = EmitCopyUpTo64(op, offset, 60);
        len -= 60;
    }
    return EmitCopyUpTo64(op, offset, len);
}

// Greedy match-find over one block (<= 64 KiB so offsets fit uint16_t).
inline char* CompressBlock(const char* input, size_t n, char* op,
                           uint16_t* table, int table_bits) {
    std::memset(table, 0, sizeof(uint16_t) << table_bits);
    const int shift = 32 - table_bits;
    const char* end = input + n;
    const char* lit_start = input;
    if (n >= 5) {
        const char* limit = end - 4;
        const char* ip = input + 1;
        // skip-ahead heuristic (as in the real library): after 32 probes
        // with no match, start stepping 2, 3, ... so incompressible input
        // costs O(n / skip) probes instead of one per byte
        uint32_t skip = 32;
        while (ip <= limit) {
            uint32_t cur = Load32(ip);
            uint32_t h = Hash(cur, shift);
            const char* cand = input + table[h];
            table[h] = static_cast<uint16_t>(ip - input);
            if (cand < ip && Load32(cand) == cur) {
                skip = 32;
                if (ip > lit_start)
                    op = EmitLiteral(op, lit_start, ip - lit_start);
                size_t len = 4 + MatchLen(ip + 4, cand + 4, end);
                op = EmitCopy(op, ip - cand, len);
                ip += len;
                lit_start = ip;
            } else {
                ip += (skip++ >> 5);
            }
        }
    }
    if (lit_start < end) op = EmitLiteral(op, lit_start, end - lit_start);
    return op;
}

}  // namespace detail

inline void RawCompress(const char* input, size_t input_length,
                        char* compressed, size_t* compressed_length) {
    char* op = compressed;
    size_t v = input_length;
    while (v >= 0x80) {
        *op++ = static_cast<char>(v | 0x80);
        v >>= 7;
    }
    *op++ = static_cast<char>(v);
    constexpr int kTableBits = 14;
    static thread_local uint16_t table[1 << kTableBits];
    constexpr size_t kBlock = 1 << 16;
    for (size_t base = 0; base < input_length; base += kBlock) {
        size_t blen = input_length - base;
        if (blen > kBlock) blen = kBlock;
        op = detail::CompressBlock(input + base, blen, op, table, kTableBits);
    }
    *compressed_length = static_cast<size_t>(op - compressed);
}

inline bool GetUncompressedLength(const char* compressed,
                                  size_t compressed_length, size_t* result) {
    size_t r = 0;
    int shift = 0;
    for (size_t i = 0; i < compressed_length && shift < 64; ++i) {
        unsigned char b = static_cast<unsigned char>(compressed[i]);
        r |= static_cast<size_t>(b & 0x7f) << shift;
        if (!(b & 0x80)) {
            *result = r;
            return true;
        }
        shift += 7;
    }
    return false;
}

inline bool RawUncompress(const char* compressed, size_t compressed_length,
                          char* uncompressed) {
    // skip the length preamble
    size_t ulen = 0;
    size_t i = 0;
    {
        int shift = 0;
        bool done = false;
        while (i < compressed_length && shift < 64) {
            unsigned char b = static_cast<unsigned char>(compressed[i++]);
            ulen |= static_cast<size_t>(b & 0x7f) << shift;
            if (!(b & 0x80)) {
                done = true;
                break;
            }
            shift += 7;
        }
        if (!done) return false;
    }
    char* op = uncompressed;
    char* oend = uncompressed + ulen;
    while (i < compressed_length) {
        unsigned char tag = static_cast<unsigned char>(compressed[i++]);
        if ((tag & 3) == 0) {  // literal
            size_t len = (tag >> 2) + 1;
            if (len > 60) {
                int extra = (tag >> 2) - 59;  // 1..4 length bytes
                if (i + static_cast<size_t>(extra) > compressed_length)
                    return false;
                len = 0;
                for (int k = 0; k < extra; ++k)
                    len |= static_cast<size_t>(
                               static_cast<unsigned char>(compressed[i + k]))
                           << (8 * k);
                len += 1;
                i += extra;
            }
            if (i + len > compressed_length || op + len > oend) return false;
            std::memcpy(op, compressed + i, len);
            op += len;
            i += len;
        } else {  // copy
            size_t len, offset;
            if ((tag & 3) == 1) {
                if (i + 1 > compressed_length) return false;
                len = ((tag >> 2) & 7) + 4;
                offset = (static_cast<size_t>(tag >> 5) << 8) |
                         static_cast<unsigned char>(compressed[i]);
                i += 1;
            } else if ((tag & 3) == 2) {
                if (i + 2 > compressed_length) return false;
                len = (tag >> 2) + 1;
                offset = static_cast<unsigned char>(compressed[i]) |
                         (static_cast<size_t>(
                              static_cast<unsigned char>(compressed[i + 1]))
                          << 8);
                i += 2;
            } else {
                if (i + 4 > compressed_length) return false;
                len = (tag >> 2) + 1;
                offset = 0;
                for (int k = 0; k < 4; ++k)
                    offset |= static_cast<size_t>(
                                  static_cast<unsigned char>(compressed[i + k]))
                              << (8 * k);
                i += 4;
            }
            if (offset == 0 || static_cast<size_t>(op - uncompressed) < offset ||
                op + len > oend)
                return false;
            const char* src = op - offset;
            if (offset >= len) {
                std::memcpy(op, src, len);
            } else if (offset >= 8) {
                // 8-byte chunks only ever read bytes already written
                size_t k = 0;
                for (; k + 8 <= len; k += 8) std::memcpy(op + k, src + k, 8);
                for (; k < len; ++k) op[k] = src[k];
            } else {
                for (size_t k = 0; k < len; ++k) op[k] = src[k];
            }
            op += len;
        }
    }
    return op == oend;
}

}  // namespace snappy
