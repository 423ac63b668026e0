"""From-scratch DEFLATE/zlib/gzip decoder vs the stdlib zlib referee.

Every stream CPython's zlib emits (all levels: stored, fixed and
dynamic blocks; sparse, low-entropy and repetitive payloads) must
decode byte-exact.  Strictness is pinned by hand-assembled hostile
streams; a mutation battery proves every escape is the domain error.
"""

import gzip
import io
import random
import struct
import zlib

import pytest

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.inflatecodec import (
    InflateError,
    adler32,
    crc32,
    inflate_gzip,
    inflate_raw,
    inflate_zlib,
)


def _payloads(rng, n_each=40):
    out = []
    for _ in range(n_each):
        n = rng.randrange(0, 4000)
        out.append(bytes(rng.randrange(256) for _ in range(n)))
        out.append(bytes(rng.choice(b"abcde ") for _ in range(n)))
        unit = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 30)))
        out.append((unit * (n // max(len(unit), 1) + 1))[:n])
    return out


def test_checksums_match_stdlib():
    rng = random.Random(3)
    for p in _payloads(rng, 10):
        assert adler32(p) == zlib.adler32(p)
        assert crc32(p) == zlib.crc32(p)


def test_zlib_referee_all_levels():
    rng = random.Random(5)
    payloads = _payloads(rng, 15)
    for i, p in enumerate(payloads):
        level = i % 10
        assert inflate_zlib(zlib.compress(p, level)) == p
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        raw = co.compress(p) + co.flush()
        got, pos = inflate_raw(raw)
        assert got == p and pos == len(raw)


def test_gzip_referee_with_header_fields():
    p = bytes(range(256)) * 11
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", filename="name.txt") as f:
        f.write(p)
    assert inflate_gzip(buf.getvalue()) == p
    # multi-flag header assembled by hand: FEXTRA + FNAME + FCOMMENT
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = co.compress(p) + co.flush()
    hdr = (
        b"\x1f\x8b\x08" + bytes([0x04 | 0x08 | 0x10]) + b"\x00" * 6
        + struct.pack("<H", 3) + b"xyz"      # FEXTRA
        + b"fname\x00" + b"comment\x00"      # FNAME, FCOMMENT
    )
    blob = hdr + body + struct.pack("<II", zlib.crc32(p), len(p) % (1 << 32))
    assert inflate_gzip(blob) == p


def test_hand_assembled_stored_and_fixed_blocks():
    # stored: BFINAL=1 BTYPE=00 -> byte 0x01, LEN=3 NLEN=~3, 'abc'
    stored = b"\x01\x03\x00\xfc\xff" + b"abc"
    out, pos = inflate_raw(stored)
    assert out == b"abc" and pos == len(stored)
    # fixed-huffman 'abc' exactly as zlib level 9 emits for tiny input
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    fixed = co.compress(b"abc") + co.flush()
    assert inflate_raw(fixed)[0] == b"abc"
    # empty stored block
    out, _ = inflate_raw(b"\x01\x00\x00\xff\xff")
    assert out == b""


def test_overlapping_backreference_replicates():
    # 'a' then a (distance=1, length=5) run -> 'aaaaaa'
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    raw = co.compress(b"a" * 600) + co.flush()
    assert inflate_raw(raw)[0] == b"a" * 600


def test_hostile_streams_raise_domain_error():
    assert issubclass(InflateError, DBPSInvalidInputError)
    with pytest.raises(InflateError, match="LEN/NLEN"):
        inflate_raw(b"\x01\x03\x00\x00\x00abc")
    with pytest.raises(InflateError, match="reserved block"):
        inflate_raw(b"\x07")
    with pytest.raises(InflateError, match="end of DEFLATE"):
        inflate_raw(b"")
    with pytest.raises(InflateError, match="before stream start"):
        # fixed block: literal 'a' then length-3 @ distance 4 (too far)
        import io as _io
        bits = []
        def put(v, n):
            for i in range(n):
                bits.append((v >> i) & 1)
        put(1, 1); put(1, 2)                # BFINAL, fixed
        def put_code(code, n):              # huffman codes MSB-first
            for i in range(n - 1, -1, -1):
                bits.append((code >> i) & 1)
        put_code(0x30 + ord('a'), 8)        # literal 'a'
        put_code(0x01, 7)                   # length code 257 (len 3)
        put_code(3, 5)                      # distance code 3 (dist 4)
        put_code(0, 7)                      # end of block
        raw = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j, bit in enumerate(bits[i : i + 8]):
                b |= bit << j
            raw.append(b)
        inflate_raw(bytes(raw))
    # zlib wrapper checks
    good = zlib.compress(b"payload")
    with pytest.raises(InflateError, match="FCHECK"):
        inflate_zlib(bytes([good[0], good[1] ^ 1]) + good[2:])
    bad_adler = bytearray(good); bad_adler[-1] ^= 1
    with pytest.raises(InflateError, match="Adler-32"):
        inflate_zlib(bytes(bad_adler))
    with pytest.raises(InflateError, match="FDICT"):
        inflate_zlib(b"\x78\xbb" + b"\x00" * 8)
    # gzip wrapper checks
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb") as f:
        f.write(b"x")
    g = bytearray(buf.getvalue())
    g[-5] ^= 1
    with pytest.raises(InflateError, match="CRC-32|ISIZE"):
        inflate_gzip(bytes(g))


def test_mutation_battery():
    rng = random.Random(59)
    bases = [
        bytearray(zlib.compress(bytes(range(256)) * 5, 6)),
        bytearray(zlib.compress(b"ab" * 800, 9)),
        bytearray(zlib.compress(bytes(rng.randrange(256) for _ in range(900)), 1)),
    ]
    for _ in range(3000):
        b = bytearray(rng.choice(bases))
        for _ in range(rng.randint(1, 6)):
            op = rng.random()
            if op < 0.6 and b:
                b[rng.randrange(len(b))] = rng.randrange(256)
            elif op < 0.8 and len(b) > 4:
                cut = rng.randrange(len(b) - 3)
                del b[cut : cut + rng.randint(1, 12)]
            else:
                i = rng.randrange(len(b) + 1)
                b[i:i] = bytes(
                    rng.randrange(256) for _ in range(rng.randint(1, 6))
                )
        try:
            inflate_zlib(bytes(b))
        except InflateError:
            pass


# ---------------------------------------------------------------------------
# Encode direction: fixed-Huffman DEFLATE + wrappers; stdlib zlib is
# the decode REFEREE (it must read our streams byte-exact).
# ---------------------------------------------------------------------------

from databatchprotectionservice_spark.core.inflatecodec import (  # noqa: E402
    deflate,
    deflate_fixed,
    deflate_stored,
    gzip_compress,
    zlib_compress,
)


def test_encoder_zlib_referee_matrix():
    rng = random.Random(61)
    for trial in range(60):
        n = rng.randrange(0, 5000)
        kind = trial % 3
        if kind == 0:
            p = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            p = bytes(rng.choice(b"hello world ") for _ in range(n))
        else:
            u = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 25)))
            p = (u * (n // max(len(u), 1) + 1))[:n]
        raw = deflate(p)
        assert zlib.decompress(raw, -15) == p
        assert inflate_raw(raw)[0] == p
        assert zlib.decompress(zlib_compress(p)) == p
        assert inflate_zlib(zlib_compress(p)) == p
        assert gzip.decompress(gzip_compress(p, fname="t.bin")) == p
        assert inflate_gzip(gzip_compress(p)) == p


def test_encoder_compresses_and_falls_back():
    repetitive = b"spark " * 2000
    assert len(deflate_fixed(repetitive)) < len(repetitive) // 50
    rnd = bytes(random.Random(1).randrange(256) for _ in range(4000))
    # incompressible input: deflate() picks stored, still referee-clean
    raw = deflate(rnd)
    assert len(raw) <= len(deflate_fixed(rnd))
    assert zlib.decompress(raw, -15) == rnd


def test_encoder_long_matches_and_window_edge():
    # a match at exactly the 258 cap and repeats far apart
    p = b"A" * 1000 + b"B" * 40000 + b"A" * 1000
    raw = deflate_fixed(p)
    assert zlib.decompress(raw, -15) == p
    assert inflate_raw(raw)[0] == p


def test_encoder_multi_chunk_stored():
    p = bytes(random.Random(2).randrange(256) for _ in range(70000))
    raw = deflate_stored(p)  # two stored blocks (0xFFFF cap)
    assert zlib.decompress(raw, -15) == p
    assert inflate_raw(raw)[0] == p


# ---------------------------------------------------------------------------
# Cross-validation against the engine's OWN production byte paths:
# the spec twin must decode the zlib/deflate streams the PNG, ZIP and
# Avro codecs actually emit (and, for ZIP, streams our encoder emits
# must be readable back through the production walk).
# ---------------------------------------------------------------------------


def test_decodes_png_idat_stream():
    import numpy as np

    from databatchprotectionservice_spark.core.imagecodec import (
        encode_png,
    )

    img = np.arange(9 * 11 * 3, dtype=np.uint8).reshape(9, 11, 3)
    png = encode_png(img)
    # walk PNG chunks for the concatenated IDAT payload
    pos = 8
    idat = bytearray()
    while pos + 8 <= len(png):
        (ln,) = struct.unpack_from(">I", png, pos)
        typ = png[pos + 4 : pos + 8]
        if typ == b"IDAT":
            idat += png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    ours = inflate_zlib(bytes(idat))
    assert ours == zlib.decompress(bytes(idat))
    # filtered scanlines: height rows of (1 filter byte + 3*width)
    assert len(ours) == 9 * (1 + 11 * 3)


def test_decodes_zip_deflate_member():
    from databatchprotectionservice_spark.core.zipcodec import (
        encode_zip,
        parse_zip,
    )

    payload = b"zip deflate member " * 50
    blob = encode_zip([("a.txt", payload)], deflate=True)
    m = parse_zip(blob)[0]
    assert m["method"] == 8 and m["data"] == payload
    # slice the raw deflate stream out of the single local header:
    # 30 fixed bytes + name, compressed size at local offset 18
    (csize,) = struct.unpack_from("<I", blob, 18)
    raw = blob[30 + len(b"a.txt") : 30 + len(b"a.txt") + csize]
    assert inflate_raw(raw)[0] == payload


def test_decodes_avro_deflate_block():
    from databatchprotectionservice_spark.core.avrocodec import (
        encode_avro_ocf,
        parse_avro_ocf,
    )

    from databatchprotectionservice_spark.core.avrocodec import (
        read_long,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "string"}],
    }
    rows = [{"x": f"value {i} " * 9} for i in range(50)]
    sync = bytes(range(16))
    blob = encode_avro_ocf(rows, schema, codec="deflate", sync=sync)
    assert parse_avro_ocf(blob)["records"] == rows  # production walk
    # locate the single block after the header's sync marker:
    # [count varint][size varint][deflate bytes][sync]
    start = blob.find(sync) + 16
    _, p2 = read_long(blob, start)
    size, p3 = read_long(blob, p2)
    raw = blob[p3 : p3 + size]
    assert blob[p3 + size : p3 + size + 16] == sync
    assert inflate_raw(raw)[0] == zlib.decompress(raw, -15)


def test_zip_walk_reads_our_deflate():
    """Invert the referee: hand the production ZIP walk a member whose
    deflate stream came from OUR encoder."""
    from databatchprotectionservice_spark.core.inflatecodec import (
        deflate as our_deflate,
    )
    from databatchprotectionservice_spark.core.zipcodec import parse_zip

    payload = b"our deflate inside a zip " * 40
    raw = our_deflate(payload)
    crc = zlib.crc32(payload) & 0xFFFFFFFF
    name = b"ours.bin"
    local = (
        b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 8, 0, 0)
        + struct.pack("<IIIHH", crc, len(raw), len(payload), len(name), 0)
        + name + raw
    )
    central = (
        b"PK\x01\x02"
        + struct.pack("<HHHHHH", 20, 20, 0, 8, 0, 0)   # versions..date
        + struct.pack("<III", crc, len(raw), len(payload))
        + struct.pack("<HHH", len(name), 0, 0)          # n/e/c lens
        + struct.pack("<HH", 0, 0)                      # disk, iattr
        + struct.pack("<II", 0, 0)                      # eattr, offset
        + name
    )
    eocd = (
        b"PK\x05\x06" + struct.pack("<HHHHIIH", 0, 0, 1, 1,
                                     len(central), len(local), 0)
    )
    blob = local + central + eocd
    m = parse_zip(blob)[0]
    assert m["name"] == "ours.bin"
    assert m["data"] == payload  # the production walk inflated OUR stream


def test_dynamic_huffman_encoder_referee():
    from databatchprotectionservice_spark.core.inflatecodec import (
        deflate_dynamic,
    )

    rng = random.Random(67)
    for trial in range(50):
        n = rng.randrange(0, 5000)
        kind = trial % 4
        if kind == 0:
            p = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            p = bytes(rng.choice(b"hello world ") for _ in range(n))
        elif kind == 2:
            u = bytes(
                rng.randrange(256) for _ in range(rng.randrange(1, 25))
            )
            p = (u * (n // max(len(u), 1) + 1))[:n]
        else:
            p = bytes([rng.choice(b"ab")]) * n  # 1-2 symbol extremes
        raw = deflate_dynamic(p)
        assert zlib.decompress(raw, -15) == p
        assert inflate_raw(raw)[0] == p


def test_dynamic_beats_fixed_on_text():
    from databatchprotectionservice_spark.core.inflatecodec import (
        deflate_dynamic,
    )

    p = b"the quick brown fox jumps over the lazy dog " * 300
    d, f = len(deflate_dynamic(p)), len(deflate_fixed(p))
    z = len(zlib.compress(p, 6)) - 6  # strip zlib header+adler
    assert d < f
    assert d < 1.25 * z  # within 25% of zlib's raw stream


def test_deflate_elects_smallest_block_type():
    text = b"spark table query value " * 800
    rnd = bytes(random.Random(4).randrange(256) for _ in range(3000))
    from databatchprotectionservice_spark.core.inflatecodec import (
        deflate_dynamic,
    )

    assert len(deflate(text)) == len(deflate_dynamic(text))
    assert len(deflate(rnd)) <= len(deflate_stored(rnd))
    for p in (text, rnd, b"", b"x"):
        assert zlib.decompress(deflate(p), -15) == p
        assert inflate_raw(deflate(p))[0] == p


def test_gzip_trailing_garbage_rejected():
    """ADVICE r9 (low): inflate_gzip is the single-member strict entry
    point — bytes after the CRC32/ISIZE trailer are an error, exactly as
    gzip_members treats a malformed second member."""
    blob = gzip_compress(b"strict single member")
    assert inflate_gzip(blob) == b"strict single member"
    with pytest.raises(InflateError):
        inflate_gzip(blob + b"\x00")
    with pytest.raises(InflateError):
        inflate_gzip(blob + blob)  # two members -> use gzip_members
