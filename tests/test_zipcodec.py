"""ZIP walk (core/zipcodec.py).

Interop pinned BOTH directions against stdlib zipfile (stored and
deflated), CRC tamper detection, seam errors (encryption flag,
exotic methods, zip64 markers), and the mutation battery for the
domain-error contract.
"""

import io
import random
import struct
import zipfile

import numpy as np
import pytest

from databatchprotectionservice_spark.core.errors import (
    DBPSInvalidInputError,
)
from databatchprotectionservice_spark.core.zipcodec import (
    ZipFormatError,
    encode_zip,
    parse_zip,
)


def test_reads_stdlib_zipfile_output():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("a.txt", b"alpha beta " * 40)
        z.writestr("d/b.bin", bytes(300))
    with zipfile.ZipFile(buf, "a", zipfile.ZIP_STORED) as z:
        z.writestr("c.raw", b"stored-bytes")
    entries = parse_zip(buf.getvalue())
    by_name = {e["name"]: e for e in entries}
    assert by_name["a.txt"]["data"] == b"alpha beta " * 40
    assert by_name["a.txt"]["method"] == 8
    assert by_name["d/b.bin"]["data"] == bytes(300)
    assert by_name["c.raw"]["method"] == 0
    assert by_name["c.raw"]["data"] == b"stored-bytes"


def test_stdlib_reads_our_output():
    for deflate in (True, False):
        enc = encode_zip(
            [("x/y.json", b'{"k": 1}'), ("z.cls", b"7" * 100)],
            deflate=deflate,
        )
        with zipfile.ZipFile(io.BytesIO(enc)) as z:
            assert z.namelist() == ["x/y.json", "z.cls"]
            assert z.read("x/y.json") == b'{"k": 1}'
            assert z.read("z.cls") == b"7" * 100
            assert z.testzip() is None  # stdlib CRC pass


def test_crc_tamper_detected():
    enc = encode_zip([("a.txt", b"payload-bytes")], deflate=False)
    at = enc.find(b"payload-bytes")
    bad = bytearray(enc)
    bad[at] ^= 0x01
    with pytest.raises(ZipFormatError, match="CRC-32 mismatch"):
        parse_zip(bytes(bad))


def test_seam_errors():
    enc = encode_zip([("a", b"x")])
    # encryption flag in the central entry
    cd_at = enc.find(b"PK\x01\x02")
    bad = bytearray(enc)
    bad[cd_at + 8] |= 0x01  # flags low byte
    with pytest.raises(ZipFormatError, match="encrypted"):
        parse_zip(bytes(bad))
    # exotic method (bzip2 = 12)
    bad = bytearray(enc)
    bad[cd_at + 10] = 12
    with pytest.raises(ZipFormatError, match="method 12"):
        parse_zip(bytes(bad))
    # zip64 marker count
    eocd_at = enc.rfind(b"PK\x05\x06")
    bad = bytearray(enc)
    struct.pack_into("<H", bad, eocd_at + 10, 0xFFFF)
    with pytest.raises(ZipFormatError):
        parse_zip(bytes(bad))


def test_error_paths():
    enc = encode_zip([("a.txt", b"abc"), ("b.txt", b"def")])
    with pytest.raises(ZipFormatError, match="end-of-central"):
        parse_zip(b"PK\x03\x04" + bytes(40))
    with pytest.raises(ZipFormatError, match="comment length"):
        parse_zip(enc + b"x")  # undeclared trailing byte
    # name mismatch between local and central copies
    local_name = enc.find(b"a.txt")
    bad = bytearray(enc)
    bad[local_name] = ord("z")
    with pytest.raises(ZipFormatError, match="name mismatch"):
        parse_zip(bytes(bad))
    assert issubclass(ZipFormatError, DBPSInvalidInputError)


def test_empty_and_unicode_names():
    enc = encode_zip([("päth/ü.txt", "héllo".encode("utf-8"))])
    (e,) = parse_zip(enc)
    assert e["name"] == "päth/ü.txt"
    assert e["data"].decode("utf-8") == "héllo"
    assert parse_zip(encode_zip([])) == []


def test_mutation_battery():
    rng = np.random.default_rng(67)
    bases = [
        bytearray(encode_zip([("a.txt", b"abc")], deflate=False)),
        bytearray(encode_zip(
            [("n" * 60 + ".bin",
              rng.integers(0, 256, 800, dtype=np.uint8).tobytes()),
             ("b.json", b"{}" * 50)])),
    ]
    random.seed(67)
    for _ in range(3000):
        b = bytearray(random.choice(bases))
        for _ in range(random.randint(1, 8)):
            op = random.random()
            if op < 0.5 and b:
                b[random.randrange(len(b))] = random.randrange(256)
            elif op < 0.75 and len(b) > 4:
                cut = random.randrange(len(b) - 3)
                del b[cut : cut + random.randint(1, 16)]
            else:
                i = random.randrange(len(b) + 1)
                b[i:i] = bytes(
                    random.randrange(256)
                    for _ in range(random.randint(1, 8))
                )
        try:
            parse_zip(bytes(b))
        except ZipFormatError:
            pass


def test_zip64_members_and_eocd64():
    """The r11 Zip64 closure: per-entry 0x0001 extra fields
    (force_zip64 members) and the EOCD64 locator/record path when
    the entry count saturates 0xFFFF — both against stdlib zipfile
    as the producer referee."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        with z.open("big.txt", "w", force_zip64=True) as f:
            f.write(b"hello zip64 " * 1000)
        z.writestr("small.txt", "plain member")
    ents = parse_zip(buf.getvalue())
    assert ents[0]["data"] == b"hello zip64 " * 1000
    assert ents[1]["data"] == b"plain member"

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for i in range(65600):
            z.writestr(f"m{i}", b"")
    data = buf.getvalue()
    assert data.find(b"PK\x06\x06") != -1  # EOCD64 really present
    ents = parse_zip(data)
    assert len(ents) == 65600
    assert ents[12345]["name"] == "m12345"
    # saturated EOCD without the locator must raise, not guess
    loc_at = data.rfind(b"PK\x06\x07")
    bad = bytearray(data)
    bad[loc_at] = 0x00
    with pytest.raises(ZipFormatError, match="[Zz]ip64"):
        parse_zip(bytes(bad))


def test_zip64_saturated_disk_fields_accepted():
    """ADVICE r11: APPNOTE 4.4.1.4 permits saturating the EOCD's
    16-bit disk-number fields to 0xFFFF in a Zip64 archive; those are
    deferral markers, not real disk numbers, so the multi-disk check
    must run on the EOCD64-resolved values. A genuinely nonzero
    (unsaturated) disk number still rejects."""
    import io
    import struct as _s
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("a.txt", b"payload " * 64)
    base = buf.getvalue()
    eocd_at = base.rfind(b"PK\x05\x06")
    _d, _cd, n_disk, n_total, cd_size, cd_off, _cl = _s.unpack_from(
        "<HHHHIIH", base, eocd_at + 4
    )
    # splice in an EOCD64 record + locator ahead of the EOCD (stdlib
    # only emits them on real overflow), then saturate EVERY 16-bit
    # EOCD field to 0xFFFF — the APPNOTE-valid single-disk shape
    rec = b"PK\x06\x06" + _s.pack(
        "<QHHIIQQQQ", 44, 45, 45, 0, 0, n_total, n_total, cd_size, cd_off
    )
    rec_off = eocd_at
    loc = b"PK\x06\x07" + _s.pack("<IQI", 0, rec_off, 1)
    eocd = bytearray(base[eocd_at:])
    _s.pack_into("<HHHH", eocd, 4, 0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF)
    data = base[:eocd_at] + rec + loc + bytes(eocd)
    ents = parse_zip(data)
    assert ents[0]["data"] == b"payload " * 64

    # unsaturated nonzero disk number: genuine multi-disk, reject
    bad = bytearray(base)
    _s.pack_into("<H", bad, eocd_at + 4, 2)
    with pytest.raises(ZipFormatError, match="multi-disk"):
        parse_zip(bytes(bad))
