"""ZIP archive walk — public APPNOTE layout, stored + deflate.

The other universal corpus container beside tar: dataset dumps,
office formats, and model bundles are all ZIP.  From the public
PKWARE APPNOTE structures: end-of-central-directory locate (backward
comment scan), central-directory entries as the source of truth,
local-header cross-validation, CRC-32 verification of every member
(zlib polynomial), methods 0 (stored) and 8 (deflate, raw
``wbits=-15``), and — since r11 — Zip64: the EOCD64 locator/record
take over when the classic EOCD fields saturate at 0xFFFF/
0xFFFFFFFF, and per-entry 0x0001 extra fields supply 64-bit
usize/csize/local-header offsets in APPNOTE's ordered-only-if-maxed
layout.  Encryption and the other 17 compression methods remain
named seams.

Binary-container discipline as in tar/mkv/warc: every malformed
input raises ``ZipFormatError``, proven by the mutation battery; the
tests pin interop BOTH directions against stdlib ``zipfile``.
"""

from __future__ import annotations

import struct
import zlib

from .errors import DBPSInvalidInputError


class ZipFormatError(DBPSInvalidInputError):
    """Raised for malformed or out-of-subset ZIP bytes."""


_LOCAL = b"PK\x03\x04"
_CENTRAL = b"PK\x01\x02"
_EOCD = b"PK\x05\x06"
_EOCD64_LOC = b"PK\x06\x07"
_EOCD64 = b"PK\x06\x06"

#: hostile-input guards
MAX_MEMBER_BYTES = 1 << 30
MAX_COMMENT = 1 << 16


def parse_zip(data: bytes) -> list:
    """Central-directory walk -> [{name, size, crc32, method, data}].

    Every member is decompressed and CRC-checked; local headers are
    cross-validated against the directory."""
    eocd_at = data.rfind(_EOCD, max(0, len(data) - MAX_COMMENT - 22))
    if eocd_at == -1:
        raise ZipFormatError("no end-of-central-directory record")
    if eocd_at + 22 > len(data):
        raise ZipFormatError("truncated end-of-central-directory")
    (
        disk, cd_disk, n_disk, n_total, cd_size, cd_off, comment_len
    ) = struct.unpack_from("<HHHHIIH", data, eocd_at + 4)
    if eocd_at + 22 + comment_len != len(data):
        raise ZipFormatError("EOCD comment length disagrees with file end")
    # APPNOTE permits saturating ANY 16-bit EOCD field to 0xFFFF in a
    # Zip64 archive (4.4.1.4), including the disk numbers — those are
    # markers deferring to the EOCD64 record, not real disk numbers,
    # so the multi-disk check must run on the RESOLVED values
    # (ADVICE r11). A nonzero-but-unsaturated disk number is a
    # genuine multi-disk archive either way.
    is_zip64 = (
        n_total == 0xFFFF
        or cd_off == 0xFFFFFFFF
        or cd_size == 0xFFFFFFFF
        or disk == 0xFFFF
        or cd_disk == 0xFFFF
        or n_disk == 0xFFFF
    )
    if (disk and disk != 0xFFFF) or (cd_disk and cd_disk != 0xFFFF):
        raise ZipFormatError("multi-disk archives are a documented seam")
    if not is_zip64 and (disk or cd_disk or n_disk != n_total):
        raise ZipFormatError("multi-disk archives are a documented seam")
    if is_zip64:
        # Zip64: the EOCD64 locator sits immediately before the EOCD
        # (APPNOTE 4.3.15) and points at the EOCD64 record
        loc_at = eocd_at - 20
        if loc_at < 0 or data[loc_at : loc_at + 4] != _EOCD64_LOC:
            raise ZipFormatError(
                "saturated EOCD fields without a Zip64 locator"
            )
        l_disk, rec_off, l_ndisk = struct.unpack_from(
            "<IQI", data, loc_at + 4
        )
        if l_disk or l_ndisk != 1:
            raise ZipFormatError(
                "multi-disk Zip64 archives are a documented seam"
            )
        if rec_off + 56 > loc_at or data[
            rec_off : rec_off + 4
        ] != _EOCD64:
            raise ZipFormatError("Zip64 EOCD record out of place")
        (
            _rec_size, _vmade64, _vneed64, disk64, cd_disk64,
            n_disk64, n_total64, cd_size64, cd_off64,
        ) = struct.unpack_from("<QHHIIQQQQ", data, rec_off + 4)
        if disk64 or cd_disk64 or n_disk64 != n_total64:
            raise ZipFormatError(
                "multi-disk Zip64 archives are a documented seam"
            )
        n_total, cd_size, cd_off = n_total64, cd_size64, cd_off64
        eocd_at = rec_off  # directory must end before the record
    if cd_off + cd_size > eocd_at:
        raise ZipFormatError("central directory overruns the EOCD")

    entries = []
    pos = cd_off
    for i in range(n_total):
        if data[pos : pos + 4] != _CENTRAL:
            raise ZipFormatError(
                f"central entry {i} missing signature at {pos}"
            )
        if pos + 46 > len(data):
            raise ZipFormatError(f"truncated central entry {i}")
        (
            _vmade, _vneed, flags, method, _mt, _md, crc, csize, usize,
            nlen, elen, clen, _dstart, _iattr, _eattr, lho
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", data, pos + 4)
        name = data[pos + 46 : pos + 46 + nlen]
        extra = data[pos + 46 + nlen : pos + 46 + nlen + elen]
        pos += 46 + nlen + elen + clen
        if pos > cd_off + cd_size:
            raise ZipFormatError(f"central entry {i} overruns directory")
        if 0xFFFFFFFF in (usize, csize, lho):
            # Zip64 extended-information extra field (id 0x0001):
            # 64-bit values appear IN ORDER, only for the saturated
            # classic fields (APPNOTE 4.5.3)
            usize, csize, lho = _zip64_extra(
                extra, name, usize, csize, lho
            )
        if flags & 0x1:
            raise ZipFormatError("encrypted member is a documented seam")
        if method not in (0, 8):
            raise ZipFormatError(
                f"compression method {method} is a documented seam "
                "(stored/deflate subset)"
            )
        if usize > MAX_MEMBER_BYTES or csize > MAX_MEMBER_BYTES:
            raise ZipFormatError("member size over the decode guard")
        # local header cross-validation
        if lho + 30 > len(data) or data[lho : lho + 4] != _LOCAL:
            raise ZipFormatError(f"bad local header offset for {name!r}")
        (l_nlen, l_elen) = struct.unpack_from("<HH", data, lho + 26)
        body_at = lho + 30 + l_nlen + l_elen
        if data[lho + 30 : lho + 30 + l_nlen] != name:
            raise ZipFormatError(
                f"local/central name mismatch for {name!r}"
            )
        if body_at + csize > len(data):
            raise ZipFormatError(f"member {name!r} overruns the archive")
        raw = data[body_at : body_at + csize]
        if method == 0:
            if csize != usize:
                raise ZipFormatError(
                    f"stored member {name!r} with csize != usize"
                )
            blob = raw
        else:
            try:
                d = zlib.decompressobj(wbits=-15)
                blob = d.decompress(raw, MAX_MEMBER_BYTES)
                blob += d.flush()
            except zlib.error as e:
                raise ZipFormatError(f"corrupt deflate in {name!r}: {e}")
            if len(blob) != usize:
                raise ZipFormatError(
                    f"member {name!r} inflated to {len(blob)}, "
                    f"directory says {usize}"
                )
        if zlib.crc32(blob) & 0xFFFFFFFF != crc:
            raise ZipFormatError(f"CRC-32 mismatch in {name!r}")
        entries.append(
            {
                "name": name.decode("utf-8", "replace"),
                "size": usize,
                "crc32": crc,
                "method": method,
                "data": blob,
            }
        )
    return entries


def _zip64_extra(
    extra: bytes, name: bytes, usize: int, csize: int, lho: int
) -> tuple:
    """Resolve saturated central-entry fields from the 0x0001 extra
    field; its payload holds 8-byte values only for the fields that
    are 0xFFFFFFFF, in usize/csize/offset order."""
    at = 0
    while at + 4 <= len(extra):
        (hid, hlen) = struct.unpack_from("<HH", extra, at)
        body = extra[at + 4 : at + 4 + hlen]
        at += 4 + hlen
        if hid != 0x0001:
            continue
        bp = 0
        out = []
        for v in (usize, csize, lho):
            if v == 0xFFFFFFFF:
                if bp + 8 > len(body):
                    raise ZipFormatError(
                        f"Zip64 extra field too short for {name!r}"
                    )
                v = struct.unpack_from("<Q", body, bp)[0]
                bp += 8
            out.append(v)
        return tuple(out)
    raise ZipFormatError(
        f"saturated sizes without a Zip64 extra field for {name!r}"
    )


def encode_zip(members: list, *, deflate: bool = True) -> bytes:
    """(name, bytes) pairs -> ZIP with correct CRCs and directory."""
    out = bytearray()
    central = bytearray()
    count = 0
    for name, blob in members:
        nb = name.encode("utf-8")
        blob = bytes(blob)
        crc = zlib.crc32(blob) & 0xFFFFFFFF
        if deflate:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = co.compress(blob) + co.flush()
            method = 8
        else:
            raw, method = blob, 0
        lho = len(out)
        common = struct.pack(
            "<HHHHHIII", 20, 0, method, 0, 0x21, crc, len(raw), len(blob)
        )
        out += _LOCAL + common + struct.pack("<HH", len(nb), 0) + nb + raw
        central += (
            _CENTRAL
            + struct.pack("<H", 20)
            + common
            + struct.pack("<HHHHHII", len(nb), 0, 0, 0, 0, 0, lho)
            + nb
        )
        count += 1
    cd_off = len(out)
    out += central
    out += _EOCD + struct.pack(
        "<HHHHIIH", 0, 0, count, count, len(central), cd_off, 0
    )
    return bytes(out)
